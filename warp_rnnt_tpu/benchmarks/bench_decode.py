"""Inference (decoding) throughput on TPU.

The reference project is loss-only; this measures the serving tier the
framework adds — batched greedy and beam-search transducer decoding, fully
jitted (fixed-trip loops, no host round-trips per step).

Usage: python -m warp_rnnt_tpu.benchmarks.bench_decode [N] [T] [V] [beam]
"""

from __future__ import annotations

import json
import sys

import jax
import jax.numpy as jnp

from warp_rnnt_tpu.models import Transducer, greedy_decode, init_model
from warp_rnnt_tpu.models.beam_search import beam_decode
from warp_rnnt_tpu.utils.profiling import timeit


def bench_decode(N=32, T=400, V=1024, beam=4, feat_dim=80, hidden=512,
                 max_length=100):
    model, params, _ = init_model(
        jax.random.PRNGKey(0), vocab_size=V, feat_dim=feat_dim,
        N=N, T=T, U=8,
        encoder_hidden=hidden, predictor_hidden=hidden, joint_hidden=hidden,
    )
    feats = jax.random.normal(jax.random.PRNGKey(1), (N, T, feat_dim))
    xn = jnp.full((N,), T, jnp.int32)

    greedy = jax.jit(
        lambda f: greedy_decode(model, params, f, xn, max_length=max_length)
    )
    ms_g = timeit(greedy, feats, iters=10)

    beam_fn = jax.jit(
        lambda f: beam_decode(
            model, params, f, xn, max_length=max_length, beam_size=beam
        )
    )
    ms_b = timeit(beam_fn, feats, iters=10)

    return {
        "N": N, "T": T, "V": V, "hidden": hidden, "beam": beam,
        "greedy_ms": round(ms_g, 2),
        "greedy_utts_per_s": round(N / (ms_g / 1e3), 1),
        "beam_ms": round(ms_b, 2),
        "beam_utts_per_s": round(N / (ms_b / 1e3), 1),
    }


def main(*args):
    cfg = [int(a) for a in args] or [32, 400, 1024, 4]
    print(json.dumps(bench_decode(*cfg)), flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:])
