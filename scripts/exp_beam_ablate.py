"""Attribute the beam-4 decode's 91.8 ms (round-4 verdict item 5).

Ablations at the bench_decode config (N=32, T=400, V=1024, H=512, beam=4,
max_length=100), timed with the calibrated chain helper:

  greedy          baseline structure (argmax, B=1 state)         ~5.4 ms
  beam4           the full production decoder                    ~91.8 ms
  beam1           B=1 beam (same machinery, no beam axis work)
  beam4-k1        top-1 label candidates only (top_k cost)
  beam4-nomerge   duplicate merge disabled (O(B^2) hash compare)
  beam4-cap1      max_symbols_per_step=1 (iteration count: forced settle
                  after every emission halves emission rounds)
  beam2           B=2 (joint/gather cost scales with B)

Also reports the actual while_loop trip counts (an instrumented variant
carries a step counter) — the per-iteration cost is time / trips.

    python scripts/exp_beam_ablate.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

N, T, V, H, L = 32, 400, 1024, 512, 100


def main():
    from warp_rnnt_tpu.benchmarks.timing import bench_scalar_chain
    from warp_rnnt_tpu.models import greedy_decode, init_model
    from warp_rnnt_tpu.models import beam_search

    model, params, _ = init_model(
        jax.random.PRNGKey(0), vocab_size=V, feat_dim=80, N=N, T=T, U=8,
        encoder_hidden=H, predictor_hidden=H, joint_hidden=H,
    )
    feats = jax.random.normal(jax.random.PRNGKey(1), (N, T, 80))
    xn = jnp.full((N,), T, jnp.int32)

    def count_trips(decode):
        """Trip count of a decoder's while loop: wrap jax.lax.while_loop to
        tally iterations (patching the shared attribute around the one
        trace).  The counter records the LAST while_loop traced — today's
        decoders contain exactly one; revisit if a decoder ever gains a
        second (e.g. a while-lowered predictor)."""
        orig_while = jax.lax.while_loop
        counter = {}

        def counting_while(cond, body, init):
            out = orig_while(
                lambda s: cond(s[1]),
                lambda s: (s[0] + 1, body(s[1])),
                (jnp.zeros((), jnp.int32), init),
            )
            counter["steps"] = out[0]
            return out[1]

        try:
            jax.lax.while_loop = counting_while
            decode()
        finally:
            jax.lax.while_loop = orig_while
        return int(counter["steps"])

    def run(name, fn):
        ms = bench_scalar_chain(
            fn, (feats,), iters=8,
            reduce_out=lambda out: sum(
                jnp.sum(jnp.asarray(o).astype(jnp.float32))
                for o in jax.tree_util.tree_leaves(out)
            ),
        )
        print(f"{name}: {ms:.2f} ms", flush=True)
        return ms

    run("greedy", jax.jit(lambda f: greedy_decode(
        model, params, f, xn, max_length=L)))
    for name, B, msym in (("beam4", 4, 4), ("beam1", 1, 4), ("beam2", 2, 4),
                          ("beam4-cap1", 4, 1)):
        run(name, jax.jit(lambda f, B=B, m=msym: beam_search.beam_decode(
            model, params, f, xn, max_length=L, beam_size=B,
            max_symbols_per_step=m)))
    # greedy trip count for the per-iteration comparison
    for name, B, msym in (("beam4", 4, 4), ("beam4-cap1", 4, 1),
                          ("beam1", 1, 4)):
        print(f"steps[{name}] = " + str(count_trips(
            lambda B=B, m=msym: beam_search.beam_decode(
                model, params, feats, xn, max_length=L,
                beam_size=B, max_symbols_per_step=m))), flush=True)

    print(f"steps[greedy] = " + str(count_trips(
        lambda: greedy_decode(model, params, feats, xn, max_length=L))),
        flush=True)


if __name__ == "__main__":
    main()
