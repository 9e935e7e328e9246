"""Isolate why the routed padded branch loses to direct user code at tiny V.

Measured (benchmarks_endtoend.json joint_loss_backward_by_config, rand
lengths, N=16, T=150, U=40, V=28, H=256): rnnt_loss_joint layout="auto"
(-> padded branch) 1.562 ms vs Joint.apply + rnnt_loss_from_logits 0.366.

Times the EXACT bench_joint measurement (value_and_grad w.r.t. params,
bench_scalar_chain) across variants of the padded branch:

  direct    Joint.apply(normalize=False) + from_logits  (the user program)
  routedA   current: _pre_projections + jax.checkpoint'd combine/tanh/out
  routedB   pre-projections, NO checkpoint
  routedC   direct-equivalent math from the params dict (broadcast raw f/g
            in bf16, pre matmul on (N,T,U,H), tanh, out matmul)

    python scripts/exp_padded_variants.py [T U V H]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def main():
    dims = [int(a) for a in sys.argv[1:]]
    T, U, V, H = dims + [150, 40, 28, 256][len(dims):]
    N = 16
    import flax.linen as nn
    import numpy as np

    from warp_rnnt_tpu.benchmarks.bench_joint import make_inputs
    from warp_rnnt_tpu.benchmarks.timing import bench_scalar_chain
    from warp_rnnt_tpu.functional.from_logits import rnnt_loss_from_logits
    from warp_rnnt_tpu.functional.joint_loss import (
        _pre_projections,
        _project_out,
    )
    from warp_rnnt_tpu.models.joint import Joint

    f, g, ys, xn, yn = make_inputs(
        jax.random.PRNGKey(0), N, T, U, H, rand_length=True
    )
    joint = Joint(vocab_size=V, hidden=H)
    params = joint.init(jax.random.PRNGKey(1), f, g)

    def loss(logits):
        return rnnt_loss_from_logits(logits, ys, xn, yn, reduction="mean")

    def fp(p):
        pp = nn.unbox(p)["params"]
        return dict(
            w_pre=pp["pre"]["kernel"], b_pre=pp["pre"]["bias"],
            w_out=pp["out"]["kernel"], b_out=pp["out"]["bias"],
        )

    def direct(p, f, g):
        return loss(joint.apply(p, f, g, normalize=False))

    def routedA(p, f, g):
        d = fp(p)
        a, c = _pre_projections(f, g, d, "add")
        return loss(_project_out(
            a, c, d, lambda a, c: a[:, :, None, :] + c[:, None, :, :]
        ))

    def routedB(p, f, g):
        d = fp(p)
        a, c = _pre_projections(f, g, d, "add")
        h = a[:, :, None, :] + c[:, None, :, :]
        z = jax.lax.dot_general(
            jnp.tanh(h).astype(jnp.bfloat16).reshape(-1, h.shape[-1]),
            d["w_out"].astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(h.shape[:-1] + (d["w_out"].shape[1],))
        return loss(z + d["b_out"].astype(jnp.float32))

    def routedC(p, f, g):
        d = fp(p)
        cd = jnp.bfloat16
        h = f.astype(cd)[:, :, None, :] + g.astype(cd)[:, None, :, :]
        h = jnp.dot(h, d["w_pre"].astype(cd),
                    preferred_element_type=jnp.float32)
        h = jnp.tanh(h + d["b_pre"].astype(jnp.float32))
        z = jax.lax.dot_general(
            h.astype(cd).reshape(-1, h.shape[-1]),
            d["w_out"].astype(cd),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(h.shape[:-1] + (d["w_out"].shape[1],))
        return loss(z + d["b_out"].astype(jnp.float32))

    def routedD(p, f, g):
        # reconstruct the flax param tree from the dict -> the EXACT
        # Joint.apply program users write
        d = fp(p)
        tree = {"params": {
            "pre": {"kernel": d["w_pre"], "bias": d["b_pre"]},
            "out": {"kernel": d["w_out"], "bias": d["b_out"]},
        }}
        return loss(joint.apply(tree, f, g, normalize=False))

    def routedE(p, f, g):
        # manual math, flax promotion rules: everything bf16 end to end
        d = fp(p)
        cd = jnp.bfloat16
        h = f.astype(cd)[:, :, None, :] + g.astype(cd)[:, None, :, :]
        h = jnp.dot(h, d["w_pre"].astype(cd)) + d["b_pre"].astype(cd)
        h = jnp.tanh(h)
        z = jnp.dot(h, d["w_out"].astype(cd)) + d["b_out"].astype(cd)
        return loss(z.astype(jnp.float32))

    for name, fn in (("direct", direct), ("routedA", routedA),
                     ("routedB", routedB), ("routedC", routedC),
                     ("routedD", routedD), ("routedE", routedE)):
        step = jax.jit(lambda p, f, g, fn=fn: jax.value_and_grad(fn)(p, f, g))
        compiled = step.lower(params, f, g).compile()
        mem = compiled.memory_analysis()
        # args must be passed (not closure-captured), else the chain jit
        # sees them as constants and folds the whole step at compile time
        ms = bench_scalar_chain(step, (params, f, g), iters=20)
        print(f"{name}: {ms:.3f} ms  temp {mem.temp_size_in_bytes/(1<<20):.1f}"
              f" MiB", flush=True)


if __name__ == "__main__":
    main()
