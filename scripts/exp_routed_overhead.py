"""Why is the routed padded branch slower than direct from_logits at tiny V?

Measured (benchmarks_endtoend.json joint_loss_backward_by_config,
T=150, U=40, V=28, H=256, N=16): rnnt_loss_joint routed 1.56 ms vs
Joint.apply + rnnt_loss_from_logits 0.37 — despite the routed branch
pre-projecting f and g separately (40x fewer pre-matmul FLOPs).

Compile-only: lowers both steps, prints XLA temp memory and every op whose
output is an (N, T, U, H)- or (N, T, U, V)-sized buffer, to find the
unfused round trip.  Then optionally times both (arg `time`).

    python scripts/exp_routed_overhead.py [time]
"""

import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

N, T, U, V, H = 16, 150, 40, 28, 256


def main():
    timed = "time" in sys.argv[1:]
    import flax.linen as nn
    import numpy as np

    from warp_rnnt_tpu import rnnt_loss_joint
    from warp_rnnt_tpu.functional.from_logits import rnnt_loss_from_logits
    from warp_rnnt_tpu.models.joint import Joint

    key = jax.random.PRNGKey(0)
    kf, kg, ky = jax.random.split(key, 3)
    f = jax.random.normal(kf, (N, T, H), jnp.float32)
    g = jax.random.normal(kg, (N, U + 1, H), jnp.float32)
    ys = jax.random.randint(ky, (N, U), 1, V, jnp.int32)
    xn = jnp.full((N,), T, jnp.int32)
    yn = jnp.full((N,), U, jnp.int32)

    joint = Joint(vocab_size=V, hidden=H)
    params = joint.init(jax.random.PRNGKey(1), f, g)
    pp = nn.unbox(params)["params"]
    fused_params = dict(
        w_pre=pp["pre"]["kernel"], b_pre=pp["pre"]["bias"],
        w_out=pp["out"]["kernel"], b_out=pp["out"]["bias"],
    )

    def direct(p, f, g):
        logits = joint.apply(p, f, g, normalize=False)
        return rnnt_loss_from_logits(logits, ys, xn, yn, reduction="mean")

    def routed(p, f, g):
        del p
        return rnnt_loss_joint(f, g, fused_params, ys, xn, yn,
                               reduction="mean", layout="padded")

    big = re.compile(
        rf"f32\[{N},{T},{U + 1},({H}|{V})\]|bf16\[{N},{T},{U + 1},({H}|{V})\]"
    )
    for name, fn in (("direct", direct), ("routed", routed)):
        step = jax.jit(lambda p, f, g, fn=fn: jax.value_and_grad(fn)(p, f, g))
        compiled = step.lower(params, f, g).compile()
        mem = compiled.memory_analysis()
        print(f"== {name}: temp {mem.temp_size_in_bytes / (1 << 20):.1f} MiB")
        for line in compiled.as_text().splitlines():
            ls = line.strip()
            if big.match(ls.split(" = ")[-1].split("(")[0] or "") or (
                " = " in ls and big.search(ls.split(" = ")[1][:40])
                and not ls.startswith("ROOT")
            ):
                kind = ls.split(" = ")[1].split("(")[0]
                if "fusion" in kind or "copy" in kind or "custom-call" in kind:
                    print("  " + ls[:160])
        if timed:
            from warp_rnnt_tpu.benchmarks.timing import bench_scalar_chain

            ms = bench_scalar_chain(
                lambda p: step(p, f, g)[0], (params,), iters=30,
                reduce_out=lambda x: x,
            )
            print(f"  {name}: {ms:.3f} ms")


if __name__ == "__main__":
    main()
