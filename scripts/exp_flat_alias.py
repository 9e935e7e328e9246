"""Diagnose full-tensor copies in the flat >4 GiB loss+grad pipeline.

Compile-only (abstract inputs; nothing runs): lowers the production
`value_and_grad(rnnt_loss)` at the flat N=128, T=150, U=20, V=5000 config
under {alias, donate} and reports every op in the optimized HLO whose output
is the full (N, T, U*V) tensor, plus XLA's temp-memory total.  This is how
the donation-copy pathology (47.3 ms vs 22.6) was root-caused: the copy
shows up as `copy(custom-call)` only when donate=1, alias=0.

    python scripts/exp_flat_alias.py <alias:0|1> <donate:0|1> [N] [pin] [time]

`pin` forces row-major {2,1,0} layouts on the xs parameter and the gradient
output (jax.experimental.layout.Format) — the Mosaic custom call constrains
row-major operands/results, and without pinning XLA picks the gather's
preferred {0,2,1} for the parameter, reconciling with full-tensor transpose
copies.  `time` additionally runs the timed chain (real memory).
"""

import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from warp_rnnt_tpu.functional import gather


def main():
    alias, donate = int(sys.argv[1]), int(sys.argv[2])
    N = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    pin = "pin" in sys.argv[4:]
    timed = "time" in sys.argv[4:]
    T, U, V = 150, 20, 5000
    gather._FLAT_ALIAS = bool(alias)

    from warp_rnnt_tpu.functional.loss import rnnt_loss

    UV = (U + 1) * V
    xs = jax.ShapeDtypeStruct((N, T, UV), jnp.float32)
    key = jax.random.PRNGKey(0)
    ys = jax.random.randint(key, (N, U), 1, V, jnp.int32)
    xn = jnp.full((N,), T, jnp.int32)
    yn = jnp.full((N,), U, jnp.int32)

    def loss_vg(x):
        return jax.value_and_grad(
            lambda z: rnnt_loss(z, ys, xn, yn, reduction="mean", gather=True)
        )(x)

    kw = {}
    if donate:
        kw["donate_argnums"] = 0
    if pin:
        from warp_rnnt_tpu import flat_arg_formats

        rm, grad_fmt = flat_arg_formats()
        kw["in_shardings"] = rm
        kw["out_shardings"] = (None, grad_fmt)
    step = jax.jit(loss_vg, **kw)
    compiled = step.lower(xs).compile()
    hlo = compiled.as_text()
    big = rf"f32\[{N},{T},{UV}\]"
    print(f"alias={alias} donate={donate}  ops producing the full tensor:")
    for line in hlo.splitlines():
        line = line.strip()
        if re.match(rf"^\S+ = {big}", line) or (
            "copy" in line.split("=")[0] and re.search(big, line)
        ):
            print("  " + line[:220])
    mem = compiled.memory_analysis()
    if mem is not None:
        gib = 1 << 30
        print(f"temp {mem.temp_size_in_bytes/gib:.2f} GiB, "
              f"output {mem.output_size_in_bytes/gib:.2f} GiB, "
              f"args {mem.argument_size_in_bytes/gib:.2f} GiB, "
              f"alias {mem.alias_size_in_bytes/gib:.2f} GiB")
    if timed:
        from warp_rnnt_tpu.benchmarks.timing import bench_grad_chain

        x0 = jax.jit(
            lambda k: jax.random.normal(k, (N, T, UV), jnp.float32),
            out_shardings=kw.get("in_shardings"),
        )(key)
        ms = bench_grad_chain(step, x0, iters=10)
        print(f"loss+grad: {ms:.3f} ms")


if __name__ == "__main__":
    main()
