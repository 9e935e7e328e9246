"""Profile the headline config's loss+grad pipeline on TPU and print the
per-op device-time breakdown.

The headline (N=32, T=150, U=21, V=5000, gather) measures ~4.5 ms against a
~2.5 ms pipeline floor (dense 1.9 GB grad write + beta sweep); this shows
where the slack lives.

Usage: python scripts/profile_headline.py [N]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from warp_rnnt_tpu import rnnt_loss
from warp_rnnt_tpu.utils.profiling import op_breakdown, trace


def main(N=32):
    N = int(N)
    T, U, V = 150, 21, 5000
    key = jax.random.PRNGKey(0)
    lp = jax.jit(
        lambda k: jax.nn.log_softmax(
            jax.random.normal(k, (N, T, U, V), jnp.float32), -1
        )
    )(key)
    ys = jax.random.randint(key, (N, U - 1), 1, V, jnp.int32)
    xn = jnp.full((N,), T, jnp.int32)
    yn = jnp.full((N,), U - 1, jnp.int32)

    step = jax.jit(
        jax.value_and_grad(
            lambda x: rnnt_loss(x, ys, xn, yn, reduction="mean", gather=True)
        )
    )
    out = step(lp)  # compile
    jax.block_until_ready(out)

    tdir = "/tmp/headline_trace"
    with trace(tdir):
        for _ in range(8):
            out = step(lp)
        jax.block_until_ready(out)

    total = 0
    for us, name in op_breakdown(tdir, top=30):
        total += us
        print(f"{us / 8:10.1f} us/iter  {name[:110]}")
    print(f"{'':10s}({total / 8 / 1000:.2f} ms/iter total across listed ops)")


if __name__ == "__main__":
    main(*sys.argv[1:])
