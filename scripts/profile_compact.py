"""Profile the compact joint+loss+backward step at the big-lattice config.

python scripts/profile_compact.py [N T U V]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from warp_rnnt_tpu.utils.profiling import op_breakdown, trace


def main(N=16, T=1500, U=300, V=50):
    N, T, U, V = map(int, (N, T, U, V))
    from warp_rnnt_tpu.benchmarks import bench_joint as BJ
    import jax.numpy as jnp
    import numpy as np

    key = jax.random.PRNGKey(0)
    f, g, ys, xn, yn = BJ.make_inputs(key, N, T, U, 256, rand_length=True)
    joint = BJ.Joint(vocab_size=V, hidden=256)
    params = joint.init(jax.random.PRNGKey(1), f, g)

    from warp_rnnt_tpu import rnnt_loss

    xn_h, yn_h = np.asarray(xn), np.asarray(yn)
    n_idx = np.concatenate([
        np.full(t * (u + 1), i, np.int32)
        for i, (t, u) in enumerate(zip(xn_h, yn_h))
    ])
    t_idx = np.concatenate([
        np.repeat(np.arange(t, dtype=np.int32), u + 1)
        for t, u in zip(xn_h, yn_h)
    ])
    u_idx = np.concatenate([
        np.tile(np.arange(u + 1, dtype=np.int32), t)
        for t, u in zip(xn_h, yn_h)
    ])
    ys_packed = jnp.concatenate([ys[i, : yn_h[i]] for i in range(N)])
    n_idx, t_idx, u_idx = map(jnp.asarray, (n_idx, t_idx, u_idx))

    def loss_fn(p, f, g):
        lp = joint.apply(p, f[n_idx, t_idx], g[n_idx, u_idx])
        return rnnt_loss(
            lp, ys_packed, xn, yn, reduction="mean", compact=True,
            max_frames=T, max_labels=U,
        )

    step = jax.jit(lambda p, f, g: jax.value_and_grad(loss_fn)(p, f, g))
    out = step(params, f, g)
    jax.block_until_ready(out)

    ITERS = 4
    tdir = "/tmp/compact_trace"
    with trace(tdir):
        for _ in range(ITERS):
            out = step(params, f, g)
        jax.block_until_ready(out)

    for us, name in op_breakdown(tdir, top=25):
        print(f"{us / ITERS:10.1f} us/iter  {name[:110]}")


if __name__ == "__main__":
    main(*sys.argv[1:])
