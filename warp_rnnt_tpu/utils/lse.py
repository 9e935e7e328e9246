"""Numerically safe log-space primitives.

The reference `log_sum_exp` (`/root/reference/core.cu:26-39`) leaks NaN for
``logaddexp(-inf, -inf)``; every routine here is -inf-safe, because padded
lattice cells are represented as -inf throughout this package.
"""

import jax.numpy as jnp

NEG_INF = float("-inf")


def safe_logaddexp(a, b):
    """log(exp(a) + exp(b)), returning -inf (not NaN) when both are -inf."""
    mx = jnp.maximum(a, b)
    d = -jnp.abs(a - b)  # NaN when both infinite with same sign
    out = mx + jnp.log1p(jnp.exp(d))
    return jnp.where(jnp.isfinite(mx), out, mx)


def logrec_combine(x, y):
    """Associative combine for the log-space linear recurrence.

    Solves ``a[t] = logaddexp(a[t-1] + m[t], b[t])`` as an associative scan
    over elements ``(m, b)``:

        (m1, b1) . (m2, b2) = (m1 + m2, logaddexp(b1 + m2, b2))

    After an inclusive scan, the ``b`` component at position t equals
    ``LSE_j<=t ( b[j] + sum_{k=j+1..t} m[k] )`` which is exactly the
    recurrence solution.  ``m[0]`` is never consumed.
    """
    m1, b1 = x
    m2, b2 = y
    return (m1 + m2, safe_logaddexp(b1 + m2, b2))
