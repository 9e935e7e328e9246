"""Pure-NumPy RNN-Transducer oracle.

A slow, obviously-correct forward-backward over the ``(T, U)`` lattice used as
the conformance oracle for every fast implementation in this package.  The
math is the standard Graves (2012) transducer recursion; semantics (gradient
w.r.t. log-probs, FastEmit scaling, terminal-cell convention) follow the
behaviour documented for the reference CUDA implementation
(``/root/reference/core.cu:41-332``) so that golden vectors from its test
suite transfer verbatim.

This module is intentionally dependency-free (NumPy only) and loop-based:
readability over speed.
"""

from __future__ import annotations

import numpy as np

NEG_INF = -np.inf


def _logaddexp(a: float, b: float) -> float:
    if a == NEG_INF:
        return b
    if b == NEG_INF:
        return a
    hi, lo = (a, b) if a > b else (b, a)
    return hi + np.log1p(np.exp(lo - hi))


def transduce_single(
    log_probs: np.ndarray,
    labels: np.ndarray,
    blank: int = 0,
    fastemit_lambda: float = 0.0,
):
    """Forward-backward for ONE utterance.

    Args:
      log_probs: ``(T, U, V)`` float array of log-softmax outputs, where
        ``T`` is the number of frames and ``U = len(labels) + 1``.
      labels: ``(U-1,)`` int array of reference labels (no blanks).
      blank: index of the blank symbol in ``V``.
      fastemit_lambda: FastEmit regularization weight (arXiv:2010.11148);
        scales only the label (emit) gradients by ``1 + lambda``.

    Returns:
      ``(cost, alphas, betas, grads)`` where ``cost = -log p(y|x)`` (float),
      ``alphas``/``betas`` are ``(T, U)`` and ``grads`` is ``(T, U, V)``
      d(cost)/d(log_probs).
    """
    lp = np.asarray(log_probs, dtype=np.float64)
    T, U, V = lp.shape
    labels = np.asarray(labels, dtype=np.int64).reshape(-1)
    assert labels.shape[0] == U - 1, (labels.shape, U)

    def blk(t, u):
        return lp[t, u, blank]

    def emt(t, u):
        return lp[t, u, labels[u]]

    alphas = np.full((T, U), NEG_INF)
    alphas[0, 0] = 0.0
    for t in range(1, T):
        alphas[t, 0] = alphas[t - 1, 0] + blk(t - 1, 0)
    for u in range(1, U):
        alphas[0, u] = alphas[0, u - 1] + emt(0, u - 1)
    for t in range(1, T):
        for u in range(1, U):
            alphas[t, u] = _logaddexp(
                alphas[t - 1, u] + blk(t - 1, u),
                alphas[t, u - 1] + emt(t, u - 1),
            )

    betas = np.full((T, U), NEG_INF)
    betas[T - 1, U - 1] = blk(T - 1, U - 1)
    for t in range(T - 2, -1, -1):
        betas[t, U - 1] = betas[t + 1, U - 1] + blk(t, U - 1)
    for u in range(U - 2, -1, -1):
        betas[T - 1, u] = betas[T - 1, u + 1] + emt(T - 1, u)
    for t in range(T - 2, -1, -1):
        for u in range(U - 2, -1, -1):
            betas[t, u] = _logaddexp(
                betas[t + 1, u] + blk(t, u),
                betas[t, u + 1] + emt(t, u),
            )

    ll = betas[0, 0]
    cost = -ll

    # Gradients w.r.t. log_probs (not logits).  Arc-occupancy of cell (t, u):
    #   d cost / d lp[t,u,blank]     = -exp(a[t,u] + lp[t,u,blank] + b[t+1,u] - ll)
    #   d cost / d lp[t,u,labels[u]] = -(1+lam) exp(a[t,u] + lp[t,u,lab] + b[t,u+1] - ll)
    # with the beta term dropped at the terminal cell (T-1, U-1) and blank
    # grads at (T-1, u<U-1) left at zero (reference `core.cu:281-294,321-331`).
    grads = np.zeros((T, U, V))
    for t in range(T):
        for u in range(U):
            if t < T - 1:
                grads[t, u, blank] += -np.exp(
                    alphas[t, u] + blk(t, u) + betas[t + 1, u] - ll
                )
            elif u == U - 1:
                grads[t, u, blank] += -np.exp(alphas[t, u] + blk(t, u) - ll)
            if u < U - 1:
                g = -np.exp(alphas[t, u] + emt(t, u) + betas[t, u + 1] - ll)
                grads[t, u, labels[u]] += (1.0 + fastemit_lambda) * g
    return cost, alphas, betas, grads


def transduce_batch(
    log_probs: np.ndarray,
    labels: np.ndarray,
    frames_lengths: np.ndarray,
    labels_lengths: np.ndarray,
    blank: int = 0,
    fastemit_lambda: float = 0.0,
):
    """Batched oracle over a padded ``(N, T, U, V)`` batch.

    Returns ``(costs (N,), alphas (N,T,U), betas (N,T,U), grads (N,T,U,V))``.
    Cells outside each sample's valid ``(xn, yn+1)`` region have
    ``alphas/betas = -inf`` and ``grads = 0``, mirroring the reference's
    zero-initialized gradient workspace.
    """
    lp = np.asarray(log_probs, dtype=np.float64)
    N, T, U, V = lp.shape
    xn = np.asarray(frames_lengths, dtype=np.int64)
    yn = np.asarray(labels_lengths, dtype=np.int64)
    costs = np.zeros((N,))
    alphas = np.full((N, T, U), NEG_INF)
    betas = np.full((N, T, U), NEG_INF)
    grads = np.zeros((N, T, U, V))
    for n in range(N):
        t_n, u_n = int(xn[n]), int(yn[n]) + 1
        c, a, b, g = transduce_single(
            lp[n, :t_n, :u_n], labels[n, : u_n - 1], blank, fastemit_lambda
        )
        costs[n] = c
        alphas[n, :t_n, :u_n] = a
        betas[n, :t_n, :u_n] = b
        grads[n, :t_n, :u_n] = g
    return costs, alphas, betas, grads
