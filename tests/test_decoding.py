"""Greedy decoding: shape/termination sanity and train->decode round trip
(overfit a tiny model on one batch, greedy decode must recover the targets)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from warp_rnnt_tpu.models import greedy_decode, init_model, make_train_step


def test_decode_shapes_and_bounds():
    model, params, batch = init_model(
        jax.random.PRNGKey(0), vocab_size=10, feat_dim=8, N=3, T=6, U=3,
        encoder_hidden=16, predictor_hidden=16, joint_hidden=16,
    )
    feats, _, xn, _ = batch
    tokens, lengths = jax.jit(
        lambda f: greedy_decode(model, params, f, xn, max_length=5)
    )(feats)
    assert tokens.shape == (3, 5)
    assert np.all(np.asarray(lengths) <= 5)
    assert np.all(np.asarray(tokens) >= 0)
    assert np.all(np.asarray(tokens) < 10)
    # padding beyond length is blank
    toks = np.asarray(tokens)
    for i, l in enumerate(np.asarray(lengths)):
        assert np.all(toks[i, l:] == 0)


def test_overfit_then_decode_recovers_targets():
    vocab, N, T, U = 8, 2, 8, 3
    model, params, _ = init_model(
        jax.random.PRNGKey(1), vocab_size=vocab, feat_dim=6, N=N, T=T, U=U,
        encoder_hidden=32, predictor_hidden=32, joint_hidden=32,
    )
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(N, T, 6), jnp.float32)
    labels = jnp.asarray([[3, 5], [2, 7]], jnp.int32)
    xn = jnp.full((N,), T, jnp.int32)
    yn = jnp.full((N,), U - 1, jnp.int32)
    batch = (feats, labels, xn, yn)

    opt = optax.adam(5e-3)
    step = jax.jit(make_train_step(model, opt))
    opt_state = opt.init(params)
    p = params
    loss = None
    for _ in range(300):
        p, opt_state, loss = step(p, opt_state, batch)
    assert float(loss) < 1.0, float(loss)

    tokens, lengths = greedy_decode(model, p, feats, xn, max_length=4)
    toks = np.asarray(tokens)
    lens = np.asarray(lengths)
    for i in range(N):
        assert lens[i] == 2, (i, toks[i], lens[i])
        np.testing.assert_array_equal(toks[i, :2], np.asarray(labels)[i])
