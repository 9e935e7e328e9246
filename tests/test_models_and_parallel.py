"""Model forward/train-step sanity and multi-device (8 virtual CPU devices)
data-parallel loss equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from warp_rnnt_tpu import rnnt_loss
from warp_rnnt_tpu.models import Transducer, init_model, make_train_step
from warp_rnnt_tpu.parallel import (
    make_mesh,
    rnnt_loss_shard_map,
    rnnt_loss_sharded,
    shard_batch,
)

import golden


def _random_batch(seed, N, T, U, V):
    rng = np.random.RandomState(seed)
    xs = golden.log_softmax(rng.randn(N, T, U, V)).astype(np.float32)
    ys = rng.randint(1, V, size=(N, U - 1)).astype(np.int32)
    xn = np.full((N,), T, np.int32)
    yn = rng.randint(1, U, size=(N,)).astype(np.int32)
    return jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(xn), jnp.asarray(yn)


def test_multidevice_available():
    assert jax.device_count() == 8, jax.devices()


def test_shard_map_loss_matches_single_device():
    xs, ys, xn, yn = _random_batch(0, 8, 12, 5, 7)
    mesh = make_mesh()
    ref = rnnt_loss(xs, ys, xn, yn, impl="scan")

    costs = rnnt_loss_shard_map(mesh, xs, ys, xn, yn, reduction="none", impl="scan")
    np.testing.assert_allclose(np.asarray(costs), np.asarray(ref), rtol=1e-5, atol=1e-6)

    total = rnnt_loss_shard_map(mesh, xs, ys, xn, yn, reduction="sum", impl="scan")
    np.testing.assert_allclose(float(total), float(np.asarray(ref).sum()), rtol=1e-5)

    mean = rnnt_loss_shard_map(mesh, xs, ys, xn, yn, reduction="mean", impl="scan")
    np.testing.assert_allclose(float(mean), float(np.asarray(ref).mean()), rtol=1e-5)


def test_gspmd_sharded_loss_and_grad():
    xs, ys, xn, yn = _random_batch(1, 8, 10, 4, 6)
    mesh = make_mesh()
    xs_sh, ys_sh = shard_batch(mesh, (xs, ys))

    @jax.jit
    def f(x):
        return rnnt_loss_sharded(mesh, x, ys_sh, xn, yn, reduction="mean", impl="scan")

    @jax.jit
    def g(x):
        return jax.grad(
            lambda z: rnnt_loss_sharded(mesh, z, ys_sh, xn, yn, reduction="mean", impl="scan")
        )(x)

    ref = rnnt_loss(xs, ys, xn, yn, reduction="mean", impl="scan")
    np.testing.assert_allclose(float(f(xs_sh)), float(ref), rtol=1e-5)
    g_ref = jax.grad(
        lambda z: rnnt_loss(z, ys, xn, yn, reduction="mean", impl="scan")
    )(xs)
    np.testing.assert_allclose(
        np.asarray(g(xs_sh)), np.asarray(g_ref), rtol=1e-4, atol=1e-6
    )


def test_shard_map_loss_pallas_impl():
    """The pallas kernel (interpret mode off-TPU) inside shard_map — the
    partitioned path a real multi-chip run takes with impl='auto'."""
    xs, ys, xn, yn = _random_batch(2, 8, 12, 5, 7)
    mesh = make_mesh()
    ref = rnnt_loss(xs, ys, xn, yn, impl="scan")
    costs = rnnt_loss_shard_map(
        mesh, xs, ys, xn, yn, reduction="none", impl="pallas"
    )
    np.testing.assert_allclose(
        np.asarray(costs), np.asarray(ref), rtol=1e-5, atol=1e-6
    )


def test_gspmd_sharded_loss_and_grad_pallas_impl():
    """GSPMD-partitioned pallas loss + grad matches single-device scan."""
    xs, ys, xn, yn = _random_batch(3, 8, 10, 4, 6)
    mesh = make_mesh()
    xs_sh, ys_sh = shard_batch(mesh, (xs, ys))

    @jax.jit
    def vg(x):
        return jax.value_and_grad(
            lambda z: rnnt_loss_sharded(
                mesh, z, ys_sh, xn, yn, reduction="mean", impl="pallas"
            )
        )(x)

    loss, grads = vg(xs_sh)
    ref_loss, ref_grads = jax.value_and_grad(
        lambda z: rnnt_loss(z, ys, xn, yn, reduction="mean", impl="scan")
    )(xs)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(grads), np.asarray(ref_grads), rtol=1e-4, atol=1e-6
    )


def test_transducer_forward_and_train_step():
    model, params, batch = init_model(
        jax.random.PRNGKey(0), vocab_size=16, feat_dim=20, N=4, T=12, U=4,
        encoder_hidden=32, predictor_hidden=32, joint_hidden=32,
    )
    feats, labels, xn, yn = batch
    lp = model.apply(params, feats, labels)
    assert lp.shape == (4, 12, 4, 16)
    # log-probs normalize over V
    np.testing.assert_allclose(
        np.asarray(jnp.exp(lp).sum(-1)), np.ones((4, 12, 4)), rtol=1e-3
    )

    opt = optax.adamw(1e-3)
    step = jax.jit(make_train_step(model, opt))
    opt_state = opt.init(params)
    losses = []
    p = params
    for _ in range(5):
        p, opt_state, loss = step(p, opt_state, batch)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses  # optimizes on a fixed batch


def test_train_step_sharded_over_mesh():
    mesh = make_mesh()
    model, params, batch = init_model(
        jax.random.PRNGKey(1), vocab_size=12, feat_dim=16, N=8, T=10, U=4,
        encoder_hidden=16, predictor_hidden=16, joint_hidden=16,
    )
    batch = shard_batch(mesh, batch)
    opt = optax.adamw(1e-3)
    step = jax.jit(make_train_step(model, opt))
    opt_state = opt.init(params)
    p, opt_state, loss = step(params, opt_state, batch)
    assert np.isfinite(float(loss))


def test_vocab_sharded_loss_and_grad():
    """Tensor-parallel vocabulary: log-probs sharded over V on a ('data',
    'model') mesh — the layout a vocab-sharded joint projection produces.
    GSPMD must partition the blank/label gather (cross-shard index reads)
    and the dense scatter-back VJP; results must match unsharded exactly."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    xs, ys, xn, yn = _random_batch(2, 8, 10, 4, 8)
    devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("data", "model"))
    xs_sh = jax.device_put(xs, NamedSharding(mesh, P("data", None, None, "model")))
    ys_sh = jax.device_put(ys, NamedSharding(mesh, P("data", None)))

    @jax.jit
    def vg(x):
        return jax.value_and_grad(
            lambda z: rnnt_loss(z, ys_sh, xn, yn, reduction="mean", impl="scan")
        )(x)

    val, grad = vg(xs_sh)
    ref_val, ref_grad = jax.value_and_grad(
        lambda z: rnnt_loss(z, ys, xn, yn, reduction="mean", impl="scan")
    )(xs)
    np.testing.assert_allclose(float(val), float(ref_val), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(grad), np.asarray(ref_grad), rtol=1e-4, atol=1e-6
    )
    # the gradient stays at least batch-sharded (GSPMD may choose to
    # replicate or re-shard the vocab axis of the output)
    assert grad.sharding.spec[0] == "data", grad.sharding


def test_fused_joint_train_step_sharded_over_mesh():
    """loss_mode='fused' (Pallas fused joint+loss, interpret mode on CPU)
    composes with GSPMD data sharding: sharded train step runs, and its
    loss matches the unsharded fused step exactly."""
    mesh = make_mesh()
    model, params, batch = init_model(
        jax.random.PRNGKey(3), vocab_size=12, feat_dim=16, N=8, T=10, U=4,
        encoder_hidden=16, predictor_hidden=16, joint_hidden=16,
    )
    opt = optax.adamw(1e-3)
    step = jax.jit(make_train_step(model, opt, loss_mode="fused"))
    opt_state = opt.init(params)
    _, _, loss_ref = step(params, opt_state, batch)

    batch_sh = shard_batch(mesh, batch)
    p, o, loss_sh = step(params, opt.init(params), batch_sh)
    assert np.isfinite(float(loss_sh))
    np.testing.assert_allclose(float(loss_sh), float(loss_ref), rtol=1e-5)
    # one more step on the sharded batch keeps optimizing
    _, _, loss2 = step(p, o, batch_sh)
    assert float(loss2) < float(loss_sh)
