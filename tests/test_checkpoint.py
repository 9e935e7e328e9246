"""Checkpoint save/restore round trip, including resume-equivalence."""

import jax
import numpy as np
import optax
import pytest

from warp_rnnt_tpu.models import init_model, make_train_step
from warp_rnnt_tpu.models.checkpoint import (
    latest_step,
    restore_checkpoint,
    save_checkpoint,
)


def test_roundtrip_and_resume(tmp_path):
    model, params, batch = init_model(
        jax.random.PRNGKey(0), vocab_size=8, feat_dim=6, N=2, T=6, U=3,
        encoder_hidden=8, predictor_hidden=8, joint_hidden=8,
    )
    opt = optax.adamw(1e-3)
    opt_state = opt.init(params)
    step = jax.jit(make_train_step(model, opt))

    p, s = params, opt_state
    for _ in range(3):
        p, s, loss = step(p, s, batch)

    save_checkpoint(tmp_path, p, s, step=3)
    assert latest_step(tmp_path) == 3

    template = {"params": params, "opt_state": opt_state, "step": 0}
    restored = restore_checkpoint(tmp_path, template)
    assert restored["step"] == 3

    # resumed training must match continued training exactly
    p_cont, s_cont, loss_cont = step(p, s, batch)
    p_res, s_res, loss_res = step(restored["params"], restored["opt_state"], batch)
    np.testing.assert_allclose(float(loss_res), float(loss_cont), rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6),
        p_res, p_cont,
    )
