"""Joint networks for RNN-T training.

TPU-first equivalents of the reference end-to-end benchmark's joint
(`pytorch_binding/benchmark2.py:20-60`): encoder frame vectors f (N, T, H)
and predictor label vectors g (N, U, H) are combined per lattice cell and
projected to the vocabulary.

Two combination modes, as in the reference benchmark:
  * broadcast add  f[:, :, None] + g[:, None, :]          ("add")
  * concat         [f, g] along features, then a dense    ("concat")

The projection runs in bf16 on the MXU with fp32 accumulation
(preferred_element_type) and the log_softmax in fp32 — the bf16-joint /
fp32-lattice recipe from BASELINE config 5.  The output projection kernel is
annotated for vocabulary ('model'-axis) sharding so large-V joints partition
under GSPMD.
"""

from __future__ import annotations


import flax.linen as nn
import jax
import jax.numpy as jnp


class Joint(nn.Module):
    """Tanh-MLP joint: combine -> tanh -> dense(V) -> log_softmax."""

    vocab_size: int
    hidden: int = 512
    mode: str = "add"  # "add" | "concat"
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, f, g, normalize: bool = True):
        """f (N, T, H), g (N, U, H) -> log-probs (N, T, U, V) in fp32
        (raw fp32 logits when ``normalize=False`` — pair with
        `rnnt_loss_from_logits` to skip the log_softmax pass entirely).

        Packed (compact) mode: pass 2-D row tensors f (STU, H), g (STU, H) —
        one row per valid lattice cell, pre-gathered by the caller — and get
        (STU, V) back, the reference's `requires_packing_` joint
        (`pytorch_binding/benchmark2.py:46-60`) with identical parameters to
        the padded call."""
        f = f.astype(self.compute_dtype)
        g = g.astype(self.compute_dtype)
        if self.mode not in ("add", "concat"):
            raise ValueError(f"unknown joint mode: {self.mode!r}")
        if f.ndim == 2:
            h = (
                f + g if self.mode == "add"
                else jnp.concatenate([f, g], axis=-1)
            )
        elif self.mode == "add":
            h = f[:, :, None, :] + g[:, None, :, :]
        else:  # concat
            N, T, H = f.shape
            U = g.shape[1]
            h = jnp.concatenate(
                [
                    jnp.broadcast_to(f[:, :, None, :], (N, T, U, H)),
                    jnp.broadcast_to(g[:, None, :, :], (N, T, U, g.shape[-1])),
                ],
                axis=-1,
            )
        h = nn.Dense(self.hidden, dtype=self.compute_dtype, name="pre")(h)
        h = jnp.tanh(h)
        kernel_init = nn.with_logical_partitioning(
            nn.initializers.lecun_normal(), ("joint_hidden", "vocab")
        )
        logits = nn.Dense(
            self.vocab_size,
            dtype=self.compute_dtype,
            kernel_init=kernel_init,
            name="out",
        )(h)
        logits = logits.astype(jnp.float32)
        return jax.nn.log_softmax(logits, axis=-1) if normalize else logits
