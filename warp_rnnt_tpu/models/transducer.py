"""A complete (small) RNN-Transducer model + training step.

The reference ships no model (it is a loss library); this module provides the
minimal end-to-end system a loss needs to prove itself: acoustic encoder,
label predictor, joint, `rnnt_loss`, and a jit/mesh-ready optax training
step.  Architecture is deliberately compact but real:

  encoder:   dense "subsampling" + N conv-GLU blocks over time (MXU-friendly,
             no sequential recurrence) + layernorm
  predictor: embedding + unidirectional GRU (lax.scan) over labels
  joint:     see `warp_rnnt_tpu.models.joint`

Everything is shape-static and shardable: batch over 'data', joint vocab over
'model'.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from warp_rnnt_tpu.functional.loss import rnnt_loss
from warp_rnnt_tpu.models.joint import Joint


class ConvBlock(nn.Module):
    """Residual conv-GLU block; streamable (see `stream`).

    The convolution is declared VALID and `__call__` pads explicitly —
    identical math to padding="SAME" for an odd kernel at stride 1, and it
    lets `stream` run the same parameters over a cached context window.
    """

    features: int
    kernel: int = 5
    compute_dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        self.ln = nn.LayerNorm(dtype=jnp.float32)
        self.conv = nn.Conv(2 * self.features, (self.kernel,),
                            padding="VALID", dtype=self.compute_dtype)

    def _glu(self, h):
        a, b = jnp.split(h, 2, axis=-1)
        return a * nn.sigmoid(b)

    def __call__(self, x):  # (N, T, H)
        r = self.kernel // 2
        h = self.ln(x).astype(self.compute_dtype)
        h = jnp.pad(h, ((0, 0), (r, r), (0, 0)))
        h = self.conv(h)
        return x + self._glu(h).astype(x.dtype)

    def stream_init(self, N):
        """Caches for chunked streaming: the last kernel-1 LN-space frames
        (zero-initialized — exactly the SAME conv's left padding) and the
        last `radius` raw input frames still awaiting their right
        context."""
        r = self.kernel // 2
        return {
            "ln": jnp.zeros((N, self.kernel - 1, self.features),
                            self.compute_dtype),
            "x": jnp.zeros((N, r, self.features), jnp.float32),
        }

    def stream(self, carry, x_chunk, pos0, limit):
        """One streaming step over a chunk of C >= 1 input frames.

        ``pos0`` is the stream position of x_chunk[:, 0] in THIS block's
        input stream; ``limit`` its total length (pass a huge value while
        frames keep coming).  Frames outside [0, limit) are masked to zero
        in LN-space so they act exactly as the full-utterance SAME conv's
        zero padding (pre-stream warm-up rows and the flush's trailing
        zeros are data here, padding there).  Emits C output frames for
        positions pos0-radius .. pos0+C-radius-1 — the block's algorithmic
        delay is `radius` frames; rows at out-of-stream positions are junk
        the caller discards.
        """
        r = self.kernel // 2
        C = x_chunk.shape[1]
        ln = self.ln(x_chunk).astype(self.compute_dtype)
        in_pos = pos0 + jnp.arange(C, dtype=jnp.int32)
        ok = (in_pos >= 0) & (in_pos < limit)
        ln = jnp.where(ok[None, :, None], ln, 0)
        full_ln = jnp.concatenate([carry["ln"], ln], axis=1)  # (N, C+2r, H)
        glu = self._glu(self.conv(full_ln))                   # (N, C, H)
        x_all = jnp.concatenate([carry["x"], x_chunk], axis=1)  # (N, C+r, H)
        y = x_all[:, :C] + glu.astype(x_chunk.dtype)
        new_carry = {"ln": full_ln[:, -2 * r:], "x": x_all[:, -r:]}
        return new_carry, y


class Encoder(nn.Module):
    hidden: int = 256
    blocks: int = 2
    compute_dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        self.inp = nn.Dense(self.hidden, dtype=self.compute_dtype)
        self.conv_blocks = [
            ConvBlock(self.hidden, compute_dtype=self.compute_dtype)
            for _ in range(self.blocks)
        ]
        self.out_ln = nn.LayerNorm(dtype=jnp.float32)

    def __call__(self, feats):  # (N, T, F) -> (N, T, H)
        h = self.inp(feats.astype(self.compute_dtype)).astype(jnp.float32)
        for blk in self.conv_blocks:
            h = blk(h)
        return self.out_ln(h)

    @property
    def lookahead(self):
        """Total algorithmic delay of `stream` in frames (sum of block
        radii): output frame t is emitted once input frame t+lookahead
        arrives."""
        return sum(b.kernel // 2 for b in self.conv_blocks)

    def stream_init(self, N):
        return {
            "m": jnp.zeros((), jnp.int32),  # raw frames consumed so far
            "blocks": tuple(b.stream_init(N) for b in self.conv_blocks),
        }

    def stream(self, carry, feats_chunk, limit):
        """Chunked encoding, exactly matching `__call__` on the whole
        utterance.  Feeding C raw frames emits C encoder frames for
        positions m-lookahead .. m+C-lookahead-1 (junk rows outside
        [0, limit) — the caller tracks positions and discards them).
        ``limit`` is the final stream length, or a huge value while more
        frames are coming.  Any chunk size C >= 1 works."""
        h = self.inp(feats_chunk.astype(self.compute_dtype))
        h = h.astype(jnp.float32)
        pos0 = carry["m"]
        new_blocks = []
        for blk, bc in zip(self.conv_blocks, carry["blocks"]):
            bc, h = blk.stream(bc, h, pos0, limit)
            new_blocks.append(bc)
            pos0 = pos0 - blk.kernel // 2
        out = self.out_ln(h)  # positions pos0 .. pos0+C-1
        new_carry = {
            "m": carry["m"] + feats_chunk.shape[1],
            "blocks": tuple(new_blocks),
        }
        return new_carry, out, pos0

    def stream_finish(self, carry, limit):
        """Flush the lookahead: push `lookahead` zero raw frames through
        (masked to padding in every block), emitting the final encoder
        frames up to position limit-1."""
        R = self.lookahead
        N = carry["blocks"][0]["ln"].shape[0]
        feat_dim = self.inp.variables["params"]["kernel"].shape[0]
        zeros = jnp.zeros((N, R, feat_dim), jnp.float32)
        return self.stream(carry, zeros, limit)


class Predictor(nn.Module):
    vocab_size: int
    hidden: int = 256

    def setup(self):
        self.embed = nn.Embed(self.vocab_size, self.hidden)
        self.cell = nn.GRUCell(self.hidden)
        self.rnn = nn.RNN(self.cell)  # shares self.cell's parameters

    def _embed_token(self, token):
        """token (N,) int32; negative => <sos> (zero embedding)."""
        emb = self.embed(jnp.maximum(token, 0))
        return jnp.where(token[:, None] < 0, 0.0, emb)

    def __call__(self, labels):  # (N, U-1) int -> (N, U, H)
        N = labels.shape[0]
        emb = self.embed(labels)
        # prepend the <sos>/blank step: row u of the output conditions on
        # labels[< u], so shift right with a zero vector.
        emb = jnp.concatenate(
            [jnp.zeros((N, 1, self.hidden), emb.dtype), emb], axis=1
        )  # (N, U, H)
        carry = self.initial_state(N)
        return self.rnn(emb, initial_carry=carry)

    def initial_state(self, N):
        return jnp.zeros((N, self.hidden), jnp.float32)

    def step(self, carry, token):
        """One decode step: (carry, token (N,) int; <0 = <sos>) -> (carry, g)."""
        emb = self._embed_token(token)
        new_carry, out = self.cell(carry, emb)
        return new_carry, out


class Transducer(nn.Module):
    vocab_size: int
    encoder_hidden: int = 256
    predictor_hidden: int = 256
    joint_hidden: int = 512
    joint_mode: str = "add"

    def setup(self):
        self.encoder = Encoder(self.encoder_hidden)
        self.predictor = Predictor(self.vocab_size, self.predictor_hidden)
        self.joint = Joint(self.vocab_size, self.joint_hidden, self.joint_mode)

    def __call__(self, feats, labels, normalize: bool = True):
        """feats (N, T, F), labels (N, U-1) -> log-probs (N, T, U, V)
        (raw logits when ``normalize=False``)."""
        f = self.encoder(feats)
        g = self.predictor(labels)
        return self.joint(f, g, normalize)

    def encode(self, feats):
        return self.encoder(feats)

    def predictor_init(self, N):
        return self.predictor.initial_state(N)

    def predictor_step(self, carry, token):
        return self.predictor.step(carry, token)

    def joint_step(self, f_t, g_u):
        """f_t (N, H), g_u (N, H) -> log-probs (N, V) for one lattice cell."""
        return self.joint(f_t[:, None, :], g_u[:, None, :])[:, 0, 0, :]


def transducer_loss_fn(model: Transducer, params, batch, fastemit_lambda=0.0,
                       loss_mode: str = "from_logits"):
    """Mean RNN-T loss of a batch.

    loss_mode 'from_logits' (default) feeds RAW joint logits into the fused
    loss — the log_softmax over the (N, T, U, V) tensor and its backward
    pass never run, saving three full passes over the largest tensor in the
    step.  'gather' is the classic normalize-then-gather path (numerically
    identical; kept for A/B measurement and parity with the reference
    recipe, `pytorch_binding/README`).  'fused' goes further: the joint's
    V-projection + logsumexp + blank/label extraction run inside one Pallas
    kernel (`ops/fused_joint.py`) and the (N, T, U, V) logits tensor never
    exists in HBM at all — capability the reference architecture cannot
    express (it requires materialized log-probs, `README.md:59`).
    """
    if loss_mode not in ("from_logits", "gather", "fused"):
        raise ValueError(f"unknown loss_mode: {loss_mode!r}")
    feats, labels, xn, yn = batch
    if loss_mode == "fused":
        from warp_rnnt_tpu.ops.fused_joint import rnnt_loss_fused_joint

        f = model.apply(params, feats, method=Transducer.encode)
        g = model.apply(params, labels,
                        method=lambda m, lbl: m.predictor(lbl))
        pp = nn.unbox(params)["params"]["joint"]
        fused_params = dict(
            w_pre=pp["pre"]["kernel"], b_pre=pp["pre"]["bias"],
            w_out=pp["out"]["kernel"], b_out=pp["out"]["bias"],
        )
        return rnnt_loss_fused_joint(
            f, g, fused_params, labels, xn, yn, reduction="mean",
            fastemit_lambda=fastemit_lambda, mode=model.joint_mode,
        )
    if loss_mode == "from_logits":
        from warp_rnnt_tpu.functional.from_logits import rnnt_loss_from_logits

        logits = model.apply(params, feats, labels, normalize=False)
        return rnnt_loss_from_logits(
            logits, labels, xn, yn,
            reduction="mean", fastemit_lambda=fastemit_lambda,
        )
    log_probs = model.apply(params, feats, labels)
    return rnnt_loss(
        log_probs, labels, xn, yn,
        reduction="mean", gather=True, fastemit_lambda=fastemit_lambda,
    )


def make_train_step(model: Transducer, optimizer: optax.GradientTransformation,
                    fastemit_lambda: float = 0.0,
                    loss_mode: str = "from_logits"):
    """Returns a pure (params, opt_state, batch) -> (params, opt_state, loss)
    step, ready for jit over a mesh (shard batch over 'data')."""

    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(
            lambda p: transducer_loss_fn(
                model, p, batch, fastemit_lambda, loss_mode
            )
        )(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def init_model(
    key, vocab_size=32, feat_dim=80, N=4, T=32, U=8, **model_kwargs
) -> Tuple[Transducer, Any, Tuple]:
    """Convenience initializer returning (model, params, example_batch)."""
    model = Transducer(vocab_size=vocab_size, **model_kwargs)
    k1, k2, k3 = jax.random.split(key, 3)
    feats = jax.random.normal(k1, (N, T, feat_dim), jnp.float32)
    labels = jax.random.randint(k2, (N, U - 1), 1, vocab_size, jnp.int32)
    xn = jnp.full((N,), T, jnp.int32)
    yn = jax.random.randint(k3, (N,), max(U // 2, 1), U, jnp.int32)
    params = model.init(jax.random.PRNGKey(0), feats, labels)
    return model, params, (feats, labels, xn, yn)
