"""Cross-entropy loss with label smoothing, z-loss, logit scaling, and
vocab-parallel support (reference: flash_attn/losses/cross_entropy.py:9-66,
flash_attn/ops/triton/cross_entropy.py:25-292).

The reference needs a Triton kernel for (a) fusion and (b) splitting the
vocab across TP ranks with a `class_start_idx` + handshake over the
ProcessGroup. On TPU: (a) XLA fuses the logsumexp chain; (b) vocab
parallelism is a sharding annotation — under GSPMD the same code runs with
`logits` sharded on the vocab axis and XLA inserts the psum for the lse and
the masked gather for the label logit. An explicit shard_map variant is in
flash_attn_tpu/parallel for when manual control is wanted.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_entropy_loss(
    logits: jnp.ndarray,   # (..., vocab)
    labels: jnp.ndarray,   # (...,) int32
    *,
    label_smoothing: float = 0.0,
    logit_scale: float = 1.0,
    lse_square_scale: float = 0.0,  # z-loss coefficient
    ignore_index: int = -100,
    reduction: str = "mean",
):
    """Returns loss with the reference's exact semantics: optional label
    smoothing, z-loss `lse_square_scale * lse^2`, `logit_scale` applied
    before softmax, ignore_index masking, reduction in {none, mean, sum}."""
    logits_f = logits.astype(jnp.float32) * logit_scale
    lse = jax.scipy.special.logsumexp(logits_f, axis=-1)
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0)
    label_logit = jnp.take_along_axis(
        logits_f, safe_labels[..., None], axis=-1
    )[..., 0]
    if label_smoothing > 0.0:
        # Reference smoothing: (1-eps)*(-label_logit) + eps*(-mean(logits)).
        loss = lse - (1.0 - label_smoothing) * label_logit \
            - label_smoothing * logits_f.mean(-1)
    else:
        loss = lse - label_logit
    if lse_square_scale > 0.0:
        loss = loss + lse_square_scale * jnp.square(lse)
    loss = jnp.where(valid, loss, 0.0)
    if reduction == "none":
        return loss
    if reduction == "sum":
        return loss.sum()
    n = jnp.maximum(valid.sum(), 1)
    return loss.sum() / n


def fused_linear_cross_entropy(
    hidden: jnp.ndarray,   # (b, s, h)
    weight: jnp.ndarray,   # (vocab, h) — embedding layout (wte / lm_head.T)
    labels: jnp.ndarray,   # (b, s) int32
    *,
    chunk: int = 1024,
    label_smoothing: float = 0.0,
    logit_scale: float = 1.0,
    lse_square_scale: float = 0.0,
    ignore_index: int = -100,
    reduction: str = "mean",
):
    """Cross-entropy fused with the LM-head projection: the full-vocab
    logits tensor (b*s, V — several GB in fp32 at GPT-2 scale) is never
    materialized. The sequence is scanned in chunks; each chunk's logits
    are computed, reduced to scalars, and REMATERIALIZED in the backward
    (jax.checkpoint on the chunk body), so peak memory is one
    (b, chunk, V) tile plus one (V, h) weight-grad accumulator that the
    scan's backward carries.

    TPU-native form of the memory optimization the reference gets from its
    Triton CE kernel's inplace_backward + logit recompute
    (flash_attn/ops/triton/cross_entropy.py:25-292) — extended through the
    head matmul. Same semantics as cross_entropy_loss for
    reduction in {"mean", "sum"}.
    """
    if reduction not in ("mean", "sum"):
        raise ValueError("fused CE supports reduction in {'mean','sum'}")
    b, s, h = hidden.shape
    chunk = min(chunk, s)
    pad = (-s) % chunk
    if pad:
        hidden = jnp.pad(hidden, ((0, 0), (0, pad), (0, 0)))
        labels = jnp.pad(labels, ((0, 0), (0, pad)),
                         constant_values=ignore_index)
    n = (s + pad) // chunk
    # (n, b, chunk, .) scan layout
    hs = hidden.reshape(b, n, chunk, h).swapaxes(0, 1)
    ls = labels.reshape(b, n, chunk).swapaxes(0, 1)

    @jax.checkpoint
    def body(carry, xs):
        hc, lc = xs
        logits = hc @ weight.T.astype(hc.dtype)
        loss = cross_entropy_loss(
            logits, lc,
            label_smoothing=label_smoothing, logit_scale=logit_scale,
            lse_square_scale=lse_square_scale, ignore_index=ignore_index,
            reduction="sum",
        )
        valid = (lc != ignore_index).sum()
        return (carry[0] + loss, carry[1] + valid), None

    (total, count), _ = jax.lax.scan(
        body, (jnp.float32(0.0), jnp.int32(0)), (hs, ls)
    )
    if reduction == "sum":
        return total
    return total / jnp.maximum(count, 1)


class CrossEntropyLoss:
    """Module-style wrapper matching the reference class
    (flash_attn/losses/cross_entropy.py:9)."""

    def __init__(
        self,
        ignore_index: int = -100,
        reduction: str = "mean",
        label_smoothing: float = 0.0,
        logit_scale: float = 1.0,
        lse_square_scale: float = 0.0,
        inplace_backward: bool = False,  # n/a on TPU (functional grads)
        process_group=None,  # n/a: vocab parallelism via sharding
        return_z_loss: bool = False,
    ):
        del inplace_backward, process_group
        self.ignore_index = ignore_index
        self.reduction = reduction
        self.label_smoothing = label_smoothing
        self.logit_scale = logit_scale
        self.lse_square_scale = lse_square_scale
        self.return_z_loss = return_z_loss

    def __call__(self, logits, labels):
        loss = cross_entropy_loss(
            logits, labels,
            label_smoothing=self.label_smoothing,
            logit_scale=self.logit_scale,
            lse_square_scale=self.lse_square_scale,
            ignore_index=self.ignore_index,
            reduction=self.reduction,
        )
        if self.return_z_loss:
            logits_f = logits.astype(jnp.float32) * self.logit_scale
            lse = jax.scipy.special.logsumexp(logits_f, axis=-1)
            valid = labels != self.ignore_index
            z = jnp.where(valid, self.lse_square_scale * jnp.square(lse), 0.0)
            if self.reduction == "mean":
                z = z.sum() / jnp.maximum(valid.sum(), 1)
            elif self.reduction == "sum":
                z = z.sum()
            return loss, z
        return loss
