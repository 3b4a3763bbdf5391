"""Vocab-parallel cross-entropy under shard_map (reference:
flash_attn/ops/triton/cross_entropy.py:25-292 — vocab split across TP ranks
with class_start_idx bookkeeping and a handshake over the ProcessGroup).

GSPMD usually derives this automatically from a vocab-sharded lm_head; this
explicit shard_map version guarantees the communication pattern (one psum of
(lse_partial, label_logit_partial) per token) for the training hot path.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


def _vocab_parallel_ce_local(
    logits,  # (tokens, vocab_local)
    labels,  # (tokens,)
    *,
    axis_name: str,
    label_smoothing: float,
    lse_square_scale: float,
    logit_scale: float,
    ignore_index: int,
):
    vocab_local = logits.shape[-1]
    rank = jax.lax.axis_index(axis_name)
    start = rank * vocab_local

    logits_f = logits.astype(jnp.float32) * logit_scale
    # Global logsumexp: local max -> global max (pmax) -> psum of exp-sums.
    m_local = logits_f.max(-1)
    m = jax.lax.pmax(m_local, axis_name)
    sumexp = jax.lax.psum(jnp.exp(logits_f - m[:, None]).sum(-1), axis_name)
    lse = m + jnp.log(sumexp)

    valid = labels != ignore_index
    local_label = labels - start
    in_range = jnp.logical_and(local_label >= 0, local_label < vocab_local)
    safe = jnp.clip(local_label, 0, vocab_local - 1)
    picked = jnp.take_along_axis(logits_f, safe[:, None], axis=-1)[:, 0]
    label_logit = jax.lax.psum(jnp.where(in_range, picked, 0.0), axis_name)

    if label_smoothing > 0.0:
        mean_logit = jax.lax.psum(logits_f.sum(-1), axis_name) / jax.lax.psum(
            jnp.float32(vocab_local), axis_name
        )
        loss = lse - (1.0 - label_smoothing) * label_logit \
            - label_smoothing * mean_logit
    else:
        loss = lse - label_logit
    if lse_square_scale > 0.0:
        loss = loss + lse_square_scale * jnp.square(lse)
    return jnp.where(valid, loss, 0.0)


def vocab_parallel_cross_entropy(
    logits: jnp.ndarray,  # (tokens, vocab) sharded P(None, axis)
    labels: jnp.ndarray,  # (tokens,)
    mesh: Mesh,
    *,
    axis_name: str = "model",
    label_smoothing: float = 0.0,
    lse_square_scale: float = 0.0,
    logit_scale: float = 1.0,
    ignore_index: int = -100,
    reduction: str = "mean",
):
    fn = shard_map(
        functools.partial(
            _vocab_parallel_ce_local,
            axis_name=axis_name,
            label_smoothing=label_smoothing,
            lse_square_scale=lse_square_scale,
            logit_scale=logit_scale,
            ignore_index=ignore_index,
        ),
        mesh=mesh,
        in_specs=(P(None, axis_name), P(None)),
        out_specs=P(None),
        check_vma=False,
    )
    loss = fn(logits, labels)
    if reduction == "none":
        return loss
    if reduction == "sum":
        return loss.sum()
    return loss.sum() / jnp.maximum((labels != ignore_index).sum(), 1)
