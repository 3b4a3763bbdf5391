"""Pad/unpad between (batch, seqlen, ...) and packed (total_tokens, ...)
layouts — the JAX equivalent of flash_attn/bert_padding.py:8-264
(`unpad_input`, `pad_input`, `IndexFirstAxis`, concatenated variant).

On TPU these are gathers/scatters with *static* output sizes: JAX requires
static shapes under jit, so `unpad_input` returns buffers sized to the padded
total (batch*seqlen) with valid tokens front-packed — downstream varlen
kernels read only cu_seqlens, so trailing garbage is never touched. Pass
`total_tokens` to get a tighter static bound when known.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def unpad_input(
    hidden_states: jnp.ndarray,  # (b, s, ...)
    attention_mask: jnp.ndarray,  # (b, s) bool
    total_tokens: Optional[int] = None,
):
    """Front-pack valid tokens. Returns (packed, indices, cu_seqlens,
    max_seqlen_in_batch, used_seqlens) — same tuple as the reference
    (bert_padding.py:98 returns 5 values in newer versions).
    """
    b, s = attention_mask.shape
    total = total_tokens if total_tokens is not None else b * s
    seqlens = attention_mask.sum(-1).astype(jnp.int32)  # (b,)
    cu_seqlens = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(seqlens)]
    )
    max_seqlen_in_batch = seqlens.max()

    # Stable front-pack: argsort of ~mask keeps valid tokens in order.
    flat_mask = attention_mask.reshape(-1)
    order = jnp.argsort(~flat_mask, stable=True)  # valid first
    indices = order[:total]
    flat = hidden_states.reshape(b * s, *hidden_states.shape[2:])
    packed = jnp.take(flat, indices, axis=0)
    return packed, indices, cu_seqlens, max_seqlen_in_batch, seqlens


def pad_input(
    packed: jnp.ndarray,  # (total, ...)
    indices: jnp.ndarray,
    batch: int,
    seqlen: int,
) -> jnp.ndarray:
    """Inverse of unpad_input (bert_padding.py:131)."""
    flat = jnp.zeros((batch * seqlen, *packed.shape[1:]), packed.dtype)
    flat = flat.at[indices].set(packed)
    return flat.reshape(batch, seqlen, *packed.shape[1:])


def index_first_axis(x: jnp.ndarray, indices: jnp.ndarray) -> jnp.ndarray:
    """Gather rows (bert_padding.py:8 IndexFirstAxis) — differentiable via
    jnp.take's native gradient; no custom autograd needed in JAX."""
    return jnp.take(x, indices, axis=0)


def index_put_first_axis(
    values: jnp.ndarray, indices: jnp.ndarray, first_axis_dim: int
) -> jnp.ndarray:
    """Scatter rows into zeros (bert_padding.py:52 IndexPutFirstAxis)."""
    out = jnp.zeros((first_axis_dim, *values.shape[1:]), values.dtype)
    return out.at[indices].set(values)


def unpad_input_for_concatenated_sequences(
    hidden_states: jnp.ndarray,  # (b, s, ...)
    attention_mask_in_length: jnp.ndarray,  # (b, s) int: per-seq lengths
):
    """Reference bert_padding.py:204: each batch row packs multiple
    sequences; attention_mask_in_length holds their lengths front-packed.
    Returns (packed, indices, cu_seqlens, max_seqlen_in_batch)."""
    b, s = attention_mask_in_length.shape
    lengths = attention_mask_in_length.reshape(-1).astype(jnp.int32)
    nonzero = lengths > 0
    # cu_seqlens over all (batch-major) sequences with zero-length entries
    # dropped is not static-shape friendly; keep all entries (zero-length
    # sequences are valid in the varlen kernels).
    cu_seqlens = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(lengths)]
    )
    max_seqlen_in_batch = lengths.max()
    # Valid tokens per row: first sum(lengths of that row).
    row_totals = attention_mask_in_length.sum(-1).astype(jnp.int32)
    mask = jnp.arange(s)[None, :] < row_totals[:, None]
    packed, indices, _, _, _ = unpad_input(hidden_states, mask)
    del nonzero
    return packed, indices, cu_seqlens, max_seqlen_in_batch
