"""Legacy fixed-blockmask blocksparse attention (reference:
flash_attn/flash_blocksparse_attention.py:15 FlashBlocksparseMHA,
flash_blocksparse_attn_interface.py:7 flash_blocksparse_attn_func,
:185 convert_blockmask).

Implemented on the vertical-and-slash sparse kernel by expressing the fixed
(q_blocks, k_blocks) boolean blockmask as per-q-block slash tile lists.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from flash_attn_tpu.flash_attn_interface import sparse_attn_func


def convert_blockmask(blockmask: jnp.ndarray, block_size: int = 64):
    """(nqb, nkb) bool -> (block_count, block_offset) slash metadata."""
    nqb, nkb = blockmask.shape
    bm = jnp.asarray(blockmask, bool)
    counts = bm.sum(axis=1).astype(jnp.int32)
    order = jnp.argsort(~bm, axis=1, stable=True).astype(jnp.int32)
    offsets = order * block_size  # element offsets; invalid entries unused
    return counts, offsets


def flash_blocksparse_attn_func(
    q: jnp.ndarray,  # (b, s, h, d)
    k: jnp.ndarray,
    v: jnp.ndarray,
    blockmask: jnp.ndarray,  # (s//block, s//block) bool keep-mask
    dropout_p: float = 0.0,
    softmax_scale: Optional[float] = None,
    causal: bool = False,
    *,
    block_size: int = 64,
    dropout_seed: Optional[jnp.ndarray] = None,
    interpret: Optional[bool] = None,
):
    """Fixed blockmask flash attention. The mask is shared across batch and
    heads (the legacy Triton kernel's contract). Differentiable and
    trainable with dropout, like the legacy FlashBlocksparseMHA
    (flash_attn/flash_blocksparse_attention.py:15)."""
    assert block_size == 64, "legacy blocksparse blockmask granularity is 64"
    b, sq, h, d = q.shape
    counts, offsets = convert_blockmask(blockmask, block_size)
    nqb = blockmask.shape[0]
    nnz = offsets.shape[1]
    block_count = jnp.broadcast_to(counts[None, None], (b, h, nqb))
    block_offset = jnp.broadcast_to(offsets[None, None], (b, h, nqb, nnz))
    column_count = jnp.zeros((b, h, nqb), jnp.int32)
    column_index = jnp.zeros((b, h, nqb, 1), jnp.int32)
    return sparse_attn_func(
        q, k, v, block_count, block_offset, column_count, column_index,
        dropout_p=dropout_p, dropout_seed=dropout_seed,
        softmax_scale=softmax_scale, causal=causal, interpret=interpret,
    )
