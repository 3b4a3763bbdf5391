"""Vertical-and-slash sparse attention (MInference, arXiv 2407.02490).

TPU-native replacement for the reference sparse path
(csrc/flash_attn/flash_api_sparse.cpp:166 `mha_fwd_sparse`,
csrc/flash_attn/src/flash_fwd_sparse_kernel.h; exposed as
vllm_flash_attn/flash_attn_interface.py:313 `sparse_attn_func`).

Semantics (per (batch, head, q-block-of-64) metadata, forward-only like the
reference):
  * block_offset[:block_count] — element offsets of 64-wide "slash" KV tiles
  * column_index[:column_count] — individual "vertical" KV column indices
  * attended set = union of the two (disjointness is assumed upstream; the
    reference's own test partitions seqlen_k between them,
    tests/test_vllm_flash_attn.py:387-433)

TPU design: the reference metadata granularity (64) is finer than a TPU
lane tile (128), so the host planner lowers BOTH patterns into one int8
column-membership bitmap per (b, h, q-block) plus the list of 128-wide KV
tiles that contain any attended column. The kernel runs one uniform loop
over that prefetched tile list — skipped tiles' DMAs are elided by
index-map clamping, and each visited tile masks scores with its bitmap row
(one int8 tile load + compare). No gather ops anywhere.
The bitmap costs one int8 per (b, h, q-block, key) — fine at benchmark
scales; a per-column-DMA variant is the planned path for >100k contexts.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flash_attn_tpu.kernels.common import (
    DEFAULT_MASK_VALUE,
    LOG2E,
    NUM_LANES,
    cdiv,
    interpret_mode,
    pad_to_block,
    round_up,
)

_MASK2 = DEFAULT_MASK_VALUE


def _plan_sparse(
    block_count, block_offset, column_count, column_index,
    *, num_kv_blocks, block_kv, meta_block_n,
):
    """Lower slash+vertical metadata to (tile_list, tile_count, bitmap).

    tile_list: (b, h, nqb, T) int32 kv-tile indices (active-first).
    tile_count: (b, h, nqb) int32.
    bitmap: (rows_pad, skp) int8 column membership, rows flat over (b,h,qb).
    """
    b, h, nqb, nnz_s = block_offset.shape
    nnz_v = column_index.shape[-1]
    block_count = jnp.asarray(block_count, jnp.int32)
    block_offset = jnp.asarray(block_offset, jnp.int32)
    column_count = jnp.asarray(column_count, jnp.int32)
    column_index = jnp.asarray(column_index, jnp.int32)

    rows = b * h * nqb
    skp = num_kv_blocks * block_kv
    n64 = skp // meta_block_n

    s_valid = jnp.arange(nnz_s)[None, None, None] < block_count[..., None]
    v_valid = jnp.arange(nnz_v)[None, None, None] < column_count[..., None]

    # Vertical columns -> bitmap scatter (OOB entries dropped).
    flat_cols = jnp.where(
        v_valid, column_index, skp
    ).reshape(rows, nnz_v)
    bitmap = jnp.zeros((rows, skp + 1), jnp.int8)
    if nnz_v > 0:
        bitmap = bitmap.at[
            jnp.arange(rows)[:, None], flat_cols
        ].set(1, mode="drop")
    bitmap = bitmap[:, :skp]

    # Slash tiles (meta_block_n wide) -> fill their column ranges.
    if nnz_s > 0:
        s64 = jnp.where(
            s_valid, block_offset // meta_block_n, n64
        ).reshape(rows, nnz_s)
        slash64 = jnp.zeros((rows, n64 + 1), jnp.int8)
        slash64 = slash64.at[
            jnp.arange(rows)[:, None], s64
        ].set(1, mode="drop")
        slash_cols = jnp.repeat(slash64[:, :n64], meta_block_n, axis=1)
        bitmap = jnp.maximum(bitmap, slash_cols)

    # Active 128-wide kv tiles + fixed-size compaction (active-first order).
    active = bitmap.reshape(rows, num_kv_blocks, block_kv).max(axis=2)
    t_max = max(1, min(num_kv_blocks, nnz_s + nnz_v))
    order = jnp.argsort(-active.astype(jnp.int32), axis=1, stable=True)
    tile_list = order[:, :t_max].astype(jnp.int32)
    tile_count = active.astype(jnp.int32).sum(axis=1)

    rows_pad = round_up(rows, 32)
    if rows_pad != rows:
        bitmap = jnp.pad(bitmap, ((0, rows_pad - rows), (0, 0)))
    return (
        tile_list.reshape(b, h, nqb, t_max),
        tile_count.reshape(b, h, nqb),
        bitmap,
    )


def _plan_sparse_pairs(active, b, h, nqb64, nkb, t_max):
    """Merge consecutive 64-row metadata blocks into 128-row kernel
    super-blocks: union tile lists (the MXU wants >=128 q rows per matmul;
    the metadata granularity stays 64 via two bitmap rows per block)."""
    nqb128 = nqb64 // 2
    act2 = active.reshape(b * h * nqb128, 2, nkb).max(axis=1)
    t2 = min(nkb, 2 * t_max)
    order = jnp.argsort(-act2.astype(jnp.int32), axis=1, stable=True)
    tile_list = order[:, :t2].astype(jnp.int32)
    tile_count = act2.astype(jnp.int32).sum(axis=1)
    return (
        tile_list.reshape(b, h, nqb128, t2),
        tile_count.reshape(b, h, nqb128),
    )


def _sparse_fwd_kernel(
    tile_ref, count_ref,  # scalar prefetch
    *refs,
    seqlen_q: int, seqlen_k: int,
    block_q: int, block_kv: int, num_tiles: int, nqb: int,
    scale: float, causal: bool, softcap: float,
    group_size: int, has_alibi: bool, alibi_batched: bool,
    has_lens: bool, dropout_p: float = 0.0, meta_per_blk: int = 1,
    out_dtype=None,
):
    idx = 0
    q_ref = refs[idx]; idx += 1
    k_ref = refs[idx]; idx += 1
    v_ref = refs[idx]; idx += 1
    bm_ref = refs[idx]; idx += 1  # (32, block_kv) int8 bitmap rows
    slopes_ref = lens_ref = seed_ref = None
    if has_alibi:
        slopes_ref = refs[idx]; idx += 1
    if has_lens:
        lens_ref = refs[idx]; idx += 1  # (2, b) int32: per-seq len_q/len_k
    if dropout_p > 0.0:
        seed_ref = refs[idx]; idx += 1
    o_ref = refs[idx]; idx += 1
    lse_ref = refs[idx]; idx += 1
    m_scr = refs[idx]; idx += 1
    l_scr = refs[idx]; idx += 1
    acc_scr = refs[idx]; idx += 1

    b = pl.program_id(0)
    h = pl.program_id(1)
    qi = pl.program_id(2)
    ti = pl.program_id(3)

    @pl.when(ti == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, _MASK2)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    ki = tile_ref[b, h, qi, ti]

    @pl.when(ti < count_ref[b, h, qi])
    def _body():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if softcap > 0.0:
            s2 = jnp.tanh(s * (scale / softcap)) * (softcap * LOG2E)
        else:
            s2 = s * (scale * LOG2E)

        rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + qi * block_q
        cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ki * block_kv

        # Per-batch lengths (varlen path, reference mha_varlen_fwd_sparse,
        # csrc/flash_attn/flash_api_sparse.cpp:337): bottom-right causal
        # alignment uses each sequence's own len_k - len_q.
        if has_lens:
            len_q = lens_ref[0, b]
            len_k = lens_ref[1, b]
        else:
            len_q = seqlen_q
            len_k = seqlen_k

        if has_alibi:
            slope2 = slopes_ref[b if alibi_batched else 0, h] * LOG2E
            rel = jnp.abs((cols - rows - (len_k - len_q)).astype(jnp.float32))
            s2 = s2 - slope2 * rel

        mask = jnp.logical_and(cols < len_k, rows < len_q)
        if causal:
            mask = jnp.logical_and(mask, cols <= rows + (len_k - len_q))
        # Column membership from the bitmap row(s) of this (b, h, qi).
        # Mosaic cannot prove alignment of a dynamic sublane index, so rows
        # are selected with a vectorized reduce instead of a dynamic slice.
        # With meta_per_blk == 2, one 128-row kernel block spans TWO 64-row
        # metadata rows (base even => both live in the same 32-row bitmap
        # block) — the MXU wants >= 128 q rows per matmul.
        base_row = (b * pl.num_programs(1) + h) * nqb + meta_per_blk * qi
        bm_tile = bm_ref[...]  # (32, block_kv) int8
        sub = jax.lax.broadcasted_iota(jnp.int32, bm_tile.shape, 0)
        bm0 = jnp.max(
            jnp.where(sub == (base_row % 32), bm_tile, jnp.int8(0))
            .astype(jnp.int32), axis=0,
        )
        if meta_per_blk == 2:
            bm1 = jnp.max(
                jnp.where(sub == (base_row % 32 + 1), bm_tile, jnp.int8(0))
                .astype(jnp.int32), axis=0,
            )
            r_local = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
            bm_full = jnp.where(
                r_local < 64,
                jnp.broadcast_to(bm0[None, :], s.shape),
                jnp.broadcast_to(bm1[None, :], s.shape),
            )
            bm_mask = bm_full > 0
        else:
            bm_mask = (bm0 > 0)[None, :]
        mask = jnp.logical_and(mask, bm_mask)

        s2 = jnp.where(mask, s2, _MASK2)
        m_prev = m_scr[...]
        m_cur = jnp.max(s2, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp2(m_prev - m_next)
        kv_rep = s2.shape[1] // m_next.shape[1]
        m_full = pltpu.repeat(m_next, kv_rep, axis=1) if kv_rep > 1 else m_next
        p = jnp.exp2(s2 - m_full)
        p = jnp.where(mask, p, 0.0)
        l_scr[...] = alpha * l_scr[...] + jnp.sum(p, axis=1, keepdims=True)
        m_scr[...] = m_next
        if dropout_p > 0.0:
            from flash_attn_tpu.kernels.flash_fwd import _dropout_keep_mask

            keep = _dropout_keep_mask(
                seed_ref, b, h, qi * block_q, ki * block_kv, p.shape,
                1.0 - dropout_p,
            )
            p = jnp.where(keep, p, 0.0)
        v = v_ref[0, 0]
        d_rep = acc_scr.shape[1] // alpha.shape[1]
        alpha_full = pltpu.repeat(alpha, d_rep, axis=1) if d_rep > 1 else alpha
        acc_scr[...] = acc_scr[...] * alpha_full + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(ti == num_tiles - 1)
    def _finalize():
        m = m_scr[...][:, 0:1]
        l = l_scr[...][:, 0:1]
        l_inv = jnp.where(l == 0.0, 0.0, 1.0 / l)
        if dropout_p > 0.0:
            l_inv = l_inv * (1.0 / (1.0 - dropout_p))
        o_ref[0, 0] = (acc_scr[...] * l_inv).astype(out_dtype)
        lse_ref[0, 0] = jnp.where(
            l == 0.0, -jnp.inf, (m + jnp.log2(jnp.maximum(l, 1e-37))) / LOG2E
        )


def flash_attention_sparse_fwd(
    q: jnp.ndarray,  # (b, h, sq, d) kernel-native layout
    k: jnp.ndarray,  # (b, hk, sk, d)
    v: jnp.ndarray,
    block_count: jnp.ndarray,   # (b, h, cdiv(sq, meta_block_m))
    block_offset: jnp.ndarray,  # (b, h, nqb, NNZ_S) element offsets
    column_count: jnp.ndarray,  # (b, h, nqb)
    column_index: jnp.ndarray,  # (b, h, nqb, NNZ_V)
    *,
    alibi_slopes: Optional[jnp.ndarray] = None,
    softmax_scale: Optional[float] = None,
    causal: bool = False,
    softcap: float = 0.0,
    seqlens_q: Optional[jnp.ndarray] = None,  # (b,) per-seq q lengths
    seqlens_k: Optional[jnp.ndarray] = None,  # (b,) per-seq k lengths
    dropout_p: float = 0.0,
    dropout_seed: Optional[jnp.ndarray] = None,
    meta_block_m: int = 64,  # reference BLOCK_M (flash_api_sparse.cpp)
    meta_block_n: int = 64,  # reference BLOCK_N (slash tile width)
    interpret: Optional[bool] = None,
):
    """Vertical-and-slash sparse forward. Returns (out, lse).

    With seqlens_q/seqlens_k, each batch entry is a left-aligned varlen
    sequence: validity bounds and the bottom-right causal diagonal use that
    entry's own lengths (varlen path of the reference sparse API).

    Routing: patterns the DMA-gather kernel handles (no alibi/lens, even
    64-row block count, compact KV fits VMEM) take the gather fast path
    (flash_sparse_gather.py) — it pays only for attended 64-blocks instead
    of masking inside fixed tiles.
    """
    batch, num_heads, seqlen_q, head_dim = q.shape
    _nqb64 = cdiv(seqlen_q, meta_block_m)
    _n64 = cdiv(k.shape[2], 64)
    _G_est = max(1, min(
        _n64, 2 * (block_offset.shape[-1] + column_index.shape[-1])
    ))
    if (
        alibi_slopes is None and seqlens_q is None and seqlens_k is None
        and dropout_p == 0.0
        and meta_block_m == 64 and meta_block_n == 64
        and _nqb64 % 2 == 0 and _G_est * 64 <= 4096
    ):
        from flash_attn_tpu.kernels.flash_sparse_gather import (
            flash_attention_sparse_gather_fwd,
        )
        from flash_attn_tpu.utils.fa_logging import log_dispatch

        log_dispatch("sparse", route="dma-gather", G=_G_est,
                     shape=q.shape)
        return flash_attention_sparse_gather_fwd(
            q, k, v, block_count, block_offset, column_count, column_index,
            softmax_scale=softmax_scale, causal=causal, softcap=softcap,
            interpret=interpret,
        )
    _, num_heads_kv, seqlen_k, _ = k.shape
    group_size = num_heads // num_heads_kv
    if softmax_scale is None:
        softmax_scale = head_dim**-0.5
    if interpret is None:
        interpret = interpret_mode()
    out_dtype = q.dtype

    nqb64 = cdiv(seqlen_q, meta_block_m)
    # MXU efficiency: fold TWO 64-row metadata blocks into one 128-row
    # kernel block whenever the per-(b,h) metadata row count is even.
    meta_per_blk = 2 if nqb64 % 2 == 0 else 1
    block_q = meta_block_m * meta_per_blk
    # Wide KV tiles collapse the per-grid-step overhead (the sparse loop is
    # step-bound, not FLOP-bound); element masking keeps semantics exact.
    block_kv = 512 if seqlen_k >= 2048 else NUM_LANES
    nqb = cdiv(seqlen_q, block_q)
    nkb = cdiv(seqlen_k, block_kv)
    assert block_count.shape[2] == nqb64, (block_count.shape, nqb64)

    d_pad = round_up(head_dim, NUM_LANES)
    qp = pad_to_block(pad_to_block(q, 3, d_pad), 2, block_q)
    kp = pad_to_block(pad_to_block(k, 3, d_pad), 2, block_kv)
    vp = pad_to_block(pad_to_block(v, 3, d_pad), 2, block_kv)

    tile_list, tile_count, bitmap = _plan_sparse(
        block_count, block_offset, column_count, column_index,
        num_kv_blocks=nkb, block_kv=block_kv, meta_block_n=meta_block_n,
    )
    if meta_per_blk == 2:
        rows = batch * num_heads * nqb64
        active64 = bitmap[:rows].reshape(
            rows, nkb, block_kv
        ).max(axis=2)
        tile_list, tile_count = _plan_sparse_pairs(
            active64, batch, num_heads, nqb64, nkb, tile_list.shape[-1]
        )
    num_tiles = tile_list.shape[-1]

    def kv_index(b, h, qi, ti, tref, cref):
        t = jnp.minimum(ti, jnp.maximum(cref[b, h, qi] - 1, 0))
        return (b, h // group_size, tref[b, h, qi, t], 0)

    in_specs = [
        pl.BlockSpec((1, 1, block_q, d_pad),
                     lambda b, h, qi, ti, tref, cref: (b, h, qi, 0)),
        pl.BlockSpec((1, 1, block_kv, d_pad), kv_index),
        pl.BlockSpec((1, 1, block_kv, d_pad), kv_index),
        pl.BlockSpec(
            (32, block_kv),
            lambda b, h, qi, ti, tref, cref: (
                ((b * num_heads + h) * nqb64 + meta_per_blk * qi) // 32,
                kv_index(b, h, qi, ti, tref, cref)[2],
            ),
        ),
    ]
    args = [qp, kp, vp, bitmap]

    has_alibi = alibi_slopes is not None
    alibi_batched = False
    if has_alibi:
        slopes = jnp.asarray(alibi_slopes, jnp.float32)
        if slopes.ndim == 1:
            slopes = slopes[None, :]
        alibi_batched = slopes.shape[0] > 1
        in_specs.append(
            pl.BlockSpec(slopes.shape,
                         lambda b, h, qi, ti, tref, cref: (0, 0),
                         memory_space=pltpu.SMEM)
        )
        args.append(slopes)

    has_lens = seqlens_q is not None or seqlens_k is not None
    if has_lens:
        lq = (jnp.asarray(seqlens_q, jnp.int32) if seqlens_q is not None
              else jnp.full((batch,), seqlen_q, jnp.int32))
        lk = (jnp.asarray(seqlens_k, jnp.int32) if seqlens_k is not None
              else jnp.full((batch,), seqlen_k, jnp.int32))
        lens = jnp.stack([lq, lk])  # (2, b)
        in_specs.append(
            pl.BlockSpec(lens.shape,
                         lambda b, h, qi, ti, tref, cref: (0, 0),
                         memory_space=pltpu.SMEM)
        )
        args.append(lens)

    if dropout_p > 0.0:
        if dropout_seed is None:
            dropout_seed = jnp.zeros((), jnp.int32)
        in_specs.append(
            pl.BlockSpec((1, 1), lambda b, h, qi, ti, tref, cref: (0, 0),
                         memory_space=pltpu.SMEM)
        )
        args.append(jnp.asarray(dropout_seed, jnp.int32).reshape(1, 1))

    kernel = functools.partial(
        _sparse_fwd_kernel,
        seqlen_q=seqlen_q, seqlen_k=seqlen_k,
        block_q=block_q, block_kv=block_kv, num_tiles=num_tiles, nqb=nqb64,
        scale=float(softmax_scale), causal=causal, softcap=float(softcap),
        group_size=group_size, has_alibi=has_alibi,
        alibi_batched=alibi_batched, has_lens=has_lens,
        dropout_p=float(dropout_p),
        meta_per_blk=meta_per_blk, out_dtype=out_dtype,
    )

    sq_pad = nqb * block_q
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(batch, num_heads, nqb, num_tiles),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, block_q, d_pad),
                         lambda b, h, qi, ti, tref, cref: (b, h, qi, 0)),
            pl.BlockSpec((1, 1, block_q, 1),
                         lambda b, h, qi, ti, tref, cref: (b, h, qi, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, NUM_LANES), jnp.float32),
            pltpu.VMEM((block_q, NUM_LANES), jnp.float32),
            pltpu.VMEM((block_q, d_pad), jnp.float32),
        ],
    )

    out, lse = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((batch, num_heads, sq_pad, d_pad), out_dtype),
            jax.ShapeDtypeStruct((batch, num_heads, sq_pad, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        interpret=interpret,
    )(tile_list, tile_count, *args)

    out = out[:, :, :seqlen_q, :head_dim]
    lse = lse[:, :, :seqlen_q, 0]
    return out, lse


# ---------------------------------------------------------------------------
# Backward (beyond the vLLM build's fwd-only sparse: FA4's block sparsity is
# differentiable — flash_attn/cute/block_sparse_utils.py computes a
# deterministic dq write order; here the two-kernel grid-sequential
# structure is deterministic by construction, like the dense backward).
# ---------------------------------------------------------------------------

def _sparse_mask_tile(
    bm_ref, row_id, s_shape, qi, ki, *,
    block_q, block_kv, len_q, len_k, causal,
):
    """(bq, bkv) keep-mask for tile (qi, ki): bounds & causal & bitmap row."""
    rows = jax.lax.broadcasted_iota(jnp.int32, s_shape, 0) + qi * block_q
    cols = jax.lax.broadcasted_iota(jnp.int32, s_shape, 1) + ki * block_kv
    mask = jnp.logical_and(cols < len_k, rows < len_q)
    if causal:
        mask = jnp.logical_and(mask, cols <= rows + (len_k - len_q))
    bm_tile = bm_ref[...]  # (32, block_kv) int8
    row_sel = jax.lax.broadcasted_iota(jnp.int32, bm_tile.shape, 0) \
        == (row_id % 32)
    bm = jnp.max(
        jnp.where(row_sel, bm_tile, jnp.int8(0)).astype(jnp.int32), axis=0
    )
    return jnp.logical_and(mask, (bm > 0)[None, :])


def _sparse_recompute(
    q, k, v, do, lse2, delta, mask, *, scale, softcap,
    dropout_p=0.0, seed_ref=None, b=0, h=0, q_start=0, k_start=0,
    bias2=None,
):
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if softcap > 0.0:
        t = jnp.tanh(s * (scale / softcap))
        s2 = t * (softcap * LOG2E)
    else:
        t = None
        s2 = s * (scale * LOG2E)
    if bias2 is not None:
        # Additive position bias (alibi), base-2 scaled, applied after
        # softcap exactly like the forward; contributes no d(q.k) term.
        s2 = s2 + bias2
    s2 = jnp.where(mask, s2, _MASK2)
    p = jnp.exp2(s2 - lse2)
    p = jnp.where(mask, p, 0.0)
    if dropout_p > 0.0:
        from flash_attn_tpu.kernels.flash_fwd import _dropout_keep_mask

        keep = _dropout_keep_mask(
            seed_ref, b, h, q_start, k_start, p.shape, 1.0 - dropout_p
        )
        inv = 1.0 / (1.0 - dropout_p)
        p_drop = jnp.where(keep, p, 0.0) * inv
    else:
        p_drop = p
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if dropout_p > 0.0:
        dp = jnp.where(keep, dp, 0.0) * inv
    ds = p * (dp - delta)
    if softcap > 0.0:
        ds = ds * ((1.0 - t * t) * scale)
    else:
        ds = ds * scale
    return p_drop, ds


def _sparse_dkv_kernel(
    qtile_ref, qcount_ref,  # scalar prefetch: inverse lists
    *refs,
    block_q: int, block_kv: int, num_q_tiles: int, nqb: int,
    scale: float, causal: bool, softcap: float,
    seqlen_q: int, seqlen_k: int, has_lens: bool, dropout_p: float = 0.0,
    has_alibi: bool = False, alibi_batched: bool = False,
):
    idx = 0
    q_ref = refs[idx]; idx += 1
    k_ref = refs[idx]; idx += 1
    v_ref = refs[idx]; idx += 1
    do_ref = refs[idx]; idx += 1
    lse_ref = refs[idx]; idx += 1
    delta_ref = refs[idx]; idx += 1
    bm_ref = refs[idx]; idx += 1
    slopes_ref = lens_ref = seed_ref = None
    if has_alibi:
        slopes_ref = refs[idx]; idx += 1
    if has_lens:
        lens_ref = refs[idx]; idx += 1
    if dropout_p > 0.0:
        seed_ref = refs[idx]; idx += 1
    dk_ref = refs[idx]; idx += 1
    dv_ref = refs[idx]; idx += 1
    dk_scr = refs[idx]; idx += 1
    dv_scr = refs[idx]; idx += 1

    b = pl.program_id(0)
    h = pl.program_id(1)
    ki = pl.program_id(2)
    ti = pl.program_id(3)

    @pl.when(ti == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    qi = qtile_ref[b, h, ki, ti]

    @pl.when(ti < qcount_ref[b, h, ki])
    def _body():
        if has_lens:
            len_q, len_k = lens_ref[0, b], lens_ref[1, b]
        else:
            len_q, len_k = seqlen_q, seqlen_k
        row_id = (b * pl.num_programs(1) + h) * nqb + qi
        mask = _sparse_mask_tile(
            bm_ref, row_id, (block_q, block_kv), qi, ki,
            block_q=block_q, block_kv=block_kv,
            len_q=len_q, len_k=len_k, causal=causal,
        )
        q = q_ref[0, 0]
        do = do_ref[0, 0].astype(jnp.float32)
        bias2 = None
        if has_alibi:
            bias2 = _sparse_alibi_bias2(
                slopes_ref, b, h, qi, ki, (block_q, block_kv),
                block_q=block_q, block_kv=block_kv,
                len_q=len_q, len_k=len_k, alibi_batched=alibi_batched,
            )
        p, ds = _sparse_recompute(
            q, k_ref[0, 0], v_ref[0, 0], do,
            lse_ref[0, 0] * LOG2E, delta_ref[0, 0], mask,
            scale=scale, softcap=softcap,
            dropout_p=dropout_p, seed_ref=seed_ref, b=b, h=h,
            q_start=qi * block_q, k_start=ki * block_kv, bias2=bias2,
        )
        dv_scr[...] += jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dk_scr[...] += jax.lax.dot_general(
            ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(ti == num_q_tiles - 1)
    def _finalize():
        dk_ref[0, 0] = dk_scr[...]
        dv_ref[0, 0] = dv_scr[...]


def _sparse_alibi_bias2(
    slopes_ref, b, h, qi, ki, s_shape, *,
    block_q, block_kv, len_q, len_k, alibi_batched,
):
    """Base-2-scaled alibi tile bias, matching the forward's
    -slope * |cols - rows - (len_k - len_q)| (bottom-right aligned)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, s_shape, 0) + qi * block_q
    cols = jax.lax.broadcasted_iota(jnp.int32, s_shape, 1) + ki * block_kv
    slope2 = slopes_ref[b if alibi_batched else 0, h] * LOG2E
    rel = jnp.abs((cols - rows - (len_k - len_q)).astype(jnp.float32))
    return -slope2 * rel


def _sparse_dq_kernel(
    tile_ref, count_ref,  # scalar prefetch: forward tile lists
    *refs,
    block_q: int, block_kv: int, num_tiles: int, nqb: int,
    scale: float, causal: bool, softcap: float,
    seqlen_q: int, seqlen_k: int, has_lens: bool, out_dtype,
    dropout_p: float = 0.0,
    has_alibi: bool = False, alibi_batched: bool = False,
):
    idx = 0
    q_ref = refs[idx]; idx += 1
    k_ref = refs[idx]; idx += 1
    v_ref = refs[idx]; idx += 1
    do_ref = refs[idx]; idx += 1
    lse_ref = refs[idx]; idx += 1
    delta_ref = refs[idx]; idx += 1
    bm_ref = refs[idx]; idx += 1
    slopes_ref = lens_ref = seed_ref = None
    if has_alibi:
        slopes_ref = refs[idx]; idx += 1
    if has_lens:
        lens_ref = refs[idx]; idx += 1
    if dropout_p > 0.0:
        seed_ref = refs[idx]; idx += 1
    dq_ref = refs[idx]; idx += 1
    dq_scr = refs[idx]; idx += 1

    b = pl.program_id(0)
    h = pl.program_id(1)
    qi = pl.program_id(2)
    ti = pl.program_id(3)

    @pl.when(ti == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    ki = tile_ref[b, h, qi, ti]

    @pl.when(ti < count_ref[b, h, qi])
    def _body():
        if has_lens:
            len_q, len_k = lens_ref[0, b], lens_ref[1, b]
        else:
            len_q, len_k = seqlen_q, seqlen_k
        row_id = (b * pl.num_programs(1) + h) * nqb + qi
        mask = _sparse_mask_tile(
            bm_ref, row_id, (block_q, block_kv), qi, ki,
            block_q=block_q, block_kv=block_kv,
            len_q=len_q, len_k=len_k, causal=causal,
        )
        k = k_ref[0, 0]
        bias2 = None
        if has_alibi:
            bias2 = _sparse_alibi_bias2(
                slopes_ref, b, h, qi, ki, (block_q, block_kv),
                block_q=block_q, block_kv=block_kv,
                len_q=len_q, len_k=len_k, alibi_batched=alibi_batched,
            )
        _, ds = _sparse_recompute(
            q_ref[0, 0], k, v_ref[0, 0], do_ref[0, 0].astype(jnp.float32),
            lse_ref[0, 0] * LOG2E, delta_ref[0, 0], mask,
            scale=scale, softcap=softcap,
            dropout_p=dropout_p, seed_ref=seed_ref, b=b, h=h,
            q_start=qi * block_q, k_start=ki * block_kv, bias2=bias2,
        )
        dq_scr[...] += jax.lax.dot_general(
            ds, k.astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(ti == num_tiles - 1)
    def _finalize():
        dq_ref[0, 0] = dq_scr[...].astype(out_dtype)


def flash_attention_sparse_bwd(
    q, k, v,          # (b, h, s, d) kernel-native
    out, lse, do,     # fwd residuals; lse (b, h, sq)
    block_count, block_offset, column_count, column_index,
    *,
    softmax_scale: Optional[float] = None,
    causal: bool = False,
    softcap: float = 0.0,
    alibi_slopes: Optional[jnp.ndarray] = None,
    seqlens_q: Optional[jnp.ndarray] = None,
    seqlens_k: Optional[jnp.ndarray] = None,
    dropout_p: float = 0.0,
    dropout_seed: Optional[jnp.ndarray] = None,
    meta_block_m: int = 64,
    meta_block_n: int = 64,
    interpret: Optional[bool] = None,
):
    """Vertical-and-slash sparse backward: (dq, dk, dv). Deterministic
    two-kernel structure; only attended tiles are visited (forward tile
    lists for dQ, their inverse for dK/dV)."""
    batch, num_heads, seqlen_q, head_dim = q.shape
    _, num_heads_kv, seqlen_k, _ = k.shape
    group_size = num_heads // num_heads_kv
    if softmax_scale is None:
        softmax_scale = head_dim**-0.5
    if interpret is None:
        interpret = interpret_mode()
    out_dtype = q.dtype

    block_q = meta_block_m
    block_kv = NUM_LANES
    nqb = cdiv(seqlen_q, block_q)
    nkb = cdiv(seqlen_k, block_kv)
    d_pad = round_up(head_dim, NUM_LANES)

    tile_list, tile_count, bitmap = _plan_sparse(
        block_count, block_offset, column_count, column_index,
        num_kv_blocks=nkb, block_kv=block_kv, meta_block_n=meta_block_n,
    )
    num_tiles = tile_list.shape[-1]

    # Inverse lists: which q tiles attend each kv tile.
    rows = batch * num_heads * nqb
    active = bitmap[:rows].reshape(
        batch, num_heads, nqb, nkb, block_kv
    ).max(axis=4)  # (b, h, nqb, nkb) 0/1
    act_t = jnp.swapaxes(active, 2, 3)  # (b, h, nkb, nqb)
    order = jnp.argsort(-act_t.astype(jnp.int32), axis=3, stable=True)
    qtile_list = order[..., :nqb].astype(jnp.int32)
    qtile_count = act_t.astype(jnp.int32).sum(axis=3)
    num_q_tiles = qtile_list.shape[-1]

    qp = pad_to_block(pad_to_block(q, 3, d_pad), 2, block_q)
    kp = pad_to_block(pad_to_block(k, 3, d_pad), 2, block_kv)
    vp = pad_to_block(pad_to_block(v, 3, d_pad), 2, block_kv)
    dop = pad_to_block(pad_to_block(do, 3, d_pad), 2, block_q)
    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    lsep = pad_to_block(lse, 2, block_q)[..., None]
    deltap = pad_to_block(delta, 2, block_q)[..., None]

    has_alibi = alibi_slopes is not None
    alibi_batched = False
    slopes = None
    if has_alibi:
        slopes = jnp.asarray(alibi_slopes, jnp.float32)
        if slopes.ndim == 1:
            slopes = slopes[None, :]
        alibi_batched = slopes.shape[0] > 1

    has_lens = seqlens_q is not None or seqlens_k is not None
    lens = None
    if has_lens:
        lq = (jnp.asarray(seqlens_q, jnp.int32) if seqlens_q is not None
              else jnp.full((batch,), seqlen_q, jnp.int32))
        lk = (jnp.asarray(seqlens_k, jnp.int32) if seqlens_k is not None
              else jnp.full((batch,), seqlen_k, jnp.int32))
        lens = jnp.stack([lq, lk])

    def mk_specs(q_index, kv_index, bm_index):
        def kv_grouped(*a):
            b_, h_, ki_, z_ = kv_index(*a)
            return (b_, h_ // group_size, ki_, z_)

        specs = [
            pl.BlockSpec((1, 1, block_q, d_pad), q_index),
            pl.BlockSpec((1, 1, block_kv, d_pad), kv_grouped),
            pl.BlockSpec((1, 1, block_kv, d_pad), kv_grouped),
            pl.BlockSpec((1, 1, block_q, d_pad), q_index),
            pl.BlockSpec((1, 1, block_q, 1), q_index),
            pl.BlockSpec((1, 1, block_q, 1), q_index),
            pl.BlockSpec((32, block_kv), bm_index),
        ]
        if has_alibi:
            specs.append(
                pl.BlockSpec(slopes.shape, lambda *a: (0, 0),
                             memory_space=pltpu.SMEM)
            )
        if has_lens:
            specs.append(
                pl.BlockSpec(lens.shape, lambda *a: (0, 0),
                             memory_space=pltpu.SMEM)
            )
        if dropout_p > 0.0:
            specs.append(
                pl.BlockSpec((1, 1), lambda *a: (0, 0),
                             memory_space=pltpu.SMEM)
            )
        return specs

    args = [qp, kp, vp, dop, lsep, deltap, bitmap] \
        + ([slopes] if has_alibi else []) + ([lens] if has_lens else [])
    if dropout_p > 0.0:
        if dropout_seed is None:
            dropout_seed = jnp.zeros((), jnp.int32)
        args.append(jnp.asarray(dropout_seed, jnp.int32).reshape(1, 1))

    # ---- dK/dV: grid (b, h, kv_tile, q_step) ----
    def dkv_q(b, h, ki, ti, tref, cref):
        t = jnp.minimum(ti, jnp.maximum(cref[b, h, ki] - 1, 0))
        return (b, h, tref[b, h, ki, t], 0)

    def dkv_q_lse(b, h, ki, ti, tref, cref):
        bb, hh, qq, _ = dkv_q(b, h, ki, ti, tref, cref)
        return (bb, hh, qq, 0)

    dkv_specs = mk_specs(
        q_index=dkv_q,
        kv_index=lambda b, h, ki, ti, tref, cref: (b, h, ki, 0),
        bm_index=lambda b, h, ki, ti, tref, cref: (
            ((b * num_heads + h) * nqb + dkv_q(b, h, ki, ti, tref, cref)[2])
            // 32,
            ki,
        ),
    )
    dkv_kernel = functools.partial(
        _sparse_dkv_kernel,
        block_q=block_q, block_kv=block_kv, num_q_tiles=num_q_tiles, nqb=nqb,
        scale=float(softmax_scale), causal=causal, softcap=float(softcap),
        seqlen_q=seqlen_q, seqlen_k=seqlen_k, has_lens=has_lens,
        dropout_p=float(dropout_p),
        has_alibi=has_alibi, alibi_batched=alibi_batched,
    )
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(batch, num_heads, nkb, num_q_tiles),
            in_specs=dkv_specs,
            out_specs=[
                pl.BlockSpec((1, 1, block_kv, d_pad),
                             lambda b, h, ki, ti, tr, cr: (b, h, ki, 0)),
                pl.BlockSpec((1, 1, block_kv, d_pad),
                             lambda b, h, ki, ti, tr, cr: (b, h, ki, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_kv, d_pad), jnp.float32),
                pltpu.VMEM((block_kv, d_pad), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct(
                (batch, num_heads, nkb * block_kv, d_pad), jnp.float32),
            jax.ShapeDtypeStruct(
                (batch, num_heads, nkb * block_kv, d_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        interpret=interpret,
    )(qtile_list, qtile_count, *args)
    dk = dk[:, :, :seqlen_k, :head_dim]
    dv = dv[:, :, :seqlen_k, :head_dim]
    if group_size > 1:
        dk = dk.reshape(
            batch, num_heads_kv, group_size, seqlen_k, head_dim).sum(axis=2)
        dv = dv.reshape(
            batch, num_heads_kv, group_size, seqlen_k, head_dim).sum(axis=2)
    dk = dk.astype(out_dtype)
    dv = dv.astype(out_dtype)

    # ---- dQ: grid (b, h, q_tile, kv_step) — forward tile lists ----
    def dq_kv(b, h, qi, ti, tref, cref):
        t = jnp.minimum(ti, jnp.maximum(cref[b, h, qi] - 1, 0))
        return (b, h, tref[b, h, qi, t], 0)

    dq_specs = mk_specs(
        q_index=lambda b, h, qi, ti, tref, cref: (b, h, qi, 0),
        kv_index=dq_kv,
        bm_index=lambda b, h, qi, ti, tref, cref: (
            ((b * num_heads + h) * nqb + qi) // 32,
            dq_kv(b, h, qi, ti, tref, cref)[2],
        ),
    )
    dq_kernel = functools.partial(
        _sparse_dq_kernel,
        block_q=block_q, block_kv=block_kv, num_tiles=num_tiles, nqb=nqb,
        scale=float(softmax_scale), causal=causal, softcap=float(softcap),
        seqlen_q=seqlen_q, seqlen_k=seqlen_k, has_lens=has_lens,
        out_dtype=out_dtype, dropout_p=float(dropout_p),
        has_alibi=has_alibi, alibi_batched=alibi_batched,
    )
    (dq,) = pl.pallas_call(
        dq_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(batch, num_heads, nqb, num_tiles),
            in_specs=dq_specs,
            out_specs=[
                pl.BlockSpec((1, 1, block_q, d_pad),
                             lambda b, h, qi, ti, tr, cr: (b, h, qi, 0)),
            ],
            scratch_shapes=[pltpu.VMEM((block_q, d_pad), jnp.float32)],
        ),
        out_shape=[
            jax.ShapeDtypeStruct(
                (batch, num_heads, nqb * block_q, d_pad), out_dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        interpret=interpret,
    )(tile_list, tile_count, *args)
    dq = dq[:, :, :seqlen_q, :head_dim]
    return dq, dk, dv
