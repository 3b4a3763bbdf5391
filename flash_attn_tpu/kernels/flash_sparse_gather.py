"""Gather-style sparse attention: DMA exactly the attended 64-wide blocks.

The bitmap kernel (flash_sparse.py) visits fixed KV tiles and masks inside
them — step-bound for fine patterns, FLOP-wasteful for coarse tiles. This
variant is the TPU analog of the reference's CpasyncGatherKVManager
(flash_attn/cute/topk_gather_kv.py): a host planner lowers the
vertical-and-slash metadata to a per-(b, h, 128-q-row-block) list of
64-wide KV block offsets; the kernel DMA-gathers exactly those blocks from
HBM into a compact VMEM buffer (double-issue, wait-all) and runs ONE
matmul over the compacted keys — no predicated-off grid steps, no
tile-granularity waste beyond the 64-block quantum.

Scope: forward, slash-dominant patterns (each vertical column is rounded
up to its surrounding 64-block and exact-masked via a gathered bitmap).
The bitmap kernel remains the fallback for everything else.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

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
_GBLK = 64  # gather quantum (the reference metadata granularity)


def _plan_gather(
    block_count, block_offset, column_count, column_index,
    *, seqlen_k: int, nqb64: int,
):
    """Per-(b, h, 128-row block): merged 64-block offset list + exact masks.

    Returns (goff (b,h,nqb128,G), gcount (b,h,nqb128),
             col_ok (b,h,nqb128,2,G*64) int8 exact membership per 64-row
             metadata half, col_abs (b,h,nqb128,G*64) int32).
    All jnp — runs under jit.
    """
    b, h, nqb, nnz_s = block_offset.shape
    nnz_v = column_index.shape[-1]
    assert nqb == nqb64 and nqb64 % 2 == 0
    nqb128 = nqb64 // 2
    bc = jnp.asarray(block_count, jnp.int32)
    bo = jnp.asarray(block_offset, jnp.int32)
    cc = jnp.asarray(column_count, jnp.int32)
    ci = jnp.asarray(column_index, jnp.int32)

    n64 = cdiv(seqlen_k, _GBLK)
    s_valid = jnp.arange(nnz_s)[None, None, None] < bc[..., None]
    v_valid = jnp.arange(nnz_v)[None, None, None] < cc[..., None]

    # Active 64-blocks per 64-row metadata block: slash blocks + the blocks
    # containing each vertical column.
    rows = b * h * nqb
    act = jnp.zeros((rows, n64 + 1), jnp.int8)
    s_blk = jnp.where(s_valid, bo // _GBLK, n64).reshape(rows, nnz_s)
    act = act.at[jnp.arange(rows)[:, None], s_blk].set(1, mode="drop")
    v_blk = jnp.where(v_valid, ci // _GBLK, n64).reshape(rows, nnz_v)
    act = act.at[jnp.arange(rows)[:, None], v_blk].set(1, mode="drop")
    act = act[:, :n64]

    # Exact column membership bitmap per metadata row (for masking inside
    # gathered blocks): verticals individually + whole slash blocks.
    skp = n64 * _GBLK
    bm = jnp.zeros((rows, skp + 1), jnp.int8)
    flat_cols = jnp.where(v_valid, ci, skp).reshape(rows, nnz_v)
    bm = bm.at[jnp.arange(rows)[:, None], flat_cols].set(1, mode="drop")
    slash_fill = jnp.repeat(
        jnp.zeros((rows, n64 + 1), jnp.int8).at[
            jnp.arange(rows)[:, None], s_blk
        ].set(1, mode="drop")[:, :n64],
        _GBLK, axis=1,
    )
    bm = jnp.maximum(bm[:, :skp], slash_fill)

    # Merge row pairs -> 128-row blocks.
    act2 = act.reshape(b * h * nqb128, 2, n64).max(axis=1)
    G = max(1, min(n64, 2 * (nnz_s + nnz_v)))
    order = jnp.argsort(-act2.astype(jnp.int32), axis=1, stable=True)
    gblk = order[:, :G].astype(jnp.int32)            # 64-block indices
    gcount = act2.astype(jnp.int32).sum(axis=1)
    goff = gblk * _GBLK                              # element offsets

    # Gathered views of the membership bitmap + absolute columns.
    bm2 = bm.reshape(b * h * nqb128, 2, skp)
    gcols = (goff[:, :, None] + jnp.arange(_GBLK)[None, None, :]).reshape(
        b * h * nqb128, G * _GBLK
    )  # absolute column per gathered position
    col_ok = jnp.take_along_axis(
        bm2, jnp.broadcast_to(gcols[:, None, :], (b * h * nqb128, 2, G * _GBLK)),
        axis=2,
    )
    # Drop gathered positions beyond gcount (padding blocks re-gather block
    # order[gcount-1]; membership masking makes them exact, but mask anyway).
    pos_ok = (
        jnp.arange(G)[None, :] < gcount[:, None]
    )[:, :, None]  # (rows128, G, 1)
    col_ok = jnp.where(
        jnp.broadcast_to(
            pos_ok.reshape(b * h * nqb128, 1, G, 1),
            (b * h * nqb128, 2, G, _GBLK),
        ).reshape(b * h * nqb128, 2, G * _GBLK),
        col_ok, 0,
    ).astype(jnp.int8)
    return (
        goff.reshape(b, h, nqb128, G),
        gcount.reshape(b, h, nqb128),
        col_ok.reshape(b, h, nqb128, 2, G * _GBLK),
        gcols.reshape(b, h, nqb128, 1, G * _GBLK).astype(jnp.int32),
    )


def _gather_kernel(
    goff_ref, gcount_ref,   # scalar prefetch: (b,h,nqb,G), (b,h,nqb)
    *refs,
    seqlen_q: int, seqlen_k: int, block_q: int, G: int,
    scale: float, causal: bool, softcap: float, group_size: int,
    out_dtype,
):
    idx = 0
    q_ref = refs[idx]; idx += 1          # (1, 1, block_q, d_pad) VMEM
    k_hbm = refs[idx]; idx += 1          # (b, hk, skp, d_pad) ANY
    v_hbm = refs[idx]; idx += 1
    colok_ref = refs[idx]; idx += 1      # (1, 1, 1, 2, L) int8 VMEM
    colabs_ref = refs[idx]; idx += 1     # (1, 1, 1, 1, L) int32 VMEM
    o_ref = refs[idx]; idx += 1
    lse_ref = refs[idx]; idx += 1
    kbuf = refs[idx]; idx += 1           # (L, d_pad) VMEM scratch
    vbuf = refs[idx]; idx += 1
    ksem = refs[idx]; idx += 1           # (G,) DMA semaphores
    vsem = refs[idx]; idx += 1

    b = pl.program_id(0)
    h = pl.program_id(1)
    qi = pl.program_id(2)
    hk = h // group_size

    # Issue ALL gathers, then wait — the DMA engine pipelines them.
    for j in range(G):
        # Offsets are 64-block aligned by construction; tell Mosaic so it
        # can prove sublane-tiling divisibility for the dynamic slice.
        off = pl.multiple_of(goff_ref[b, h, qi, j], _GBLK)
        pltpu.make_async_copy(
            k_hbm.at[b, hk, pl.ds(off, _GBLK)],
            kbuf.at[pl.ds(j * _GBLK, _GBLK)], ksem.at[j],
        ).start()
        pltpu.make_async_copy(
            v_hbm.at[b, hk, pl.ds(off, _GBLK)],
            vbuf.at[pl.ds(j * _GBLK, _GBLK)], vsem.at[j],
        ).start()
    for j in range(G):
        off = pl.multiple_of(goff_ref[b, h, qi, j], _GBLK)
        pltpu.make_async_copy(
            k_hbm.at[b, hk, pl.ds(off, _GBLK)],
            kbuf.at[pl.ds(j * _GBLK, _GBLK)], ksem.at[j],
        ).wait()
        pltpu.make_async_copy(
            v_hbm.at[b, hk, pl.ds(off, _GBLK)],
            vbuf.at[pl.ds(j * _GBLK, _GBLK)], vsem.at[j],
        ).wait()

    q = q_ref[0, 0]                       # (block_q, d_pad)
    k = kbuf[...]                         # (L, d_pad)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (block_q, L)
    if softcap > 0.0:
        s2 = jnp.tanh(s * (scale / softcap)) * (softcap * LOG2E)
    else:
        s2 = s * (scale * LOG2E)

    rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + qi * block_q
    cols = jnp.broadcast_to(colabs_ref[0, 0, 0, 0][None, :], s.shape)
    ok0 = colok_ref[0, 0, 0, 0][None, :]
    ok1 = colok_ref[0, 0, 0, 1][None, :]
    r_local = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
    memb = jnp.where(
        r_local < _GBLK,
        jnp.broadcast_to(ok0.astype(jnp.int32), s.shape),
        jnp.broadcast_to(ok1.astype(jnp.int32), s.shape),
    ) > 0
    mask = jnp.logical_and(memb, rows < seqlen_q)
    mask = jnp.logical_and(mask, cols < seqlen_k)
    if causal:
        mask = jnp.logical_and(
            mask, cols <= rows + (seqlen_k - seqlen_q)
        )
    s2 = jnp.where(mask, s2, _MASK2)

    m = jnp.max(s2, axis=1, keepdims=True)
    p = jnp.exp2(s2 - jnp.broadcast_to(m, s2.shape))
    p = jnp.where(mask, p, 0.0)
    l = jnp.sum(p, axis=1, keepdims=True)
    v = vbuf[...]
    acc = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    l_inv = jnp.where(l == 0.0, 0.0, 1.0 / l)
    o_ref[0, 0] = (acc * l_inv).astype(out_dtype)
    lse_ref[0, 0] = jnp.where(
        l == 0.0, -jnp.inf, (m + jnp.log2(jnp.maximum(l, 1e-37))) / LOG2E
    )


def flash_attention_sparse_gather_fwd(
    q: jnp.ndarray,  # (b, h, sq, d) kernel-native layout
    k: jnp.ndarray,  # (b, hk, sk, d)
    v: jnp.ndarray,
    block_count, block_offset, column_count, column_index,
    *,
    softmax_scale: Optional[float] = None,
    causal: bool = False,
    softcap: float = 0.0,
    meta_block_m: int = 64,
    interpret: Optional[bool] = None,
):
    """Gather-path sparse forward. Same metadata contract as
    flash_attention_sparse_fwd; requires cdiv(sq,64) even and compact-KV
    length G*64 small enough for VMEM (the router checks)."""
    batch, num_heads, seqlen_q, head_dim = q.shape
    _, num_heads_kv, seqlen_k, _ = k.shape
    group_size = num_heads // num_heads_kv
    if softmax_scale is None:
        softmax_scale = head_dim**-0.5
    if interpret is None:
        interpret = interpret_mode()
    out_dtype = q.dtype
    assert meta_block_m == _GBLK

    nqb64 = cdiv(seqlen_q, _GBLK)
    assert nqb64 % 2 == 0, "gather path needs an even 64-row block count"
    block_q = 2 * _GBLK
    nqb = nqb64 // 2

    goff, gcount, col_ok, col_abs = _plan_gather(
        block_count, block_offset, column_count, column_index,
        seqlen_k=seqlen_k, nqb64=nqb64,
    )
    G = goff.shape[-1]
    L = G * _GBLK

    d_pad = round_up(head_dim, NUM_LANES)
    qp = pad_to_block(pad_to_block(q, 3, d_pad), 2, block_q)
    # +64 slack so a gather at the last block never reads out of bounds.
    kp = pad_to_block(pad_to_block(k, 3, d_pad), 2, _GBLK)
    vp = pad_to_block(pad_to_block(v, 3, d_pad), 2, _GBLK)

    kernel = functools.partial(
        _gather_kernel,
        seqlen_q=seqlen_q, seqlen_k=seqlen_k, block_q=block_q, G=G,
        scale=float(softmax_scale), causal=causal, softcap=float(softcap),
        group_size=group_size, out_dtype=out_dtype,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(batch, num_heads, nqb),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d_pad),
                         lambda b, h, qi, go, gc: (b, h, qi, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1, 1, 2, L),
                         lambda b, h, qi, go, gc: (b, h, qi, 0, 0)),
            pl.BlockSpec((1, 1, 1, 1, L),
                         lambda b, h, qi, go, gc: (b, h, qi, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_q, d_pad),
                         lambda b, h, qi, go, gc: (b, h, qi, 0)),
            pl.BlockSpec((1, 1, block_q, 1),
                         lambda b, h, qi, go, gc: (b, h, qi, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((L, d_pad), kp.dtype),
            pltpu.VMEM((L, d_pad), vp.dtype),
            pltpu.SemaphoreType.DMA((G,)),
            pltpu.SemaphoreType.DMA((G,)),
        ],
    )

    sq_pad = nqb * block_q
    out, lse = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((batch, num_heads, sq_pad, d_pad), out_dtype),
            jax.ShapeDtypeStruct((batch, num_heads, sq_pad, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        interpret=interpret,
    )(goff, gcount, qp, kp, vp, col_ok, col_abs)

    out = out[:, :, :seqlen_q, :head_dim]
    lse = lse[:, :, :seqlen_q, 0]
    return out, lse
