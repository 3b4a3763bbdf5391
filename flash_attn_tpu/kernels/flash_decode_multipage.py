"""Small-page paged decode: multi-page gather with a manual DMA pipeline.

The index-map paged decode (flash_decode.py) fetches ONE page per grid step;
at vLLM-style page sizes (16-128 tokens) the fixed per-step cost dominates
and bandwidth collapses (~140 GB/s at page=128 vs ~750 at page>=256 on v5e).
This variant keeps K/V page pools in HBM (memory_space=ANY) and gathers
SUPER-blocks of many pages per step with explicit double-buffered
`make_async_copy` DMAs — the hand-rolled analog of the reference's
PagedKVManager TMA pipeline (hopper/paged_kv.h) and the Pallas
double-buffering pattern from the TPU guide.

Feature scope: causal decode with per-batch lengths and sliding window (the
serving hot path). Exotic extras (sinks, alibi, leftpad, quantized cache)
stay on the general kernel; flash_attention_decode dispatches here
automatically for small pages when features allow.
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


def _mp_decode_kernel(
    seq_ref, table_ref,     # scalar prefetch: (b,), (b, max_pages)
    *refs,
    sq: int, group: int, rows: int,
    page: int, pages_per_sup: int, max_pages: int,
    scale: float, window_left: int, softcap: float,
    has_qv: bool, out_dtype,
):
    idx = 0
    q_ref = refs[idx]; idx += 1          # (1, 1, rows, d) VMEM
    qv_ref = None
    if has_qv:
        qv_ref = refs[idx]; idx += 1     # (1, 1, rows, d_v) VMEM
    k_hbm = refs[idx]; idx += 1          # (npages, hk, page, d) HBM/ANY
    v_hbm = refs[idx]; idx += 1
    o_ref = refs[idx]; idx += 1
    lse_ref = refs[idx]; idx += 1
    kbuf = refs[idx]; idx += 1           # (2, sup, d) VMEM scratch
    vbuf = refs[idx]; idx += 1           # (2, sup, d_v)
    ksem = refs[idx]; idx += 1
    vsem = refs[idx]; idx += 1
    m_scr = refs[idx]; idx += 1
    l_scr = refs[idx]; idx += 1
    acc_scr = refs[idx]; idx += 1
    b = pl.program_id(0)
    hk = pl.program_id(1)
    seqused = seq_ref[b]
    sup = page * pages_per_sup
    nsup = jnp.maximum(pl.cdiv(seqused, sup), 1)
    if window_left >= 0:
        first_sup = jnp.maximum(seqused - sq - window_left, 0) // sup
    else:
        first_sup = jnp.int32(0)

    def issue(sup_idx, slot):
        base = sup_idx * pages_per_sup
        for j in range(pages_per_sup):
            pidx = jnp.minimum(base + j, max_pages - 1)
            pg = table_ref[b, pidx]
            pltpu.make_async_copy(
                k_hbm.at[pg, hk], kbuf.at[slot, pl.ds(j * page, page)],
                ksem.at[slot, j],
            ).start()
            pltpu.make_async_copy(
                v_hbm.at[pg, hk], vbuf.at[slot, pl.ds(j * page, page)],
                vsem.at[slot, j],
            ).start()

    def wait(sup_idx, slot):
        base = sup_idx * pages_per_sup
        for j in range(pages_per_sup):
            pidx = jnp.minimum(base + j, max_pages - 1)
            pg = table_ref[b, pidx]
            pltpu.make_async_copy(
                k_hbm.at[pg, hk], kbuf.at[slot, pl.ds(j * page, page)],
                ksem.at[slot, j],
            ).wait()
            pltpu.make_async_copy(
                v_hbm.at[pg, hk], vbuf.at[slot, pl.ds(j * page, page)],
                vsem.at[slot, j],
            ).wait()

    m_scr[...] = jnp.full_like(m_scr, _MASK2)
    l_scr[...] = jnp.zeros_like(l_scr)
    acc_scr[...] = jnp.zeros_like(acc_scr)

    issue(first_sup, 0)

    q = q_ref[0, 0]  # (rows, d)

    def body(i, _):
        sup_idx = first_sup + i
        slot = jax.lax.rem(i, 2)

        @pl.when(sup_idx + 1 < nsup)
        def _prefetch():
            issue(sup_idx + 1, jax.lax.rem(i + 1, 2))

        wait(sup_idx, slot)
        k = kbuf[slot]  # (sup, d)
        v = vbuf[slot]  # (sup, d_v)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (rows, sup)
        if has_qv:
            # MLA absorbed decode: S += Qv V^T with the latent V reused below.
            s = s + jax.lax.dot_general(
                qv_ref[0, 0], v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        if softcap > 0.0:
            s2 = jnp.tanh(s * (scale / softcap)) * (softcap * LOG2E)
        else:
            s2 = s * (scale * LOG2E)

        r_ids = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        pos_r = seqused - sq + r_ids // group
        cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + sup_idx * sup
        mask = jnp.logical_and(cols < seqused, cols <= pos_r)
        if window_left >= 0:
            mask = jnp.logical_and(mask, cols >= pos_r - window_left)
        s2 = jnp.where(mask, s2, _MASK2)

        m_prev = m_scr[...]
        m_next = jnp.maximum(m_prev, jnp.max(s2, axis=1, keepdims=True))
        alpha = jnp.exp2(m_prev - m_next)
        if s2.shape[1] >= m_next.shape[1]:
            rep = s2.shape[1] // m_next.shape[1]
            m_full = pltpu.repeat(m_next, rep, axis=1) if rep > 1 else m_next
        else:
            m_full = m_next[:, : s2.shape[1]]
        p = jnp.exp2(s2 - m_full)
        p = jnp.where(mask, p, 0.0)
        l_scr[...] = alpha * l_scr[...] + jnp.sum(p, axis=1, keepdims=True)
        m_scr[...] = m_next
        d_rep = acc_scr.shape[1] // alpha.shape[1]
        alpha_full = pltpu.repeat(alpha, d_rep, axis=1) if d_rep > 1 else alpha
        acc_scr[...] = acc_scr[...] * alpha_full + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return 0

    jax.lax.fori_loop(0, nsup - first_sup, body, 0)

    m = m_scr[...][:, 0:1]
    l = l_scr[...][:, 0:1]
    l_inv = jnp.where(l == 0.0, 0.0, 1.0 / l)
    o_ref[0, 0] = (acc_scr[...] * l_inv).astype(out_dtype)
    lse_ref[0, 0] = jnp.where(
        l == 0.0, -jnp.inf, (m + jnp.log2(jnp.maximum(l, 1e-37))) / LOG2E
    )


def flash_attention_decode_multipage(
    q: jnp.ndarray,        # (b, sq, h, d)
    k_pages: jnp.ndarray,  # (npages, hk, page, d)
    v_pages: jnp.ndarray,
    cache_seqlens: jnp.ndarray,  # (b,) total lengths
    block_table: jnp.ndarray,    # (b, max_pages) int32
    *,
    qv: Optional[jnp.ndarray] = None,  # (b, sq, h, d_v) MLA absorbed
    softmax_scale: Optional[float] = None,
    window_left: int = -1,
    softcap: float = 0.0,
    super_block: int = 1024,
    interpret: Optional[bool] = None,
):
    """Small-page decode. Returns (out (b, sq, h, d), lse (b, h, sq))."""
    batch, sq, num_heads, head_dim = q.shape
    npages, num_heads_kv, page, _ = k_pages.shape
    group = num_heads // num_heads_kv
    has_qv = qv is not None
    if softmax_scale is None:
        softmax_scale = (
            (head_dim + v_pages.shape[3]) ** -0.5 if has_qv
            else head_dim**-0.5
        )
    if interpret is None:
        interpret = interpret_mode()
    out_dtype = q.dtype

    sup = max(super_block, page)
    assert sup % page == 0
    pages_per_sup = sup // page
    max_pages = block_table.shape[1]
    # Pad the table so every super-block has full page indices to prefetch.
    if max_pages % pages_per_sup != 0:
        pad = pages_per_sup - max_pages % pages_per_sup
        block_table = jnp.pad(block_table, ((0, 0), (0, pad)))
        max_pages += pad

    d_pad = round_up(head_dim, NUM_LANES)
    head_dim_v = v_pages.shape[3]  # may differ (MLA absorbed decode)
    dv_pad = round_up(head_dim_v, NUM_LANES)
    k_pages = pad_to_block(k_pages, 3, d_pad)
    v_pages = pad_to_block(v_pages, 3, dv_pad)

    def fold(x, dim, pad):
        xr = x.reshape(batch, sq, num_heads_kv, group, dim)
        xr = xr.transpose(0, 2, 1, 3, 4).reshape(
            batch, num_heads_kv, sq * group, dim
        )
        return pad_to_block(pad_to_block(xr, 3, pad), 2, rows)

    rows = round_up(sq * group, 16 if q.dtype.itemsize == 2 else 8)
    qr = fold(q, head_dim, d_pad)

    in_specs = [
        pl.BlockSpec((1, 1, rows, d_pad), lambda b, hk, s, t: (b, hk, 0, 0)),
    ]
    args = [qr]
    if has_qv:
        in_specs.append(
            pl.BlockSpec((1, 1, rows, dv_pad),
                         lambda b, hk, s, t: (b, hk, 0, 0))
        )
        args.append(fold(qv, head_dim_v, dv_pad))
    in_specs += [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    args += [k_pages, v_pages]

    kernel = functools.partial(
        _mp_decode_kernel,
        sq=sq, group=group, rows=rows,
        page=page, pages_per_sup=pages_per_sup, max_pages=max_pages,
        scale=float(softmax_scale), window_left=int(window_left),
        softcap=float(softcap), has_qv=has_qv, out_dtype=out_dtype,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(batch, num_heads_kv),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, rows, dv_pad), lambda b, hk, s, t: (b, hk, 0, 0)),
            pl.BlockSpec((1, 1, rows, 1), lambda b, hk, s, t: (b, hk, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, sup, d_pad), k_pages.dtype),
            pltpu.VMEM((2, sup, dv_pad), v_pages.dtype),
            pltpu.SemaphoreType.DMA((2, pages_per_sup)),
            pltpu.SemaphoreType.DMA((2, pages_per_sup)),
            pltpu.VMEM((rows, NUM_LANES), jnp.float32),
            pltpu.VMEM((rows, NUM_LANES), jnp.float32),
            pltpu.VMEM((rows, dv_pad), jnp.float32),
        ],
    )

    out, lse = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((batch, num_heads_kv, rows, dv_pad), out_dtype),
            jax.ShapeDtypeStruct((batch, num_heads_kv, rows, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(jnp.asarray(cache_seqlens, jnp.int32),
      jnp.asarray(block_table, jnp.int32), *args)

    out = out[:, :, : sq * group, :head_dim_v]
    out = out.reshape(batch, num_heads_kv, sq, group, head_dim_v)
    out = out.transpose(0, 2, 1, 3, 4).reshape(
        batch, sq, num_heads, head_dim_v)
    lse = lse[:, :, : sq * group, 0].reshape(batch, num_heads_kv, sq, group)
    lse = lse.transpose(0, 1, 3, 2).reshape(batch, num_heads, sq)
    return out, lse
