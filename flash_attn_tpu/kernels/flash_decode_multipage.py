"""Small-page paged decode: multi-page gather with a manual DMA pipeline.

The index-map paged decode (flash_decode.py) fetches ONE page per grid step;
at vLLM-style page sizes (16-128 tokens) the fixed per-step cost dominates
and bandwidth collapses. This kernel is the second generation of the
multi-page path (the TPU analog of the reference's PagedKVManager TMA
pipeline + `get_pagedkv_tma` routing, hopper/paged_kv.h,
hopper/flash_api.cpp:464):

  * One DMA fetches a page across ALL KV heads (the grid runs over batch
    only; heads are computed in-kernel) — DMA size scales with hk.
  * The host planner marks chunks of C pages whose block-table entries are
    consecutive; those chunks ride ONE contiguous DMA (~64KB+). Serving
    allocators hand out mostly-consecutive pages, so the common case gets
    big DMAs while arbitrary tables still work page-by-page.
  * One semaphore per pipeline slot with a single aggregate byte-count wait
    (TPU DMA semaphores count bytes), instead of a wait per page.
  * The DMA pipeline prefetches ACROSS batch boundaries (slot parity carried
    in SMEM scratch), so the engine never idles between grid steps.

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

# Target contiguous-chunk size for coalesced page DMAs. Swept on v5e at
# b=8/s=4k/hk=2/d=128 across page sizes 16/32/64 x contiguous/permuted:
# 128KB dominates 64KB at every point (worst case +5%, best +28% at
# page=32 permuted); 256KB wins a couple of points but loses badly at
# page=64 (-35% permuted). Single uniform choice: 128KB.
_TARGET_CHUNK_BYTES = 128 * 1024

# VMEM sizing knobs (bytes). Mosaic's scoped-VMEM accounting roughly
# doubles the naive buffer arithmetic (double/triple buffering of blocks,
# lane padding of (…, 1) outputs), so these are set from measured compile
# headroom, not first principles.
import os as _os
_ROW_BUDGET = int(_os.environ.get("FA_MP_ROW_BUDGET", 4 * 1024 * 1024))
_KV_BUDGET = int(_os.environ.get("FA_MP_KV_BUDGET", 8 * 1024 * 1024))


def _mp_decode_kernel(
    seq_ref, table_ref, contig_ref,  # scalar prefetch
    *refs,
    sq: int, group: int, rows: int, hk: int,
    page: int, pages_per_sup: int, chunk_pages: int, max_pages: int,
    scale: float, window_left: int, softcap: float,
    has_qv: bool, out_dtype,
    fused_dim: int = 0,
    quant: bool = False,
):
    # fused_dim > 0: K and V live page-adjacent in ONE pool of last-dim
    # width fused_dim + d_v, so each page gather is a single DMA of twice
    # the size — the lever that matters for permuted small-page tables.
    # quant: the pool is 1-byte (int8/fp8) — pages DMA at HALF the bytes,
    # tiles upcast in VMEM after the gather, and the per-head descales
    # (SMEM (2, hk)) fold into the softmax scale (K) and the output
    # normalizer (V) — the serving fp8_kv_dequant analog
    # (cute/interface.py:482-497) at DMA-pipeline speed.
    fused = fused_dim > 0
    idx = 0
    q_ref = refs[idx]; idx += 1          # (1, hk, rows, d) VMEM
    qv_ref = None
    if has_qv:
        qv_ref = refs[idx]; idx += 1     # (1, hk, rows, d_v) VMEM
    k_hbm = refs[idx]; idx += 1          # (npages, hk, page, d[+d_v]) ANY
    v_hbm = None
    if not fused:
        v_hbm = refs[idx]; idx += 1
    kvscale_ref = None
    if quant:
        kvscale_ref = refs[idx]; idx += 1  # SMEM (2, hk) f32 descales
    o_ref = refs[idx]; idx += 1          # (1, hk, rows, d_v)
    lse_ref = refs[idx]; idx += 1
    kbuf = refs[idx]; idx += 1           # (2, P, hk, page, d[+d_v]) VMEM
    vbuf = vsem = None
    if not fused:
        vbuf = refs[idx]; idx += 1       # (2, P, hk, page, d_v)
    ksem = refs[idx]; idx += 1           # DMA sem (2,)
    if not fused:
        vsem = refs[idx]; idx += 1
    state = refs[idx]; idx += 1          # SMEM (2,): next slot, prefetched?
    m_scr = refs[idx]; idx += 1          # (hk, rows, NUM_LANES)
    l_scr = refs[idx]; idx += 1
    acc_scr = refs[idx]; idx += 1        # (hk, rows, d_v)

    b = pl.program_id(0)
    batch = pl.num_programs(0)
    # Row blocking: big prefill chunks (rows = sq*group) are split over a
    # second grid dim so the all-head softmax scratch and q/out blocks fit
    # VMEM; each row block re-streams the batch's KV.
    rb = pl.program_id(1)
    nrb = pl.num_programs(1)
    P = pages_per_sup
    C = chunk_pages
    sup = page * P

    def first_sup_of(bb):
        seql = seq_ref[bb]
        if window_left >= 0:
            return jnp.maximum(seql - sq - window_left, 0) // sup
        return jnp.int32(0)

    def nsup_of(bb):
        return jnp.maximum(pl.cdiv(seq_ref[bb], sup), 1)

    def issue(bb, sup_idx, slot):
        """Fetch super-block `sup_idx` of batch `bb` into pipeline `slot`.

        Chunks of C consecutive-in-table pages ride one contiguous DMA; the
        rest fall back to per-page (all-head) DMAs. Both paths transfer the
        same byte count into the slot, so one aggregate wait suffices.
        """
        base = sup_idx * P
        for c in range(P // C):
            cbase = base + c * C
            chunk_id = cbase // C
            pg0 = table_ref[bb, jnp.minimum(cbase, max_pages - 1)]
            is_contig = contig_ref[bb, chunk_id] == 1
            if C > 1:
                @pl.when(is_contig)
                def _big():
                    pltpu.make_async_copy(
                        k_hbm.at[pl.ds(pg0, C)],
                        kbuf.at[slot, pl.ds(c * C, C)],
                        ksem.at[slot],
                    ).start()
                    if not fused:
                        pltpu.make_async_copy(
                            v_hbm.at[pl.ds(pg0, C)],
                            vbuf.at[slot, pl.ds(c * C, C)],
                            vsem.at[slot],
                        ).start()

                @pl.when(jnp.logical_not(is_contig))
                def _small():
                    for j in range(C):
                        pidx = jnp.minimum(cbase + j, max_pages - 1)
                        pg = table_ref[bb, pidx]
                        pltpu.make_async_copy(
                            k_hbm.at[pg], kbuf.at[slot, c * C + j],
                            ksem.at[slot],
                        ).start()
                        if not fused:
                            pltpu.make_async_copy(
                                v_hbm.at[pg], vbuf.at[slot, c * C + j],
                                vsem.at[slot],
                            ).start()
            else:
                pltpu.make_async_copy(
                    k_hbm.at[pg0], kbuf.at[slot, c], ksem.at[slot],
                ).start()
                if not fused:
                    pltpu.make_async_copy(
                        v_hbm.at[pg0], vbuf.at[slot, c], vsem.at[slot],
                    ).start()

    def wait_slot(slot):
        # Aggregate wait: DMA semaphores count bytes; one wait for the whole
        # slot regardless of how many descriptors filled it.
        pltpu.make_async_copy(
            k_hbm.at[pl.ds(0, P)], kbuf.at[slot], ksem.at[slot]
        ).wait()
        if not fused:
            pltpu.make_async_copy(
                v_hbm.at[pl.ds(0, P)], vbuf.at[slot], vsem.at[slot]
            ).wait()

    @pl.when(jnp.logical_and(b == 0, rb == 0))
    def _reset():
        state[0] = 0
        state[1] = 0

    seqused = seq_ref[b]
    first_sup = first_sup_of(b)
    nsup = nsup_of(b)
    count = nsup - first_sup
    slot0 = state[0]

    @pl.when(state[1] == 0)
    def _warmup():
        issue(b, first_sup, slot0)

    m_scr[...] = jnp.full_like(m_scr, _MASK2)
    l_scr[...] = jnp.zeros_like(l_scr)
    acc_scr[...] = jnp.zeros_like(acc_scr)

    # Next grid step: another row block of the SAME batch (restart this
    # batch's KV stream) or the next batch's first super-block.
    bnext = jnp.where(rb + 1 < nrb, b, jnp.minimum(b + 1, batch - 1))
    has_next = jnp.logical_or(rb + 1 < nrb, b + 1 < batch)

    def body(i, slot):
        sup_idx = first_sup + i
        nxt_slot = 1 - slot
        is_last = i == count - 1

        @pl.when(jnp.logical_not(is_last))
        def _prefetch_same():
            issue(b, sup_idx + 1, nxt_slot)

        @pl.when(jnp.logical_and(is_last, has_next))
        def _prefetch_next_batch():
            issue(bnext, first_sup_of(bnext), nxt_slot)

        wait_slot(slot)

        for h in range(hk):
            if fused:
                kv = kbuf[slot, :, h].reshape(sup, kbuf.shape[-1])
                k = kv[:, :fused_dim]               # (sup, d)
                v = kv[:, fused_dim:]               # (sup, d_v)
            else:
                k = kbuf[slot, :, h].reshape(sup, kbuf.shape[-1])  # (sup, d)
                v = vbuf[slot, :, h].reshape(sup, vbuf.shape[-1])  # (sup, d_v)
            if quant:
                # Upcast AFTER the half-size DMA; descales fold into
                # scalars (K into the softmax scale, V at finalize). fp8
                # uses the integer-domain bit dequant — engine pools are
                # written subnormal-flushed (quantize_to_cache_dtype), and
                # Mosaic's f32-route fp8 convert measured 66 Gelem/s in
                # this loop vs int8's ~363 class.
                from flash_attn_tpu.kernels.common import (
                    upcast_e4m3_bits,
                    upcast_quant_tile,
                )

                if k.dtype == jnp.float8_e4m3fn:
                    k = upcast_e4m3_bits(k)
                    v = upcast_e4m3_bits(v)
                else:
                    k = upcast_quant_tile(k)
                    v = upcast_quant_tile(v)
            q = q_ref[0, h]  # (rows, d)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (rows, sup)
            if has_qv:
                # MLA absorbed decode: S += Qv V^T, latent V reused below.
                s = s + jax.lax.dot_general(
                    qv_ref[0, h], v, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            scale_h = scale * kvscale_ref[0, h] if quant else scale
            if softcap > 0.0:
                s2 = jnp.tanh(s * (scale_h / softcap)) * (softcap * LOG2E)
            else:
                s2 = s * (scale_h * LOG2E)

            r_ids = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) \
                + rb * rows
            pos_r = seqused - sq + r_ids // group
            cols = (
                jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                + sup_idx * sup
            )
            mask = jnp.logical_and(cols < seqused, cols <= pos_r)
            if window_left >= 0:
                mask = jnp.logical_and(mask, cols >= pos_r - window_left)
            s2 = jnp.where(mask, s2, _MASK2)

            m_prev = m_scr[h]
            m_next = jnp.maximum(m_prev, jnp.max(s2, axis=1, keepdims=True))
            alpha = jnp.exp2(m_prev - m_next)
            if s2.shape[1] >= m_next.shape[1]:
                rep = s2.shape[1] // m_next.shape[1]
                m_full = pltpu.repeat(m_next, rep, axis=1) if rep > 1 else m_next
            else:
                m_full = m_next[:, : s2.shape[1]]
            p = jnp.exp2(s2 - m_full)
            p = jnp.where(mask, p, 0.0)
            l_scr[h] = alpha * l_scr[h] + jnp.sum(p, axis=1, keepdims=True)
            m_scr[h] = m_next
            d_rep = acc_scr.shape[-1] // alpha.shape[-1]
            alpha_full = pltpu.repeat(alpha, d_rep, axis=1) if d_rep > 1 else alpha
            acc_scr[h] = acc_scr[h] * alpha_full + jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        return nxt_slot

    slot_final = jax.lax.fori_loop(0, count, body, slot0)
    state[0] = slot_final
    state[1] = jnp.where(has_next, jnp.int32(1), jnp.int32(0))

    for h in range(hk):
        m = m_scr[h][:, 0:1]
        l = l_scr[h][:, 0:1]
        l_inv = jnp.where(l == 0.0, 0.0, 1.0 / l)
        if quant:
            # V descale folds into the output normalizer (one scalar).
            l_inv = l_inv * kvscale_ref[1, h]
        o_ref[0, h] = (acc_scr[h] * l_inv).astype(out_dtype)
        lse_ref[0, h] = jnp.where(
            l == 0.0, -jnp.inf, (m + jnp.log2(jnp.maximum(l, 1e-37))) / LOG2E
        )


def flash_attention_decode_multipage(
    q: jnp.ndarray,        # (b, sq, h, d)
    k_pages: jnp.ndarray,  # (npages, hk, page, d) — or fused (…, d + d_v)
    v_pages: Optional[jnp.ndarray],
    cache_seqlens: jnp.ndarray,  # (b,) total lengths
    block_table: jnp.ndarray,    # (b, max_pages) int32
    *,
    qv: Optional[jnp.ndarray] = None,  # (b, sq, h, d_v) MLA absorbed
    fused_kv_dim: int = 0,  # >0: k_pages holds K|V fused on the last dim,
                            # K head dim fused_kv_dim; v_pages must be None
    fused_kv_dim_v: int = 0,  # true V head dim in the fused pool
                              # (default: the padded remainder)
    k_scale: Optional[jnp.ndarray] = None,  # (hk,) descales for 1-byte pools
    v_scale: Optional[jnp.ndarray] = None,
    softmax_scale: Optional[float] = None,
    window_left: int = -1,
    softcap: float = 0.0,
    super_block: int = 1024,
    interpret: Optional[bool] = None,
):
    """Small-page decode. Returns (out (b, sq, h, d_v), lse (b, h, sq))."""
    batch, sq, num_heads, head_dim = q.shape
    npages, num_heads_kv, page, _ = k_pages.shape
    group = num_heads // num_heads_kv
    has_qv = qv is not None
    fused = fused_kv_dim > 0
    if fused:
        # Fused pool layout (runtime/kv_cache.py): K at [:, :d] and V at
        # [:, Kpad:Kpad+dv], each section lane-padded. fused_kv_dim is the
        # TRUE K head dim; fused_kv_dim_v the true V head dim.
        assert v_pages is None
        assert head_dim == fused_kv_dim, (head_dim, fused_kv_dim)
        head_dim_v = (
            fused_kv_dim_v
            if fused_kv_dim_v
            else k_pages.shape[3] - round_up(fused_kv_dim, NUM_LANES)
        )
        assert k_pages.shape[3] == (
            round_up(fused_kv_dim, NUM_LANES) + round_up(head_dim_v, NUM_LANES)
        ), (k_pages.shape, fused_kv_dim, head_dim_v)
    else:
        head_dim_v = v_pages.shape[3]  # may differ (MLA absorbed decode)
    if softmax_scale is None:
        softmax_scale = (
            (head_dim + head_dim_v) ** -0.5 if has_qv
            else head_dim**-0.5
        )
    if interpret is None:
        interpret = interpret_mode()
    out_dtype = q.dtype

    quant = k_pages.dtype.itemsize == 1
    if quant:
        assert not has_qv, "qv unsupported with a quantized pool"
        num_hk = k_pages.shape[1]
        k_scale = (
            jnp.ones((num_hk,), jnp.float32) if k_scale is None
            else jnp.asarray(k_scale, jnp.float32).reshape(num_hk)
        )
        v_scale = (
            jnp.ones((num_hk,), jnp.float32) if v_scale is None
            else jnp.asarray(v_scale, jnp.float32).reshape(num_hk)
        )
    else:
        assert k_scale is None and v_scale is None

    d_pad = round_up(head_dim, NUM_LANES)
    dv_pad = round_up(head_dim_v, NUM_LANES)
    if not fused:
        k_pages = pad_to_block(k_pages, 3, d_pad)
        v_pages = pad_to_block(v_pages, 3, dv_pad)
    itemsize = k_pages.dtype.itemsize

    # Row blocking: the softmax scratch (m/l/acc fp32) and the q/out
    # blocks scale with rows = sq*group across ALL kv heads; big prefill
    # chunks otherwise blow the 16MB scoped-VMEM limit. Rows are split
    # over a second grid dimension (each row block re-streams the KV).
    row_unit = 16 if q.dtype.itemsize == 2 else 8
    rows_total = round_up(sq * group, row_unit)
    per_row = (
        4 * num_heads_kv * (2 * NUM_LANES + dv_pad)  # m, l, acc fp32
        + 2 * 2 * num_heads_kv * itemsize * (
            d_pad + dv_pad + (dv_pad if has_qv else 0)
        )  # q, out (+qv), double-buffered
    )
    rows = rows_total
    while rows > row_unit and rows * per_row > _ROW_BUDGET:
        rows = round_up(rows // 2, row_unit)
    nrb = cdiv(rows_total, rows)
    rows_padded = nrb * rows

    # Super-block sizing under a VMEM budget (two slots of K and V
    # buffers), net of the row-block reserve above. Capped at the pool
    # size: every DMA slice's STATIC size must fit the page array (tiny
    # pools otherwise trace ds(0, P) > npages).
    budget = max(2 * 1024 * 1024, _KV_BUDGET - rows * per_row)
    sup = max(super_block, page)
    per_tok = num_heads_kv * (d_pad + dv_pad) * itemsize
    while sup > page and 2 * sup * per_tok > budget:
        sup //= 2
    if npages * page < sup:
        # The kernel's lane-replicated softmax stats need sup to stay a
        # multiple of 128 (when >= 128) as well as of page.
        import math

        step = math.lcm(page, NUM_LANES)
        cap = (npages * page // step) * step
        sup = cap if cap >= step else npages * page
    sup = max(page, (sup // page) * page)
    pages_per_sup = sup // page
    max_pages = block_table.shape[1]
    # Pad the table so every super-block has full page indices to prefetch.
    if max_pages % pages_per_sup != 0:
        pad = pages_per_sup - max_pages % pages_per_sup
        block_table = jnp.pad(block_table, ((0, 0), (0, pad)))
        max_pages += pad

    # Coalescing chunk: C pages per contiguous DMA.
    page_bytes = num_heads_kv * page * (
        d_pad + dv_pad if fused else d_pad
    ) * itemsize
    chunk_pages = max(1, min(pages_per_sup,
                             _TARGET_CHUNK_BYTES // max(page_bytes, 1)))
    while pages_per_sup % chunk_pages != 0:
        chunk_pages -= 1

    table = jnp.asarray(block_table, jnp.int32)
    if chunk_pages > 1:
        tt = table.reshape(batch, -1, chunk_pages)
        contig = jnp.all(
            tt == tt[..., :1] + jnp.arange(chunk_pages, dtype=jnp.int32),
            axis=-1,
        ).astype(jnp.int32)
    else:
        contig = jnp.zeros((batch, max_pages), jnp.int32)

    def fold(x, dim, pad):
        xr = x.reshape(batch, sq, num_heads_kv, group, dim)
        xr = xr.transpose(0, 2, 1, 3, 4).reshape(
            batch, num_heads_kv, sq * group, dim
        )
        return pad_to_block(pad_to_block(xr, 3, pad), 2, rows_padded)

    qr = fold(q, head_dim, d_pad)

    in_specs = [
        pl.BlockSpec((1, num_heads_kv, rows, d_pad),
                     lambda b, rb, s, t, c: (b, 0, rb, 0)),
    ]
    args = [qr]
    if has_qv:
        in_specs.append(
            pl.BlockSpec((1, num_heads_kv, rows, dv_pad),
                         lambda b, rb, s, t, c: (b, 0, rb, 0))
        )
        args.append(fold(qv, head_dim_v, dv_pad))
    if fused:
        in_specs += [pl.BlockSpec(memory_space=pl.ANY)]
        args += [k_pages]
    else:
        in_specs += [
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ]
        args += [k_pages, v_pages]
    if quant:
        in_specs.append(
            pl.BlockSpec((2, num_heads_kv), lambda b, rb, s, t, c: (0, 0),
                         memory_space=pltpu.SMEM)
        )
        args.append(jnp.stack([k_scale, v_scale]))

    kernel = functools.partial(
        _mp_decode_kernel,
        sq=sq, group=group, rows=rows, hk=num_heads_kv,
        page=page, pages_per_sup=pages_per_sup, chunk_pages=chunk_pages,
        max_pages=max_pages,
        scale=float(softmax_scale), window_left=int(window_left),
        softcap=float(softcap), has_qv=has_qv, out_dtype=out_dtype,
        fused_dim=d_pad if fused else 0,
        quant=quant,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(batch, nrb),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, num_heads_kv, rows, dv_pad),
                         lambda b, rb, s, t, c: (b, 0, rb, 0)),
            pl.BlockSpec((1, num_heads_kv, rows, 1),
                         lambda b, rb, s, t, c: (b, 0, rb, 0)),
        ],
        scratch_shapes=(
            [
                pltpu.VMEM(
                    (2, pages_per_sup, num_heads_kv, page, d_pad + dv_pad),
                    k_pages.dtype,
                ),
                pltpu.SemaphoreType.DMA((2,)),
            ]
            if fused
            else [
                pltpu.VMEM((2, pages_per_sup, num_heads_kv, page, d_pad),
                           k_pages.dtype),
                pltpu.VMEM((2, pages_per_sup, num_heads_kv, page, dv_pad),
                           v_pages.dtype),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ]
        )
        + [
            pltpu.SMEM((2,), jnp.int32),
            pltpu.VMEM((num_heads_kv, rows, NUM_LANES), jnp.float32),
            pltpu.VMEM((num_heads_kv, rows, NUM_LANES), jnp.float32),
            pltpu.VMEM((num_heads_kv, rows, dv_pad), jnp.float32),
        ],
    )

    out, lse = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(
                (batch, num_heads_kv, rows_padded, dv_pad), out_dtype),
            jax.ShapeDtypeStruct(
                (batch, num_heads_kv, rows_padded, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(jnp.asarray(cache_seqlens, jnp.int32), table, contig, *args)

    out = out[:, :, : sq * group, :head_dim_v]
    out = out.reshape(batch, num_heads_kv, sq, group, head_dim_v)
    out = out.transpose(0, 2, 1, 3, 4).reshape(
        batch, sq, num_heads, head_dim_v)
    lse = lse[:, :, : sq * group, 0].reshape(batch, num_heads_kv, sq, group)
    lse = lse.transpose(0, 1, 3, 2).reshape(batch, num_heads, sq)
    return out, lse
