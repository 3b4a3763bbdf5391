"""Pallas TPU decode kernel: attention against a (paged) KV cache.

TPU-native replacement for the reference decode path
(`mha_fwd_kvcache`, csrc/flash_attn/flash_api.cpp:1309; splitkv mainloop
csrc/flash_attn/src/flash_fwd_kernel.h:506; FA3 paged manager
hopper/paged_kv.h; GQA packing hopper/pack_gqa.h).

Design notes (how the GPU concepts map):
  * PackGQA: all `g = h/h_kv` query heads of one KV group are folded into the
    sublane axis of a single tile, so the (rows x d) @ (d x block_kv) matmul
    feeds the MXU even at seqlen_q = 1.
  * Paged KV: the block table is a scalar-prefetch operand; the K/V BlockSpec
    index_map dereferences it, so page gather is plain DMA address
    computation — no gather op, no extra copies (SURVEY.md hard-part #1).
  * Per-batch cache lengths (`cache_seqlens`, reference seqused_k): prefetched
    and used both for element masking and to clamp the kv block index so DMAs
    for out-of-range blocks are elided.
  * Split-KV: the reference splits KV across CTAs for occupancy
    (num_splits_heuristic, flash_api.cpp:307). A TPU core executes the grid
    sequentially, so intra-chip splits buy nothing; the combine math lives in
    `combine_partials` below and is used for cross-chip context parallelism
    instead (hopper/flash_fwd_combine_kernel.h:26).
  * cache_batch_idx: an index indirection in the K/V index_map (prefetched),
    matching flash_api.cpp:648 semantics without a gather.

The kernel treats `cache_seqlens` as the TOTAL valid length (any new tokens
already appended by the caller — see runtime/kv_cache.py for the functional
append that XLA turns into an in-place dynamic-update-slice on donated
buffers, replacing the reference's in-kernel append path).
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
    upcast_quant_tile,
)

_MASK2 = DEFAULT_MASK_VALUE


def _decode_kernel(
    # scalar prefetch:
    seq_ref,          # (b,) total valid lengths
    leftpad_ref,      # (b,) or None
    batchidx_ref,     # (b,) or None
    table_ref,        # (b, max_pages) or None
    # tensor refs:
    *refs,
    sq: int,
    group: int,
    rows: int,        # padded sq*group
    block_kv: int,
    num_kv_blocks: int,
    scale: float,
    causal: bool,
    window_left: int,
    attention_chunk: int,
    sink_token_length: int,
    softcap: float,
    has_leftpad: bool,
    has_qv: bool,
    has_alibi: bool,
    alibi_batched: bool,
    has_sink: bool,
    has_kv_scale: bool,
    kv_scale_batched: bool,
    out_dtype,
):
    idx = 0
    q_ref = refs[idx]; idx += 1
    k_ref = refs[idx]; idx += 1
    v_ref = refs[idx]; idx += 1
    qv_ref = None
    if has_qv:
        qv_ref = refs[idx]; idx += 1
    slopes_ref = sink_ref = kvscale_ref = None
    if has_kv_scale:
        kvscale_ref = refs[idx]; idx += 1  # (2, b|1, hk) SMEM: k/v descales
    if has_alibi:
        slopes_ref = refs[idx]; idx += 1
    if has_sink:
        sink_ref = refs[idx]; idx += 1
    o_ref = refs[idx]; idx += 1
    lse_ref = refs[idx]; idx += 1
    m_scr = refs[idx]; idx += 1
    l_scr = refs[idx]; idx += 1
    acc_scr = refs[idx]; idx += 1

    b = pl.program_id(0)
    hk = pl.program_id(1)
    ki = pl.program_id(2)

    seqused = seq_ref[b]
    leftpad = leftpad_ref[b] if has_leftpad else 0

    @pl.when(ki == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, _MASK2)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    # Visible kv range for this batch: [first_blk, last_blk].
    last_blk = jnp.maximum((seqused - 1) // block_kv, 0)
    if window_left >= 0:
        # Earliest position any new token attends to (most restrictive row
        # is the first new token at position seqused - sq).
        lo = jnp.maximum(seqused - sq - window_left, 0) + leftpad
        first_blk = lo // block_kv
    else:
        first_blk = jnp.int32(0)
    if attention_chunk > 0:
        # Chunked attention (Llama-4 serving): the earliest position any new
        # token can see is the chunk start of the first new token. Chunk
        # coordinates are leftpad-relative (construct_chunk_mask key_leftpad).
        p0 = seqused - sq
        chunk_lo0 = p0 - (p0 - leftpad) % attention_chunk
        first_blk = jnp.maximum(
            first_blk, jnp.maximum(chunk_lo0, 0) // block_kv
        )
    should_run = jnp.logical_and(ki >= first_blk, ki <= last_blk)
    should_run = jnp.logical_and(should_run, ki * block_kv < seqused)
    if sink_token_length > 0:
        should_run = jnp.logical_or(
            should_run, ki * block_kv < leftpad + sink_token_length
        )

    # Interior tiles (strictly inside every row's visible range) skip all
    # masking work; only boundary tiles (the last block, a window's first
    # block, leftpad/sink edges) pay for iota+select — the decode analog of
    # the fwd kernel's masking_steps specialization.
    vis_hi = (seqused - sq) if causal else seqused  # min over rows
    interior = (ki + 1) * block_kv <= vis_hi
    if has_leftpad or sink_token_length > 0:
        interior = jnp.logical_and(
            interior, ki * block_kv >= leftpad + sink_token_length
        )
    if window_left >= 0:
        # Fully inside the window for the most restrictive (first) row.
        interior = jnp.logical_and(
            interior, ki * block_kv >= seqused - sq - window_left
        )
    if attention_chunk > 0:
        # Interior iff all rows share one chunk and the tile lies inside it.
        p0 = seqused - sq
        p1 = seqused - 1
        c0 = p0 - (p0 - leftpad) % attention_chunk
        c1 = p1 - (p1 - leftpad) % attention_chunk
        interior = jnp.logical_and(
            interior,
            jnp.logical_and(
                c0 == c1,
                jnp.logical_and(
                    ki * block_kv >= c0,
                    (ki + 1) * block_kv <= c0 + attention_chunk,
                ),
            ),
        )

    def _compute(with_mask):
        q = q_ref[0, 0]  # (rows, d)
        k = k_ref[0, 0]  # (block_kv, d)
        if k.dtype.itemsize < 2:
            # Quantized KV cache: upcast the K tile; its per-head descale
            # folds into the softmax scale (in-kernel dequant path, maps
            # fp8_kv_dequant, cute/interface.py:482-497). fp8 routes
            # through f32 (see common.upcast_quant_tile).
            k = upcast_quant_tile(k)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (rows, block_kv)

        if has_qv:
            # MLA weight-absorbed decode (FA4 qv / benchmark_mla_decode):
            # S = Q K^T + Qv V^T with the latent V reused as the PV operand.
            qv_t = qv_ref[0, 0]
            v_t = v_ref[0, 0]
            if v_t.dtype.itemsize < 2:
                v_t = upcast_quant_tile(v_t)
            s = s + jax.lax.dot_general(
                qv_t, v_t, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        if has_kv_scale:
            db = b if kv_scale_batched else 0
            scale_dyn = scale * kvscale_ref[0, db, hk]
        else:
            scale_dyn = scale

        if softcap > 0.0:
            s2 = jnp.tanh(s * (scale_dyn / softcap)) * (softcap * LOG2E)
        else:
            s2 = s * (scale_dyn * LOG2E)

        if has_alibi or with_mask:
            # Row r holds query head (r % group) of new token (r // group);
            # its absolute key-position is pos_r = seqused - sq + r//group.
            r_ids = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
            pos_r = seqused - sq + r_ids // group
            cols = (
                jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                + ki * block_kv
            )

        if has_alibi:
            # Per-row slopes in PackGQA order (row r holds q-head r % group
            # of kv group hk), so ALiBi works for any GQA packing — maps
            # mha_fwd_kvcache's unconditional alibi (flash_api.cpp:375,1309).
            slope_rows = slopes_ref[0, 0] * LOG2E  # (rows, 1)
            rel = jnp.abs((cols - pos_r).astype(jnp.float32))
            s2 = s2 - slope_rows * rel

        if with_mask:
            mask = cols < seqused
            if causal:
                mask = jnp.logical_and(mask, cols <= pos_r)
            if has_leftpad:
                mask = jnp.logical_and(mask, cols >= leftpad)
            if window_left >= 0:
                in_window = cols >= pos_r - window_left
                if sink_token_length > 0:
                    in_window = jnp.logical_or(
                        in_window, cols < leftpad + sink_token_length
                    )
                mask = jnp.logical_and(mask, in_window)
            if attention_chunk > 0:
                ch_lo = pos_r - (pos_r - leftpad) % attention_chunk
                mask = jnp.logical_and(
                    mask,
                    jnp.logical_and(
                        cols >= ch_lo, cols < ch_lo + attention_chunk
                    ),
                )
            s2 = jnp.where(mask, s2, _MASK2)

        m_prev = m_scr[...]
        m_cur = jnp.max(s2, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp2(m_prev - m_next)
        if s2.shape[1] >= m_next.shape[1]:
            kv_rep = s2.shape[1] // m_next.shape[1]
            m_full = (
                pltpu.repeat(m_next, kv_rep, axis=1) if kv_rep > 1 else m_next
            )
        else:
            # Small pages (block_kv < lane width): the stats stay
            # lane-replicated at full width; slice for the score tile.
            m_full = m_next[:, : s2.shape[1]]
        p = jnp.exp2(s2 - m_full)
        if with_mask:
            p = jnp.where(mask, p, 0.0)
        l_scr[...] = alpha * l_scr[...] + jnp.sum(p, axis=1, keepdims=True)
        m_scr[...] = m_next

        v = v_ref[0, 0]
        if v.dtype.itemsize < 2:
            v = upcast_quant_tile(v)
        d_rep = acc_scr.shape[1] // alpha.shape[1]
        alpha_full = pltpu.repeat(alpha, d_rep, axis=1) if d_rep > 1 else alpha
        acc_scr[...] = acc_scr[...] * alpha_full + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(jnp.logical_and(should_run, interior))
    def _body_interior():
        _compute(with_mask=False)

    @pl.when(jnp.logical_and(should_run, jnp.logical_not(interior)))
    def _body_edge():
        _compute(with_mask=True)

    @pl.when(ki == num_kv_blocks - 1)
    def _finalize():
        m = m_scr[...][:, 0:1]
        l = l_scr[...][:, 0:1]
        if has_sink:
            # sink_ref holds the per-row sink values (precomputed outside to
            # match the PackGQA row order): block (1, rows, 1).
            sink2 = sink_ref[0] * LOG2E  # (rows, 1)
            l = l + jnp.exp2(sink2 - m)
        l_inv = jnp.where(l == 0.0, 0.0, 1.0 / l)
        if has_kv_scale:
            db = b if kv_scale_batched else 0
            l_inv = l_inv * kvscale_ref[1, db, hk]
        o_ref[0, 0] = (acc_scr[...] * l_inv).astype(out_dtype)
        lse_ref[0, 0] = jnp.where(
            l == 0.0, -jnp.inf, (m + jnp.log2(jnp.maximum(l, 1e-37))) / LOG2E
        )


def flash_attention_decode(
    q: jnp.ndarray,        # (b, sq, h, d) — new query tokens
    k_cache: jnp.ndarray,  # (b, hk, smax, d) or paged (npages, hk, page, d)
    v_cache: jnp.ndarray,
    cache_seqlens: jnp.ndarray,  # (b,) int32 TOTAL valid lengths
    *,
    qv: Optional[jnp.ndarray] = None,  # (b, sq, h, d_v) MLA absorbed scores
    block_table: Optional[jnp.ndarray] = None,  # (b, max_pages) int32
    cache_batch_idx: Optional[jnp.ndarray] = None,  # (b,) int32
    cache_leftpad: Optional[jnp.ndarray] = None,  # (b,) int32
    alibi_slopes: Optional[jnp.ndarray] = None,
    sink: Optional[jnp.ndarray] = None,  # (h,)
    k_scale: Optional[jnp.ndarray] = None,  # (hk,) or (b, hk) cache descale
    v_scale: Optional[jnp.ndarray] = None,
    softmax_scale: Optional[float] = None,
    causal: bool = True,
    window_left: int = -1,
    attention_chunk: int = 0,
    sink_token_length: int = 0,
    softcap: float = 0.0,
    fused_kv_dim: int = 0,  # >0: k_cache is a fused K|V page pool
    fused_kv_dim_v: int = 0,
    block_kv: Optional[int] = None,
    interpret: Optional[bool] = None,
):
    """Decode attention over a KV cache. Returns (out (b, sq, h, d), lse
    (b, h, sq) fp32). Causal within the new tokens (reference semantics:
    query token i of sq attends to cache positions <= seqlen - sq + i)."""
    batch, sq, num_heads, head_dim = q.shape
    paged = block_table is not None
    if fused_kv_dim > 0:
        # Fused K|V page pool (engine-internal layout): only the multipage
        # kernel understands it, and its feature set must suffice. 1-byte
        # (int8/fp8) pools ride the same path with per-head descales — the
        # serving quantized-KV route (fp8_kv_dequant analog,
        # cute/interface.py:482-497).
        assert paged and causal and v_cache is None
        assert sink is None and alibi_slopes is None
        assert cache_leftpad is None and cache_batch_idx is None
        assert sink_token_length == 0 and attention_chunk == 0
        assert not (k_cache.dtype.itemsize == 1 and qv is not None)
        if k_cache.dtype.itemsize >= 2 and (
            k_scale is not None or v_scale is not None
        ):
            raise ValueError(
                "k_scale/v_scale descales are the quantized-pool contract: "
                "a fused K|V pool only carries them when its elements are "
                "1-byte (int8/fp8). For a bf16/fp16 fused pool pass no "
                "descales (fold them into softmax_scale instead)."
            )
        from flash_attn_tpu.kernels.flash_decode_multipage import (
            flash_attention_decode_multipage,
        )
        from flash_attn_tpu.utils.fa_logging import log_dispatch

        log_dispatch("decode", route="multipage-dma-fused",
                     page=k_cache.shape[2], b=batch, h=num_heads,
                     quant=k_cache.dtype.itemsize == 1)
        return flash_attention_decode_multipage(
            q, k_cache, None, cache_seqlens, block_table, qv=qv,
            fused_kv_dim=fused_kv_dim, fused_kv_dim_v=fused_kv_dim_v,
            k_scale=k_scale, v_scale=v_scale,
            softmax_scale=softmax_scale, window_left=window_left,
            softcap=softcap, interpret=interpret,
        )
    # The index-map pipeline pays a fixed per-grid-step cost per page; the
    # manually pipelined multi-page gather kernel (DMA coalescing + aggregate
    # waits) beats it at every page size measured (16 -> ~640 GB/s,
    # 256 -> ~650+ on v5e), so ALL paged decodes route there when its
    # feature set suffices.
    if (
        paged
        and causal
        and sink is None and alibi_slopes is None
        and cache_leftpad is None and cache_batch_idx is None
        and sink_token_length == 0
        and attention_chunk == 0
        and (k_cache.dtype.itemsize >= 2 or qv is None)
        # descales on a >=2-byte cache only exist on the index-map path
        and ((k_scale is None and v_scale is None)
             or k_cache.dtype.itemsize == 1)
    ):
        from flash_attn_tpu.kernels.flash_decode_multipage import (
            flash_attention_decode_multipage,
        )
        from flash_attn_tpu.utils.fa_logging import log_dispatch

        log_dispatch("decode", route="multipage-dma", page=k_cache.shape[2],
                     b=batch, h=num_heads,
                     quant=k_cache.dtype.itemsize == 1)
        return flash_attention_decode_multipage(
            q, k_cache, v_cache, cache_seqlens, block_table, qv=qv,
            k_scale=k_scale, v_scale=v_scale,
            softmax_scale=softmax_scale, window_left=window_left,
            softcap=softcap, interpret=interpret,
        )
    if paged:
        npages, num_heads_kv, page_size, _ = k_cache.shape
        if block_kv is None:
            block_kv = page_size
        assert block_kv == page_size, "paged decode requires block_kv == page_size"
        max_pages = block_table.shape[1]
        num_kv_blocks = max_pages
        smax = max_pages * page_size
        assert cache_batch_idx is None, "cache_batch_idx unsupported with paging"
    else:
        _, num_heads_kv, smax, _ = k_cache.shape
        if block_kv is None:
            block_kv = min(512, round_up(smax, NUM_LANES))
        if (k_cache.dtype.itemsize == 1
                and jnp.issubdtype(k_cache.dtype, jnp.floating)):
            # fp8 KV cache, contiguous layout: one XLA-level upcast pass.
            # Mosaic's in-kernel fp8 convert reads ~60 GB/s of fp8 bytes;
            # XLA's convert runs at HBM speed, so read-N + write-2N +
            # kernel-read-2N beats per-tile dequant ~2.5x (measured; the
            # kv_scale descale still folds in-kernel). Paged pools keep
            # in-kernel dequant — converting a whole serving pool per step
            # would read cold pages.
            k_cache = k_cache.astype(jnp.bfloat16)
            v_cache = v_cache.astype(jnp.bfloat16)
        k_cache = pad_to_block(k_cache, 2, block_kv)
        v_cache = pad_to_block(v_cache, 2, block_kv)
        smax_pad = k_cache.shape[2]
        num_kv_blocks = smax_pad // block_kv

    group = num_heads // num_heads_kv
    has_qv = qv is not None
    if has_qv:
        assert k_scale is None and v_scale is None, \
            "qv is not supported with a quantized KV cache"
    if softmax_scale is None:
        softmax_scale = (
            (head_dim + v_cache.shape[3]) ** -0.5 if has_qv
            else head_dim**-0.5
        )
    if interpret is None:
        interpret = interpret_mode()
    out_dtype = q.dtype if q.dtype.itemsize >= 2 else jnp.bfloat16

    d_pad = round_up(head_dim, NUM_LANES)
    head_dim_v = v_cache.shape[3]  # may differ from head_dim (MLA decode,
    # hopper/benchmark_mla_decode.py: d_qk=576 latent+rope, d_v=512)
    dv_pad = round_up(head_dim_v, NUM_LANES)
    # PackGQA fold: (b, sq, hk, g, d) -> (b, hk, sq*g, d).
    qr = q.reshape(batch, sq, num_heads_kv, group, head_dim)
    qr = qr.transpose(0, 2, 1, 3, 4).reshape(batch, num_heads_kv, sq * group, head_dim)
    rows = round_up(sq * group, {2: 16, 1: 32}.get(qr.dtype.itemsize, 8))
    qr = pad_to_block(pad_to_block(qr, 3, d_pad), 2, rows)
    k_cache = pad_to_block(k_cache, 3, d_pad)
    v_cache = pad_to_block(v_cache, 3, dv_pad)

    seqlens = jnp.asarray(cache_seqlens, jnp.int32)
    has_leftpad = cache_leftpad is not None
    leftpad = (
        jnp.asarray(cache_leftpad, jnp.int32)
        if has_leftpad
        else jnp.zeros((batch,), jnp.int32)
    )
    has_bidx = cache_batch_idx is not None
    bidx = (
        jnp.asarray(cache_batch_idx, jnp.int32)
        if has_bidx
        else jnp.arange(batch, dtype=jnp.int32)
    )
    table = (
        jnp.asarray(block_table, jnp.int32)
        if paged
        else jnp.zeros((batch, 1), jnp.int32)
    )

    # Clamp helper available to index maps through the prefetched seq_ref.
    def kv_index(b, hk, ki, seq_ref, lp_ref, bi_ref, tb_ref):
        last = jnp.maximum((seq_ref[b] - 1) // block_kv, 0)
        kc = jnp.minimum(ki, last)
        if paged:
            return (tb_ref[b, kc], hk, 0, 0)
        return (bi_ref[b], hk, kc, 0)

    in_specs = [
        pl.BlockSpec(
            (1, 1, rows, d_pad),
            lambda b, hk, ki, s, lp, bi, tb: (b, hk, 0, 0),
        ),
        pl.BlockSpec((1, 1, block_kv, d_pad), kv_index),
        pl.BlockSpec((1, 1, block_kv, dv_pad), kv_index),
    ]
    args = [qr, k_cache, v_cache]

    if has_qv:
        qvr = qv.reshape(batch, sq, num_heads_kv, group, head_dim_v)
        qvr = qvr.transpose(0, 2, 1, 3, 4).reshape(
            batch, num_heads_kv, sq * group, head_dim_v
        )
        qvr = pad_to_block(pad_to_block(qvr, 3, dv_pad), 2, rows)
        in_specs.append(
            pl.BlockSpec(
                (1, 1, rows, dv_pad),
                lambda b, hk, ki, s, lp, bi, tb: (b, hk, 0, 0),
            )
        )
        args.append(qvr)

    has_kv_scale = k_scale is not None or v_scale is not None
    kv_scale_batched = False
    if has_kv_scale:
        def norm_scale(x):
            if x is None:
                x = jnp.ones((1, num_heads_kv), jnp.float32)
            x = jnp.asarray(x, jnp.float32)
            return x[None, :] if x.ndim == 1 else x

        ks, vs = norm_scale(k_scale), norm_scale(v_scale)
        kv_scale_batched = ks.shape[0] > 1 or vs.shape[0] > 1
        db = batch if kv_scale_batched else 1
        scale_arr = jnp.stack([
            jnp.broadcast_to(ks, (db, num_heads_kv)),
            jnp.broadcast_to(vs, (db, num_heads_kv)),
        ])
        in_specs.append(
            pl.BlockSpec(
                scale_arr.shape,
                lambda b, hk, ki, s, lp, bi, tb: (0, 0, 0),
                memory_space=pltpu.SMEM,
            )
        )
        args.append(scale_arr)

    has_alibi = alibi_slopes is not None
    alibi_batched = False
    if has_alibi:
        slopes = jnp.asarray(alibi_slopes, jnp.float32)
        if slopes.ndim == 1:
            slopes = slopes[None, :]
        alibi_batched = slopes.shape[0] > 1
        # Decode folds q-heads into rows (PackGQA): row r = si*group + gi of
        # kv group hk carries q-head hk*group + gi. Precompute per-row slopes
        # in that order so any group size works.
        db = slopes.shape[0]
        s_hg = slopes.reshape(db, num_heads_kv, 1, group)
        srows = jnp.tile(s_hg, (1, 1, sq, 1)).reshape(
            db, num_heads_kv, sq * group
        )
        srows = pad_to_block(srows, 2, rows)[..., None]  # (db, hk, rows, 1)
        if alibi_batched:
            in_specs.append(
                pl.BlockSpec(
                    (1, 1, rows, 1),
                    lambda b, hk, ki, s, lp, bi, tb: (b, hk, 0, 0),
                )
            )
        else:
            in_specs.append(
                pl.BlockSpec(
                    (1, 1, rows, 1),
                    lambda b, hk, ki, s, lp, bi, tb: (0, hk, 0, 0),
                )
            )
        args.append(srows)
    has_sink = sink is not None
    if has_sink:
        # Precompute per-row sinks in PackGQA row order r = si*group + gi.
        sink_hg = jnp.asarray(sink, jnp.float32).reshape(num_heads_kv, 1, group)
        sink_rows_arr = jnp.tile(sink_hg, (1, sq, 1)).reshape(
            num_heads_kv, sq * group
        )
        sink_rows_arr = pad_to_block(sink_rows_arr, 1, rows)[..., None]
        in_specs.append(
            pl.BlockSpec(
                (1, rows, 1), lambda b, hk, ki, s, lp, bi, tb: (hk, 0, 0)
            )
        )
        args.append(sink_rows_arr)

    kernel = functools.partial(
        _decode_kernel,
        sq=sq,
        group=group,
        rows=rows,
        block_kv=block_kv,
        num_kv_blocks=num_kv_blocks,
        scale=float(softmax_scale),
        causal=bool(causal),
        window_left=int(window_left),
        attention_chunk=int(attention_chunk),
        sink_token_length=int(sink_token_length),
        softcap=float(softcap),
        has_leftpad=has_leftpad,
        has_qv=has_qv,
        has_alibi=has_alibi,
        alibi_batched=alibi_batched,
        has_sink=has_sink,
        has_kv_scale=has_kv_scale,
        kv_scale_batched=kv_scale_batched,
        out_dtype=out_dtype,
    )

    from flash_attn_tpu.utils.fa_logging import log_dispatch

    log_dispatch("decode", route="index-map", paged=paged, block_kv=block_kv,
                 b=batch, hk=num_heads_kv, rows=rows, qv=has_qv)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(batch, num_heads_kv, num_kv_blocks),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec(
                (1, 1, rows, dv_pad), lambda b, hk, ki, s, lp, bi, tb: (b, hk, 0, 0)
            ),
            pl.BlockSpec(
                (1, 1, rows, 1), lambda b, hk, ki, s, lp, bi, tb: (b, hk, 0, 0)
            ),
        ],
        scratch_shapes=[
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
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(seqlens, leftpad, bidx, table, *args)

    # Unfold PackGQA: (b, hk, rows, d) -> (b, sq, h, d).
    out = out[:, :, : sq * group, :head_dim_v]
    out = out.reshape(batch, num_heads_kv, sq, group, head_dim_v)
    out = out.transpose(0, 2, 1, 3, 4).reshape(batch, sq, num_heads, head_dim_v)
    lse = lse[:, :, : sq * group, 0].reshape(batch, num_heads_kv, sq, group)
    lse = lse.transpose(0, 1, 3, 2).reshape(batch, num_heads, sq)
    return out, lse


def combine_partials(o_parts: jnp.ndarray, lse_parts: jnp.ndarray):
    """LSE-weighted merge of attention partials.

    Maps the reference combine kernel (hopper/flash_fwd_combine_kernel.h:26,
    csrc/flash_attn/src/flash_fwd_kernel.h:1133 combine_attn_seqk_parallel).
    o_parts: (n, ..., d) fp32 partial outputs (each normalized by its own l);
    lse_parts: (n, ...) fp32 partial LSEs. Returns (o, lse).

    On TPU this is a small XLA reduction (fuses into neighbors); it is the
    merge point for split-KV and for cross-chip context parallelism.
    """
    lse_max = jnp.max(lse_parts, axis=0)
    # exp(-inf - -inf) guard: fully-masked partials carry lse = -inf.
    safe_max = jnp.where(jnp.isfinite(lse_max), lse_max, 0.0)
    w = jnp.exp(lse_parts - safe_max)  # (n, ...)
    w = jnp.where(jnp.isfinite(lse_parts), w, 0.0)
    denom = jnp.sum(w, axis=0)
    o = jnp.sum(w[..., None] * o_parts, axis=0)
    o = jnp.where(denom[..., None] == 0.0, 0.0, o / jnp.maximum(denom[..., None], 1e-37))
    lse = jnp.where(denom == 0.0, -jnp.inf, safe_max + jnp.log(jnp.maximum(denom, 1e-37)))
    return o, lse
