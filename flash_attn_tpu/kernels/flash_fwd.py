"""Pallas TPU flash-attention forward kernel (dense, fixed-length).

This is the TPU-native replacement for the reference's forward mainloops
(csrc/flash_attn/src/flash_fwd_kernel.h:55 `compute_attn_1rowblock`,
hopper/flash_fwd_kernel_sm90.h:28 `FlashAttnFwdSm90`). The GPU design —
warp-specialized producer/consumer pipelines, TMA, online softmax in
registers — maps onto a Pallas grid with automatically double-buffered
HBM→VMEM block pipelines and fp32 VMEM scratch accumulators.

Feature lattice (one kernel, not four generations):
  * online softmax in base-2 (exp2 on the VPU is the fast path; the
    softmax scale is folded into a single multiply with log2(e))
  * bottom-right-aligned causal + sliding-window + attention-sink-token
    masking (semantics of flash_attn/utils/testing.py:228 `attention_ref`
    and csrc/flash_attn/src/mask.h)
  * block-level skipping of fully-masked KV tiles: the kv grid index is
    clamped in the BlockSpec index_map so Pallas skips the HBM→VMEM DMA
    for revisited blocks, and compute is predicated off with pl.when —
    the TPU analog of the reference's tile-bound logic (hopper/block.h)
  * GQA/MQA by indexing K/V blocks at h_q // group_size
    (maps kernel_traits + pack_gqa.h head mapping)
  * ALiBi (csrc/flash_attn/src/alibi.h), additive bias, softcap
    (tanh capping, hopper/softmax.h), learnable per-head sink (s_aux,
    hopper/flash_api.cpp s_aux param)
  * dropout with counter-based PRNG seeded per (batch, head, q-block,
    kv-block) so the backward kernels regenerate identical masks
    (maps csrc/flash_attn/src/dropout.h + philox.cuh)
  * fp32 LSE output for the backward pass / split-combine merges
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flash_attn_tpu.kernels.common import (
    DEFAULT_MASK_VALUE,
    LOG2E,
    NUM_LANES,
    AuxData,
    BlockSizes,
    call_mod,
    cdiv,
    choose_block_sizes,
    interpret_mode,
    is_local,
    make_causal_window_bounds,
    normalize_window,
    pad_aux_table,
    pad_to_block,
    round_up,
    upcast_quant_tile,
)

# Mask value used in base-2 log space. Kept finite (never -inf) so
# exp2(m - m) can't produce NaN; must NOT overflow float32 when compared or
# subtracted, so we use the same -0.7*float32_max as the natural-log path.
_MASK2 = DEFAULT_MASK_VALUE


def _dropout_keep_mask(seed_ref, b, h, row0, col0, shape, keep_prob: float):
    """Deterministic keep-mask from a counter-based hash PRNG.

    Keyed on (seed, batch, head, absolute row, absolute col) — NOT on tile
    coordinates — so the backward kernels regenerate the identical mask under
    any tiling, and the same bits come out in compiled and interpreter mode.
    This is the TPU version of Philox offset bookkeeping
    (csrc/flash_attn/src/dropout.h:16), built from a murmur3-style finalizer
    on the VPU instead of the hardware PRNG (which has no CPU lowering).
    """
    rows = (jax.lax.broadcasted_iota(jnp.int32, shape, 0) + row0).astype(jnp.uint32)
    cols = (jax.lax.broadcasted_iota(jnp.int32, shape, 1) + col0).astype(jnp.uint32)
    base = (
        seed_ref[0, 0].astype(jnp.uint32) * jnp.uint32(0x27D4EB2F)
        + jnp.uint32(b).astype(jnp.uint32) * jnp.uint32(0x165667B1)
        + jnp.uint32(h).astype(jnp.uint32) * jnp.uint32(0x9E3779B9)
    )
    x = rows * jnp.uint32(0x9E3779B1) ^ cols * jnp.uint32(0x85EBCA77) ^ base
    # murmur3 fmix32
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    threshold = jnp.uint32(min(int(keep_prob * (2**32)), 2**32 - 1))
    return x < threshold


def _fwd_kernel(
    # dynamic refs (optional ones present only when enabled):
    *refs,
    # static config:
    seqlen_q: int,
    seqlen_k: int,
    block_q: int,
    block_kv: int,
    num_kv_blocks: int,
    scale: float,
    causal: bool,
    window: Tuple[int, int],
    attention_chunk: int,
    sink_token_length: int,
    softcap: float,
    dropout_p: float,
    group_size: int,
    has_bias: bool,
    has_alibi: bool,
    alibi_batched: bool,
    has_sink: bool,
    has_segments: bool,
    has_descale: bool,
    descale_batched: bool,
    has_qv: bool = False,
    cp_world_size: int = 1,
    cp_rank: int = 0,
    cp_tot_seqlen_k: int = 0,
    output_scale: float = 1.0,
    score_mod=None,
    mask_mod=None,
    num_aux: int = 0,
    aux_shapes: tuple = (),
    num_aux_scalars: int = 0,
    out_dtype=None,
    fold_r: int = 0,
    fold_num_q: int = 0,
):
    # Unpack refs in canonical order.
    idx = 0
    q_ref = refs[idx]; idx += 1
    k_ref = refs[idx]; idx += 1
    v_ref = refs[idx]; idx += 1
    qv_ref = None
    if has_qv:
        qv_ref = refs[idx]; idx += 1
    bias_ref = None
    slopes_ref = None
    sink_ref = None
    seed_ref = None
    qseg_ref = None
    kseg_ref = None
    descale_ref = None
    if has_descale:
        descale_ref = refs[idx]; idx += 1  # (3, b|1, hk) SMEM: q/k/v descales
    if has_bias:
        bias_ref = refs[idx]; idx += 1
    if has_alibi:
        slopes_ref = refs[idx]; idx += 1
    if has_sink:
        sink_ref = refs[idx]; idx += 1
    if dropout_p > 0.0:
        seed_ref = refs[idx]; idx += 1
    if has_segments:
        qseg_ref = refs[idx]; idx += 1
        kseg_ref = refs[idx]; idx += 1
    aux_refs = []
    for _ in range(num_aux):
        aux_refs.append(refs[idx]); idx += 1
    auxsc_ref = None
    if num_aux_scalars:
        auxsc_ref = refs[idx]; idx += 1
    o_ref = refs[idx]; idx += 1
    lse_ref = refs[idx]; idx += 1
    m_scr = refs[idx]; idx += 1
    l_scr = refs[idx]; idx += 1
    acc_scr = refs[idx]; idx += 1

    b = pl.program_id(0)
    h = pl.program_id(1)
    if fold_r > 0:
        # Folded causal grid (see flash_attention_fwd): q tile p is paired
        # with q tile N-1-p so every (pair, j) row covers exactly
        # r*(N+1) visible tiles — no predicated-off grid steps, closed-form
        # index arithmetic (the TPU answer to the reference's per-CTA
        # variable trip count, flash_fwd_kernel.h:55 n_block_max).
        p = pl.program_id(2)
        j = pl.program_id(3)
        fold_j_total = fold_r * (fold_num_q + 1)
        cross = fold_r * (p + 1)
        in_first = j < cross
        qi = jnp.where(in_first, p, fold_num_q - 1 - p)
        ki = jnp.where(in_first, j, j - cross)
        chain_start = jnp.logical_or(j == 0, j == cross)
        chain_end = jnp.logical_or(j == cross - 1, j == fold_j_total - 1)
        should_run = jnp.bool_(True)
    else:
        qi = pl.program_id(2)
        ki = pl.program_id(3)
        chain_start = ki == 0
        chain_end = ki == num_kv_blocks - 1

    # Folded-grid chains start on always-live steps, so chain start can be
    # folded into the compute step (write-through: scalar-predicated selects
    # gate out stale scratch — no zero-fill region, shorter chain-boundary
    # bubble). Unfolded grids qualify too when the ki==0 step is provably
    # live for every chain: only a left window or chunked attention can
    # raise min_kv_blk above 0 (causal/dense always see kv block 0).
    write_through = fold_r > 0 or (
        not is_local(window) and attention_chunk == 0
    )
    if not write_through:
        @pl.when(chain_start)
        def _init():
            m_scr[...] = jnp.full_like(m_scr, _MASK2)
            l_scr[...] = jnp.zeros_like(l_scr)
            acc_scr[...] = jnp.zeros_like(acc_scr)

    if fold_r > 0:
        pass  # every grid step is a visible tile by construction
    else:
        min_kv_blk, max_kv_blk = make_causal_window_bounds(
            seqlen_q=seqlen_q,
            seqlen_k=seqlen_k,
            # Round-robin CP interleaves absolute columns across ranks, so
            # local-unit block bounds do not apply; fall back to full range
            # (element masking stays exact).
            window=window if cp_world_size == 1 else (-1, -1),
            block_q=block_q,
            block_kv=block_kv,
            num_kv_blocks=num_kv_blocks,
            attention_chunk=attention_chunk if cp_world_size == 1 else 0,
        )
        if cp_world_size > 1:
            should_run = jnp.bool_(True)
        else:
            should_run = jnp.logical_and(
                ki >= min_kv_blk(qi), ki <= max_kv_blk(qi)
            )
        # Sink tokens re-enable the first blocks even outside the window.
        if sink_token_length > 0:
            should_run = jnp.logical_or(
                should_run, ki * block_kv < sink_token_length
            )

    # Does this (qi, ki) tile need element-level masking at all? Static
    # masking work is skipped entirely for pure-interior tiles of the
    # non-causal aligned case.
    needs_mask = (
        causal
        or is_local(window)
        or attention_chunk > 0
        or has_segments
        or (mask_mod is not None)
        or (cp_world_size > 1)
        or (seqlen_k % block_kv != 0)
        or (seqlen_q % block_q != 0)
    )

    if num_aux or num_aux_scalars:
        # Runtime captures for mods (FA4 aux_tensors/aux_scalars): whole
        # arrays loaded from VMEM, scalars from SMEM, reshaped back to the
        # caller's original shapes at trace time.
        aux = AuxData(
            tensors=tuple(
                r[...].reshape(shp) for r, shp in zip(aux_refs, aux_shapes)
            ),
            scalars=tuple(
                auxsc_ref[0, i] for i in range(num_aux_scalars)
            ),
        )
    else:
        aux = None

    def _compute(with_mask: bool):
        q = q_ref[0, 0]  # (block_q, d)
        k = k_ref[0, 0]  # (block_kv, d)
        # Quantized inputs (fp8/int8): the per-(batch, head) descales are
        # scalars, so dot(q_quant, k_quant) * q_descale * k_descale is exact
        # dequantization folded into the softmax scale — no per-element
        # multiplies (maps hopper FP8 descale params,
        # hopper/flash_api_torch_lib.cpp:275-277). int8 inputs ride the
        # int8 MXU path with an int32 accumulator.
        if q.dtype == jnp.int8 and k.dtype == jnp.int8:
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
        else:
            qc = upcast_quant_tile(q)
            kc = upcast_quant_tile(k)
            s = jax.lax.dot_general(
                qc, kc, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (block_q, block_kv)

        if has_qv:
            # MLA weight-absorbed scores (FA4 qv, cute/interface.py:3066):
            # S = Q K^T + Qv V^T, with V reused as the PV operand below.
            qv_t = qv_ref[0, 0]
            v_t = v_ref[0, 0]
            if v_t.dtype.itemsize < 2:
                v_t = upcast_quant_tile(v_t)
            if qv_t.dtype.itemsize < 2:
                qv_t = upcast_quant_tile(qv_t)
            s = s + jax.lax.dot_general(
                qv_t, v_t, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        if has_descale:
            db = b if descale_batched else 0
            scale_dyn = scale * descale_ref[0, db, h // group_size] \
                * descale_ref[1, db, h // group_size]
        else:
            scale_dyn = scale

        if softcap > 0.0:
            s_nat = jnp.tanh(s * (scale_dyn / softcap)) * softcap
        elif score_mod is not None:
            s_nat = s * scale_dyn
        else:
            s_nat = None  # fold scale into the LOG2E multiply below
        if score_mod is not None:
            # FA4-style programmable attention: a traced callable inlined
            # into the kernel at trace time (cute/interface.py:363-427
            # score_mod; trivial in Pallas — mods are just JAX functions).
            sm_rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) \
                + qi * block_q
            sm_cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) \
                + ki * block_kv
            s_nat = call_mod(
                score_mod, s_nat, b, h, sm_rows, sm_cols, aux=aux
            ).astype(jnp.float32)
        if s_nat is None:
            # Fold scale and the base-2 conversion into ONE tile-wide
            # multiply — Mosaic does no algebraic simplification, so
            # (s*a)*b is two VPU passes over the full tile as written.
            s2 = s * (scale_dyn * LOG2E)
        else:
            s2 = s_nat * LOG2E

        if has_alibi:
            slope2 = slopes_ref[b if alibi_batched else 0, h] * LOG2E
            rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + qi * block_q
            cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ki * block_kv
            rel = jnp.abs(
                (cols - rows - (seqlen_k - seqlen_q)).astype(jnp.float32)
            )
            s2 = s2 - slope2 * rel

        if has_bias:
            s2 = s2 + bias_ref[0, 0].astype(jnp.float32) * LOG2E

        if with_mask:
            rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + qi * block_q
            cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ki * block_kv
            mask = cols < seqlen_k
            offset = seqlen_k - seqlen_q
            if cp_world_size > 1:
                # Context parallelism, round-robin KV sharding: this rank
                # holds keys with absolute index local*W + rank
                # (hopper/mask.h:103-105); causal/window align against the
                # TOTAL key length across ranks (hopper/seqlen.h:59).
                cols = cols * cp_world_size + cp_rank
                offset = cp_tot_seqlen_k - seqlen_q
            left, right = window
            if causal or right >= 0:
                r = 0 if causal and right < 0 else right
                mask = jnp.logical_and(mask, cols <= rows + offset + r)
            if left >= 0:
                in_window = cols >= rows + offset - left
                if sink_token_length > 0:
                    in_window = jnp.logical_or(in_window, cols < sink_token_length)
                mask = jnp.logical_and(mask, in_window)
            if attention_chunk > 0:
                # Chunked (Llama-4-style) attention: keep only keys inside
                # the query row's own chunk (construct_chunk_mask,
                # flash_attn/utils/testing.py:195).
                diag = rows + offset
                chunk_lo = diag - diag % attention_chunk
                mask = jnp.logical_and(
                    mask,
                    jnp.logical_and(
                        cols >= chunk_lo, cols < chunk_lo + attention_chunk
                    ),
                )
            if has_segments:
                qseg = qseg_ref[0, :, 0]  # (block_q,)
                kseg = kseg_ref[0, :, 0]  # (block_kv,)
                mask = jnp.logical_and(mask, qseg[:, None] == kseg[None, :])
            if mask_mod is not None:
                # flex-attention mask_mod (cute/mask.py:21-49 shim).
                mask = jnp.logical_and(
                    mask, call_mod(mask_mod, b, h, rows, cols, aux=aux)
                )
            m_in = jnp.where(mask, s2, _MASK2)
        else:
            mask = None
            m_in = s2

        # Softmax statistics are kept lane-replicated (block_q, 128) so every
        # update is a full-width VPU op; single-lane broadcasts are slow.
        if write_through:
            m_prev = jnp.where(
                chain_start, jnp.full_like(m_scr, _MASK2), m_scr[...]
            )
        else:
            m_prev = m_scr[...]  # (block_q, 128)
        m_cur = jnp.max(m_in, axis=1, keepdims=True)  # (block_q, 1)
        m_next = jnp.maximum(m_prev, m_cur)  # lane-replicated (block_q, 128)
        alpha = jnp.exp2(m_prev - m_next)

        kv_rep = s2.shape[1] // m_next.shape[1]
        m_full = pltpu.repeat(m_next, kv_rep, axis=1) if kv_rep > 1 else m_next
        # exp2 of the MASKED scores: masked elements sit at the finite
        # _MASK2, so p underflows to exactly 0 whenever the row has any
        # visible element — no second where on p. Fully-empty rows carry
        # junk p that the finalize zeroes via m == _MASK2.
        p = jnp.exp2(m_in - m_full)

        if write_through:
            l_prev = jnp.where(chain_start, jnp.zeros_like(l_scr), l_scr[...])
        else:
            l_prev = l_scr[...]
        l_scr[...] = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_scr[...] = m_next

        if dropout_p > 0.0:
            keep = _dropout_keep_mask(
                seed_ref, b, h, qi * block_q, ki * block_kv, p.shape,
                1.0 - dropout_p,
            )
            p = jnp.where(keep, p, 0.0)

        v = v_ref[0, 0]  # (block_kv, d)
        if v.dtype.itemsize < 2:
            # Quantized V: upcast the tile; its descale is folded into the
            # finalize normalizer (fp8_kv_dequant, cute/interface.py:482-497).
            v = upcast_quant_tile(v)
        d_rep = acc_scr.shape[1] // alpha.shape[1]
        alpha_full = pltpu.repeat(alpha, d_rep, axis=1) if d_rep > 1 else alpha
        if write_through:
            acc_prev = jnp.where(
                chain_start, jnp.zeros_like(acc_scr), acc_scr[...]
            )
        else:
            acc_prev = acc_scr[...]
        acc_scr[...] = acc_prev * alpha_full + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    if not needs_mask:
        @pl.when(should_run)
        def _body_fast():
            _compute(with_mask=False)
    else:
        # Specialize: interior tiles (fully inside the valid/causal/window
        # region) skip every mask op — only diagonal/edge tiles pay for the
        # iota+select work. This is the TPU analog of the reference's
        # separate masked/unmasked mainloop iterations
        # (csrc/flash_attn/src/flash_fwd_kernel.h: masking_steps).
        row_lo = qi * block_q
        row_hi = row_lo + block_q - 1
        col_lo = ki * block_kv
        col_hi = col_lo + block_kv - 1
        offset = seqlen_k - seqlen_q
        if cp_world_size > 1:
            col_lo = col_lo * cp_world_size + cp_rank
            col_hi = col_hi * cp_world_size + cp_rank
            offset = cp_tot_seqlen_k - seqlen_q
            # col_hi < seqlen_k check below is in LOCAL units; replace.
        left, right = window
        interior = (
            col_hi < seqlen_k if cp_world_size == 1
            else (ki + 1) * block_kv <= seqlen_k
        )
        if causal or right >= 0:
            r = 0 if causal and right < 0 else right
            interior = jnp.logical_and(interior, col_hi <= row_lo + offset + r)
        if left >= 0:
            interior = jnp.logical_and(interior, col_lo >= row_hi + offset - left)
        if attention_chunk > 0:
            # Interior iff every row of the tile shares one chunk and the
            # whole kv tile lies inside it.
            d_lo = row_lo + offset
            d_hi = row_hi + offset
            cs_lo = d_lo - d_lo % attention_chunk
            cs_hi = d_hi - d_hi % attention_chunk
            interior = jnp.logical_and(
                interior,
                jnp.logical_and(
                    cs_lo == cs_hi,
                    jnp.logical_and(
                        col_lo >= cs_lo, col_hi < cs_lo + attention_chunk
                    ),
                ),
            )
        if has_segments or mask_mod is not None:
            interior = False
        if seqlen_q % block_q != 0:
            # Padded q rows are sliced off afterwards; no masking needed
            # on their account.
            pass

        @pl.when(jnp.logical_and(should_run, interior))
        def _body_interior():
            _compute(with_mask=False)

        @pl.when(jnp.logical_and(should_run, jnp.logical_not(interior)))
        def _body_edge():
            _compute(with_mask=True)

    @pl.when(chain_end)
    def _finalize():
        m = m_scr[...][:, 0:1]  # (block_q, 1), base-2 units
        l = l_scr[...][:, 0:1]
        if has_sink:
            sink2 = sink_ref[0, h] * LOG2E
            l = l + jnp.exp2(sink2 - m)
            empty = l == 0.0  # sink keeps the pre-junk-l semantics (l=inf)
        else:
            # Rows with no visible element keep m == _MASK2 exactly; their
            # accumulated p is junk (no p-masking in the mainloop).
            empty = jnp.logical_or(l == 0.0, m == _MASK2)
        l_inv = jnp.where(empty, 0.0, 1.0 / l)
        if dropout_p > 0.0:
            l_inv = l_inv * (1.0 / (1.0 - dropout_p))
        if has_descale:
            db = b if descale_batched else 0
            l_inv = l_inv * descale_ref[2, db, h // group_size]
        if output_scale != 1.0:
            # Fused output quantization scale (FA4 output_scale,
            # cute/interface.py:420-424) — folded into the normalizer.
            l_inv = l_inv * output_scale
        o_ref[0, 0] = (acc_scr[...] * l_inv).astype(out_dtype)
        lse = jnp.where(
            empty,
            -jnp.inf,
            (m + jnp.log2(jnp.maximum(l, 1e-37))) / LOG2E,
        )
        lse_ref[0, 0] = lse  # (block_q, 1)


def flash_attention_fwd(
    q: jnp.ndarray,  # (b, h, seqlen_q, d)
    k: jnp.ndarray,  # (b, h_kv, seqlen_k, d)
    v: jnp.ndarray,  # (b, h_kv, seqlen_k, d)
    *,
    qv: Optional[jnp.ndarray] = None,  # (b, h, seqlen_q, d_v) MLA absorbed
    bias: Optional[jnp.ndarray] = None,  # (b|1, h|1, seqlen_q, seqlen_k)
    alibi_slopes: Optional[jnp.ndarray] = None,  # (h,) or (b, h)
    sink: Optional[jnp.ndarray] = None,  # (h,) learnable attention sink
    q_segment_ids: Optional[jnp.ndarray] = None,  # (b, seqlen_q) int32
    kv_segment_ids: Optional[jnp.ndarray] = None,  # (b, seqlen_k) int32
    q_descale: Optional[jnp.ndarray] = None,  # (b, hk) or (hk,) fp32
    k_descale: Optional[jnp.ndarray] = None,
    v_descale: Optional[jnp.ndarray] = None,
    softmax_scale: Optional[float] = None,
    causal: bool = False,
    window_size: Tuple[int, int] = (-1, -1),
    attention_chunk: int = 0,  # Llama-4-style chunked attention (FA3/FA4)
    sink_token_length: int = 0,
    softcap: float = 0.0,
    dropout_p: float = 0.0,
    dropout_seed: Optional[jnp.ndarray] = None,
    score_mod=None,  # callable(scores, b, h, q_idx, kv_idx[, aux]) -> scores
    mask_mod=None,   # callable(b, h, q_idx, kv_idx[, aux]) -> bool keep-mask
    aux_tensors=(),  # runtime arrays consumable by mods (FA4 aux_tensors)
    aux_scalars=(),  # runtime fp32 scalars (FA4 aux_scalars)
    cp_world_size: int = 1,  # round-robin context parallelism (FA3 CP args)
    cp_rank: int = 0,
    cp_tot_seqlen_k: Optional[int] = None,
    output_scale: float = 1.0,   # fused output quant scale (FA4)
    out_quant_dtype=None,        # e.g. jnp.float8_e4m3fn with output_scale
    block_sizes: Optional[BlockSizes] = None,
    interpret: Optional[bool] = None,
):
    """Dense flash-attention forward. Returns (out, lse).

    out: (b, h, seqlen_q, d) in q.dtype; lse: (b, h, seqlen_q) fp32,
    natural-log sum-exp of the scaled scores (reference `softmax_lse`).
    """
    batch, num_heads, seqlen_q, head_dim = q.shape
    _, num_heads_kv, seqlen_k, _ = k.shape
    assert num_heads % num_heads_kv == 0
    group_size = num_heads // num_heads_kv
    has_qv = qv is not None
    if has_qv:
        assert qv.shape[:3] == q.shape[:3] and qv.shape[3] == v.shape[3], (
            qv.shape, q.shape, v.shape)
        assert q.dtype.itemsize >= 2, "qv is not supported with int8/fp8 QKV"
    if softmax_scale is None:
        # With qv the reference defaults to 1/sqrt(d + d_v)
        # (cute/interface.py:544-547).
        softmax_scale = (
            (head_dim + v.shape[3]) ** -0.5 if has_qv else head_dim**-0.5
        )
    window = normalize_window(window_size, causal, seqlen_k)
    if interpret is None:
        interpret = interpret_mode()
    if block_sizes is None:
        block_sizes = choose_block_sizes(seqlen_q, seqlen_k, head_dim, dtype=q.dtype)
    block_q = min(block_sizes.block_q, round_up(seqlen_q, NUM_LANES))
    block_kv = min(block_sizes.block_kv, round_up(seqlen_k, NUM_LANES))
    from flash_attn_tpu.utils.fa_logging import log_dispatch

    log_dispatch(
        "fwd", shape=q.shape, causal=causal, window=window, bq=block_q,
        bkv=block_kv, qv=has_qv, dtype=q.dtype.name,
    )

    # fp8 inputs upcast to bf16 at the XLA level BEFORE the kernel: v5e has
    # no fp8 MXU, and XLA's fp8 convert runs at HBM speed (~1200 Gelem/s)
    # while Mosaic's in-kernel lowering crawls (~73-158) — one whole-tensor
    # pass is ~10x cheaper than per-tile dequant on a compute-bound path.
    # int8 stays quantized in-kernel (int8 MXU path). Descales still fold
    # into the softmax scale / finalize normalizer. fp8 KV CACHES (decode)
    # keep in-kernel dequant — see common.upcast_quant_tile.
    def _xla_upcast_fp8(x):
        if (x is not None and x.dtype.itemsize == 1
                and jnp.issubdtype(x.dtype, jnp.floating)):
            return x.astype(jnp.bfloat16)
        return x

    fp8_in = any(
        x is not None and x.dtype.itemsize == 1
        and jnp.issubdtype(x.dtype, jnp.floating) for x in (q, k, v)
    )
    q, k, v, qv = (_xla_upcast_fp8(x) for x in (q, k, v, qv))

    # Quantized inputs produce bf16 outputs (reference FP8 fwd returns fp16).
    out_dtype = (
        q.dtype if q.dtype.itemsize >= 2 and not fp8_in else jnp.bfloat16
    )
    if out_quant_dtype is not None:
        out_dtype = out_quant_dtype

    # Pad to tile boundaries; masking inside the kernel keeps semantics.
    d_pad = round_up(head_dim, NUM_LANES)
    head_dim_v = v.shape[3]  # may differ from head_dim (MLA / hdimdiff,
    # hopper/generate_kernels.py hdim 64->512, 192->128 variants)
    dv_pad = round_up(head_dim_v, NUM_LANES)
    qp = pad_to_block(pad_to_block(q, 3, d_pad), 2, block_q)
    kp = pad_to_block(pad_to_block(k, 3, d_pad), 2, block_kv)
    vp = pad_to_block(pad_to_block(v, 3, dv_pad), 2, block_kv)
    sq_pad, sk_pad = qp.shape[2], kp.shape[2]
    num_q_blocks = sq_pad // block_q
    num_kv_blocks = sk_pad // block_kv

    if cp_tot_seqlen_k is None:
        cp_tot_seqlen_k = seqlen_k * cp_world_size
    min_kv_blk, max_kv_blk = make_causal_window_bounds(
        seqlen_q=seqlen_q,
        seqlen_k=seqlen_k,
        window=window if cp_world_size == 1 else (-1, -1),
        block_q=block_q,
        block_kv=block_kv,
        num_kv_blocks=num_kv_blocks,
        attention_chunk=attention_chunk if cp_world_size == 1 else 0,
    )

    def clamp_kv(ki, qi):
        # Clamp the kv block index so skipped iterations re-address the same
        # block: Pallas elides the DMA when the index is unchanged.
        lo = min_kv_blk(qi)
        hi = max_kv_blk(qi)
        if sink_token_length > 0:
            lo = 0
        return jnp.clip(ki, lo, hi)

    # Folded causal grid: for the pure-causal aligned case, pair q tile p
    # with q tile N-1-p. Tile p sees r*(p+1) kv tiles and tile N-1-p sees
    # r*(N-p), so every pair covers exactly r*(N+1) — a rectangular grid
    # that enumerates only visible tiles, with closed-form (no
    # scalar-prefetch) index arithmetic. Removes the ~44% predicated-off
    # grid steps of the rectangular causal grid (measured +~12% at s=8k).
    fold_r = 0
    if (
        causal
        and cp_world_size == 1
        and attention_chunk == 0
        and sink_token_length == 0
        and window == (-1, 0)
        and seqlen_q == seqlen_k
        and sq_pad == sk_pad
        and block_q % block_kv == 0
        and num_q_blocks % 2 == 0
        and num_q_blocks >= 2
    ):
        fold_r = block_q // block_kv

    if fold_r:
        _N = num_q_blocks

        def q_index(b, h, p, j):
            return jnp.where(j < fold_r * (p + 1), p, _N - 1 - p)

        def kv_index(b, h, p, j):
            cross = fold_r * (p + 1)
            return jnp.where(j < cross, j, j - cross)
    else:
        def q_index(b, h, qi, ki):
            return qi

        def kv_index(b, h, qi, ki):
            return clamp_kv(ki, qi)

    in_specs = [
        pl.BlockSpec(
            (1, 1, block_q, d_pad),
            lambda b, h, qi, ki: (b, h, q_index(b, h, qi, ki), 0),
        ),
        pl.BlockSpec(
            (1, 1, block_kv, d_pad),
            lambda b, h, qi, ki: (b, h // group_size, kv_index(b, h, qi, ki), 0),
        ),
        pl.BlockSpec(
            (1, 1, block_kv, dv_pad),
            lambda b, h, qi, ki: (b, h // group_size, kv_index(b, h, qi, ki), 0),
        ),
    ]
    args = [qp, kp, vp]

    if has_qv:
        qvp = pad_to_block(pad_to_block(qv, 3, dv_pad), 2, block_q)
        in_specs.append(
            pl.BlockSpec((1, 1, block_q, dv_pad),
                         lambda b, h, qi, ki: (b, h, q_index(b, h, qi, ki), 0))
        )
        args.append(qvp)

    has_descale = any(
        x is not None for x in (q_descale, k_descale, v_descale)
    )
    descale_batched = False
    if has_descale:
        def norm_descale(x):
            if x is None:
                x = jnp.ones((1, num_heads_kv), jnp.float32)
            x = jnp.asarray(x, jnp.float32)
            return x[None, :] if x.ndim == 1 else x

        ds = [norm_descale(x) for x in (q_descale, k_descale, v_descale)]
        descale_batched = any(d.shape[0] > 1 for d in ds)
        db = batch if descale_batched else 1
        ds = [jnp.broadcast_to(d, (db, num_heads_kv)) for d in ds]
        descale_arr = jnp.stack(ds)  # (3, b|1, hk)
        in_specs.append(
            pl.BlockSpec(descale_arr.shape, lambda b, h, qi, ki: (0, 0, 0),
                         memory_space=pltpu.SMEM)
        )
        args.append(descale_arr)

    has_bias = bias is not None
    if has_bias:
        bb = 0 if bias.shape[0] == 1 else None
        bh = 0 if bias.shape[1] == 1 else None
        bias_p = pad_to_block(pad_to_block(bias, 3, block_kv), 2, block_q)
        in_specs.append(
            pl.BlockSpec(
                (1, 1, block_q, block_kv),
                lambda b, h, qi, ki, bb=bb, bh=bh: (
                    0 if bb == 0 else b,
                    0 if bh == 0 else h,
                    q_index(b, h, qi, ki),
                    kv_index(b, h, qi, ki),
                ),
            )
        )
        args.append(bias_p)

    # Scalar parameters live whole in SMEM and are indexed dynamically
    # in-kernel (block must cover the full array on TPU).
    has_alibi = alibi_slopes is not None
    alibi_batched = False
    if has_alibi:
        slopes = jnp.asarray(alibi_slopes, jnp.float32)
        if slopes.ndim == 1:
            slopes = slopes[None, :]
        alibi_batched = slopes.shape[0] > 1
        in_specs.append(
            pl.BlockSpec(slopes.shape, lambda b, h, qi, ki: (0, 0),
                         memory_space=pltpu.SMEM)
        )
        args.append(slopes)

    has_sink = sink is not None
    if has_sink:
        sink_arr = jnp.asarray(sink, jnp.float32)[None, :]
        in_specs.append(
            pl.BlockSpec(sink_arr.shape, lambda b, h, qi, ki: (0, 0),
                         memory_space=pltpu.SMEM)
        )
        args.append(sink_arr)

    if dropout_p > 0.0:
        if dropout_seed is None:
            dropout_seed = jnp.zeros((), jnp.int32)
        seed_arr = jnp.asarray(dropout_seed, jnp.int32).reshape(1, 1)
        in_specs.append(
            pl.BlockSpec((1, 1), lambda b, h, qi, ki: (0, 0), memory_space=pltpu.SMEM)
        )
        args.append(seed_arr)

    has_segments = q_segment_ids is not None
    if has_segments:
        assert kv_segment_ids is not None
        qseg = pad_to_block(
            jnp.asarray(q_segment_ids, jnp.int32), 1, block_q, value=-1
        )[..., None]
        kseg = pad_to_block(
            jnp.asarray(kv_segment_ids, jnp.int32), 1, block_kv, value=-2
        )[..., None]
        in_specs.append(
            pl.BlockSpec(
                (1, block_q, 1),
                lambda b, h, qi, ki: (b, q_index(b, h, qi, ki), 0),
            )
        )
        in_specs.append(
            pl.BlockSpec(
                (1, block_kv, 1),
                lambda b, h, qi, ki: (b, kv_index(b, h, qi, ki), 0),
            )
        )
        args.extend([qseg, kseg])

    aux_tensors = tuple(aux_tensors or ())
    aux_scalars = tuple(aux_scalars or ())
    aux_shapes = []
    for a in aux_tensors:
        a = jnp.asarray(a)
        if a.ndim <= 1:
            # 1-D lookup tables are edge-padded to a lane multiple so
            # aux_take's aligned-window gather lowers on Mosaic.
            a = pad_aux_table(a.reshape(-1))
        aux_shapes.append(a.shape)
        a2 = a.reshape((1,) * max(0, 2 - a.ndim) + a.shape)  # >=2D for TPU
        in_specs.append(
            pl.BlockSpec(
                a2.shape,
                lambda b, h, qi, ki, _n=a2.ndim: (0,) * _n,
            )
        )
        args.append(a2)
    aux_shapes = tuple(aux_shapes)
    if aux_scalars:
        sc = jnp.stack(
            [jnp.asarray(x, jnp.float32) for x in aux_scalars]
        )[None, :]
        in_specs.append(
            pl.BlockSpec(sc.shape, lambda b, h, qi, ki: (0, 0),
                         memory_space=pltpu.SMEM)
        )
        args.append(sc)

    if fold_r:
        grid = (
            batch, num_heads, num_q_blocks // 2, fold_r * (num_q_blocks + 1)
        )
    else:
        grid = (batch, num_heads, num_q_blocks, num_kv_blocks)

    kernel = functools.partial(
        _fwd_kernel,
        seqlen_q=seqlen_q,
        seqlen_k=seqlen_k,
        block_q=block_q,
        block_kv=block_kv,
        num_kv_blocks=num_kv_blocks,
        scale=float(softmax_scale),
        causal=causal,
        window=window,
        attention_chunk=int(attention_chunk),
        sink_token_length=sink_token_length,
        softcap=float(softcap),
        dropout_p=float(dropout_p),
        group_size=group_size,
        has_bias=has_bias,
        has_alibi=has_alibi,
        alibi_batched=alibi_batched,
        has_sink=has_sink,
        has_segments=has_segments,
        has_descale=has_descale,
        descale_batched=descale_batched,
        has_qv=has_qv,
        cp_world_size=int(cp_world_size),
        cp_rank=int(cp_rank),
        cp_tot_seqlen_k=int(cp_tot_seqlen_k),
        output_scale=float(output_scale),
        score_mod=score_mod,
        mask_mod=mask_mod,
        num_aux=len(aux_tensors),
        aux_shapes=aux_shapes,
        num_aux_scalars=len(aux_scalars),
        out_dtype=out_dtype,
        fold_r=fold_r,
        fold_num_q=num_q_blocks,
    )

    # LSE carries a trailing singleton lane dim: TPU block shapes must have
    # their last two dims either tile-aligned or equal to the array dims.
    out_shape = [
        jax.ShapeDtypeStruct((batch, num_heads, sq_pad, dv_pad), out_dtype),
        jax.ShapeDtypeStruct((batch, num_heads, sq_pad, 1), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec(
            (1, 1, block_q, dv_pad),
            lambda b, h, qi, ki: (b, h, q_index(b, h, qi, ki), 0),
        ),
        pl.BlockSpec(
            (1, 1, block_q, 1),
            lambda b, h, qi, ki: (b, h, q_index(b, h, qi, ki), 0),
        ),
    ]
    scratch_shapes = [
        pltpu.VMEM((block_q, NUM_LANES), jnp.float32),  # running max (base-2)
        pltpu.VMEM((block_q, NUM_LANES), jnp.float32),  # running sum
        pltpu.VMEM((block_q, dv_pad), jnp.float32),  # output accumulator
    ]

    flops_per_block = 4 * block_q * block_kv * d_pad
    num_compute_blocks = (
        grid[2] * grid[3] if fold_r else num_q_blocks * num_kv_blocks
    )
    cost = pl.CostEstimate(
        flops=flops_per_block * batch * num_heads * num_compute_blocks,
        bytes_accessed=(qp.size + kp.size + vp.size) * qp.dtype.itemsize,
        transcendentals=batch * num_heads * sq_pad * sk_pad
        // (2 if fold_r else 1),
    )

    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(
                ("arbitrary",) * 4
                if os.environ.get("FA_FWD_ALL_ARBITRARY", "0") == "1"
                else ("parallel", "parallel", "parallel", "arbitrary")
            ),
        ),
        cost_estimate=cost,
        interpret=interpret,
    )(*args)

    out = out[:, :, :seqlen_q, :head_dim_v]
    lse = lse[:, :, :seqlen_q, 0]
    return out, lse
