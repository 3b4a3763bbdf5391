"""Pallas TPU varlen flash-attention (packed sequences, fwd + bwd).

TPU-native replacement for the reference varlen path (`mha_varlen_fwd`,
csrc/flash_attn/flash_api.cpp:563; varlen offsets `BlockInfo`
csrc/flash_attn/src/block_info.h:13; FA3 seqlen resolution hopper/seqlen.h).

Design (SURVEY.md hard-part #6, build-plan stage 3):
  * Sequences are packed into one (total_tokens, ...) axis — the reference's
    cu_seqlens layout — and stay packed on TPU: no padding to max_seqlen.
  * Per-token int32 metadata (segment id, bottom-right-adjusted position)
    gives exact per-sequence causal/window/alibi masking inside a tile even
    when a tile spans a sequence boundary.
  * A host-side planner (`make_varlen_metadata`) computes per-q-block
    [min,max] kv-block visibility bounds — the static-shape analog of the
    reference's GPU-side prepare-scheduler (hopper/flash_prepare_scheduler.cu:43).
    The bounds ride scalar prefetch; BlockSpec index_maps clamp with them so
    the HBM->VMEM DMAs of skipped tiles are elided.
  * The backward uses the same two-kernel deterministic structure as the
    dense path (flash_bwd.py) with inverse per-kv-block q bounds.

seqused_k (reference seqused_k arg) truncates each sequence's visible keys;
the bottom-right diagonal then aligns to the used length, matching
hopper/seqlen.h:36-59.
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


# ---------------------------------------------------------------------------
# Host-side planner (the prepare-scheduler analog).
# ---------------------------------------------------------------------------

def make_varlen_metadata(
    cu_seqlens_q: jnp.ndarray,  # (nseq+1,) int32
    cu_seqlens_k: jnp.ndarray,
    total_q: int,
    total_k: int,
    *,
    seqused_q: Optional[jnp.ndarray] = None,  # (nseq,) used q rows per seq
    seqused_k: Optional[jnp.ndarray] = None,  # (nseq,) visible k per seq
    block_q: int,
    block_kv: int,
    causal: bool,
    window: Tuple[int, int],
    attention_chunk: int = 0,
    cp_world_size: int = 1,
    cp_rank: int = 0,
    cp_tot_seqused_k: Optional[jnp.ndarray] = None,  # (nseq,) totals
):
    """Returns (qseg, qpos_adj, kseg, kpos, kvmin, kvmax, qmin, qmax).

    qseg/kseg: (total,) segment id per token (-1/-2 for tail padding).
    qpos_adj:  per-q-token position shifted by (used_k_j - seqlen_q_j) so the
               bottom-right causal test is simply kpos <= qpos_adj.
    kvmin/kvmax: per-q-block kv-block visibility bounds (fwd + dq grids).
    qmin/qmax:   per-kv-block q-block bounds (dkv grid).
    All jnp ops — usable under jit with traced cu_seqlens.
    """
    left, right = window
    nqb = cdiv(total_q, block_q)
    nkb = cdiv(total_k, block_kv)
    tqp = nqb * block_q
    tkp = nkb * block_kv

    cu_q = jnp.asarray(cu_seqlens_q, jnp.int32)
    cu_k = jnp.asarray(cu_seqlens_k, jnp.int32)
    nseq = cu_q.shape[0] - 1
    sq_len = cu_q[1:] - cu_q[:-1]  # (nseq,)
    sk_len = cu_k[1:] - cu_k[:-1]
    used_k = (
        jnp.asarray(seqused_k, jnp.int32) if seqused_k is not None else sk_len
    )
    # seqused_q (hopper/flash_attn_interface.py:30): only the first used_q
    # rows of each sequence participate; the bottom-right diagonal aligns
    # used_q against used_k.
    used_q = (
        jnp.asarray(seqused_q, jnp.int32) if seqused_q is not None else sq_len
    )
    if cp_world_size > 1:
        # Round-robin CP (hopper/mask.h:103, seqlen.h:59): this rank's local
        # key i has absolute index i*W + rank; per-sequence totals come from
        # cp_tot_seqused_k and bound how many local keys are live.
        tot_k = (
            jnp.asarray(cp_tot_seqused_k, jnp.int32)
            if cp_tot_seqused_k is not None else used_k * cp_world_size
        )
        used_k = (tot_k - cp_rank + cp_world_size - 1) // cp_world_size

    qidx = jnp.arange(tqp, dtype=jnp.int32)
    kidx = jnp.arange(tkp, dtype=jnp.int32)
    # searchsorted gives segment of each token; padding tail -> last+1.
    qseg = jnp.searchsorted(cu_q, qidx, side="right").astype(jnp.int32) - 1
    kseg = jnp.searchsorted(cu_k, kidx, side="right").astype(jnp.int32) - 1
    qseg = jnp.where(qidx < total_q, qseg, -1)
    kseg = jnp.where(kidx < total_k, kseg, -2)

    qseg_c = jnp.clip(qseg, 0, nseq - 1)
    kseg_c = jnp.clip(kseg, 0, nseq - 1)
    qpos = qidx - cu_q[qseg_c]
    kpos = kidx - cu_k[kseg_c]
    # seqused_k: keys at pos >= used are invisible.
    kseg = jnp.where(kpos < used_k[kseg_c], kseg, -2)
    # seqused_q: query rows at pos >= used are inert (masked everywhere;
    # out rows are zero, lse rows -inf, grads zero).
    if seqused_q is not None:
        qseg = jnp.where(qpos < used_q[qseg_c], qseg, -1)
    if cp_world_size > 1:
        kpos = kpos * cp_world_size + cp_rank  # absolute key positions
        offset = tot_k - used_q
    else:
        offset = used_k - used_q  # bottom-right alignment per sequence
    qpos_adj = qpos + offset[qseg_c]

    # ---- per-q-block kv bounds ----
    qb = jnp.arange(nqb, dtype=jnp.int32)
    r_first = jnp.minimum(qb * block_q, total_q - 1)
    r_last = jnp.minimum(qb * block_q + block_q - 1, total_q - 1)
    jf = qseg_c[r_first]
    jl = qseg_c[r_last]
    if causal or right >= 0:
        r = 0 if (causal and right < 0) else right
        kmax_g = cu_k[jl] + jnp.clip(
            qpos_adj[r_last] + r, 0, jnp.maximum(used_k[jl] - 1, 0)
        )
    else:
        kmax_g = cu_k[jl] + jnp.maximum(used_k[jl] - 1, 0)
    if left >= 0:
        kmin_g = cu_k[jf] + jnp.clip(
            qpos_adj[r_first] - left, 0, jnp.maximum(used_k[jf] - 1, 0)
        )
    else:
        kmin_g = cu_k[jf]
    if attention_chunk > 0:
        # Chunked attention: row r only sees keys in its own chunk
        # [diag - diag % chunk, +chunk) with diag = qpos_adj.
        d_last = qpos_adj[r_last]
        chunk_hi = d_last - d_last % attention_chunk + attention_chunk - 1
        kmax_g = jnp.minimum(
            kmax_g,
            cu_k[jl] + jnp.clip(chunk_hi, 0, jnp.maximum(used_k[jl] - 1, 0)),
        )
        d_first = qpos_adj[r_first]
        chunk_lo = d_first - d_first % attention_chunk
        kmin_g = jnp.maximum(
            kmin_g,
            cu_k[jf] + jnp.clip(chunk_lo, 0, jnp.maximum(used_k[jf] - 1, 0)),
        )
    kvmax = jnp.clip(kmax_g // block_kv, 0, nkb - 1)
    kvmin = jnp.clip(kmin_g // block_kv, 0, nkb - 1)
    kvmin = jnp.minimum(kvmin, kvmax)

    # ---- per-kv-block q bounds (for the dkv grid) ----
    kb = jnp.arange(nkb, dtype=jnp.int32)
    c_first = jnp.minimum(kb * block_kv, total_k - 1)
    c_last = jnp.minimum(kb * block_kv + block_kv - 1, total_k - 1)
    jkf = kseg_c[c_first]
    jkl = kseg_c[c_last]
    if causal or right >= 0:
        r = 0 if (causal and right < 0) else right
        # first q row with qpos_adj + r >= kpos(c_first)
        qmin_g = cu_q[jkf] + jnp.clip(
            kpos[c_first] - offset[jkf] - r, 0, sq_len[jkf]
        )
    else:
        qmin_g = cu_q[jkf]
    if left >= 0:
        qmax_g = cu_q[jkl] + jnp.clip(
            kpos[c_last] + left - offset[jkl], 0, jnp.maximum(sq_len[jkl] - 1, 0)
        )
    else:
        qmax_g = jnp.minimum(cu_q[jkl + 1], total_q) - 1
    if attention_chunk > 0:
        # Col c is only visible from rows with qpos_adj in
        # [c - c % chunk, +chunk).
        c_lo = kpos[c_first] - kpos[c_first] % attention_chunk
        qmin_g = jnp.maximum(
            qmin_g, cu_q[jkf] + jnp.clip(c_lo - offset[jkf], 0, sq_len[jkf])
        )
        c_hi = (
            kpos[c_last] - kpos[c_last] % attention_chunk
            + attention_chunk - 1
        )
        qmax_g = jnp.minimum(
            qmax_g,
            cu_q[jkl] + jnp.clip(
                c_hi - offset[jkl], 0, jnp.maximum(sq_len[jkl] - 1, 0)
            ),
        )
    qmax = jnp.clip(qmax_g // block_q, 0, nqb - 1)
    qmin = jnp.clip(qmin_g // block_q, 0, nqb - 1)
    qmin = jnp.minimum(qmin, qmax)

    if cp_world_size > 1:
        kvmin = jnp.zeros_like(kvmin)
        kvmax = jnp.full_like(kvmax, nkb - 1)
        qmin = jnp.zeros_like(qmin)
        qmax = jnp.full_like(qmax, nqb - 1)

    # ---- per-(q-block, kv-block) interior table ----
    # A tile is INTERIOR when every element passes the segment + causal/
    # window tests, so the kernels skip all element-mask VPU work on it
    # (the varlen analog of the dense kernels' interior/edge split).
    # Endpoint checks suffice: segments, trimmed tails and positions are
    # monotone along the packed axis. Chunked attention stays on the
    # masked path.
    qseg_f = qseg[jnp.minimum(qb * block_q, tqp - 1)]
    qseg_l = qseg[r_last]
    kseg_f = kseg[c_first]
    kseg_l = kseg[c_last]
    q_uni = jnp.logical_and(qseg_f == qseg_l, qseg_f >= 0)  # (nqb,)
    # KV tiles must also be free of tail padding: padded key columns
    # (kseg -2 beyond total_k) sit past the clipped endpoint check and
    # would contribute garbage on an unmasked tile. (Padded q ROWS are
    # harmless — their outputs are sliced off.)
    k_uni = jnp.logical_and(
        jnp.logical_and(kseg_f == kseg_l, kseg_f >= 0),
        (kb + 1) * block_kv <= total_k,
    )  # (nkb,)
    same_seg = jnp.logical_and(
        jnp.logical_and(q_uni[:, None], k_uni[None, :]),
        qseg_f[:, None] == kseg_f[None, :],
    )  # (nqb, nkb)
    interior = same_seg
    if causal or right >= 0:
        r = 0 if (causal and right < 0) else right
        interior = jnp.logical_and(
            interior,
            kpos[c_last][None, :] <= qpos_adj[r_first][:, None] + r,
        )
    if left >= 0:
        interior = jnp.logical_and(
            interior,
            kpos[c_first][None, :] >= qpos_adj[r_last][:, None] - left,
        )
    if attention_chunk > 0:
        interior = jnp.zeros_like(interior)
    interior = interior.astype(jnp.int32)

    return (
        qseg[:, None], qpos_adj[:, None], kseg[:, None], kpos[:, None],
        kvmin, kvmax, qmin, qmax, interior,
    )


# ---------------------------------------------------------------------------
# Shared tile math.
# ---------------------------------------------------------------------------

def _tile_mask(qseg, qpos, kseg, kpos, *, causal, window, has_alibi,
               attention_chunk: int = 0):
    """Element mask + relative distance for a (bq, bkv) tile from per-token
    metadata: q columns ((bq,1)) and k rows ((1,bkv)) — k columns ((bkv,1))
    are transposed for the backward callers."""
    left, right = window
    if kseg.shape[0] != 1:
        kseg = kseg.T
        kpos = kpos.T
    seg_ok = qseg == kseg  # (bq, bkv)
    mask = seg_ok
    rel = kpos - qpos  # (bq, bkv): kpos - qpos_adj
    if causal or right >= 0:
        r = 0 if (causal and right < 0) else right
        mask = jnp.logical_and(mask, rel <= r)
    if left >= 0:
        mask = jnp.logical_and(mask, rel >= -left)
    if attention_chunk > 0:
        # Chunked attention (construct_chunk_mask): same chunk of the
        # bottom-right-aligned coordinate.
        mask = jnp.logical_and(
            mask, kpos.T // attention_chunk == qpos // attention_chunk
        )
    return mask, rel


def _varlen_fwd_kernel(
    kvmin_ref, kvmax_ref, kidx_ref, inter_ref,  # scalar prefetch
    *refs,
    block_q: int, block_kv: int, num_kv_blocks: int, d_pad: int,
    scale: float, causal: bool, window: Tuple[int, int],
    attention_chunk: int,
    softcap: float, dropout_p: float, group_size: int,
    has_alibi: bool, has_qv: bool, out_dtype,
):
    # Per-step operands are FUSED to keep the inter-step scalar/DMA work
    # minimal (measured 2.7us/step vs the dense kernels' 1.8us before this:
    # benchmarks/profile_varlen.py): K|V ride one lane-concatenated block
    # (one DMA, one index map), kseg|kpos one (2, block_kv) row block, and
    # the clamped kv block index is a precomputed kidx table so every
    # dynamic index map is a single SMEM load.
    idx = 0
    q_ref = refs[idx]; idx += 1
    kv_ref = refs[idx]; idx += 1
    qv_ref = None
    if has_qv:
        qv_ref = refs[idx]; idx += 1
    qmeta_ref = refs[idx]; idx += 1
    kmeta_ref = refs[idx]; idx += 1
    slopes_ref = seed_ref = None
    if has_alibi:
        slopes_ref = refs[idx]; idx += 1
    if dropout_p > 0.0:
        seed_ref = refs[idx]; idx += 1
    o_ref = refs[idx]; idx += 1
    lse_ref = refs[idx]; idx += 1
    m_scr = refs[idx]; idx += 1
    l_scr = refs[idx]; idx += 1
    acc_scr = refs[idx]; idx += 1

    h = pl.program_id(0)
    qi = pl.program_id(1)
    kj = pl.program_id(2)
    # The kv grid dim is OFFSET per q block: step j maps to absolute kv
    # block kvmin[qi] + j, so its length is the widest per-q-block visible
    # SPAN instead of total_k/block_kv — packed batches of S-token
    # sequences skip (total_k - S)/block_kv predicated steps per q block
    # otherwise.
    ki = kvmin_ref[qi] + kj

    @pl.when(kj == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, _MASK2)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    should_run = ki <= kvmax_ref[qi]
    # Interior tiles (single segment, fully below the diagonal/inside the
    # window) skip every element-mask op — the varlen analog of the dense
    # kernels' interior/edge specialization. ALiBi needs rel regardless,
    # so it stays on the masked path.
    if has_alibi:
        is_interior = jnp.bool_(False)
    else:
        is_interior = inter_ref[qi, kidx_ref[qi, kj]] == 1

    def _compute(with_mask: bool):
        q = q_ref[0]  # (bq, d)
        k = kv_ref[0][:, :d_pad]
        v = kv_ref[0][:, d_pad:]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if has_qv:
            # MLA weight-absorbed scores (FA4 varlen qv): S = Q K^T + Qv V^T.
            s = s + jax.lax.dot_general(
                qv_ref[0], v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        if softcap > 0.0:
            s2 = jnp.tanh(s * (scale / softcap)) * (softcap * LOG2E)
        else:
            s2 = s * (scale * LOG2E)

        if with_mask:
            qseg = qmeta_ref[:, 0:1]  # (bq, 1)
            qpos = qmeta_ref[:, 1:2]
            kseg = kmeta_ref[0:1, :]  # (1, bkv)
            kpos = kmeta_ref[1:2, :]
            mask, rel = _tile_mask(
                qseg, qpos, kseg, kpos,
                causal=causal, window=window, has_alibi=has_alibi,
                attention_chunk=attention_chunk,
            )
            if has_alibi:
                slope2 = slopes_ref[0, h] * LOG2E
                s2 = s2 - slope2 * jnp.abs(rel.astype(jnp.float32))
            s2 = jnp.where(mask, s2, _MASK2)
        else:
            mask = None
        m_prev = m_scr[...]
        m_cur = jnp.max(s2, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp2(m_prev - m_next)
        kv_rep = s2.shape[1] // m_next.shape[1]
        m_full = pltpu.repeat(m_next, kv_rep, axis=1) if kv_rep > 1 else m_next
        p = jnp.exp2(s2 - m_full)
        if with_mask:
            p = jnp.where(mask, p, 0.0)
        l_scr[...] = alpha * l_scr[...] + jnp.sum(p, axis=1, keepdims=True)
        m_scr[...] = m_next
        if dropout_p > 0.0:
            from flash_attn_tpu.kernels.flash_fwd import _dropout_keep_mask

            keep = _dropout_keep_mask(
                seed_ref, 0, h, qi * block_q, ki * block_kv, p.shape,
                1.0 - dropout_p,
            )
            p = jnp.where(keep, p, 0.0)
        d_rep = acc_scr.shape[1] // alpha.shape[1]
        alpha_full = pltpu.repeat(alpha, d_rep, axis=1) if d_rep > 1 else alpha
        acc_scr[...] = acc_scr[...] * alpha_full + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(jnp.logical_and(should_run, is_interior))
    def _body_interior():
        _compute(with_mask=False)

    @pl.when(jnp.logical_and(should_run, jnp.logical_not(is_interior)))
    def _body_edge():
        _compute(with_mask=True)

    @pl.when(kj == num_kv_blocks - 1)
    def _finalize():
        m = m_scr[...][:, 0:1]
        l = l_scr[...][:, 0:1]
        l_inv = jnp.where(l == 0.0, 0.0, 1.0 / l)
        if dropout_p > 0.0:
            l_inv = l_inv * (1.0 / (1.0 - dropout_p))
        o_ref[0] = (acc_scr[...] * l_inv).astype(out_dtype)
        lse_ref[0] = jnp.where(
            l == 0.0, -jnp.inf, (m + jnp.log2(jnp.maximum(l, 1e-37))) / LOG2E
        )


def _varlen_recompute(
    q, k, v, do, lse2, delta,
    qseg, qpos, kseg, kpos, slopes_ref, h,
    *, scale, causal, window, softcap, has_alibi,
    attention_chunk=0,
    dropout_p=0.0, seed_ref=None, qi=0, ki=0, block_q=0, block_kv=0,
    qv=None, with_mask=True,
):
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if qv is not None:
        s = s + jax.lax.dot_general(
            qv, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
    if softcap > 0.0:
        t = jnp.tanh(s * (scale / softcap))
        s2 = t * (softcap * LOG2E)
    else:
        t = None
        s2 = s * (scale * LOG2E)
    if with_mask:
        mask, rel = _tile_mask(
            qseg, qpos, kseg, kpos, causal=causal, window=window,
            has_alibi=has_alibi, attention_chunk=attention_chunk,
        )
        if has_alibi:
            slope2 = slopes_ref[0, h] * LOG2E
            s2 = s2 - slope2 * jnp.abs(rel.astype(jnp.float32))
        p = jnp.exp2(s2 - lse2)
        p = jnp.where(mask, p, 0.0)
    else:
        # Interior tile: every element passes the segment/causal/window
        # tests (precomputed table; see make_varlen_metadata).
        p = jnp.exp2(s2 - lse2)
    if dropout_p > 0.0:
        from flash_attn_tpu.kernels.flash_fwd import _dropout_keep_mask

        keep = _dropout_keep_mask(
            seed_ref, 0, h, qi * block_q, ki * block_kv, p.shape,
            1.0 - dropout_p,
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


def _varlen_dkv_kernel(
    qmin_ref, qmax_ref, qidx_ref, inter_ref,
    *refs,
    block_q: int, block_kv: int, num_q_blocks: int, d_pad: int,
    scale: float, causal: bool, window: Tuple[int, int],
    attention_chunk: int,
    softcap: float, dropout_p: float, has_alibi: bool,
    has_qv: bool = False,
):
    # Fused per-step operands (see _varlen_fwd_kernel): Q|dO one block,
    # LSE|delta one block, qseg|qpos one block — 3 dynamic index maps per
    # grid step instead of 6.
    idx = 0
    qdo_ref = refs[idx]; idx += 1
    kv_ref = refs[idx]; idx += 1
    qv_ref = None
    if has_qv:
        qv_ref = refs[idx]; idx += 1
    ld_ref = refs[idx]; idx += 1
    qmeta_ref = refs[idx]; idx += 1
    kmeta_ref = refs[idx]; idx += 1
    slopes_ref = seed_ref = None
    if has_alibi:
        slopes_ref = refs[idx]; idx += 1
    if dropout_p > 0.0:
        seed_ref = refs[idx]; idx += 1
    dk_ref = refs[idx]; idx += 1
    dv_ref = refs[idx]; idx += 1
    dk_scr = refs[idx]; idx += 1
    dv_scr = refs[idx]; idx += 1

    h = pl.program_id(0)
    ki = pl.program_id(1)
    qj = pl.program_id(2)
    # Offset q grid dim (see the fwd kernel): step j -> absolute q block
    # qmin[ki] + j, so the dim covers the widest visible span only.
    qi = qmin_ref[ki] + qj

    @pl.when(qj == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    should_run = qi <= qmax_ref[ki]
    if has_alibi:
        is_interior = jnp.bool_(False)
    else:
        is_interior = inter_ref[qidx_ref[ki, qj], ki] == 1

    def _body(with_mask: bool):
        q = qdo_ref[0][:, :d_pad]
        do = qdo_ref[0][:, d_pad:].astype(jnp.float32)
        k = kv_ref[0][:, :d_pad]
        v = kv_ref[0][:, d_pad:]
        p, ds = _varlen_recompute(
            q, k, v, do,
            ld_ref[0][:, 0:1] * LOG2E, ld_ref[0][:, 1:2],
            qmeta_ref[:, 0:1], qmeta_ref[:, 1:2],
            kmeta_ref[0:1, :], kmeta_ref[1:2, :],
            slopes_ref, h,
            scale=scale, causal=causal, window=window,
            attention_chunk=attention_chunk,
            softcap=softcap, has_alibi=has_alibi,
            dropout_p=dropout_p, seed_ref=seed_ref, qi=qi, ki=ki,
            block_q=block_q, block_kv=block_kv,
            qv=qv_ref[0] if has_qv else None,
            with_mask=with_mask,
        )
        dv_scr[...] += jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if has_qv:
            # V also enters the scores: dV += dS^T Qv.
            dv_scr[...] += jax.lax.dot_general(
                ds, qv_ref[0].astype(jnp.float32), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        dk_scr[...] += jax.lax.dot_general(
            ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(jnp.logical_and(should_run, is_interior))
    def _body_interior():
        _body(with_mask=False)

    @pl.when(jnp.logical_and(should_run, jnp.logical_not(is_interior)))
    def _body_edge():
        _body(with_mask=True)

    @pl.when(qj == num_q_blocks - 1)
    def _finalize():
        dk_ref[0] = dk_scr[...]
        dv_ref[0] = dv_scr[...]


def _varlen_dq_kernel(
    kvmin_ref, kvmax_ref, kidx_ref, inter_ref,
    *refs,
    block_q: int, block_kv: int, num_kv_blocks: int, d_pad: int,
    scale: float, causal: bool, window: Tuple[int, int],
    attention_chunk: int,
    softcap: float, dropout_p: float, has_alibi: bool,
    has_qv: bool = False, out_dtype=None,
):
    # Fused per-step operands (see _varlen_fwd_kernel): K|V one block,
    # kseg|kpos one block — 2 dynamic index maps per grid step.
    idx = 0
    qdo_ref = refs[idx]; idx += 1
    kv_ref = refs[idx]; idx += 1
    qv_ref = None
    if has_qv:
        qv_ref = refs[idx]; idx += 1
    ld_ref = refs[idx]; idx += 1
    qmeta_ref = refs[idx]; idx += 1
    kmeta_ref = refs[idx]; idx += 1
    slopes_ref = seed_ref = None
    if has_alibi:
        slopes_ref = refs[idx]; idx += 1
    if dropout_p > 0.0:
        seed_ref = refs[idx]; idx += 1
    dq_ref = refs[idx]; idx += 1
    dqv_ref = None
    if has_qv:
        dqv_ref = refs[idx]; idx += 1
    dq_scr = refs[idx]; idx += 1
    dqv_scr = None
    if has_qv:
        dqv_scr = refs[idx]; idx += 1

    h = pl.program_id(0)
    qi = pl.program_id(1)
    kj = pl.program_id(2)
    # Offset kv grid dim (see the fwd kernel).
    ki = kvmin_ref[qi] + kj

    @pl.when(kj == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)
        if has_qv:
            dqv_scr[...] = jnp.zeros_like(dqv_scr)

    should_run = ki <= kvmax_ref[qi]
    if has_alibi:
        is_interior = jnp.bool_(False)
    else:
        is_interior = inter_ref[qi, kidx_ref[qi, kj]] == 1

    def _body(with_mask: bool):
        q = qdo_ref[0][:, :d_pad]
        do = qdo_ref[0][:, d_pad:].astype(jnp.float32)
        k = kv_ref[0][:, :d_pad]
        v = kv_ref[0][:, d_pad:]
        _, ds = _varlen_recompute(
            q, k, v, do,
            ld_ref[0][:, 0:1] * LOG2E, ld_ref[0][:, 1:2],
            qmeta_ref[:, 0:1], qmeta_ref[:, 1:2],
            kmeta_ref[0:1, :], kmeta_ref[1:2, :],
            slopes_ref, h,
            scale=scale, causal=causal, window=window,
            attention_chunk=attention_chunk,
            softcap=softcap, has_alibi=has_alibi,
            dropout_p=dropout_p, seed_ref=seed_ref, qi=qi, ki=ki,
            block_q=block_q, block_kv=block_kv,
            qv=qv_ref[0] if has_qv else None,
            with_mask=with_mask,
        )
        dq_scr[...] += jax.lax.dot_general(
            ds, k.astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if has_qv:
            # dQv += dS V (MLA absorbed scores).
            dqv_scr[...] += jax.lax.dot_general(
                ds, v.astype(jnp.float32), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    @pl.when(jnp.logical_and(should_run, is_interior))
    def _body_interior():
        _body(with_mask=False)

    @pl.when(jnp.logical_and(should_run, jnp.logical_not(is_interior)))
    def _body_edge():
        _body(with_mask=True)

    @pl.when(kj == num_kv_blocks - 1)
    def _finalize():
        dq_ref[0] = dq_scr[...].astype(out_dtype)
        if has_qv:
            dqv_ref[0] = dqv_scr[...].astype(out_dtype)


# ---------------------------------------------------------------------------
# Host wrappers.
# ---------------------------------------------------------------------------

def _prep_packed(x, axis_block, d_pad):
    # (total, h, d) -> (h, total_pad, d_pad)
    x = x.transpose(1, 0, 2)
    return pad_to_block(pad_to_block(x, 2, d_pad), 1, axis_block)


def flash_attention_varlen_fwd(
    q: jnp.ndarray,  # (total_q, h, d)
    k: jnp.ndarray,  # (total_k, hk, d)
    v: jnp.ndarray,
    cu_seqlens_q: jnp.ndarray,
    cu_seqlens_k: jnp.ndarray,
    *,
    qv: Optional[jnp.ndarray] = None,  # (total_q, h, d_v) MLA absorbed
    seqused_q: Optional[jnp.ndarray] = None,
    seqused_k: Optional[jnp.ndarray] = None,
    alibi_slopes: Optional[jnp.ndarray] = None,
    softmax_scale: Optional[float] = None,
    causal: bool = False,
    window_size: Tuple[int, int] = (-1, -1),
    attention_chunk: int = 0,
    softcap: float = 0.0,
    dropout_p: float = 0.0,
    dropout_seed: Optional[jnp.ndarray] = None,
    cp_world_size: int = 1,
    cp_rank: int = 0,
    cp_tot_seqused_k: Optional[jnp.ndarray] = None,
    block_q: int = 512,
    block_kv: int = 1024,
    interpret: Optional[bool] = None,
):
    """Packed varlen forward. Returns (out (total_q, h, d), lse (h, total_q))."""
    total_q, num_heads, head_dim = q.shape
    total_k, num_heads_kv, _ = k.shape
    group_size = num_heads // num_heads_kv
    has_qv = qv is not None
    if softmax_scale is None:
        softmax_scale = (
            (head_dim + v.shape[2]) ** -0.5 if has_qv else head_dim**-0.5
        )
    if interpret is None:
        interpret = interpret_mode()
    window = (int(window_size[0]), int(window_size[1]))
    out_dtype = q.dtype

    nqb = cdiv(total_q, block_q)
    nkb = cdiv(total_k, block_kv)
    d_pad = round_up(head_dim, NUM_LANES)
    head_dim_v = v.shape[2]  # may differ (MLA / hdimdiff varlen)
    dv_pad = round_up(head_dim_v, NUM_LANES)

    (qseg, qpos, kseg, kpos, kvmin, kvmax, _, _, interior) = \
        make_varlen_metadata(
        cu_seqlens_q, cu_seqlens_k, total_q, total_k,
        seqused_q=seqused_q, seqused_k=seqused_k,
        block_q=block_q, block_kv=block_kv,
        causal=causal, window=window,
        attention_chunk=attention_chunk if cp_world_size == 1 else 0,
        cp_world_size=cp_world_size, cp_rank=cp_rank,
        cp_tot_seqused_k=cp_tot_seqused_k,
    )

    qp = _prep_packed(q, block_q, d_pad)
    # K|V fused along lanes: one per-step DMA + one dynamic index map
    # instead of two (K at [:, :d_pad], V at [:, d_pad:]).
    kvp = jnp.concatenate(
        [_prep_packed(k, block_kv, d_pad), _prep_packed(v, block_kv, dv_pad)],
        axis=-1,
    )
    # Per-token metadata fused likewise: q side as (tqp, 2) columns
    # [seg|pos] (fetched once per chain), k side as (2, tkp) ROWS so the
    # per-step block is (2, block_kv) — sublane-padded 2->8 instead of
    # lane-padded 1->128, and no in-kernel (bkv,1)->(1,bkv) transpose.
    qmeta = jnp.concatenate([qseg, qpos], axis=1)
    kmeta = jnp.concatenate([kseg, kpos], axis=1).T

    # Offset kv grid: its length only needs to cover the widest
    # per-q-block visible span (the kernel adds kvmin[qi]). Exact when the
    # cu_seqlens are concrete; under jit-traced metadata fall back to the
    # full packed width.
    try:
        nkb_eff = min(
            nkb, int(jax.device_get(jnp.max(kvmax - kvmin))) + 1
        )
    except (jax.errors.ConcretizationTypeError, jax.errors.TracerArrayConversionError):
        nkb_eff = nkb
    nkb_eff = max(nkb_eff, 1)

    # Precomputed clamped kv block index: each index map is one SMEM load.
    # (Clamping to kvmax makes predicated-off steps repeat the previous
    # block index, so their DMAs are elided by the pipeline.)
    kidx = jnp.minimum(
        kvmin[:, None] + jnp.arange(nkb_eff, dtype=jnp.int32)[None, :],
        kvmax[:, None],
    ).astype(jnp.int32)

    in_specs = [
        pl.BlockSpec((1, block_q, d_pad),
                     lambda h, qi, kj, mn, mx, kx, it: (h, qi, 0)),
        pl.BlockSpec(
            (1, block_kv, d_pad + dv_pad),
            lambda h, qi, kj, mn, mx, kx, it: (h // group_size, kx[qi, kj], 0),
        ),
        pl.BlockSpec((block_q, 2), lambda h, qi, kj, mn, mx, kx, it: (qi, 0)),
        pl.BlockSpec(
            (2, block_kv), lambda h, qi, kj, mn, mx, kx, it: (0, kx[qi, kj])
        ),
    ]
    args = [qp, kvp, qmeta, kmeta]
    if has_qv:
        qvp = _prep_packed(qv, block_q, dv_pad)
        in_specs.insert(2, pl.BlockSpec(
            (1, block_q, dv_pad), lambda h, qi, kj, mn, mx, kx, it: (h, qi, 0)
        ))
        args.insert(2, qvp)

    has_alibi = alibi_slopes is not None
    if has_alibi:
        slopes = jnp.asarray(alibi_slopes, jnp.float32)
        assert slopes.ndim == 1, "varlen alibi supports per-head slopes"
        slopes = slopes[None, :]
        in_specs.append(
            pl.BlockSpec(
                slopes.shape, lambda h, qi, kj, mn, mx, kx, it: (0, 0),
                memory_space=pltpu.SMEM,
            )
        )
        args.append(slopes)

    if dropout_p > 0.0:
        if dropout_seed is None:
            dropout_seed = jnp.zeros((), jnp.int32)
        seed_arr = jnp.asarray(dropout_seed, jnp.int32).reshape(1, 1)
        in_specs.append(
            pl.BlockSpec((1, 1), lambda h, qi, kj, mn, mx, kx, it: (0, 0),
                         memory_space=pltpu.SMEM)
        )
        args.append(seed_arr)

    kernel = functools.partial(
        _varlen_fwd_kernel,
        block_q=block_q, block_kv=block_kv, num_kv_blocks=nkb_eff,
        d_pad=d_pad,
        scale=float(softmax_scale), causal=causal, window=window,
        # Element-level chunk masking stays exact under CP: kpos is absolute
        # and qpos_adj aligns against the CP-total key length.
        attention_chunk=int(attention_chunk),
        softcap=float(softcap), dropout_p=float(dropout_p),
        group_size=group_size,
        has_alibi=has_alibi, has_qv=has_qv, out_dtype=out_dtype,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(num_heads, nqb, nkb_eff),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, block_q, dv_pad),
                         lambda h, qi, kj, mn, mx, kx, it: (h, qi, 0)),
            pl.BlockSpec((1, block_q, 1),
                         lambda h, qi, kj, mn, mx, kx, it: (h, qi, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, NUM_LANES), jnp.float32),
            pltpu.VMEM((block_q, NUM_LANES), jnp.float32),
            pltpu.VMEM((block_q, dv_pad), jnp.float32),
        ],
    )

    out, lse = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((num_heads, nqb * block_q, dv_pad), out_dtype),
            jax.ShapeDtypeStruct((num_heads, nqb * block_q, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(kvmin, kvmax, kidx, interior, *args)

    out = out[:, :total_q, :head_dim_v].transpose(1, 0, 2)
    lse = lse[:, :total_q, 0]
    return out, lse


def flash_attention_varlen_bwd(
    q, k, v, out, lse, do,
    cu_seqlens_q, cu_seqlens_k,
    *,
    qv: Optional[jnp.ndarray] = None,  # (total_q, h, d_v) MLA absorbed
    seqused_q: Optional[jnp.ndarray] = None,
    seqused_k: Optional[jnp.ndarray] = None,
    alibi_slopes: Optional[jnp.ndarray] = None,
    softmax_scale: Optional[float] = None,
    causal: bool = False,
    window_size: Tuple[int, int] = (-1, -1),
    attention_chunk: int = 0,
    softcap: float = 0.0,
    dropout_p: float = 0.0,
    dropout_seed: Optional[jnp.ndarray] = None,
    block_q: int = 256,
    block_kv: int = 256,
    interpret: Optional[bool] = None,
):
    """Packed varlen backward: returns (dq, dk, dv[, dqv]) in packed
    layout (dqv appended when `qv` is given)."""
    total_q, num_heads, head_dim = q.shape
    total_k, num_heads_kv, _ = k.shape
    group_size = num_heads // num_heads_kv
    has_qv = qv is not None
    if softmax_scale is None:
        softmax_scale = (
            (head_dim + v.shape[2]) ** -0.5 if has_qv else head_dim**-0.5
        )
    if interpret is None:
        interpret = interpret_mode()
    window = (int(window_size[0]), int(window_size[1]))
    out_dtype = q.dtype

    nqb = cdiv(total_q, block_q)
    nkb = cdiv(total_k, block_kv)
    d_pad = round_up(head_dim, NUM_LANES)
    head_dim_v = v.shape[2]
    dv_pad = round_up(head_dim_v, NUM_LANES)

    (qseg, qpos, kseg, kpos, kvmin, kvmax, qmin, qmax, interior) = \
        make_varlen_metadata(
        cu_seqlens_q, cu_seqlens_k, total_q, total_k,
        seqused_q=seqused_q, seqused_k=seqused_k,
        block_q=block_q, block_kv=block_kv,
        causal=causal, window=window,
        attention_chunk=attention_chunk,
    )

    # Fused operand blocks (see flash_attention_varlen_fwd): Q|dO, K|V,
    # LSE|delta, qseg|qpos columns, kseg|kpos rows.
    qdop = jnp.concatenate(
        [_prep_packed(q, block_q, d_pad), _prep_packed(do, block_q, dv_pad)],
        axis=-1,
    )
    kvp = jnp.concatenate(
        [_prep_packed(k, block_kv, d_pad), _prep_packed(v, block_kv, dv_pad)],
        axis=-1,
    )
    qvp = _prep_packed(qv, block_q, dv_pad) if qv is not None else None
    # lse/delta: (h, total_q) -> (h, tqp, 2) fused.
    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    delta = delta.transpose(1, 0)  # (h, total_q)
    ldp = jnp.stack(
        [pad_to_block(lse, 1, block_q), pad_to_block(delta, 1, block_q)],
        axis=-1,
    )
    qmeta = jnp.concatenate([qseg, qpos], axis=1)
    kmeta = jnp.concatenate([kseg, kpos], axis=1).T

    has_alibi = alibi_slopes is not None
    slopes = None
    if has_alibi:
        slopes = jnp.asarray(alibi_slopes, jnp.float32)[None, :]

    def specs_for(clamp_q, clamp_kv):
        specs = [
            pl.BlockSpec((1, block_q, d_pad + dv_pad),
                         lambda h, i, j, a, b, c, it: (h, clamp_q(i, j, a, b, c), 0)),
            pl.BlockSpec((1, block_kv, d_pad + dv_pad),
                         lambda h, i, j, a, b, c, it: (h // group_size, clamp_kv(i, j, a, b, c), 0)),
            pl.BlockSpec((1, block_q, 2),
                         lambda h, i, j, a, b, c, it: (h, clamp_q(i, j, a, b, c), 0)),
            pl.BlockSpec((block_q, 2),
                         lambda h, i, j, a, b, c, it: (clamp_q(i, j, a, b, c), 0)),
            pl.BlockSpec((2, block_kv),
                         lambda h, i, j, a, b, c, it: (0, clamp_kv(i, j, a, b, c))),
        ]
        if has_qv:
            specs.insert(2, pl.BlockSpec(
                (1, block_q, dv_pad),
                lambda h, i, j, a, b, c, it: (h, clamp_q(i, j, a, b, c), 0),
            ))
        if has_alibi:
            specs.append(
                pl.BlockSpec(slopes.shape, lambda h, i, j, a, b, c, it: (0, 0),
                             memory_space=pltpu.SMEM)
            )
        if dropout_p > 0.0:
            specs.append(
                pl.BlockSpec((1, 1), lambda h, i, j, a, b, c, it: (0, 0),
                             memory_space=pltpu.SMEM)
            )
        return specs

    base_args = [qdop, kvp, ldp, qmeta, kmeta]
    if has_qv:
        base_args.insert(2, qvp)
    if has_alibi:
        base_args.append(slopes)
    if dropout_p > 0.0:
        if dropout_seed is None:
            dropout_seed = jnp.zeros((), jnp.int32)
        base_args.append(jnp.asarray(dropout_seed, jnp.int32).reshape(1, 1))

    # Offset grids (see flash_attention_varlen_fwd): dim lengths cover
    # only the widest visible span when the metadata is concrete.
    try:
        nqb_eff = min(nqb, int(jax.device_get(jnp.max(qmax - qmin))) + 1)
        nkb_eff = min(nkb, int(jax.device_get(jnp.max(kvmax - kvmin))) + 1)
    except (jax.errors.ConcretizationTypeError,
            jax.errors.TracerArrayConversionError):
        nqb_eff, nkb_eff = nqb, nkb
    nqb_eff = max(nqb_eff, 1)
    nkb_eff = max(nkb_eff, 1)

    # Precomputed clamped block-index tables: one SMEM load per index map.
    qidx = jnp.minimum(
        qmin[:, None] + jnp.arange(nqb_eff, dtype=jnp.int32)[None, :],
        qmax[:, None],
    ).astype(jnp.int32)
    kidx = jnp.minimum(
        kvmin[:, None] + jnp.arange(nkb_eff, dtype=jnp.int32)[None, :],
        kvmax[:, None],
    ).astype(jnp.int32)

    # ---- dK/dV: grid (h, kv, q) ----
    dkv_kernel = functools.partial(
        _varlen_dkv_kernel,
        block_q=block_q, block_kv=block_kv, num_q_blocks=nqb_eff,
        d_pad=d_pad,
        scale=float(softmax_scale), causal=causal, window=window,
        attention_chunk=int(attention_chunk),
        softcap=float(softcap), dropout_p=float(dropout_p),
        has_alibi=has_alibi, has_qv=has_qv,
    )
    dkv_specs = specs_for(
        clamp_q=lambda ki, qj, mn, mx, ix: ix[ki, qj],
        clamp_kv=lambda ki, qj, mn, mx, ix: ki,
    )
    dk_gh, dv_gh = pl.pallas_call(
        dkv_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(num_heads, nkb, nqb_eff),
            in_specs=dkv_specs,
            out_specs=[
                pl.BlockSpec((1, block_kv, d_pad),
                             lambda h, ki, qi, a, b, c, it: (h, ki, 0)),
                pl.BlockSpec((1, block_kv, dv_pad),
                             lambda h, ki, qi, a, b, c, it: (h, ki, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_kv, d_pad), jnp.float32),
                pltpu.VMEM((block_kv, dv_pad), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((num_heads, nkb * block_kv, d_pad), jnp.float32),
            jax.ShapeDtypeStruct((num_heads, nkb * block_kv, dv_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qmin, qmax, qidx, interior, *base_args)

    dk_gh = dk_gh[:, :total_k, :head_dim]
    dv_gh = dv_gh[:, :total_k, :head_dim_v]
    if group_size > 1:
        dk = dk_gh.reshape(num_heads_kv, group_size, total_k, head_dim).sum(1)
        dv = dv_gh.reshape(num_heads_kv, group_size, total_k, head_dim_v).sum(1)
    else:
        dk, dv = dk_gh, dv_gh
    dk = dk.transpose(1, 0, 2).astype(out_dtype)
    dv = dv.transpose(1, 0, 2).astype(out_dtype)

    # ---- dQ: grid (h, q, kv) ----
    dq_kernel = functools.partial(
        _varlen_dq_kernel,
        block_q=block_q, block_kv=block_kv, num_kv_blocks=nkb_eff,
        d_pad=d_pad,
        scale=float(softmax_scale), causal=causal, window=window,
        attention_chunk=int(attention_chunk),
        softcap=float(softcap), dropout_p=float(dropout_p),
        has_alibi=has_alibi, has_qv=has_qv, out_dtype=out_dtype,
    )
    dq_specs = specs_for(
        clamp_q=lambda qi, kj, mn, mx, ix: qi,
        clamp_kv=lambda qi, kj, mn, mx, ix: ix[qi, kj],
    )
    dq_out_specs = [
        pl.BlockSpec((1, block_q, d_pad),
                     lambda h, qi, ki, a, b, c, it: (h, qi, 0)),
    ]
    dq_out_shape = [
        jax.ShapeDtypeStruct((num_heads, nqb * block_q, d_pad), out_dtype),
    ]
    dq_scratch = [pltpu.VMEM((block_q, d_pad), jnp.float32)]
    if has_qv:
        dq_out_specs.append(
            pl.BlockSpec((1, block_q, dv_pad),
                         lambda h, qi, ki, a, b, c, it: (h, qi, 0))
        )
        dq_out_shape.append(
            jax.ShapeDtypeStruct((num_heads, nqb * block_q, dv_pad), out_dtype)
        )
        dq_scratch.append(pltpu.VMEM((block_q, dv_pad), jnp.float32))
    results = pl.pallas_call(
        dq_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(num_heads, nqb, nkb_eff),
            in_specs=dq_specs,
            out_specs=dq_out_specs,
            scratch_shapes=dq_scratch,
        ),
        out_shape=dq_out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(kvmin, kvmax, kidx, interior, *base_args)

    dq = results[0][:, :total_q, :head_dim].transpose(1, 0, 2)
    if has_qv:
        dqv = results[1][:, :total_q, :head_dim_v].transpose(1, 0, 2)
        return dq, dk, dv, dqv
    return dq, dk, dv
