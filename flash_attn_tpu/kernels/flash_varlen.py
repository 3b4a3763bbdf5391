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

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flash_attn_tpu.kernels.common import (
    DEFAULT_MASK_VALUE,
    LOG2E,
    NUM_LANES,
    AuxData,
    call_mod,
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
    xp=jnp,  # array namespace: jnp (device/traced) or numpy (host plans)
):
    """Returns (qseg, qpos_adj, qpos_raw, lo, hi, diag, kseg, kpos, kvmin,
    kvmax, qmin, qmax, interior).

    qseg/kseg: (total,) segment id per token (-1/-2 for tail padding).
    qpos_adj:  per-q-token position shifted by (used_k_j - seqlen_q_j) so the
               bottom-right causal test is simply kpos <= qpos_adj.
    qpos_raw:  unadjusted in-sequence q position (score/mask-mod coordinate).
    lo/hi:     per-q-row visible kv interval in PACKED column coordinates
               (CP: local column units). Segment + causal + window + chunk +
               seqused masking all collapse into `lo <= col <= hi` — the
               kernels' element mask is two compares against these columns
               instead of per-element segment/position tests (the TPU answer
               to the reference's fused BlockInfo/seqlen_traits tests).
    diag:      per-q-row diagonal in packed columns; ALiBi's |rel| is
               |cp_w*col - diag| (under CP diag folds the rank offset).
    kvmin/kvmax: per-q-block kv-block visibility bounds (fwd + dq grids).
    qmin/qmax:   per-kv-block q-block bounds (dkv grid).
    All jnp ops — usable under jit with traced cu_seqlens.
    """
    left, right = window
    nqb = cdiv(total_q, block_q)
    nkb = cdiv(total_k, block_kv)
    tqp = nqb * block_q
    tkp = nkb * block_kv

    cu_q = xp.asarray(cu_seqlens_q, xp.int32)
    cu_k = xp.asarray(cu_seqlens_k, xp.int32)
    nseq = cu_q.shape[0] - 1
    sq_len = cu_q[1:] - cu_q[:-1]  # (nseq,)
    sk_len = cu_k[1:] - cu_k[:-1]
    used_k = (
        xp.asarray(seqused_k, xp.int32) if seqused_k is not None else sk_len
    )
    # seqused_q (hopper/flash_attn_interface.py:30): only the first used_q
    # rows of each sequence participate; the bottom-right diagonal aligns
    # used_q against used_k.
    used_q = (
        xp.asarray(seqused_q, xp.int32) if seqused_q is not None else sq_len
    )
    if cp_world_size > 1:
        # Round-robin CP (hopper/mask.h:103, seqlen.h:59): this rank's local
        # key i has absolute index i*W + rank; per-sequence totals come from
        # cp_tot_seqused_k and bound how many local keys are live.
        tot_k = (
            xp.asarray(cp_tot_seqused_k, xp.int32)
            if cp_tot_seqused_k is not None else used_k * cp_world_size
        )
        used_k = (tot_k - cp_rank + cp_world_size - 1) // cp_world_size

    qidx = xp.arange(tqp, dtype=xp.int32)
    kidx = xp.arange(tkp, dtype=xp.int32)
    # searchsorted gives segment of each token; padding tail -> last+1.
    qseg = xp.searchsorted(cu_q, qidx, side="right").astype(xp.int32) - 1
    kseg = xp.searchsorted(cu_k, kidx, side="right").astype(xp.int32) - 1
    qseg = xp.where(qidx < total_q, qseg, -1)
    kseg = xp.where(kidx < total_k, kseg, -2)

    qseg_c = xp.clip(qseg, 0, nseq - 1)
    kseg_c = xp.clip(kseg, 0, nseq - 1)
    qpos = qidx - cu_q[qseg_c]
    kpos = kidx - cu_k[kseg_c]
    # seqused_k: keys at pos >= used are invisible.
    kseg = xp.where(kpos < used_k[kseg_c], kseg, -2)
    # seqused_q: query rows at pos >= used are inert (masked everywhere;
    # out rows are zero, lse rows -inf, grads zero).
    if seqused_q is not None:
        qseg = xp.where(qpos < used_q[qseg_c], qseg, -1)
    if cp_world_size > 1:
        kpos = kpos * cp_world_size + cp_rank  # absolute key positions
        offset = tot_k - used_q
    else:
        offset = used_k - used_q  # bottom-right alignment per sequence
    qpos_adj = qpos + offset[qseg_c]

    # ---- per-row visible interval [lo, hi] in packed column coords ----
    # Every supported mask (segments, bottom-right causal, sliding window,
    # chunked attention, seqused truncation, CP round-robin) restricts each
    # q row to ONE contiguous packed-column interval, so the kernels test
    # `lo <= col <= hi` — two compares — instead of per-element
    # segment/position arithmetic.
    base_k = cu_k[qseg_c]
    r_right = 0 if (causal and right < 0) else right
    W, rank = cp_world_size, cp_rank
    used_row = used_k[qseg_c]
    if W > 1:
        hi_rel = used_row - 1  # local column units
        if causal or right >= 0:
            hi_rel = xp.minimum(hi_rel, (qpos_adj + r_right - rank) // W)
        lo_rel = xp.zeros_like(qpos_adj)
        if left >= 0:
            lo_rel = xp.maximum(lo_rel, -(-(qpos_adj - left - rank) // W))
        if attention_chunk > 0:
            c_lo = qpos_adj - qpos_adj % attention_chunk
            lo_rel = xp.maximum(lo_rel, -(-(c_lo - rank) // W))
            hi_rel = xp.minimum(
                hi_rel, (c_lo + attention_chunk - 1 - rank) // W
            )
        diag = W * base_k + qpos_adj - rank
    else:
        hi_rel = used_row - 1
        if causal or right >= 0:
            hi_rel = xp.minimum(hi_rel, qpos_adj + r_right)
        lo_rel = xp.zeros_like(qpos_adj)
        if left >= 0:
            lo_rel = xp.maximum(lo_rel, qpos_adj - left)
        if attention_chunk > 0:
            c_lo = qpos_adj - qpos_adj % attention_chunk
            lo_rel = xp.maximum(lo_rel, c_lo)
            hi_rel = xp.minimum(hi_rel, c_lo + attention_chunk - 1)
        diag = base_k + qpos_adj
    lo = base_k + lo_rel
    hi = base_k + hi_rel
    # Invalid rows (tail padding / seqused_q-trimmed): empty interval.
    lo = xp.where(qseg >= 0, lo, 1)
    hi = xp.where(qseg >= 0, hi, 0)
    # Rows that see nothing (hi_rel < lo_rel, e.g. bottom-right rows above
    # the diagonal or seqused_k == 0) must yield span == 0 EXACTLY — the
    # kernels' unsigned-compare mask wraps for negative spans.
    hi = xp.maximum(hi, lo - 1)

    # ---- per-q-block kv bounds ----
    qb = xp.arange(nqb, dtype=xp.int32)
    r_first = xp.minimum(qb * block_q, total_q - 1)
    r_last = xp.minimum(qb * block_q + block_q - 1, total_q - 1)
    jf = qseg_c[r_first]
    jl = qseg_c[r_last]
    if causal or right >= 0:
        r = 0 if (causal and right < 0) else right
        kmax_g = cu_k[jl] + xp.clip(
            qpos_adj[r_last] + r, 0, xp.maximum(used_k[jl] - 1, 0)
        )
    else:
        kmax_g = cu_k[jl] + xp.maximum(used_k[jl] - 1, 0)
    if left >= 0:
        kmin_g = cu_k[jf] + xp.clip(
            qpos_adj[r_first] - left, 0, xp.maximum(used_k[jf] - 1, 0)
        )
    else:
        kmin_g = cu_k[jf]
    if attention_chunk > 0:
        # Chunked attention: row r only sees keys in its own chunk
        # [diag - diag % chunk, +chunk) with diag = qpos_adj.
        d_last = qpos_adj[r_last]
        chunk_hi = d_last - d_last % attention_chunk + attention_chunk - 1
        kmax_g = xp.minimum(
            kmax_g,
            cu_k[jl] + xp.clip(chunk_hi, 0, xp.maximum(used_k[jl] - 1, 0)),
        )
        d_first = qpos_adj[r_first]
        chunk_lo = d_first - d_first % attention_chunk
        kmin_g = xp.maximum(
            kmin_g,
            cu_k[jf] + xp.clip(chunk_lo, 0, xp.maximum(used_k[jf] - 1, 0)),
        )
    kvmax = xp.clip(kmax_g // block_kv, 0, nkb - 1)
    kvmin = xp.clip(kmin_g // block_kv, 0, nkb - 1)
    kvmin = xp.minimum(kvmin, kvmax)

    # ---- per-kv-block q bounds (for the dkv grid) ----
    kb = xp.arange(nkb, dtype=xp.int32)
    c_first = xp.minimum(kb * block_kv, total_k - 1)
    c_last = xp.minimum(kb * block_kv + block_kv - 1, total_k - 1)
    jkf = kseg_c[c_first]
    jkl = kseg_c[c_last]
    if causal or right >= 0:
        r = 0 if (causal and right < 0) else right
        # first q row with qpos_adj + r >= kpos(c_first)
        qmin_g = cu_q[jkf] + xp.clip(
            kpos[c_first] - offset[jkf] - r, 0, sq_len[jkf]
        )
    else:
        qmin_g = cu_q[jkf]
    if left >= 0:
        qmax_g = cu_q[jkl] + xp.clip(
            kpos[c_last] + left - offset[jkl], 0, xp.maximum(sq_len[jkl] - 1, 0)
        )
    else:
        qmax_g = xp.minimum(cu_q[jkl + 1], total_q) - 1
    if attention_chunk > 0:
        # Col c is only visible from rows with qpos_adj in
        # [c - c % chunk, +chunk).
        c_lo = kpos[c_first] - kpos[c_first] % attention_chunk
        qmin_g = xp.maximum(
            qmin_g, cu_q[jkf] + xp.clip(c_lo - offset[jkf], 0, sq_len[jkf])
        )
        c_hi = (
            kpos[c_last] - kpos[c_last] % attention_chunk
            + attention_chunk - 1
        )
        qmax_g = xp.minimum(
            qmax_g,
            cu_q[jkl] + xp.clip(
                c_hi - offset[jkl], 0, xp.maximum(sq_len[jkl] - 1, 0)
            ),
        )
    qmax = xp.clip(qmax_g // block_q, 0, nqb - 1)
    qmin = xp.clip(qmin_g // block_q, 0, nqb - 1)
    qmin = xp.minimum(qmin, qmax)

    if cp_world_size > 1:
        kvmin = xp.zeros_like(kvmin)
        kvmax = xp.full_like(kvmax, nkb - 1)
        qmin = xp.zeros_like(qmin)
        qmax = xp.full_like(qmax, nqb - 1)

    # ---- per-(q-block, kv-block) interior table ----
    # A tile is INTERIOR when every element passes every mask test, i.e.
    # every row's visible interval covers the tile's full column range.
    # lo and hi are monotone non-decreasing within a segment, so endpoint
    # checks suffice once the tile's rows are one valid segment.
    qseg_f = qseg[xp.minimum(qb * block_q, tqp - 1)]
    qseg_l = qseg[r_last]
    q_uni = xp.logical_and(qseg_f == qseg_l, qseg_f >= 0)  # (nqb,)
    c_first_u = kb * block_kv  # UNCLIPPED tile column range
    c_last_u = kb * block_kv + block_kv - 1
    interior = xp.logical_and(
        q_uni[:, None],
        xp.logical_and(
            lo[r_last][:, None] <= c_first_u[None, :],
            hi[r_first][:, None] >= c_last_u[None, :],
        ),
    ).astype(xp.int32)

    return (
        qseg[:, None], qpos_adj[:, None], qpos[:, None],
        lo[:, None], hi[:, None], diag[:, None],
        kseg[:, None], kpos[:, None],
        kvmin, kvmax, qmin, qmax, interior,
    )


# Worklist flag bits (scalar-prefetch `flags` table).
_WL_START = 1     # first step of an output chain: zero the accumulators
_WL_END = 2       # last step of a chain: normalize + write out
_WL_INTERIOR = 4  # tile passes every mask test: skip element masking
_WL_DEAD = 8      # predicated-off step (traced-metadata fallback only)
# Bits >= _WL_PAGE_SHIFT carry the PHYSICAL page id of the step's kv block
# in paged-pool mode (in-kernel block-table reads, reference
# hopper/paged_kv.h:18,135 PagedKVManager/load_page_table): the kv
# BlockSpec index map reads `flags[t] >> _WL_PAGE_SHIFT` so each grid step
# DMAs its page straight from the pool — no gathered KV copy.
_WL_PAGE_SHIFT = 4


@dataclasses.dataclass(frozen=True)
class VarlenPlan:
    """A real, reusable scheduler plan (the reference's consumable
    scheduler_metadata: per-batch splits + ordering computed ONCE by
    hopper/flash_prepare_scheduler.cu:43 and fed back through
    hopper/flash_api.cpp:584 — here the exact tile worklist).

    Built on the HOST by `make_varlen_plan` from concrete seqlens, then
    passed into flash_attention_varlen_fwd (directly or via
    vllm_compat.get_scheduler_metadata). Because the tables are numpy,
    the plan stays host-concrete even when the attention call is traced
    under jit — without a plan, a jitted call can only run the
    rectangular fallback worklist (traced metadata), re-planning per
    trace. Build once per seqlen set, reuse across LAYERS freely; across
    STEPS only while the per-sequence lengths are unchanged — chunked
    prefill grows seqused_k every step, so rebuild per step. The plan
    snapshots the seqlens it was built from and the consumer validates
    them whenever the call's metadata is host-concrete (a traced call
    cannot be checked — the plan is trusted there, which is its purpose).
    """

    block_q: int
    block_kv: int
    causal: bool
    window: Tuple[int, int]
    attention_chunk: int
    total_q: int
    total_k: int
    qtab: object   # numpy (n_steps,) int32 q-block per step
    ktab: object   # numpy (n_steps,) int32 kv-block per step
    flags: object  # numpy (n_steps,) int32 _WL_* bits (+ page ids)
    n_steps: int
    # Seqlen snapshot (numpy; None on legacy plans): the exact inputs the
    # worklist was derived from, used for staleness validation.
    cu_q: object = None
    cu_k: object = None
    used_q: object = None
    used_k: object = None

    def with_pages(self, page_of_block) -> "VarlenPlan":
        """Fold physical page ids into the flags (paged-pool mode)."""
        pob = np.asarray(page_of_block, np.int64)
        flags = (
            np.asarray(self.flags, np.int64)
            | (pob[np.asarray(self.ktab, np.int64)] << _WL_PAGE_SHIFT)
        ).astype(np.int32)
        return dataclasses.replace(self, flags=flags)


def make_varlen_plan(
    cu_seqlens_q,
    cu_seqlens_k,
    *,
    seqused_q=None,
    seqused_k=None,
    total_q: Optional[int] = None,
    total_k: Optional[int] = None,
    block_q: int = 1024,
    block_kv: int = 1024,
    causal: bool = False,
    window: Tuple[int, int] = (-1, -1),
    attention_chunk: int = 0,
    cp_world_size: int = 1,
    cp_rank: int = 0,
    cp_tot_seqused_k=None,
) -> VarlenPlan:
    """Build the exact forward worklist plan from HOST-concrete seqlens.

    Runs ENTIRELY in numpy (make_varlen_metadata with xp=np), so it works
    even when invoked from inside a traced region as long as the seqlen
    arguments themselves are host-concrete; the returned plan is valid
    inside jit ONLY for tensors matching (total_q, total_k), the masking
    configuration, AND the exact per-sequence lengths it was built from
    (the consumer validates the seqlen snapshot whenever the call's
    metadata is host-concrete; a stale plan would silently skip visible
    tiles, so never reuse one across steps that change seqused_k).
    """

    def host(x):
        return None if x is None else np.asarray(jax.device_get(x))

    cu_q = np.asarray(jax.device_get(cu_seqlens_q), np.int64)
    cu_k = np.asarray(jax.device_get(cu_seqlens_k), np.int64)
    if total_q is None:
        total_q = int(cu_q[-1])
    if total_k is None:
        total_k = int(cu_k[-1])
    nqb = cdiv(total_q, block_q)
    nkb = cdiv(total_k, block_kv)
    (*_, kvmin, kvmax, _, _, interior) = make_varlen_metadata(
        cu_q, cu_k, total_q, total_k,
        seqused_q=host(seqused_q), seqused_k=host(seqused_k),
        block_q=block_q, block_kv=block_kv,
        causal=causal, window=window,
        attention_chunk=attention_chunk,
        cp_world_size=cp_world_size, cp_rank=cp_rank,
        cp_tot_seqused_k=host(cp_tot_seqused_k),
        xp=np,
    )
    qtab, ktab, flags, n_steps = _worklist_host(
        np.asarray(kvmin), np.asarray(kvmax), np.asarray(interior), nqb
    )
    return VarlenPlan(
        block_q=block_q, block_kv=block_kv, causal=causal,
        window=(int(window[0]), int(window[1])),
        attention_chunk=int(attention_chunk),
        total_q=total_q, total_k=total_k,
        qtab=qtab, ktab=ktab, flags=flags, n_steps=n_steps,
        cu_q=cu_q.astype(np.int64), cu_k=cu_k.astype(np.int64),
        used_q=host(seqused_q), used_k=host(seqused_k),
    )


def _check_plan_seqlens(plan, cu_q, cu_k, seqused_q, seqused_k):
    """Reject a stale plan: per-sequence lengths are part of the worklist,
    so a plan reused after seqused_k grew (e.g. across chunked-prefill
    steps) would silently skip visible tiles. Only checkable when the
    call's metadata is host-concrete; traced calls trust the plan (which
    is the plan's whole purpose under jit). Legacy plans without a
    snapshot (cu_q is None) are accepted unchecked."""
    if plan.cu_q is None:
        return

    def host(x):
        if x is None:
            return None
        try:
            return np.asarray(jax.device_get(x), np.int64)
        except (jax.errors.ConcretizationTypeError,
                jax.errors.TracerArrayConversionError):
            return "traced"

    for name, snap, call in (
        ("cu_seqlens_q", plan.cu_q, host(cu_q)),
        ("cu_seqlens_k", plan.cu_k, host(cu_k)),
        ("seqused_q", plan.used_q, host(seqused_q)),
        ("seqused_k", plan.used_k, host(seqused_k)),
    ):
        if isinstance(call, str) or (snap is None and call is None):
            continue
        if (snap is None) != (call is None) or not np.array_equal(
            np.asarray(snap, np.int64), call
        ):
            raise AssertionError(
                f"stale VarlenPlan: the call's {name} differs from the "
                "lengths the plan was built from — rebuild the plan "
                "(make_varlen_plan) whenever per-sequence lengths change "
                "(chunked prefill changes seqused_k every step)"
            )


def _worklist_host(mn, mx, it, n_chains: int):
    """Numpy worklist core (shared by build_worklist's host branch and
    make_varlen_plan, which must stay numpy-pure under tracing)."""
    spans = (mx - mn + 1).astype(np.int64)
    total = int(spans.sum())
    ends = np.cumsum(spans)
    starts = ends - spans
    ctab = np.repeat(np.arange(n_chains, dtype=np.int32),
                     spans).astype(np.int32)
    stab = (
        np.arange(total, dtype=np.int64) - starts[ctab] + mn[ctab]
    ).astype(np.int32)
    flags = (it[ctab, stab] * _WL_INTERIOR).astype(np.int32)
    flags[starts] |= _WL_START
    flags[ends - 1] |= _WL_END
    return ctab, stab, flags, total


def build_worklist(cmin, cmax, interior, n_chains: int, n_steps: int):
    """Exact tile worklist for the varlen kernels.

    Each output chain c (a q block in the fwd/dQ grids, a kv block in the
    dK/dV grid) visits exactly the tiles [cmin[c], cmax[c]] of the other
    axis. When the bounds are concrete (host-known cu_seqlens — the serving
    and benchmark path) the worklist is EXACT: the flat grid has
    sum(cmax-cmin+1) steps and zero predicated-off steps — the varlen analog
    of the dense kernels' folded causal pair grid (flash_fwd.py fold_r), but
    table-driven because packed sequence layouts have no closed form. Under
    traced metadata it falls back to a rectangular chain x widest-span grid
    with dead steps flagged (bit 8), matching the round-2 offset grid.

    Returns (ctab, stab, flags, n_total_steps, exact):
      ctab[t]: chain index of step t (non-decreasing -> Pallas flushes each
               output block exactly once), stab[t]: visited block on the
               swept axis, flags[t]: _WL_* bits. `interior` is indexed
               [chain, step] — pass it transposed for the dkv grid.
      exact: True when the worklist has no dead steps.
    """
    try:
        ctab, stab, flags, total = _worklist_host(
            np.asarray(jax.device_get(cmin)),
            np.asarray(jax.device_get(cmax)),
            np.asarray(jax.device_get(interior)),
            n_chains,
        )
        return (
            jnp.asarray(ctab), jnp.asarray(stab), jnp.asarray(flags), total,
            True,
        )
    except (jax.errors.ConcretizationTypeError,
            jax.errors.TracerArrayConversionError):
        pass
    total = n_chains * n_steps
    t = jnp.arange(total, dtype=jnp.int32)
    ctab = t // n_steps
    off = t % n_steps
    s_raw = cmin[ctab] + off
    dead = s_raw > cmax[ctab]
    stab = jnp.minimum(s_raw, cmax[ctab])  # repeat last block: DMA elided
    flags = (
        jnp.where(off == 0, _WL_START, 0)
        + jnp.where(off == n_steps - 1, _WL_END, 0)
        + interior[ctab, stab] * _WL_INTERIOR
        + jnp.where(dead, _WL_DEAD, 0)
    ).astype(jnp.int32)
    return ctab, stab, flags, total, False


# ---------------------------------------------------------------------------
# Shared tile math.
# ---------------------------------------------------------------------------

def _varlen_fwd_kernel(
    qtab_ref, ktab_ref, flags_ref,  # scalar prefetch (worklist tables)
    *refs,
    block_q: int, block_kv: int, d_pad: int,
    scale: float, cp_w: int,
    softcap: float, dropout_p: float, group_size: int,
    has_alibi: bool, has_qv: bool, has_bias: bool, out_dtype,
    score_mod=None, mask_mod=None,
    num_aux: int = 0, aux_shapes: tuple = (), num_aux_scalars: int = 0,
    exact_worklist: bool = True,
    paged_pool: Optional[str] = None,  # None | "fused" | "pair"
):
    # Worklist grid: one flat `t` dimension walks the exact list of visible
    # (q block, kv block) tiles (build_worklist) — zero predicated-off grid
    # steps when the packing is host-known, the varlen counterpart of the
    # dense folded causal grid. Per-step operands stay FUSED (K|V one
    # lane-concatenated block), every dynamic index map is a single SMEM
    # table load, and ALL masking is two compares against the per-row
    # [lo, hi] interval columns (k-side metadata rides only with mods).
    # paged_pool: the kv operand reads pages straight from the KV pool via
    # page ids packed into the flags table (in-kernel block-table reads).
    has_kmeta = score_mod is not None or mask_mod is not None
    idx = 0
    q_ref = refs[idx]; idx += 1
    kv_ref = refs[idx]; idx += 1
    v2_ref = None
    if paged_pool == "pair":
        v2_ref = refs[idx]; idx += 1
    qv_ref = None
    if has_qv:
        qv_ref = refs[idx]; idx += 1
    qmeta_ref = refs[idx]; idx += 1
    kmeta_ref = None
    if has_kmeta:
        kmeta_ref = refs[idx]; idx += 1
    bias_ref = slopes_ref = seed_ref = None
    if has_bias:
        bias_ref = refs[idx]; idx += 1
    if has_alibi:
        slopes_ref = refs[idx]; idx += 1
    if dropout_p > 0.0:
        seed_ref = refs[idx]; idx += 1
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

    h = pl.program_id(0)
    t = pl.program_id(1)
    qi = qtab_ref[t]
    ki = ktab_ref[t]
    fl = flags_ref[t]
    # Chain start is folded into the compute step (write-through): instead
    # of a separate zero-init region, the scalar `start` predicate gates the
    # previous chain's stale accumulators out of the online-softmax update —
    # no VMEM fills, no extra predicated region, shorter chain-boundary
    # pipeline bubble. (Table-driven index derivation measured IDENTICAL to
    # closed-form and 3D chain grids — PROFILE_VARLEN.md round 4.)
    start = jnp.bitwise_and(fl, _WL_START) != 0

    if exact_worklist:
        should_run = jnp.bool_(True)
    else:
        # Chain-start steps are never dead (offset 0 of a span is always
        # live), so the start gating below always fires on live compute.
        should_run = jnp.bitwise_and(fl, _WL_DEAD) == 0
    # Interior tiles (single segment, fully below the diagonal/inside the
    # window) skip every element-mask op — the varlen analog of the dense
    # kernels' interior/edge specialization. ALiBi needs rel and mask_mod
    # can hide any element, so both stay on the masked path.
    if has_alibi or mask_mod is not None:
        is_interior = jnp.bool_(False)
    else:
        is_interior = jnp.bitwise_and(fl, _WL_INTERIOR) != 0

    if num_aux or num_aux_scalars:
        aux = AuxData(
            tensors=tuple(
                r[...].reshape(shp) for r, shp in zip(aux_refs, aux_shapes)
            ),
            scalars=tuple(auxsc_ref[0, i] for i in range(num_aux_scalars)),
        )
    else:
        aux = None

    def _compute(with_mask: bool):
        q = q_ref[0]  # (bq, d)
        if paged_pool == "fused":
            kvt = kv_ref[0, 0]  # (page, kpad+vpad) straight from the pool
            k = kvt[:, :d_pad]
            v = kvt[:, d_pad:]
        elif paged_pool == "pair":
            k = kv_ref[0, 0]
            v = v2_ref[0, 0]
        else:
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
            s_nat = jnp.tanh(s * (scale / softcap)) * softcap
        elif score_mod is not None:
            s_nat = s * scale
        else:
            s_nat = None  # fold scale into the LOG2E multiply below
        if score_mod is not None:
            # FA4 varlen programmable attention (cute/interface.py:3015):
            # mods see per-SEQUENCE coordinates — b is the segment id of
            # each query row, q_idx/kv_idx are in-sequence positions
            # (broadcast to full tile shape so aux_take-style gathers work
            # exactly as on the dense path).
            zero = jnp.zeros(s.shape, jnp.int32)
            b_rows = qmeta_ref[:, 0:1]
            sm_rows = qmeta_ref[:, 2:3] + zero  # raw in-sequence q position
            sm_cols = kmeta_ref[1:2, :] + zero  # in-sequence k position
            s_nat = call_mod(
                score_mod, s_nat, b_rows, h, sm_rows, sm_cols, aux=aux
            ).astype(jnp.float32)
        if s_nat is None:
            # One fused multiply (Mosaic does no algebraic simplification).
            s2 = s * (scale * LOG2E)
        else:
            s2 = s_nat * LOG2E
        if has_bias:
            # Packed-coordinate additive bias: bias[h, i, j] for packed
            # token coordinates i, j (the varlen layout of the reference
            # Triton kernel's per-batch bias).
            s2 = s2 + bias_ref[0].astype(jnp.float32) * LOG2E

        if with_mask:
            # Masked elements get the finite _MASK2 score; exp2(_MASK2 - m)
            # underflows to exactly 0 whenever the row has any visible
            # element, so no second where on p is needed — fully-empty rows
            # are detected at finalize via m == _MASK2.
            # Interval mask: two SIGNED compares. (A uint32 sub+compare
            # "one-op" trick measured 17% SLOWER per masked step on v5e —
            # the unsigned compare + dtype converts lower worse than
            # compare+and. PROFILE_VARLEN.md round 4.)
            cols = (
                jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                + ki * block_kv
            )
            mask = jnp.logical_and(
                cols >= qmeta_ref[:, 3:4], cols <= qmeta_ref[:, 4:5]
            )
            if has_alibi:
                slope2 = slopes_ref[0, h] * LOG2E
                rel = cols * cp_w - qmeta_ref[:, 5:6]
                s2 = s2 - slope2 * jnp.abs(rel.astype(jnp.float32))
            if mask_mod is not None:
                zero = jnp.zeros(mask.shape, jnp.int32)
                mask = jnp.logical_and(
                    mask,
                    call_mod(
                        mask_mod, qmeta_ref[:, 0:1], h,
                        qmeta_ref[:, 2:3] + zero,
                        kmeta_ref[1:2, :] + zero, aux=aux,
                    ),
                )
            s2 = jnp.where(mask, s2, _MASK2)
        # Write-through chain start: stale scratch from the previous chain
        # is gated out by the scalar `start` predicate (selects are
        # scalar-predicated vector moves — cheaper than zero-fills + a
        # separate init region).
        m_prev = jnp.where(start, jnp.full_like(m_scr, _MASK2), m_scr[...])
        m_cur = jnp.max(s2, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp2(m_prev - m_next)
        kv_rep = s2.shape[1] // m_next.shape[1]
        m_full = pltpu.repeat(m_next, kv_rep, axis=1) if kv_rep > 1 else m_next
        p = jnp.exp2(s2 - m_full)
        l_prev = jnp.where(start, jnp.zeros_like(l_scr), l_scr[...])
        l_scr[...] = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
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
        acc_prev = jnp.where(start, jnp.zeros_like(acc_scr), acc_scr[...])
        acc_scr[...] = acc_prev * alpha_full + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    import os as _os
    _force = _os.environ.get("FA_VARLEN_FORCE_BODY", "")
    if _force == "edge":
        @pl.when(should_run)
        def _body_forced_edge():
            _compute(with_mask=True)
    elif _force == "interior":
        @pl.when(should_run)
        def _body_forced_interior():
            _compute(with_mask=False)
    elif _force == "bare":
        _compute(with_mask=False)  # no predicated region at all
    elif _force == "bare_edge":
        _compute(with_mask=True)
    else:
        @pl.when(jnp.logical_and(should_run, is_interior))
        def _body_interior():
            _compute(with_mask=False)

        @pl.when(jnp.logical_and(should_run, jnp.logical_not(is_interior)))
        def _body_edge():
            _compute(with_mask=True)

    @pl.when(jnp.bitwise_and(fl, _WL_END) != 0)
    def _finalize():
        m = m_scr[...][:, 0:1]
        l = l_scr[...][:, 0:1]
        # Rows with no visible element keep m == _MASK2 exactly (real
        # scores are never that negative); their accumulated p is junk
        # (no p-masking in the mainloop) and is zeroed here.
        empty = m == _MASK2
        l_inv = jnp.where(jnp.logical_or(empty, l == 0.0), 0.0, 1.0 / l)
        if dropout_p > 0.0:
            l_inv = l_inv * (1.0 / (1.0 - dropout_p))
        o_val = (acc_scr[...] * l_inv).astype(out_dtype)
        lse_val = jnp.where(
            jnp.logical_or(empty, l == 0.0),
            -jnp.inf,
            (m + jnp.log2(jnp.maximum(l, 1e-37))) / LOG2E,
        )
        o_ref[0] = o_val
        lse_ref[0] = lse_val


def _varlen_recompute(
    q, k, v, do, lse2, delta,
    qmeta, kmeta, slopes_ref, h,
    *, scale, cp_w, softcap, has_alibi,
    dropout_p=0.0, seed_ref=None, qi=0, ki=0, block_q=0, block_kv=0,
    qv=None, with_mask=True,
    bias_ref=None, score_mod=None, mask_mod=None, aux=None,
):
    """Returns (p_drop, ds_scaled, dbias_tile) — dbias_tile None w/o bias.

    qmeta: (block_q, 6) columns [seg|pos_adj|pos_raw|lo|hi|diag];
    kmeta: (2, block_kv) rows [kseg|kpos], present only with mods."""
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if qv is not None:
        s = s + jax.lax.dot_general(
            qv, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
    if softcap > 0.0:
        t = jnp.tanh(s * (scale / softcap))
        s_nat = t * softcap
    else:
        t = None
        s_nat = s * scale
    mod_vjp = None
    if score_mod is not None:
        # Differentiate through the user's score_mod at trace time (the vjp
        # inlines as more JAX ops). Varlen mods see per-sequence coords.
        zero = jnp.zeros(s.shape, jnp.int32)
        s_nat, mod_vjp = jax.vjp(
            lambda x: call_mod(
                score_mod, x, qmeta[:, 0:1], h,
                qmeta[:, 2:3] + zero, kmeta[1:2, :] + zero, aux=aux
            ).astype(jnp.float32),
            s_nat,
        )
    s2 = s_nat * LOG2E
    if bias_ref is not None:
        s2 = s2 + bias_ref[0].astype(jnp.float32) * LOG2E
    if with_mask:
        cols = (
            jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ki * block_kv
        )
        mask = jnp.logical_and(
            cols >= qmeta[:, 3:4], cols <= qmeta[:, 4:5]
        )
        if has_alibi:
            slope2 = slopes_ref[0, h] * LOG2E
            rel = cols * cp_w - qmeta[:, 5:6]
            s2 = s2 - slope2 * jnp.abs(rel.astype(jnp.float32))
        if mask_mod is not None:
            zero = jnp.zeros(mask.shape, jnp.int32)
            mask = jnp.logical_and(
                mask,
                call_mod(
                    mask_mod, qmeta[:, 0:1], h, qmeta[:, 2:3] + zero,
                    kmeta[1:2, :] + zero, aux=aux
                ),
            )
        p = jnp.exp2(s2 - lse2)
        p = jnp.where(mask, p, 0.0)
    else:
        # Interior tile: every element passes every mask test
        # (precomputed interval table; see make_varlen_metadata).
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
    dbias_tile = ds if bias_ref is not None else None
    if mod_vjp is not None:
        (ds,) = mod_vjp(ds)
    if softcap > 0.0:
        ds = ds * ((1.0 - t * t) * scale)
    else:
        ds = ds * scale
    return p_drop, ds, dbias_tile


def _varlen_dkv_kernel(
    ktab_ref, qtab_ref, flags_ref,  # scalar prefetch (worklist: kv chains)
    *refs,
    block_q: int, block_kv: int, d_pad: int,
    scale: float,
    softcap: float, dropout_p: float, has_alibi: bool,
    has_qv: bool = False, has_bias: bool = False,
    score_mod=None, mask_mod=None,
    num_aux: int = 0, aux_shapes: tuple = (), num_aux_scalars: int = 0,
    exact_worklist: bool = True,
):
    # Worklist grid over kv chains (see _varlen_fwd_kernel). Fused per-step
    # operands: Q|dO one block, LSE|delta one block, qmeta one block.
    has_kmeta = score_mod is not None or mask_mod is not None
    idx = 0
    qdo_ref = refs[idx]; idx += 1
    kv_ref = refs[idx]; idx += 1
    qv_ref = None
    if has_qv:
        qv_ref = refs[idx]; idx += 1
    ld_ref = refs[idx]; idx += 1
    qmeta_ref = refs[idx]; idx += 1
    kmeta_ref = None
    if has_kmeta:
        kmeta_ref = refs[idx]; idx += 1
    bias_ref = slopes_ref = seed_ref = None
    if has_bias:
        bias_ref = refs[idx]; idx += 1
    if has_alibi:
        slopes_ref = refs[idx]; idx += 1
    if dropout_p > 0.0:
        seed_ref = refs[idx]; idx += 1
    aux_refs = []
    for _ in range(num_aux):
        aux_refs.append(refs[idx]); idx += 1
    auxsc_ref = None
    if num_aux_scalars:
        auxsc_ref = refs[idx]; idx += 1
    dk_ref = refs[idx]; idx += 1
    dv_ref = refs[idx]; idx += 1
    dk_scr = refs[idx]; idx += 1
    dv_scr = refs[idx]; idx += 1

    h = pl.program_id(0)
    t = pl.program_id(1)
    ki = ktab_ref[t]
    qi = qtab_ref[t]
    fl = flags_ref[t]
    # Write-through chain start (see _varlen_fwd_kernel): stale scratch is
    # gated out inside the accumulate; start steps are never dead.
    start = jnp.bitwise_and(fl, _WL_START) != 0

    if exact_worklist:
        should_run = jnp.bool_(True)
    else:
        should_run = jnp.bitwise_and(fl, _WL_DEAD) == 0
    if has_alibi or mask_mod is not None:
        is_interior = jnp.bool_(False)
    else:
        is_interior = jnp.bitwise_and(fl, _WL_INTERIOR) != 0

    if num_aux or num_aux_scalars:
        aux = AuxData(
            tensors=tuple(
                r[...].reshape(shp) for r, shp in zip(aux_refs, aux_shapes)
            ),
            scalars=tuple(auxsc_ref[0, i] for i in range(num_aux_scalars)),
        )
    else:
        aux = None

    def _body(with_mask: bool):
        q = qdo_ref[0][:, :d_pad]
        do = qdo_ref[0][:, d_pad:].astype(jnp.float32)
        k = kv_ref[0][:, :d_pad]
        v = kv_ref[0][:, d_pad:]
        p, ds, _ = _varlen_recompute(
            q, k, v, do,
            ld_ref[0][:, 0:1] * LOG2E, ld_ref[0][:, 1:2],
            qmeta_ref[...], kmeta_ref[...] if has_kmeta else None,
            slopes_ref, h,
            scale=scale, cp_w=1,
            softcap=softcap, has_alibi=has_alibi,
            dropout_p=dropout_p, seed_ref=seed_ref, qi=qi, ki=ki,
            block_q=block_q, block_kv=block_kv,
            qv=qv_ref[0] if has_qv else None,
            with_mask=with_mask,
            bias_ref=bias_ref,
            score_mod=score_mod, mask_mod=mask_mod, aux=aux,
        )
        dv_prev = jnp.where(start, jnp.zeros_like(dv_scr), dv_scr[...])
        dv_new = dv_prev + jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if has_qv:
            # V also enters the scores: dV += dS^T Qv.
            dv_new = dv_new + jax.lax.dot_general(
                ds, qv_ref[0].astype(jnp.float32), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        dv_scr[...] = dv_new
        dk_prev = jnp.where(start, jnp.zeros_like(dk_scr), dk_scr[...])
        dk_scr[...] = dk_prev + jax.lax.dot_general(
            ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(jnp.logical_and(should_run, is_interior))
    def _body_interior():
        _body(with_mask=False)

    @pl.when(jnp.logical_and(should_run, jnp.logical_not(is_interior)))
    def _body_edge():
        _body(with_mask=True)

    @pl.when(jnp.bitwise_and(fl, _WL_END) != 0)
    def _finalize():
        dk_ref[0] = dk_scr[...]
        dv_ref[0] = dv_scr[...]


def _varlen_dq_kernel(
    qtab_ref, ktab_ref, flags_ref,  # scalar prefetch (worklist: q chains)
    *refs,
    block_q: int, block_kv: int, d_pad: int,
    scale: float,
    softcap: float, dropout_p: float, has_alibi: bool,
    has_qv: bool = False, out_dtype=None,
    has_bias: bool = False, bias_grad: bool = False,
    score_mod=None, mask_mod=None,
    num_aux: int = 0, aux_shapes: tuple = (), num_aux_scalars: int = 0,
    exact_worklist: bool = True,
):
    # Worklist grid over q chains (see _varlen_fwd_kernel). Fused per-step
    # operands: K|V one block.
    has_kmeta = score_mod is not None or mask_mod is not None
    idx = 0
    qdo_ref = refs[idx]; idx += 1
    kv_ref = refs[idx]; idx += 1
    qv_ref = None
    if has_qv:
        qv_ref = refs[idx]; idx += 1
    ld_ref = refs[idx]; idx += 1
    qmeta_ref = refs[idx]; idx += 1
    kmeta_ref = None
    if has_kmeta:
        kmeta_ref = refs[idx]; idx += 1
    bias_ref = slopes_ref = seed_ref = None
    if has_bias:
        bias_ref = refs[idx]; idx += 1
    if has_alibi:
        slopes_ref = refs[idx]; idx += 1
    if dropout_p > 0.0:
        seed_ref = refs[idx]; idx += 1
    aux_refs = []
    for _ in range(num_aux):
        aux_refs.append(refs[idx]); idx += 1
    auxsc_ref = None
    if num_aux_scalars:
        auxsc_ref = refs[idx]; idx += 1
    dq_ref = refs[idx]; idx += 1
    dbias_ref = None
    if bias_grad:
        dbias_ref = refs[idx]; idx += 1
    dqv_ref = None
    if has_qv:
        dqv_ref = refs[idx]; idx += 1
    dq_scr = refs[idx]; idx += 1
    dqv_scr = None
    if has_qv:
        dqv_scr = refs[idx]; idx += 1

    h = pl.program_id(0)
    t = pl.program_id(1)
    qi = qtab_ref[t]
    ki = ktab_ref[t]
    fl = flags_ref[t]
    # Write-through chain start (see _varlen_fwd_kernel).
    start = jnp.bitwise_and(fl, _WL_START) != 0

    if exact_worklist:
        should_run = jnp.bool_(True)
    else:
        should_run = jnp.bitwise_and(fl, _WL_DEAD) == 0
    if has_alibi or mask_mod is not None:
        is_interior = jnp.bool_(False)
    else:
        is_interior = jnp.bitwise_and(fl, _WL_INTERIOR) != 0

    if bias_grad:
        # dbias tiles flush every step; unvisited/dead tiles must be zero
        # (the caller routes bias_grad onto a full-rectangle worklist).
        @pl.when(jnp.logical_not(should_run))
        def _zero_dbias():
            dbias_ref[0] = jnp.zeros_like(dbias_ref[0])

    if num_aux or num_aux_scalars:
        aux = AuxData(
            tensors=tuple(
                r[...].reshape(shp) for r, shp in zip(aux_refs, aux_shapes)
            ),
            scalars=tuple(auxsc_ref[0, i] for i in range(num_aux_scalars)),
        )
    else:
        aux = None

    def _body(with_mask: bool):
        q = qdo_ref[0][:, :d_pad]
        do = qdo_ref[0][:, d_pad:].astype(jnp.float32)
        k = kv_ref[0][:, :d_pad]
        v = kv_ref[0][:, d_pad:]
        _, ds, dbias_tile = _varlen_recompute(
            q, k, v, do,
            ld_ref[0][:, 0:1] * LOG2E, ld_ref[0][:, 1:2],
            qmeta_ref[...], kmeta_ref[...] if has_kmeta else None,
            slopes_ref, h,
            scale=scale, cp_w=1,
            softcap=softcap, has_alibi=has_alibi,
            dropout_p=dropout_p, seed_ref=seed_ref, qi=qi, ki=ki,
            block_q=block_q, block_kv=block_kv,
            qv=qv_ref[0] if has_qv else None,
            with_mask=with_mask,
            bias_ref=bias_ref,
            score_mod=score_mod, mask_mod=mask_mod, aux=aux,
        )
        if bias_grad:
            dbias_ref[0] = dbias_tile.astype(dbias_ref.dtype)
        dq_prev = jnp.where(start, jnp.zeros_like(dq_scr), dq_scr[...])
        dq_scr[...] = dq_prev + jax.lax.dot_general(
            ds, k.astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if has_qv:
            # dQv += dS V (MLA absorbed scores).
            dqv_prev = jnp.where(
                start, jnp.zeros_like(dqv_scr), dqv_scr[...]
            )
            dqv_scr[...] = dqv_prev + jax.lax.dot_general(
                ds, v.astype(jnp.float32), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    @pl.when(jnp.logical_and(should_run, is_interior))
    def _body_interior():
        _body(with_mask=False)

    @pl.when(jnp.logical_and(should_run, jnp.logical_not(is_interior)))
    def _body_edge():
        _body(with_mask=True)

    @pl.when(jnp.bitwise_and(fl, _WL_END) != 0)
    def _finalize():
        dq_ref[0] = dq_scr[...].astype(out_dtype)
        if has_qv:
            dqv_ref[0] = dqv_scr[...].astype(out_dtype)


# ---------------------------------------------------------------------------
# Host wrappers.
# ---------------------------------------------------------------------------

def _prep_packed(x, axis_block, d_pad, layout="thd"):
    # (total, h, d) -> (h, total_pad, d_pad); layout="hsd" inputs are
    # already (h, total, d) — the kernel-native layout — so prep is pad
    # only (and when the caller pre-pads, a no-op). This is the knob that
    # kills the transpose/concat residue PROFILE_VARLEN.md identified: a
    # model/serving layer keeping Q/K/V head-major across layers pays no
    # per-call relayout (the reference's varlen reads (total, h, d)
    # natively because CUDA threads address strides directly,
    # csrc/flash_attn/src/block_info.h:13; Mosaic requires lane-tiled
    # last-2 dims, so head-major IS the TPU-native packed layout).
    if layout != "hsd":
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
    attn_bias: Optional[jnp.ndarray] = None,  # (h|1, total_q, total_k) packed
    score_mod=None,
    mask_mod=None,
    aux_tensors=(),
    aux_scalars=(),
    block_q: int = 1024,
    block_kv: int = 512,
    layout: str = "thd",  # "hsd": q/k/v/qv are head-major (h, total, d)
    kv_pools=None,  # (k_pool, v_pool|None): in-kernel paged-KV reads.
    # Pools are TPU-native head-major (npages, hk, page, d); v_pool=None
    # means k_pool is a FUSED K|V pool (K at [:, :kpad], V at [:, kpad:],
    # runtime/kv_cache.py allocate_fused_paged_kv_cache). block_kv is
    # forced to the page size; each grid step DMAs its page straight from
    # the pool through the worklist's page ids — no gathered KV copy
    # (reference hopper/paged_kv.h:18 PagedKVManager).
    kv_page_of_block=None,  # (num_kv_blocks,) int32 host-concrete page ids
    head_dim_v: Optional[int] = None,  # required with a fused pool
    plan: Optional[VarlenPlan] = None,  # precomputed scheduler plan
    # (make_varlen_plan) — REQUIRED for the exact worklist under jit,
    # where traced metadata would otherwise force the rectangular
    # fallback grid; validated against this call's configuration
    interpret: Optional[bool] = None,
):
    """Packed varlen forward. Returns (out (total_q, h, d), lse (h, total_q));
    with layout="hsd", inputs AND out are head-major (h, total, d)."""
    paged = kv_pools is not None
    if paged:
        assert kv_page_of_block is not None
        k_pool, v_pool = kv_pools
        fused_pool = v_pool is None
        npages_pool, num_heads_kv, page = k_pool.shape[:3]
        assert page % NUM_LANES == 0, "page size must be lane-aligned"
        block_kv = page
        total_k = len(kv_page_of_block) * page
        if layout == "hsd":
            num_heads, total_q, head_dim = q.shape
        else:
            total_q, num_heads, head_dim = q.shape
        assert not (
            attn_bias is not None or alibi_slopes is not None
            or dropout_p > 0.0 or score_mod is not None
            or mask_mod is not None or qv is not None or cp_world_size > 1
        ), "paged-pool varlen prefill: mods/bias/alibi/dropout/qv/cp ride the gather route"
        assert k_pool.dtype.itemsize >= 2, (
            "quantized pools ride the gather + XLA-upcast route"
        )
        if fused_pool:
            assert head_dim_v is not None
        else:
            head_dim_v = v_pool.shape[3]
    elif layout == "hsd":
        num_heads, total_q, head_dim = q.shape
        num_heads_kv, total_k = k.shape[0], k.shape[1]
    else:
        total_q, num_heads, head_dim = q.shape
        total_k, num_heads_kv = k.shape[0], k.shape[1]
    group_size = num_heads // num_heads_kv
    has_qv = qv is not None
    head_dim_v_ = v.shape[2] if not paged else head_dim_v
    if softmax_scale is None:
        softmax_scale = (
            (head_dim + head_dim_v_) ** -0.5 if has_qv else head_dim**-0.5
        )
    if interpret is None:
        interpret = interpret_mode()
    window = (int(window_size[0]), int(window_size[1]))
    out_dtype = q.dtype

    nqb = cdiv(total_q, block_q)
    nkb = cdiv(total_k, block_kv)
    d_pad = round_up(head_dim, NUM_LANES)
    if not paged:
        head_dim_v = v.shape[2]  # may differ (MLA / hdimdiff varlen)
    dv_pad = round_up(head_dim_v, NUM_LANES)
    if paged and fused_pool:
        # Fused pools pad each section to the lane boundary; the V section
        # width is whatever remains after K's padded section.
        assert k_pool.shape[3] == d_pad + dv_pad, (
            k_pool.shape, d_pad, dv_pad)

    (qseg, qpos, qpos_r, lo, hi, diag, kseg, kpos,
     kvmin, kvmax, _, _, interior) = make_varlen_metadata(
        cu_seqlens_q, cu_seqlens_k, total_q, total_k,
        seqused_q=seqused_q, seqused_k=seqused_k,
        block_q=block_q, block_kv=block_kv,
        causal=causal, window=window,
        attention_chunk=attention_chunk,
        cp_world_size=cp_world_size, cp_rank=cp_rank,
        cp_tot_seqused_k=cp_tot_seqused_k,
    )
    has_mods = score_mod is not None or mask_mod is not None

    import os as _os

    qp = _prep_packed(q, block_q, d_pad, layout)
    # K|V fused along lanes: one per-step DMA + one dynamic index map
    # instead of two (K at [:, :d_pad], V at [:, d_pad:]). Split operands,
    # two lane-blocked views of one fused array, a 4D blocked layout, and
    # Mosaic-rejected native (total, h, d) strided blocks all measured
    # equal-or-worse — PROFILE_VARLEN.md round 4. The transpose/concat prep
    # here is the structural price of the packed (total, h, d) API on TPU;
    # layout="hsd" callers skip the transposes (round 5). Paged-pool mode
    # skips the KV prep entirely — pages are DMAed from the pool in-kernel.
    if not paged:
        kvp = jnp.concatenate(
            [_prep_packed(k, block_kv, d_pad, layout),
             _prep_packed(v, block_kv, dv_pad, layout)],
            axis=-1,
        )
    # Per-token metadata rides as (tqp, 6) q-side columns
    # [seg|pos_adj|pos_raw|lo|hi|diag], fetched once per chain — element
    # masking needs NO k-side metadata (two compares against lo/hi).
    # kseg|kpos rows are DMAed per step only when mods need in-sequence
    # kv coordinates.
    qmeta = jnp.concatenate([qseg, qpos, qpos_r, lo, hi, diag], axis=1)
    kmeta = (
        jnp.concatenate([kseg, kpos], axis=1).T if has_mods else None
    )

    # Exact worklist grid: from a precomputed host plan when given
    # (the only way to get the exact grid under jit), else built here
    # (exact when metadata is concrete; rectangular fallback when traced).
    if plan is not None:
        assert (plan.block_q, plan.block_kv) == (block_q, block_kv), (
            "plan was built for tiles "
            f"({plan.block_q}, {plan.block_kv}), call uses "
            f"({block_q}, {block_kv})")
        assert (plan.total_q, plan.total_k) == (total_q, total_k), (
            "plan/tensor shape mismatch: "
            f"{(plan.total_q, plan.total_k)} vs {(total_q, total_k)}")
        assert plan.causal == causal and tuple(plan.window) == window and \
            plan.attention_chunk == attention_chunk, (
            "plan masking configuration differs from the call's")
        _check_plan_seqlens(
            plan, cu_seqlens_q, cu_seqlens_k, seqused_q, seqused_k
        )
        if paged:
            plan = plan.with_pages(kv_page_of_block)
        qtab = jnp.asarray(plan.qtab)
        ktab = jnp.asarray(plan.ktab)
        flags = jnp.asarray(plan.flags)
        n_steps, exact = plan.n_steps, True
    else:
        qtab, ktab, flags, n_steps, exact = build_worklist(
            kvmin, kvmax, interior, nqb, nkb
        )
        if paged:
            assert exact, (
                "paged-pool varlen needs host-concrete seqlens or a "
                "precomputed plan (make_varlen_plan)")
            pob = jnp.asarray(kv_page_of_block, jnp.int32)
            flags = flags | (pob[ktab] << _WL_PAGE_SHIFT)
    in_specs = [
        pl.BlockSpec((1, block_q, d_pad),
                     lambda h, t, qt, kt, fl: (h, qt[t], 0)),
    ]
    args = [qp]
    if paged:
        in_specs.append(pl.BlockSpec(
            (1, 1, page, k_pool.shape[3]),
            lambda h, t, qt, kt, fl: (
                fl[t] >> _WL_PAGE_SHIFT, h // group_size, 0, 0
            ),
        ))
        args.append(k_pool)
        if not fused_pool:
            in_specs.append(pl.BlockSpec(
                (1, 1, page, v_pool.shape[3]),
                lambda h, t, qt, kt, fl: (
                    fl[t] >> _WL_PAGE_SHIFT, h // group_size, 0, 0
                ),
            ))
            args.append(v_pool)
    else:
        in_specs.append(pl.BlockSpec(
            (1, block_kv, d_pad + dv_pad),
            lambda h, t, qt, kt, fl: (h // group_size, kt[t], 0),
        ))
        args.append(kvp)
    in_specs.append(
        pl.BlockSpec((block_q, 6), lambda h, t, qt, kt, fl: (qt[t], 0))
    )
    args.append(qmeta)
    if has_mods:
        in_specs.append(pl.BlockSpec(
            (2, block_kv), lambda h, t, qt, kt, fl: (0, kt[t])
        ))
        args.append(kmeta)
    if has_qv:
        qvp = _prep_packed(qv, block_q, dv_pad, layout)
        in_specs.insert(2, pl.BlockSpec(
            (1, block_q, dv_pad), lambda h, t, qt, kt, fl: (h, qt[t], 0)
        ))
        args.insert(2, qvp)

    has_bias = attn_bias is not None
    if has_bias:
        bias = jnp.asarray(attn_bias)
        assert bias.ndim == 3, "varlen attn_bias is (h|1, total_q, total_k)"
        bias_h = bias.shape[0]
        bias = pad_to_block(pad_to_block(bias, 1, block_q), 2, block_kv)
        in_specs.append(
            pl.BlockSpec(
                (1, block_q, block_kv),
                lambda h, t, qt, kt, fl, _bh=bias_h: (
                    h if _bh > 1 else 0, qt[t], kt[t]
                ),
            )
        )
        args.append(bias)

    has_alibi = alibi_slopes is not None
    if has_alibi:
        slopes = jnp.asarray(alibi_slopes, jnp.float32)
        assert slopes.ndim == 1, "varlen alibi supports per-head slopes"
        slopes = slopes[None, :]
        in_specs.append(
            pl.BlockSpec(
                slopes.shape, lambda h, t, qt, kt, fl: (0, 0),
                memory_space=pltpu.SMEM,
            )
        )
        args.append(slopes)

    if dropout_p > 0.0:
        if dropout_seed is None:
            dropout_seed = jnp.zeros((), jnp.int32)
        seed_arr = jnp.asarray(dropout_seed, jnp.int32).reshape(1, 1)
        in_specs.append(
            pl.BlockSpec((1, 1), lambda h, t, qt, kt, fl: (0, 0),
                         memory_space=pltpu.SMEM)
        )
        args.append(seed_arr)

    aux_tensors = tuple(aux_tensors or ())
    aux_scalars = tuple(aux_scalars or ())
    aux_shapes = []
    for a in aux_tensors:
        a = jnp.asarray(a)
        if a.ndim <= 1:
            from flash_attn_tpu.kernels.common import pad_aux_table

            a = pad_aux_table(a.reshape(-1))
        aux_shapes.append(a.shape)
        a2 = a.reshape((1,) * max(0, 2 - a.ndim) + a.shape)
        in_specs.append(
            pl.BlockSpec(a2.shape, lambda h, t, qt, kt, fl, _n=a2.ndim: (0,) * _n)
        )
        args.append(a2)
    aux_shapes = tuple(aux_shapes)
    if aux_scalars:
        sc = jnp.stack(
            [jnp.asarray(x, jnp.float32) for x in aux_scalars]
        )[None, :]
        in_specs.append(
            pl.BlockSpec(sc.shape, lambda h, t, qt, kt, fl: (0, 0),
                         memory_space=pltpu.SMEM)
        )
        args.append(sc)

    kernel = functools.partial(
        _varlen_fwd_kernel,
        block_q=block_q, block_kv=block_kv,
        d_pad=d_pad,
        scale=float(softmax_scale), cp_w=int(cp_world_size),
        softcap=float(softcap), dropout_p=float(dropout_p),
        group_size=group_size,
        has_alibi=has_alibi, has_qv=has_qv, has_bias=has_bias,
        out_dtype=out_dtype,
        score_mod=score_mod, mask_mod=mask_mod,
        num_aux=len(aux_tensors), aux_shapes=aux_shapes,
        num_aux_scalars=len(aux_scalars),
        exact_worklist=exact,
        paged_pool=(
            ("fused" if fused_pool else "pair") if paged else None
        ),
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_heads, n_steps),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, block_q, dv_pad),
                         lambda h, t, qt, kt, fl: (h, qt[t], 0)),
            pl.BlockSpec((1, block_q, 1),
                         lambda h, t, qt, kt, fl: (h, qt[t], 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, NUM_LANES), jnp.float32),
            pltpu.VMEM((block_q, NUM_LANES), jnp.float32),
            pltpu.VMEM((block_q, dv_pad), jnp.float32),
        ],
    )

    kv_bytes = (
        k_pool.size * k_pool.dtype.itemsize if paged
        else kvp.size * kvp.dtype.itemsize
    )
    cost = pl.CostEstimate(
        flops=4 * block_q * block_kv * (d_pad + dv_pad) * num_heads * n_steps,
        bytes_accessed=qp.size * qp.dtype.itemsize + kv_bytes,
        transcendentals=block_q * block_kv * num_heads * n_steps,
    )
    out, lse = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(
                (num_heads, nqb * block_q, dv_pad), out_dtype),
            jax.ShapeDtypeStruct(
                (num_heads, nqb * block_q, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=cost,
        interpret=interpret,
    )(qtab, ktab, flags, *args)

    out = out[:, :total_q, :head_dim_v]
    if layout != "hsd":
        out = out.transpose(1, 0, 2)
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
    attn_bias: Optional[jnp.ndarray] = None,  # (h|1, total_q, total_k)
    bias_grad: bool = False,
    score_mod=None,
    mask_mod=None,
    aux_tensors=(),
    aux_scalars=(),
    block_q: int = 256,
    block_kv: int = 256,
    layout: str = "thd",  # "hsd": q/k/v/qv/out/do are (h, total, d)
    interpret: Optional[bool] = None,
):
    """Packed varlen backward: returns (dq, dk, dv[, dbias][, dqv]) in
    packed layout (dbias when bias_grad, dqv when `qv` is given). With
    layout="hsd" all tensor args and grads are head-major (h, total, d)."""
    if layout == "hsd":
        num_heads, total_q, head_dim = q.shape
        num_heads_kv, total_k = k.shape[0], k.shape[1]
    else:
        total_q, num_heads, head_dim = q.shape
        total_k, num_heads_kv = k.shape[0], k.shape[1]
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

    (qseg, qpos, qpos_r, lo, hi, diag, kseg, kpos,
     kvmin, kvmax, qmin, qmax, interior) = make_varlen_metadata(
        cu_seqlens_q, cu_seqlens_k, total_q, total_k,
        seqused_q=seqused_q, seqused_k=seqused_k,
        block_q=block_q, block_kv=block_kv,
        causal=causal, window=window,
        attention_chunk=attention_chunk,
    )
    has_mods = score_mod is not None or mask_mod is not None

    # Fused operand blocks (see flash_attention_varlen_fwd): Q|dO, K|V,
    # LSE|delta, qseg|qpos|qpos_raw columns, kseg|kpos rows.
    qdop = jnp.concatenate(
        [_prep_packed(q, block_q, d_pad, layout),
         _prep_packed(do, block_q, dv_pad, layout)],
        axis=-1,
    )
    kvp = jnp.concatenate(
        [_prep_packed(k, block_kv, d_pad, layout),
         _prep_packed(v, block_kv, dv_pad, layout)],
        axis=-1,
    )
    qvp = (
        _prep_packed(qv, block_q, dv_pad, layout) if qv is not None else None
    )
    # lse/delta: (h, total_q) -> (h, tqp, 2) fused.
    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    if layout != "hsd":
        delta = delta.transpose(1, 0)  # (h, total_q)
    ldp = jnp.stack(
        [pad_to_block(lse, 1, block_q), pad_to_block(delta, 1, block_q)],
        axis=-1,
    )
    qmeta = jnp.concatenate([qseg, qpos, qpos_r, lo, hi, diag], axis=1)
    kmeta = (
        jnp.concatenate([kseg, kpos], axis=1).T if has_mods else None
    )

    has_alibi = alibi_slopes is not None
    slopes = None
    if has_alibi:
        slopes = jnp.asarray(alibi_slopes, jnp.float32)[None, :]

    has_bias = attn_bias is not None
    bias = None
    bias_h = 1
    if has_bias:
        bias = jnp.asarray(attn_bias)
        assert bias.ndim == 3, "varlen attn_bias is (h|1, total_q, total_k)"
        bias_h = bias.shape[0]
        bias = pad_to_block(pad_to_block(bias, 1, block_q), 2, block_kv)

    aux_tensors = tuple(aux_tensors or ())
    aux_scalars = tuple(aux_scalars or ())
    aux_args = []
    aux_shapes = []
    for a in aux_tensors:
        a = jnp.asarray(a)
        if a.ndim <= 1:
            from flash_attn_tpu.kernels.common import pad_aux_table

            a = pad_aux_table(a.reshape(-1))
        aux_shapes.append(a.shape)
        aux_args.append(a.reshape((1,) * max(0, 2 - a.ndim) + a.shape))
    aux_shapes = tuple(aux_shapes)
    auxsc_arr = None
    if aux_scalars:
        auxsc_arr = jnp.stack(
            [jnp.asarray(x, jnp.float32) for x in aux_scalars]
        )[None, :]

    def specs_for(clamp_q, clamp_kv):
        # Index-map args: (h, t, ctab, stab, flags).
        specs = [
            pl.BlockSpec((1, block_q, d_pad + dv_pad),
                         lambda h, t, ct, st, fl: (h, clamp_q(t, ct, st), 0)),
            pl.BlockSpec((1, block_kv, d_pad + dv_pad),
                         lambda h, t, ct, st, fl: (h // group_size, clamp_kv(t, ct, st), 0)),
            pl.BlockSpec((1, block_q, 2),
                         lambda h, t, ct, st, fl: (h, clamp_q(t, ct, st), 0)),
            pl.BlockSpec((block_q, 6),
                         lambda h, t, ct, st, fl: (clamp_q(t, ct, st), 0)),
        ]
        if has_mods:
            specs.append(
                pl.BlockSpec((2, block_kv),
                             lambda h, t, ct, st, fl: (0, clamp_kv(t, ct, st)))
            )
        if has_qv:
            specs.insert(2, pl.BlockSpec(
                (1, block_q, dv_pad),
                lambda h, t, ct, st, fl: (h, clamp_q(t, ct, st), 0),
            ))
        if has_bias:
            specs.append(pl.BlockSpec(
                (1, block_q, block_kv),
                lambda h, t, ct, st, fl, _bh=bias_h: (
                    h if _bh > 1 else 0, clamp_q(t, ct, st),
                    clamp_kv(t, ct, st),
                ),
            ))
        if has_alibi:
            specs.append(
                pl.BlockSpec(slopes.shape, lambda h, t, ct, st, fl: (0, 0),
                             memory_space=pltpu.SMEM)
            )
        if dropout_p > 0.0:
            specs.append(
                pl.BlockSpec((1, 1), lambda h, t, ct, st, fl: (0, 0),
                             memory_space=pltpu.SMEM)
            )
        for a2 in aux_args:
            specs.append(
                pl.BlockSpec(a2.shape,
                             lambda h, t, ct, st, fl, _n=a2.ndim: (0,) * _n)
            )
        if auxsc_arr is not None:
            specs.append(
                pl.BlockSpec(auxsc_arr.shape,
                             lambda h, t, ct, st, fl: (0, 0),
                             memory_space=pltpu.SMEM)
            )
        return specs

    base_args = [qdop, kvp, ldp, qmeta]
    if has_mods:
        base_args.append(kmeta)
    if has_qv:
        base_args.insert(2, qvp)
    if has_bias:
        base_args.append(bias)
    if has_alibi:
        base_args.append(slopes)
    if dropout_p > 0.0:
        if dropout_seed is None:
            dropout_seed = jnp.zeros((), jnp.int32)
        base_args.append(jnp.asarray(dropout_seed, jnp.int32).reshape(1, 1))
    base_args.extend(aux_args)
    if auxsc_arr is not None:
        base_args.append(auxsc_arr)

    mod_kwargs = dict(
        score_mod=score_mod, mask_mod=mask_mod,
        num_aux=len(aux_tensors), aux_shapes=aux_shapes,
        num_aux_scalars=len(aux_scalars),
    )

    # Exact worklists (build_worklist): dkv chains over kv blocks sweeping
    # q blocks; dq chains over q blocks sweeping kv blocks.
    kv_ctab, kv_stab, kv_flags, kv_steps, kv_exact = build_worklist(
        qmin, qmax, interior.T, nkb, nqb
    )
    if bias_grad:
        # dbias tiles flush every grid step, so every (q, kv) tile must be
        # visited (unvisited tiles would hold garbage) — run the dq grid
        # over the full rectangle; masking zeroes invisible tiles' dbias.
        q_ctab, q_stab, q_flags, q_steps, q_exact = build_worklist(
            jnp.zeros_like(kvmin), jnp.full_like(kvmax, nkb - 1),
            interior, nqb, nkb,
        )
    else:
        q_ctab, q_stab, q_flags, q_steps, q_exact = build_worklist(
            kvmin, kvmax, interior, nqb, nkb
        )

    # ---- dK/dV: flat worklist over kv chains ----
    dkv_kernel = functools.partial(
        _varlen_dkv_kernel,
        block_q=block_q, block_kv=block_kv,
        d_pad=d_pad,
        scale=float(softmax_scale),
        softcap=float(softcap), dropout_p=float(dropout_p),
        has_alibi=has_alibi, has_qv=has_qv, has_bias=has_bias,
        exact_worklist=kv_exact, **mod_kwargs,
    )
    dkv_specs = specs_for(
        clamp_q=lambda t, ct, st: st[t],
        clamp_kv=lambda t, ct, st: ct[t],
    )
    dk_gh, dv_gh = pl.pallas_call(
        dkv_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(num_heads, kv_steps),
            in_specs=dkv_specs,
            out_specs=[
                pl.BlockSpec((1, block_kv, d_pad),
                             lambda h, t, ct, st, fl: (h, ct[t], 0)),
                pl.BlockSpec((1, block_kv, dv_pad),
                             lambda h, t, ct, st, fl: (h, ct[t], 0)),
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
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(kv_ctab, kv_stab, kv_flags, *base_args)

    dk_gh = dk_gh[:, :total_k, :head_dim]
    dv_gh = dv_gh[:, :total_k, :head_dim_v]
    if group_size > 1:
        dk = dk_gh.reshape(num_heads_kv, group_size, total_k, head_dim).sum(1)
        dv = dv_gh.reshape(num_heads_kv, group_size, total_k, head_dim_v).sum(1)
    else:
        dk, dv = dk_gh, dv_gh
    if layout != "hsd":
        dk = dk.transpose(1, 0, 2)
        dv = dv.transpose(1, 0, 2)
    dk = dk.astype(out_dtype)
    dv = dv.astype(out_dtype)

    # ---- dQ: flat worklist over q chains ----
    dq_kernel = functools.partial(
        _varlen_dq_kernel,
        block_q=block_q, block_kv=block_kv,
        d_pad=d_pad,
        scale=float(softmax_scale),
        softcap=float(softcap), dropout_p=float(dropout_p),
        has_alibi=has_alibi, has_qv=has_qv, out_dtype=out_dtype,
        has_bias=has_bias, bias_grad=bias_grad,
        exact_worklist=q_exact, **mod_kwargs,
    )
    dq_specs = specs_for(
        clamp_q=lambda t, ct, st: ct[t],
        clamp_kv=lambda t, ct, st: st[t],
    )
    dq_out_specs = [
        pl.BlockSpec((1, block_q, d_pad),
                     lambda h, t, ct, st, fl: (h, ct[t], 0)),
    ]
    dq_out_shape = [
        jax.ShapeDtypeStruct((num_heads, nqb * block_q, d_pad), out_dtype),
    ]
    dq_scratch = [pltpu.VMEM((block_q, d_pad), jnp.float32)]
    if bias_grad:
        dq_out_specs.append(
            pl.BlockSpec((1, block_q, block_kv),
                         lambda h, t, ct, st, fl: (h, ct[t], st[t]))
        )
        dq_out_shape.append(
            jax.ShapeDtypeStruct(
                (num_heads, nqb * block_q, nkb * block_kv), jnp.float32
            )
        )
    if has_qv:
        dq_out_specs.append(
            pl.BlockSpec((1, block_q, dv_pad),
                         lambda h, t, ct, st, fl: (h, ct[t], 0))
        )
        dq_out_shape.append(
            jax.ShapeDtypeStruct((num_heads, nqb * block_q, dv_pad), out_dtype)
        )
        dq_scratch.append(pltpu.VMEM((block_q, dv_pad), jnp.float32))
    results = pl.pallas_call(
        dq_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(num_heads, q_steps),
            in_specs=dq_specs,
            out_specs=dq_out_specs,
            scratch_shapes=dq_scratch,
        ),
        out_shape=dq_out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q_ctab, q_stab, q_flags, *base_args)

    dq = results[0][:, :total_q, :head_dim]
    if layout != "hsd":
        dq = dq.transpose(1, 0, 2)
    ret = [dq, dk, dv]
    ri = 1
    if bias_grad:
        dbias = results[ri][:, :total_q, :total_k]
        ri += 1
        if bias_h == 1:
            dbias = dbias.sum(axis=0, keepdims=True)
        ret.append(dbias.astype(attn_bias.dtype))
    if has_qv:
        dqv = results[ri][:, :total_q, :head_dim_v]
        if layout != "hsd":
            dqv = dqv.transpose(1, 0, 2)
        ret.append(dqv)
    return tuple(ret)
