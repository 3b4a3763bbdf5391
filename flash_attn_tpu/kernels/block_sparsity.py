"""Block-sparse execution of programmable masks (FA4 block sparsity).

TPU-native replacement for the reference's FlexAttention block-sparsity
subsystem:
  * plan: `compute_block_sparsity` classifies every (batch, head, q-block,
    kv-block) tile against a `mask_mod` as skipped / full / partial
    (reference flash_attn/cute/compute_block_sparsity.py:32
    BlockSparsityKernel, 5-point fast sampling :40, exact per-token :243).
  * carrier: `BlockSparseTensors` — per-(b, h, q-block) packed live-KV-block
    lists + counts (reference flash_attn/cute/block_sparsity.py:17).
  * execute: fwd and bwd kernels consume the plan and visit ONLY live tiles
    (reference cute/interface.py:392, 2982 `block_sparse_tensors` /
    `block_sparse_tensors_bwd`); full tiles skip the mask evaluation
    entirely, partial tiles evaluate `mask_mod` element-wise.

TPU-first design. The reference's planner is a GPU kernel because its fwd
kernel reads the counts dynamically (persistent scheduling); XLA grids are
static, so here the classification runs as vectorized XLA (one fused
elementwise+reduce pass — exactly what XLA is good at) and the plan is
pulled to the HOST once, where an EXACT flat worklist is built: the kernel
grid enumerates precisely the live tiles, in (b, h, q-block) chain order,
with scalar-prefetched step tables (the same machinery as the varlen
worklist, kernels/flash_varlen.py). A 10%-density mask therefore costs ~10%
of the dense grid — no predicated-off steps at all. Plans depend only on
shapes + mask structure, so one plan is built per model configuration and
reused across layers and steps (the reference amortizes identically: the
plan is a tensor computed once per step outside the attention call).

The backward needs no dq_write_order (reference block_sparse_utils.py:80
compute_dq_write_order orders GPU atomics): the TPU backward is two
grid-sequential kernels — dK/dV over kv-stationary chains, dQ over
q-stationary chains — deterministic by construction.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

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
    _xla_mod_eval,
    call_mod,
    cdiv,
    interpret_mode,
    pad_aux_table,
    pad_to_block,
    round_up,
)

_MASK2 = DEFAULT_MASK_VALUE

# Step-table flag bits.
_F_START = 1   # first step of a (b, h, q-block) / (b, h, kv-block) chain
_F_END = 2     # last step of the chain (finalize/write)
_F_EMPTY = 4   # synthetic step for a row with zero live tiles (zero-write)
_F_MODE_SHIFT = 3  # bits 3-4: 0 = no mask, 1 = bounds only, 2 = bounds + mod


class BlockSparseTensors(NamedTuple):
    """Block-sparsity metadata (reference cute/block_sparsity.py:17).

    mask_block_cnt: (b, h, num_m) int32 — per q-block count of PARTIAL
        kv-blocks (need element-wise mask_mod evaluation).
    mask_block_idx: (b, h, num_m, max_nn) int32 — their kv-block indices,
        packed ascending.
    full_block_cnt/full_block_idx: same for FULL kv-blocks (every in-bounds
        element unmasked — executed without mask evaluation). May be None:
        then every live block lives in the mask list (reference
        compute_full_blocks=False).
    block_size: (tile_m, tile_n) the metadata granularity; the execution
        kernels tile exactly at this granularity.

    Arrays may be numpy (host) or jax. Execution requires host-concrete
    values (the exact worklist is a static grid); `host()` converts once.
    """

    mask_block_cnt: object
    mask_block_idx: object
    full_block_cnt: object = None
    full_block_idx: object = None
    block_size: Tuple[int, int] = (512, 512)

    def host(self) -> "BlockSparseTensors":
        def get(x):
            if x is None:
                return None
            return np.asarray(jax.device_get(x), np.int32)

        return BlockSparseTensors(
            get(self.mask_block_cnt), get(self.mask_block_idx),
            get(self.full_block_cnt), get(self.full_block_idx),
            tuple(self.block_size),
        )


def _eval_mod_xla(mask_mod, b_arr, h_arr, q_idx, kv_idx, aux):
    with _xla_mod_eval():
        keep = call_mod(mask_mod, b_arr, h_arr, q_idx, kv_idx, aux=aux)
    return keep


def _make_aux(aux_tensors, aux_scalars):
    if not aux_tensors and not aux_scalars:
        return None
    tens = []
    for a in aux_tensors:
        a = jnp.asarray(a)
        if a.ndim <= 1:
            a = pad_aux_table(a.reshape(-1))
        tens.append(a)
    return AuxData(
        tensors=tuple(tens),
        scalars=tuple(jnp.asarray(x, jnp.float32) for x in aux_scalars),
    )


def compute_block_sparsity(
    mask_mod,
    *,
    batch_size: int,
    num_heads: int,
    seqlen_q: int,
    seqlen_k: int,
    tile_m: int = 512,
    tile_n: int = 512,
    aux_tensors=(),
    aux_scalars=(),
    compute_full_blocks: bool = True,
    use_fast_sampling: bool = False,
) -> BlockSparseTensors:
    """Derive per-(b, h, q-block) live-KV-block lists from a `mask_mod`.

    Reference: flash_attn/cute/compute_block_sparsity.py:334
    `compute_block_sparsity` (kernel at :32; 5-point corner+center fast
    sampling at :189-241, exact per-token at :243-303). Classification per
    tile: PARTIAL (some masked, some unmasked in-bounds elements), FULL
    (only unmasked), or SKIPPED (only masked).

    The evaluation is vectorized XLA over broadcast coordinates —
    `mask_mod(b, h, q_idx, kv_idx[, aux])` receives arrays here rather than
    the kernel's scalar b/h + tile iotas, which every elementwise mod
    broadcasts through transparently (aux_take/aux_at switch to XLA-native
    gathers for the duration). Exact mode sweeps q-block rows to bound peak
    memory at (b, h, tile_m, seqlen_k) booleans.

    Respects `mask_mod.use_fast_sampling` like the reference (:383).
    """
    use_fast_sampling = getattr(
        mask_mod, "use_fast_sampling", use_fast_sampling
    )
    nm = cdiv(seqlen_q, tile_m)
    nn = cdiv(seqlen_k, tile_n)
    aux = _make_aux(aux_tensors, aux_scalars)
    b_arr = jnp.arange(batch_size, dtype=jnp.int32).reshape(-1, 1, 1, 1)
    h_arr = jnp.arange(num_heads, dtype=jnp.int32).reshape(1, -1, 1, 1)

    if use_fast_sampling:
        # 5 paired samples per tile: 4 corners + center (reference :189).
        m_base = np.arange(nm) * tile_m
        m_last = np.minimum(m_base + tile_m - 1, seqlen_q - 1)
        m_mid = m_base + np.minimum(seqlen_q - m_base, tile_m) // 2
        n_base = np.arange(nn) * tile_n
        n_last = np.minimum(n_base + tile_n - 1, seqlen_k - 1)
        n_mid = n_base + np.minimum(seqlen_k - n_base, tile_n) // 2
        q_s = np.stack([m_base, m_base, m_last, m_last, m_mid], -1)
        k_s = np.stack([n_base, n_last, n_base, n_last, n_mid], -1)
        q_idx = jnp.asarray(q_s, jnp.int32).reshape(1, 1, nm, 1, 5)
        kv_idx = jnp.asarray(k_s, jnp.int32).reshape(1, 1, 1, nn, 5)
        keep = _eval_mod_xla(
            mask_mod, b_arr[..., None], h_arr[..., None], q_idx, kv_idx, aux
        )
        keep = jnp.broadcast_to(
            keep, (batch_size, num_heads, nm, nn, 5)
        )
        has_unmasked = jnp.any(keep, axis=-1)
        has_masked = jnp.any(jnp.logical_not(keep), axis=-1)
    else:
        kv_idx = jnp.arange(nn * tile_n, dtype=jnp.int32).reshape(
            1, 1, 1, -1
        )
        kv_inb = kv_idx < seqlen_k

        unm_rows = []
        msk_rows = []
        for mi in range(nm):
            q_idx = (
                mi * tile_m + jnp.arange(tile_m, dtype=jnp.int32)
            ).reshape(1, 1, -1, 1)
            keep = _eval_mod_xla(mask_mod, b_arr, h_arr, q_idx, kv_idx, aux)
            keep = jnp.broadcast_to(
                keep, (batch_size, num_heads, tile_m, nn * tile_n)
            )
            inb = jnp.logical_and(q_idx < seqlen_q, kv_inb)
            u = jnp.logical_and(keep, inb)
            m = jnp.logical_and(jnp.logical_not(keep), inb)
            shape5 = (batch_size, num_heads, tile_m, nn, tile_n)
            unm_rows.append(jnp.any(u.reshape(shape5), axis=(2, 4)))
            msk_rows.append(jnp.any(m.reshape(shape5), axis=(2, 4)))
        has_unmasked = jnp.stack(unm_rows, axis=2)  # (b, h, nm, nn)
        has_masked = jnp.stack(msk_rows, axis=2)

    unm = np.asarray(jax.device_get(has_unmasked), bool)
    msk = np.asarray(jax.device_get(has_masked), bool)
    if compute_full_blocks:
        partial = unm & msk
        full = unm & ~msk
    else:
        # Without full-block tracking every live block takes the masked
        # path (a superset of the reference's drop — semantically safe).
        partial = unm
        full = np.zeros_like(unm)

    def pack(flags):
        cnt = flags.sum(-1).astype(np.int32)
        order = np.argsort(~flags, axis=-1, kind="stable")
        return cnt, order.astype(np.int32)

    mask_cnt, mask_idx = pack(partial)
    full_cnt, full_idx = pack(full)
    return BlockSparseTensors(
        mask_block_cnt=mask_cnt, mask_block_idx=mask_idx,
        full_block_cnt=full_cnt if compute_full_blocks else None,
        full_block_idx=full_idx if compute_full_blocks else None,
        block_size=(tile_m, tile_n),
    )


def wrap_varlen_mask_mod(mask_mod, num_user_aux: int, user_has_aux: bool):
    """Per-sequence bounds wrapper for varlen block sparsity.

    The wrapped mod expects two int32 length tables APPENDED to the user's
    aux_tensors (at indices num_user_aux and num_user_aux+1): per-sequence
    q lengths and kv lengths. `b` is the sequence index; q_idx/kv_idx are
    in-sequence positions (== padded left-aligned coordinates), matching
    the varlen mod convention. Out-of-sequence elements count as MASKED,
    so the planner classifies sequence-tail tiles as partial and the
    kernel masks them exactly — no static bounds flags needed.
    """
    from flash_attn_tpu.kernels.common import aux_at

    def wrapped(b, h, q_idx, kv_idx, aux):
        lq = aux_at(aux.tensors[num_user_aux], b)
        lk = aux_at(aux.tensors[num_user_aux + 1], b)
        keep = jnp.logical_and(q_idx < lq, kv_idx < lk)
        if mask_mod is not None:
            inner = (
                mask_mod(b, h, q_idx, kv_idx, aux)
                if user_has_aux
                else mask_mod(b, h, q_idx, kv_idx)
            )
            keep = jnp.logical_and(keep, inner)
        return keep

    return wrapped


def compute_block_sparsity_varlen(
    mask_mod,
    *,
    cu_seqlens_q,
    cu_seqlens_k=None,
    seqused_k=None,
    num_heads: int,
    max_seqlen_q: Optional[int] = None,
    max_seqlen_k: Optional[int] = None,
    tile_m: int = 512,
    tile_n: int = 512,
    aux_tensors=(),
    aux_scalars=(),
    compute_full_blocks: bool = True,
    use_fast_sampling: bool = False,
):
    """Varlen plan (reference compute_block_sparsity with cu_seqlens_q/k,
    cute/compute_block_sparsity.py:345-349). Classification runs over the
    left-aligned padded layout with per-sequence bounds folded into the
    mod — blocks wholly past a sequence's end are skipped, tail blocks
    are partial. Returns (BlockSparseTensors, wrapped_mask_mod,
    aux_tensors_with_lengths); pass all three to flash_attn_varlen_func
    (or reuse the wrapped mod + extended aux on the dense padded call).

    cu_seqlens must be host-concrete (the plan is a static worklist —
    built once per shape bucket and reused, like the reference's
    prepare pass)."""
    cu_q = np.asarray(jax.device_get(cu_seqlens_q), np.int64)
    nseq = len(cu_q) - 1
    lq = np.diff(cu_q)
    if seqused_k is not None:
        lk = np.asarray(jax.device_get(seqused_k), np.int64)
    else:
        lk = np.diff(np.asarray(jax.device_get(cu_seqlens_k), np.int64))
    sq = int(max_seqlen_q if max_seqlen_q is not None else lq.max())
    sk = int(max_seqlen_k if max_seqlen_k is not None else lk.max())
    user_aux = tuple(aux_tensors or ())
    wrapped = wrap_varlen_mask_mod(
        mask_mod, len(user_aux),
        user_has_aux=bool(user_aux or aux_scalars),
    )
    aux_ext = user_aux + (
        jnp.asarray(lq, jnp.int32), jnp.asarray(lk, jnp.int32),
    )
    bst = compute_block_sparsity(
        wrapped, batch_size=nseq, num_heads=num_heads,
        seqlen_q=sq, seqlen_k=sk, tile_m=tile_m, tile_n=tile_n,
        aux_tensors=aux_ext, aux_scalars=aux_scalars,
        compute_full_blocks=compute_full_blocks,
        use_fast_sampling=use_fast_sampling,
    )
    return bst, wrapped, aux_ext


# ---------------------------------------------------------------------------
# Worklist construction (host, numpy).
# ---------------------------------------------------------------------------


def _check_plan_grid(bst: BlockSparseTensors, batch: int, num_heads: int,
                     num_m: int, num_n: int):
    """Reject a plan built for a different (seqlen, tile) grid: the
    worklist row decode (`row % nm`, `row // (h*nm)`) and the kv index
    lists are meaningful only on the grid the plan was computed for — a
    mismatched plan would silently produce corrupt output."""
    pairs = [(np.asarray(bst.mask_block_cnt),
              np.asarray(bst.mask_block_idx), "mask_block")]
    if bst.full_block_cnt is not None:
        pairs.append((np.asarray(bst.full_block_cnt),
                      np.asarray(bst.full_block_idx), "full_block"))
    for cnt, idx, name in pairs:
        _check_plan_lists(cnt, idx, name, batch, num_heads, num_m, num_n,
                          bst.block_size)


def _check_plan_lists(cnt, idx, name, batch, num_heads, num_m, num_n,
                      block_size):
    for name, a in ((f"{name}_cnt", cnt), (f"{name}_idx", idx)):
        assert a.shape[2] == num_m, (
            f"block-sparse plan {name} covers {a.shape[2]} q-blocks but "
            f"the call's seqlen_q needs {num_m} at tile_m="
            f"{block_size[0]} — the plan was built for a different "
            "seqlen_q or tile size")
        assert batch % a.shape[0] == 0 and num_heads % a.shape[1] == 0, (
            f"block-sparse plan {name} (b={a.shape[0]}, h={a.shape[1]}) "
            f"does not broadcast to the call's (b={batch}, h={num_heads})")
    valid = np.arange(idx.shape[3])[None, None, None, :] < cnt[..., None]
    if valid.any():
        mx = int(idx[valid].max())
        assert mx < num_n, (
            f"block-sparse plan references kv-block {mx} but the call's "
            f"seqlen_k has only {num_n} kv-blocks at tile_n="
            f"{block_size[1]} — the plan was built for a different "
            "seqlen_k or tile size")


def _dense_live(bst: BlockSparseTensors, num_m: int, num_n: int,
                batch: int, num_heads: int):
    """(partial, full) dense bool (b, h, num_m, num_n) from packed lists."""

    def densify(cnt, idx):
        cnt = np.asarray(cnt, np.int64)
        idx = np.asarray(idx, np.int64)
        b, h, nm, mx = idx.shape
        valid = np.arange(mx)[None, None, None, :] < cnt[..., None]
        safe = np.where(valid, idx, num_n)
        out = np.zeros((b, h, nm, num_n + 1), bool)
        bi = np.arange(b)[:, None, None, None]
        hi = np.arange(h)[None, :, None, None]
        mi = np.arange(nm)[None, None, :, None]
        out[bi, hi, mi, safe] = valid
        return out[..., :num_n]

    partial = densify(bst.mask_block_cnt, bst.mask_block_idx)
    full = (
        densify(bst.full_block_cnt, bst.full_block_idx)
        if bst.full_block_cnt is not None
        else np.zeros_like(partial)
    )
    # Broadcast single-head / single-batch metadata.
    def bcast(x):
        reps = (batch // x.shape[0], num_heads // x.shape[1], 1, 1)
        return np.tile(x, reps) if reps[:2] != (1, 1) else x

    return bcast(partial), bcast(full)


def _build_worklist(partial, full, *, has_mod: bool,
                    bounds_m, bounds_n):
    """Flat exact worklist over live tiles in (row=b*h*m, n) chain order.

    Returns (row_tbl, n_tbl, flag_tbl) int32 1-D arrays. Every chain row
    (live or empty) produces at least one step carrying _F_END, so every
    output block is written exactly once.

    bounds_m/bounds_n: bool vectors — True where that m/n tile extends past
    the true seqlen (boundary tiles need bounds masking even when FULL).
    """
    b, h, nm, nn = partial.shape
    live = partial | full
    R = b * h * nm
    flat = live.reshape(R, nn)
    r_idx, n_idx = np.nonzero(flat)
    p_flags = partial.reshape(R, nn)[r_idx, n_idx]
    m_of_row = (r_idx % nm)
    boundary = bounds_m[m_of_row] | bounds_n[n_idx]
    if has_mod:
        mode = np.where(p_flags, 2, np.where(boundary, 1, 0))
    else:
        mode = np.where(p_flags | boundary, 1, 0)
    start = np.ones_like(r_idx, bool)
    start[1:] = r_idx[1:] != r_idx[:-1]
    end = np.ones_like(r_idx, bool)
    end[:-1] = r_idx[1:] != r_idx[:-1]
    flags = (
        start.astype(np.int32) * _F_START
        + end.astype(np.int32) * _F_END
        + (mode.astype(np.int32) << _F_MODE_SHIFT)
    )
    empty_rows = np.nonzero(~flat.any(axis=1))[0].astype(np.int64)
    row_tbl = np.concatenate([r_idx, empty_rows]).astype(np.int32)
    n_tbl = np.concatenate(
        [n_idx, np.zeros(len(empty_rows), np.int64)]
    ).astype(np.int32)
    # Empty steps carry mode 3 (matches no compute body) so only their
    # zero-write region executes.
    flag_tbl = np.concatenate([
        flags,
        np.full(
            len(empty_rows),
            _F_START | _F_END | _F_EMPTY | (3 << _F_MODE_SHIFT),
            np.int32,
        ),
    ]).astype(np.int32)
    return row_tbl, n_tbl, flag_tbl


def _bounds_vectors(seqlen, tile, num_blocks):
    """bool (num_blocks,): tile extends past seqlen (needs bounds mask)."""
    ends = (np.arange(num_blocks) + 1) * tile
    return ends > seqlen


# ---------------------------------------------------------------------------
# Forward kernel.
# ---------------------------------------------------------------------------


def _bs_fwd_kernel(
    row_ref, n_ref, flag_ref,  # scalar prefetch (steps,)
    *refs,
    nm: int, num_heads: int, group_size: int,
    tile_m: int, tile_n: int,
    seqlen_q: int, seqlen_k: int,
    scale: float, softcap: float,
    score_mod=None, mask_mod=None,
    num_aux: int = 0, aux_shapes: tuple = (),
    num_aux_scalars: int = 0,
    out_dtype=None,
):
    idx = 0
    q_ref = refs[idx]; idx += 1
    k_ref = refs[idx]; idx += 1
    v_ref = refs[idx]; idx += 1
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

    t = pl.program_id(0)
    row = row_ref[t]
    ni = n_ref[t]
    fl = flag_ref[t]
    start = (fl & _F_START) != 0
    end = (fl & _F_END) != 0
    empty = (fl & _F_EMPTY) != 0
    mode = fl >> _F_MODE_SHIFT
    mi = row % nm
    bh = row // nm
    h = bh % num_heads
    b = bh // num_heads

    if num_aux or num_aux_scalars:
        aux = AuxData(
            tensors=tuple(
                r[...].reshape(shp) for r, shp in zip(aux_refs, aux_shapes)
            ),
            scalars=tuple(auxsc_ref[0, i] for i in range(num_aux_scalars)),
        )
    else:
        aux = None

    def _compute(with_mask: bool, with_mod: bool):
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if softcap > 0.0:
            s_nat = jnp.tanh(s * (scale / softcap)) * softcap
        elif score_mod is not None:
            s_nat = s * scale
        else:
            s_nat = None
        if score_mod is not None:
            sm_rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) \
                + mi * tile_m
            sm_cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) \
                + ni * tile_n
            s_nat = call_mod(
                score_mod, s_nat, b, h, sm_rows, sm_cols, aux=aux
            ).astype(jnp.float32)
        if s_nat is None:
            s2 = s * (scale * LOG2E)  # one fused multiply
        else:
            s2 = s_nat * LOG2E

        if with_mask:
            rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) \
                + mi * tile_m
            cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) \
                + ni * tile_n
            mask = jnp.logical_and(rows < seqlen_q, cols < seqlen_k)
            if with_mod and mask_mod is not None:
                mask = jnp.logical_and(
                    mask, call_mod(mask_mod, b, h, rows, cols, aux=aux)
                )
            m_in = jnp.where(mask, s2, _MASK2)
        else:
            m_in = s2

        # Write-through chain start (same structure as flash_fwd.py): the
        # scalar `start` predicate gates out stale scratch from the
        # previous chain.
        m_prev = jnp.where(
            start, jnp.full_like(m_scr, _MASK2), m_scr[...]
        )
        m_cur = jnp.max(m_in, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp2(m_prev - m_next)
        kv_rep = s2.shape[1] // m_next.shape[1]
        m_full = pltpu.repeat(m_next, kv_rep, axis=1) if kv_rep > 1 else m_next
        p = jnp.exp2(m_in - m_full)
        l_prev = jnp.where(start, jnp.zeros_like(l_scr), l_scr[...])
        l_scr[...] = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_scr[...] = m_next
        v = v_ref[0, 0]
        d_rep = acc_scr.shape[1] // alpha.shape[1]
        alpha_full = pltpu.repeat(alpha, d_rep, axis=1) if d_rep > 1 else alpha
        acc_prev = jnp.where(start, jnp.zeros_like(acc_scr), acc_scr[...])
        acc_scr[...] = acc_prev * alpha_full + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(mode == 0)
    def _full_interior():
        _compute(with_mask=False, with_mod=False)

    @pl.when(mode == 1)
    def _bounds_only():
        _compute(with_mask=True, with_mod=False)

    if mask_mod is not None:
        @pl.when(mode == 2)
        def _partial():
            _compute(with_mask=True, with_mod=True)

    @pl.when(jnp.logical_and(end, jnp.logical_not(empty)))
    def _finalize():
        m = m_scr[...][:, 0:1]
        l = l_scr[...][:, 0:1]
        emptyrow = jnp.logical_or(l == 0.0, m == _MASK2)
        l_inv = jnp.where(emptyrow, 0.0, 1.0 / l)
        o_ref[0, 0] = (acc_scr[...] * l_inv).astype(out_dtype)
        lse_ref[0, 0] = jnp.where(
            emptyrow, -jnp.inf,
            (m + jnp.log2(jnp.maximum(l, 1e-37))) / LOG2E,
        )

    @pl.when(empty)
    def _zero_row():
        o_ref[0, 0] = jnp.zeros_like(o_ref[0, 0])
        lse_ref[0, 0] = jnp.full_like(lse_ref[0, 0], -jnp.inf)


def _aux_specs(aux_tensors, aux_scalars, nargs: int):
    """(specs, args, aux_shapes) for aux operands; index maps take `nargs`
    grid args plus the 3 prefetch refs."""
    specs, args, shapes = [], [], []
    for a in aux_tensors:
        a = jnp.asarray(a)
        if a.ndim <= 1:
            a = pad_aux_table(a.reshape(-1))
        shapes.append(a.shape)
        a2 = a.reshape((1,) * max(0, 2 - a.ndim) + a.shape)
        specs.append(
            pl.BlockSpec(a2.shape, lambda *a_, _n=a2.ndim: (0,) * _n)
        )
        args.append(a2)
    if aux_scalars:
        sc = jnp.stack(
            [jnp.asarray(x, jnp.float32) for x in aux_scalars]
        )[None, :]
        specs.append(
            pl.BlockSpec(sc.shape, lambda *a_: (0, 0),
                         memory_space=pltpu.SMEM)
        )
        args.append(sc)
    return specs, args, tuple(shapes)


def flash_attention_blocksparse_fwd(
    q: jnp.ndarray,  # (b, h, sq, d) kernel-native layout
    k: jnp.ndarray,  # (b, hk, sk, d)
    v: jnp.ndarray,  # (b, hk, sk, d_v)
    block_sparse: BlockSparseTensors,
    *,
    mask_mod=None,
    score_mod=None,
    aux_tensors=(),
    aux_scalars=(),
    softmax_scale: Optional[float] = None,
    softcap: float = 0.0,
    interpret: Optional[bool] = None,
):
    """Block-sparse forward: visits only the plan's live tiles.

    Bitwise-matches the dense-masked path at equal tile sizes: skipped
    tiles are exactly those whose every in-bounds element is masked, which
    contribute nothing to the online softmax (masked scores sit at the
    finite _MASK2 sentinel; their exp2 underflows to 0 against any visible
    row max, and rows with NO visible element anywhere are zeroed at
    finalize) — so removing them leaves every float op identical.
    """
    batch, num_heads, seqlen_q, head_dim = q.shape
    _, num_heads_kv, seqlen_k, head_dim_v = v.shape
    group_size = num_heads // num_heads_kv
    if softmax_scale is None:
        softmax_scale = head_dim**-0.5
    if interpret is None:
        interpret = interpret_mode()
    tile_m, tile_n = block_sparse.block_size
    bst = block_sparse.host()
    nm = cdiv(seqlen_q, tile_m)
    nn = cdiv(seqlen_k, tile_n)
    _check_plan_grid(bst, batch, num_heads, nm, nn)
    partial, full = _dense_live(bst, nm, nn, batch, num_heads)
    row_tbl, n_tbl, flag_tbl = _build_worklist(
        partial, full, has_mod=mask_mod is not None,
        bounds_m=_bounds_vectors(seqlen_q, tile_m, nm),
        bounds_n=_bounds_vectors(seqlen_k, tile_n, nn),
    )
    steps = len(row_tbl)

    d_pad = round_up(head_dim, NUM_LANES)
    dv_pad = round_up(head_dim_v, NUM_LANES)
    qp = pad_to_block(pad_to_block(q, 3, d_pad), 2, tile_m)
    kp = pad_to_block(pad_to_block(k, 3, d_pad), 2, tile_n)
    vp = pad_to_block(pad_to_block(v, 3, dv_pad), 2, tile_n)
    sq_pad = qp.shape[2]
    out_dtype = q.dtype

    def q_map(t, rref, nref, fref):
        row = rref[t]
        return (row // (num_heads * nm), (row // nm) % num_heads,
                row % nm, 0)

    def kv_map(t, rref, nref, fref):
        row = rref[t]
        return (row // (num_heads * nm),
                ((row // nm) % num_heads) // group_size, nref[t], 0)

    in_specs = [
        pl.BlockSpec((1, 1, tile_m, d_pad), q_map),
        pl.BlockSpec((1, 1, tile_n, d_pad), kv_map),
        pl.BlockSpec((1, 1, tile_n, dv_pad), kv_map),
    ]
    args = [qp, kp, vp]
    aux_specs, aux_args, aux_shapes = _aux_specs(
        aux_tensors, aux_scalars, 1
    )
    in_specs += aux_specs
    args += aux_args

    kernel = functools.partial(
        _bs_fwd_kernel,
        nm=nm, num_heads=num_heads, group_size=group_size,
        tile_m=tile_m, tile_n=tile_n,
        seqlen_q=seqlen_q, seqlen_k=seqlen_k,
        scale=float(softmax_scale), softcap=float(softcap),
        score_mod=score_mod, mask_mod=mask_mod,
        num_aux=len(tuple(aux_tensors)), aux_shapes=aux_shapes,
        num_aux_scalars=len(tuple(aux_scalars)),
        out_dtype=out_dtype,
    )

    live_steps = int(((flag_tbl & _F_EMPTY) == 0).sum())
    cost = pl.CostEstimate(
        flops=4 * tile_m * tile_n * d_pad * live_steps,
        bytes_accessed=(qp.size + kp.size + vp.size) * qp.dtype.itemsize,
        transcendentals=tile_m * tile_n * live_steps,
    )
    out, lse = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(steps,),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((1, 1, tile_m, dv_pad), q_map),
                pl.BlockSpec((1, 1, tile_m, 1), q_map),
            ],
            scratch_shapes=[
                pltpu.VMEM((tile_m, NUM_LANES), jnp.float32),
                pltpu.VMEM((tile_m, NUM_LANES), jnp.float32),
                pltpu.VMEM((tile_m, dv_pad), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct(
                (batch, num_heads, sq_pad, dv_pad), out_dtype),
            jax.ShapeDtypeStruct((batch, num_heads, sq_pad, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=cost,
        interpret=interpret,
    )(jnp.asarray(row_tbl), jnp.asarray(n_tbl), jnp.asarray(flag_tbl),
      *args)
    return out[:, :, :seqlen_q, :head_dim_v], lse[:, :, :seqlen_q, 0]


# ---------------------------------------------------------------------------
# Backward kernels (two-pass, deterministic by construction — no
# dq_write_order semaphores needed, cf. reference block_sparse_utils.py:80).
# ---------------------------------------------------------------------------


def _bs_recompute(
    q, k, v, do, lse2, delta, *,
    b, h, mi, ni, tile_m, tile_n, seqlen_q, seqlen_k,
    scale, softcap, with_mask, with_mod,
    score_mod=None, mask_mod=None, aux=None,
):
    """Shared bwd recompute: (p, ds_scaled) at tile (mi, ni)."""
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if softcap > 0.0:
        tt = jnp.tanh(s * (scale / softcap))
        s_nat = tt * softcap
    else:
        tt = None
        s_nat = s * scale
    mod_vjp = None
    if score_mod is not None:
        sm_rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) \
            + mi * tile_m
        sm_cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) \
            + ni * tile_n
        s_nat, mod_vjp = jax.vjp(
            lambda x: call_mod(
                score_mod, x, b, h, sm_rows, sm_cols, aux=aux
            ).astype(jnp.float32),
            s_nat,
        )
    s2 = s_nat * LOG2E
    p = jnp.exp2(s2 - lse2)
    if with_mask:
        rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + mi * tile_m
        cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ni * tile_n
        mask = jnp.logical_and(rows < seqlen_q, cols < seqlen_k)
        if with_mod and mask_mod is not None:
            mask = jnp.logical_and(
                mask, call_mod(mask_mod, b, h, rows, cols, aux=aux)
            )
        p = jnp.where(mask, p, 0.0)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - delta)
    if mod_vjp is not None:
        (ds,) = mod_vjp(ds)
    if softcap > 0.0:
        ds = ds * ((1.0 - tt * tt) * scale)
    else:
        ds = ds * scale
    return p, ds


def _bs_dkv_kernel(
    row_ref, m_ref, flag_ref,
    *refs,
    nn: int, num_heads: int, group_size: int,
    tile_m: int, tile_n: int,
    seqlen_q: int, seqlen_k: int,
    scale: float, softcap: float,
    score_mod=None, mask_mod=None,
    num_aux: int = 0, aux_shapes: tuple = (),
    num_aux_scalars: int = 0,
):
    idx = 0
    q_ref = refs[idx]; idx += 1
    k_ref = refs[idx]; idx += 1
    v_ref = refs[idx]; idx += 1
    do_ref = refs[idx]; idx += 1
    lse_ref = refs[idx]; idx += 1
    delta_ref = refs[idx]; idx += 1
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

    t = pl.program_id(0)
    row = row_ref[t]  # flattened (b, h, ni)
    mi = m_ref[t]
    fl = flag_ref[t]
    start = (fl & _F_START) != 0
    end = (fl & _F_END) != 0
    empty = (fl & _F_EMPTY) != 0
    mode = fl >> _F_MODE_SHIFT
    ni = row % nn
    bh = row // nn
    h = bh % num_heads
    b = bh // num_heads

    if num_aux or num_aux_scalars:
        aux = AuxData(
            tensors=tuple(
                r[...].reshape(shp) for r, shp in zip(aux_refs, aux_shapes)
            ),
            scalars=tuple(auxsc_ref[0, i] for i in range(num_aux_scalars)),
        )
    else:
        aux = None

    def _body(with_mask, with_mod):
        q = q_ref[0, 0]
        do = do_ref[0, 0].astype(jnp.float32)
        p, ds = _bs_recompute(
            q, k_ref[0, 0], v_ref[0, 0], do,
            lse_ref[0, 0] * LOG2E, delta_ref[0, 0],
            b=b, h=h, mi=mi, ni=ni, tile_m=tile_m, tile_n=tile_n,
            seqlen_q=seqlen_q, seqlen_k=seqlen_k,
            scale=scale, softcap=softcap,
            with_mask=with_mask, with_mod=with_mod,
            score_mod=score_mod, mask_mod=mask_mod, aux=aux,
        )
        dv_prev = jnp.where(start, jnp.zeros_like(dv_scr), dv_scr[...])
        dv_scr[...] = dv_prev + jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dk_prev = jnp.where(start, jnp.zeros_like(dk_scr), dk_scr[...])
        dk_scr[...] = dk_prev + jax.lax.dot_general(
            ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(mode == 0)
    def _interior():
        _body(False, False)

    @pl.when(mode == 1)
    def _bounds():
        _body(True, False)

    if mask_mod is not None:
        @pl.when(mode == 2)
        def _partial():
            _body(True, True)

    @pl.when(jnp.logical_and(end, jnp.logical_not(empty)))
    def _finalize():
        dk_ref[0, 0] = dk_scr[...]
        dv_ref[0, 0] = dv_scr[...]

    @pl.when(empty)
    def _zero():
        dk_ref[0, 0] = jnp.zeros_like(dk_ref[0, 0])
        dv_ref[0, 0] = jnp.zeros_like(dv_ref[0, 0])


def _bs_dq_kernel(
    row_ref, n_ref, flag_ref,
    *refs,
    nm: int, num_heads: int, group_size: int,
    tile_m: int, tile_n: int,
    seqlen_q: int, seqlen_k: int,
    scale: float, softcap: float,
    score_mod=None, mask_mod=None,
    num_aux: int = 0, aux_shapes: tuple = (),
    num_aux_scalars: int = 0,
    out_dtype=None,
):
    idx = 0
    q_ref = refs[idx]; idx += 1
    k_ref = refs[idx]; idx += 1
    v_ref = refs[idx]; idx += 1
    do_ref = refs[idx]; idx += 1
    lse_ref = refs[idx]; idx += 1
    delta_ref = refs[idx]; idx += 1
    aux_refs = []
    for _ in range(num_aux):
        aux_refs.append(refs[idx]); idx += 1
    auxsc_ref = None
    if num_aux_scalars:
        auxsc_ref = refs[idx]; idx += 1
    dq_ref = refs[idx]; idx += 1
    dq_scr = refs[idx]; idx += 1

    t = pl.program_id(0)
    row = row_ref[t]
    ni = n_ref[t]
    fl = flag_ref[t]
    start = (fl & _F_START) != 0
    end = (fl & _F_END) != 0
    empty = (fl & _F_EMPTY) != 0
    mode = fl >> _F_MODE_SHIFT
    mi = row % nm
    bh = row // nm
    h = bh % num_heads
    b = bh // num_heads

    if num_aux or num_aux_scalars:
        aux = AuxData(
            tensors=tuple(
                r[...].reshape(shp) for r, shp in zip(aux_refs, aux_shapes)
            ),
            scalars=tuple(auxsc_ref[0, i] for i in range(num_aux_scalars)),
        )
    else:
        aux = None

    def _body(with_mask, with_mod):
        k = k_ref[0, 0]
        _, ds = _bs_recompute(
            q_ref[0, 0], k, v_ref[0, 0], do_ref[0, 0].astype(jnp.float32),
            lse_ref[0, 0] * LOG2E, delta_ref[0, 0],
            b=b, h=h, mi=mi, ni=ni, tile_m=tile_m, tile_n=tile_n,
            seqlen_q=seqlen_q, seqlen_k=seqlen_k,
            scale=scale, softcap=softcap,
            with_mask=with_mask, with_mod=with_mod,
            score_mod=score_mod, mask_mod=mask_mod, aux=aux,
        )
        dq_prev = jnp.where(start, jnp.zeros_like(dq_scr), dq_scr[...])
        dq_scr[...] = dq_prev + jax.lax.dot_general(
            ds, k.astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(mode == 0)
    def _interior():
        _body(False, False)

    @pl.when(mode == 1)
    def _bounds():
        _body(True, False)

    if mask_mod is not None:
        @pl.when(mode == 2)
        def _partial():
            _body(True, True)

    @pl.when(jnp.logical_and(end, jnp.logical_not(empty)))
    def _finalize():
        dq_ref[0, 0] = dq_scr[...].astype(out_dtype)

    @pl.when(empty)
    def _zero():
        dq_ref[0, 0] = jnp.zeros_like(dq_ref[0, 0])


def flash_attention_blocksparse_bwd(
    q, k, v,        # (b, h[, hk], s, d) kernel-native
    out, lse, do,   # fwd residuals; lse (b, h, sq) fp32
    block_sparse: BlockSparseTensors,
    *,
    mask_mod=None,
    score_mod=None,
    aux_tensors=(),
    aux_scalars=(),
    softmax_scale: Optional[float] = None,
    softcap: float = 0.0,
    interpret: Optional[bool] = None,
):
    """Block-sparse backward: (dq, dk, dv). Visits only live tiles; the
    dK/dV pass runs kv-stationary chains (the transposed worklist), the dQ
    pass reuses the forward worklist. Reference: block-sparse bwd tensors
    at cute/interface.py:2982 + deterministic write ordering
    block_sparse_utils.py:80 — the latter is unnecessary here because the
    accumulation is grid-sequential."""
    batch, num_heads, seqlen_q, head_dim = q.shape
    _, num_heads_kv, seqlen_k, head_dim_v = v.shape
    group_size = num_heads // num_heads_kv
    if softmax_scale is None:
        softmax_scale = head_dim**-0.5
    if interpret is None:
        interpret = interpret_mode()
    tile_m, tile_n = block_sparse.block_size
    bst = block_sparse.host()
    nm = cdiv(seqlen_q, tile_m)
    nn = cdiv(seqlen_k, tile_n)
    _check_plan_grid(bst, batch, num_heads, nm, nn)
    partial, full = _dense_live(bst, nm, nn, batch, num_heads)
    bounds_m = _bounds_vectors(seqlen_q, tile_m, nm)
    bounds_n = _bounds_vectors(seqlen_k, tile_n, nn)
    out_dtype = q.dtype

    d_pad = round_up(head_dim, NUM_LANES)
    dv_pad = round_up(head_dim_v, NUM_LANES)
    qp = pad_to_block(pad_to_block(q, 3, d_pad), 2, tile_m)
    kp = pad_to_block(pad_to_block(k, 3, d_pad), 2, tile_n)
    vp = pad_to_block(pad_to_block(v, 3, dv_pad), 2, tile_n)
    dop = pad_to_block(pad_to_block(do, 3, dv_pad), 2, tile_m)
    delta = jnp.sum(
        do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
    )
    lsep = pad_to_block(lse, 2, tile_m)[..., None]
    deltap = pad_to_block(delta, 2, tile_m)[..., None]
    sq_pad, sk_pad = qp.shape[2], kp.shape[2]

    aux_specs, aux_args, aux_shapes = _aux_specs(
        aux_tensors, aux_scalars, 1
    )
    num_aux = len(tuple(aux_tensors))
    num_aux_scalars = len(tuple(aux_scalars))

    # ---- dK/dV: kv-stationary chains (transposed worklist) ----
    partial_t = np.swapaxes(partial, 2, 3)  # (b, h, nn, nm)
    full_t = np.swapaxes(full, 2, 3)
    row_k, m_tbl, flag_k = _build_worklist(
        partial_t, full_t, has_mod=mask_mod is not None,
        bounds_m=bounds_n, bounds_n=bounds_m,  # swapped roles
    )

    def q_map_k(t, rref, mref, fref):
        row = rref[t]
        return (row // (num_heads * nn), (row // nn) % num_heads,
                mref[t], 0)

    def kv_map_k(t, rref, mref, fref):
        row = rref[t]
        return (row // (num_heads * nn),
                ((row // nn) % num_heads) // group_size, row % nn, 0)

    def dkv_out_map(t, rref, mref, fref):
        row = rref[t]
        return (row // (num_heads * nn), (row // nn) % num_heads,
                row % nn, 0)

    dkv_specs = [
        pl.BlockSpec((1, 1, tile_m, d_pad), q_map_k),
        pl.BlockSpec((1, 1, tile_n, d_pad), kv_map_k),
        pl.BlockSpec((1, 1, tile_n, dv_pad), kv_map_k),
        pl.BlockSpec((1, 1, tile_m, dv_pad), q_map_k),
        pl.BlockSpec((1, 1, tile_m, 1), q_map_k),
        pl.BlockSpec((1, 1, tile_m, 1), q_map_k),
    ] + aux_specs
    dkv_args = [qp, kp, vp, dop, lsep, deltap] + aux_args

    dkv_kernel = functools.partial(
        _bs_dkv_kernel,
        nn=nn, num_heads=num_heads, group_size=group_size,
        tile_m=tile_m, tile_n=tile_n,
        seqlen_q=seqlen_q, seqlen_k=seqlen_k,
        scale=float(softmax_scale), softcap=float(softcap),
        score_mod=score_mod, mask_mod=mask_mod,
        num_aux=num_aux, aux_shapes=aux_shapes,
        num_aux_scalars=num_aux_scalars,
    )
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(len(row_k),),
            in_specs=dkv_specs,
            out_specs=[
                pl.BlockSpec((1, 1, tile_n, d_pad), dkv_out_map),
                pl.BlockSpec((1, 1, tile_n, dv_pad), dkv_out_map),
            ],
            scratch_shapes=[
                pltpu.VMEM((tile_n, d_pad), jnp.float32),
                pltpu.VMEM((tile_n, dv_pad), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct(
                (batch, num_heads, sk_pad, d_pad), jnp.float32),
            jax.ShapeDtypeStruct(
                (batch, num_heads, sk_pad, dv_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(jnp.asarray(row_k), jnp.asarray(m_tbl), jnp.asarray(flag_k),
      *dkv_args)
    dk = dk[:, :, :seqlen_k, :head_dim]
    dv = dv[:, :, :seqlen_k, :head_dim_v]
    if group_size > 1:
        dk = dk.reshape(
            batch, num_heads_kv, group_size, seqlen_k, head_dim).sum(axis=2)
        dv = dv.reshape(
            batch, num_heads_kv, group_size, seqlen_k, head_dim_v
        ).sum(axis=2)
    dk = dk.astype(out_dtype)
    dv = dv.astype(out_dtype)

    # ---- dQ: forward worklist ----
    row_q, n_tbl, flag_q = _build_worklist(
        partial, full, has_mod=mask_mod is not None,
        bounds_m=bounds_m, bounds_n=bounds_n,
    )

    def q_map(t, rref, nref, fref):
        row = rref[t]
        return (row // (num_heads * nm), (row // nm) % num_heads,
                row % nm, 0)

    def kv_map(t, rref, nref, fref):
        row = rref[t]
        return (row // (num_heads * nm),
                ((row // nm) % num_heads) // group_size, nref[t], 0)

    dq_specs = [
        pl.BlockSpec((1, 1, tile_m, d_pad), q_map),
        pl.BlockSpec((1, 1, tile_n, d_pad), kv_map),
        pl.BlockSpec((1, 1, tile_n, dv_pad), kv_map),
        pl.BlockSpec((1, 1, tile_m, dv_pad), q_map),
        pl.BlockSpec((1, 1, tile_m, 1), q_map),
        pl.BlockSpec((1, 1, tile_m, 1), q_map),
    ] + aux_specs
    dq_args = [qp, kp, vp, dop, lsep, deltap] + aux_args

    dq_kernel = functools.partial(
        _bs_dq_kernel,
        nm=nm, num_heads=num_heads, group_size=group_size,
        tile_m=tile_m, tile_n=tile_n,
        seqlen_q=seqlen_q, seqlen_k=seqlen_k,
        scale=float(softmax_scale), softcap=float(softcap),
        score_mod=score_mod, mask_mod=mask_mod,
        num_aux=num_aux, aux_shapes=aux_shapes,
        num_aux_scalars=num_aux_scalars,
        out_dtype=out_dtype,
    )
    (dq,) = pl.pallas_call(
        dq_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(len(row_q),),
            in_specs=dq_specs,
            out_specs=[
                pl.BlockSpec((1, 1, tile_m, d_pad), q_map),
            ],
            scratch_shapes=[pltpu.VMEM((tile_m, d_pad), jnp.float32)],
        ),
        out_shape=[
            jax.ShapeDtypeStruct(
                (batch, num_heads, sq_pad, d_pad), out_dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(jnp.asarray(row_q), jnp.asarray(n_tbl), jnp.asarray(flag_q),
      *dq_args)
    return dq[:, :, :seqlen_q, :head_dim], dk, dv
