"""Pallas TPU flash-attention backward kernels.

TPU-native replacement for the reference backward pass
(csrc/flash_attn/src/flash_bwd_kernel.h, hopper/flash_bwd_kernel_sm90.h,
flash_bwd_preprocess_kernel.h). The GPU design accumulates dQ with global
atomics (optionally serialized for determinism); TPU Pallas has no atomics,
so the pass is restructured as two grid-sequential kernels that are
deterministic by construction (SURVEY.md hard-part #4):

  * dK/dV kernel: KV-stationary. Grid (b, h, kv_block, q_block) with the
    q loop innermost; dK/dV accumulate in fp32 VMEM scratch and are written
    once on the last q step. Probabilities are recomputed from Q, K and the
    forward LSE exactly as the reference bwd mainloop recomputes P.
  * dQ kernel: Q-stationary. Grid (b, h, q_block, kv_block) with the kv loop
    innermost; dQ accumulates in fp32 VMEM scratch. Optionally also emits
    dBias per (q,kv) tile.

The preprocess (delta = rowsum(dO * O), flash_bwd_preprocess_kernel.h) is a
plain XLA reduction — XLA fuses it; no kernel needed.

Block-level skipping of fully-masked tiles reuses the forward's clamped
index-map trick so Pallas elides the HBM->VMEM DMAs for skipped tiles.
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
)
from flash_attn_tpu.kernels.flash_fwd import _dropout_keep_mask


def _make_inverse_bounds(
    *,
    seqlen_q: int,
    seqlen_k: int,
    window: Tuple[int, int],
    block_q: int,
    block_kv: int,
    num_q_blocks: int,
    attention_chunk: int = 0,
):
    """Per-kv-block [min_q_block, max_q_block] visibility bounds.

    Inverse of make_causal_window_bounds: which q blocks can see kv block ki.
    Row r sees col c iff  r + off - left <= c <= r + off + right  (off =
    seqlen_k - seqlen_q; negative bound = unbounded). With chunked attention
    (attention_chunk > 0), additionally floor((r+off)/chunk) == floor(c/chunk),
    so col c is visible only from rows in
    [chunk_start(c) - off, chunk_start(c) + chunk - 1 - off].
    """
    offset = seqlen_k - seqlen_q
    left, right = window

    def min_q_block(ki):
        first_col = ki * block_kv
        if right < 0 and attention_chunk <= 0:
            return 0
        lo = 0
        if right >= 0:
            lo = first_col - offset - right
        if attention_chunk > 0:
            chunk_lo = first_col - first_col % attention_chunk - offset
            lo = jnp.maximum(lo, chunk_lo) if right >= 0 else chunk_lo
        return jnp.clip(lo // block_q, 0, num_q_blocks - 1)

    def max_q_block(ki):
        last_col = ki * block_kv + block_kv - 1
        if left < 0 and attention_chunk <= 0:
            return num_q_blocks - 1
        hi = seqlen_q - 1
        if left >= 0:
            hi = last_col - offset + left
        if attention_chunk > 0:
            chunk_hi = (
                last_col - last_col % attention_chunk
                + attention_chunk - 1 - offset
            )
            hi = jnp.minimum(hi, chunk_hi) if left >= 0 else chunk_hi
        return jnp.clip(hi // block_q, 0, num_q_blocks - 1)

    return min_q_block, max_q_block


def _recompute_p_and_ds(
    q, k, v, do, lse2, delta,
    *,
    b, h, qi, ki,
    block_q, block_kv,
    seqlen_q, seqlen_k,
    scale, causal, window, attention_chunk, sink_token_length,
    softcap, has_bias, bias_ref,
    has_alibi, slopes_ref, alibi_batched,
    dropout_p, seed_ref,
    has_segments, qseg_ref, kseg_ref,
    with_mask: bool,
    score_mod=None, mask_mod=None, aux=None,
    qv=None,
):
    """Shared recompute: returns (p, ds_scaled, dbias_tile).

    p: post-softmax probs (block_q, block_kv) fp32 (pre-dropout).
    ds_scaled: gradient wrt raw scores s = q.k^T [+ qv.v^T] (includes
    softmax scale and softcap chain rule), fp32.
    dbias_tile: gradient wrt additive bias (None unless has_bias).
    """
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (bq, bkv)
    if qv is not None:
        # MLA weight-absorbed scores (FA4 qv): S = Q K^T + Qv V^T.
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
        # Differentiate through the user's score_mod at trace time — the vjp
        # is just more traced JAX ops inlined into the kernel.
        sm_rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + qi * block_q
        sm_cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ki * block_kv
        s_nat, mod_vjp = jax.vjp(
            lambda x: call_mod(
                score_mod, x, b, h, sm_rows, sm_cols, aux=aux
            ).astype(jnp.float32),
            s_nat,
        )
    s2 = s_nat * LOG2E

    if has_alibi:
        slope2 = slopes_ref[b if alibi_batched else 0, h] * LOG2E
        rows_f = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + qi * block_q
        cols_f = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ki * block_kv
        rel = jnp.abs((cols_f - rows_f - (seqlen_k - seqlen_q)).astype(jnp.float32))
        s2 = s2 - slope2 * rel

    if has_bias:
        s2 = s2 + bias_ref[0, 0].astype(jnp.float32) * LOG2E

    p = jnp.exp2(s2 - lse2)  # (bq, bkv); lse2 broadcast (bq, 1)

    if with_mask:
        rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + qi * block_q
        cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ki * block_kv
        mask = jnp.logical_and(cols < seqlen_k, rows < seqlen_q)
        offset = seqlen_k - seqlen_q
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
            diag = rows + offset
            chunk_lo = diag - diag % attention_chunk
            mask = jnp.logical_and(
                mask,
                jnp.logical_and(
                    cols >= chunk_lo, cols < chunk_lo + attention_chunk
                ),
            )
        if has_segments:
            qseg = qseg_ref[0, :, 0]
            kseg = kseg_ref[0, :, 0]
            mask = jnp.logical_and(mask, qseg[:, None] == kseg[None, :])
        if mask_mod is not None:
            mask = jnp.logical_and(
                mask, call_mod(mask_mod, b, h, rows, cols, aux=aux)
            )
        p = jnp.where(mask, p, 0.0)

    # Dropout: regenerate the forward keep-mask. The PRNG is keyed on
    # absolute element coordinates, so fwd/bwd tilings may differ freely.
    if dropout_p > 0.0:
        keep = _dropout_keep_mask(
            seed_ref, b, h, qi * block_q, ki * block_kv, p.shape, 1.0 - dropout_p
        )
        p_drop = jnp.where(keep, p, 0.0) * (1.0 / (1.0 - dropout_p))
    else:
        p_drop = p

    # dP (wrt post-dropout probs), then dS.
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (bq, bkv)
    if dropout_p > 0.0:
        dp = jnp.where(keep, dp, 0.0) * (1.0 / (1.0 - dropout_p))
    ds = p * (dp - delta)  # (bq, bkv); delta broadcast (bq, 1)

    dbias_tile = ds if has_bias else None

    if mod_vjp is not None:
        (ds,) = mod_vjp(ds)
    if softcap > 0.0:
        ds_scaled = ds * ((1.0 - t * t) * scale)
    else:
        ds_scaled = ds * scale

    return p, p_drop, ds_scaled, dbias_tile


def _bwd_dkv_kernel(
    *refs,
    seqlen_q: int, seqlen_k: int,
    block_q: int, block_kv: int,
    num_q_blocks: int,
    scale: float, causal: bool, window: Tuple[int, int],
    attention_chunk: int, sink_token_length: int, softcap: float, dropout_p: float,
    has_bias: bool, has_alibi: bool, alibi_batched: bool,
    has_segments: bool, has_qv: bool = False,
    score_mod=None, mask_mod=None,
    num_aux: int = 0, aux_shapes: tuple = (), num_aux_scalars: int = 0,
    out_dtype=None,
    fold_m: int = 0, fold_num_kv: int = 0,
):
    idx = 0
    q_ref = refs[idx]; idx += 1
    k_ref = refs[idx]; idx += 1
    v_ref = refs[idx]; idx += 1
    qv_ref = None
    if has_qv:
        qv_ref = refs[idx]; idx += 1
    do_ref = refs[idx]; idx += 1
    lse_ref = refs[idx]; idx += 1
    delta_ref = refs[idx]; idx += 1
    bias_ref = slopes_ref = seed_ref = qseg_ref = kseg_ref = None
    if has_bias:
        bias_ref = refs[idx]; idx += 1
    if has_alibi:
        slopes_ref = refs[idx]; idx += 1
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
    dk_ref = refs[idx]; idx += 1
    dv_ref = refs[idx]; idx += 1
    dk_scr = refs[idx]; idx += 1
    dv_scr = refs[idx]; idx += 1

    b = pl.program_id(0)
    h = pl.program_id(1)
    if fold_m > 0:
        # Folded causal grid (see flash_fwd.py): kv tile p sees
        # num_q_blocks - m*p q tiles (m = block_kv // block_q), so pairing
        # kv tile p with tile N_kv-1-p gives a constant trip count — the
        # grid enumerates only visible tiles, no predicated-off steps.
        p = pl.program_id(2)
        j = pl.program_id(3)
        seg1 = num_q_blocks - fold_m * p
        j_total = 2 * num_q_blocks - fold_m * (fold_num_kv - 1)
        in_first = j < seg1
        ki = jnp.where(in_first, p, fold_num_kv - 1 - p)
        qi = jnp.where(
            in_first,
            fold_m * p + j,
            fold_m * (fold_num_kv - 1 - p) + j - seg1,
        )
        chain_start = jnp.logical_or(j == 0, j == seg1)
        chain_end = jnp.logical_or(j == seg1 - 1, j == j_total - 1)
        should_run = jnp.bool_(True)
    else:
        ki = pl.program_id(2)
        qi = pl.program_id(3)
        chain_start = qi == 0
        chain_end = qi == num_q_blocks - 1

    # Folded-grid chains start on always-live steps: fold the init into the
    # accumulate (write-through, see flash_fwd.py). Predicated grids may
    # skip the qi==0 step, so they keep the explicit zero-init.
    write_through = fold_m > 0
    if not write_through:
        @pl.when(chain_start)
        def _init():
            dk_scr[...] = jnp.zeros_like(dk_scr)
            dv_scr[...] = jnp.zeros_like(dv_scr)

    if fold_m == 0:
        min_kv_blk, max_kv_blk = make_causal_window_bounds(
            seqlen_q=seqlen_q, seqlen_k=seqlen_k, window=window,
            block_q=block_q, block_kv=block_kv,
            num_kv_blocks=cdiv(round_up(seqlen_k, block_kv), block_kv),
            attention_chunk=attention_chunk,
        )
        should_run = jnp.logical_and(
            ki >= min_kv_blk(qi), ki <= max_kv_blk(qi)
        )
        if sink_token_length > 0:
            should_run = jnp.logical_or(
                should_run, ki * block_kv < sink_token_length
            )

    needs_mask = (
        causal or is_local(window) or attention_chunk > 0 or has_segments
        or (mask_mod is not None)
        or (seqlen_k % block_kv != 0) or (seqlen_q % block_q != 0)
    )

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
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0].astype(jnp.float32)
        lse2 = lse_ref[0, 0] * LOG2E  # (bq, 1) natural -> base2
        delta = delta_ref[0, 0]  # (bq, 1)
        p, p_drop, ds_scaled, _ = _recompute_p_and_ds(
            q, k, v, do, lse2, delta,
            b=b, h=h, qi=qi, ki=ki,
            block_q=block_q, block_kv=block_kv,
            seqlen_q=seqlen_q, seqlen_k=seqlen_k,
            scale=scale, causal=causal, window=window,
            attention_chunk=attention_chunk,
            sink_token_length=sink_token_length,
            softcap=softcap, has_bias=has_bias, bias_ref=bias_ref,
            has_alibi=has_alibi, slopes_ref=slopes_ref,
            alibi_batched=alibi_batched,
            dropout_p=dropout_p, seed_ref=seed_ref,
            has_segments=has_segments, qseg_ref=qseg_ref, kseg_ref=kseg_ref,
            with_mask=with_mask,
            score_mod=score_mod, mask_mod=mask_mod, aux=aux,
            qv=qv_ref[0, 0] if has_qv else None,
        )
        # dV += P_drop^T dO   (contract over q rows)
        if write_through:
            dv_prev = jnp.where(
                chain_start, jnp.zeros_like(dv_scr), dv_scr[...]
            )
        else:
            dv_prev = dv_scr[...]
        dv_new = dv_prev + jax.lax.dot_general(
            p_drop, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if has_qv:
            # V also enters the scores: dV += dS^T Qv.
            dv_new = dv_new + jax.lax.dot_general(
                ds_scaled, qv_ref[0, 0].astype(jnp.float32),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        dv_scr[...] = dv_new
        # dK += dS^T Q
        if write_through:
            dk_prev = jnp.where(
                chain_start, jnp.zeros_like(dk_scr), dk_scr[...]
            )
        else:
            dk_prev = dk_scr[...]
        dk_scr[...] = dk_prev + jax.lax.dot_general(
            ds_scaled, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    if not needs_mask:
        @pl.when(should_run)
        def _fast():
            _compute(with_mask=False)
    else:
        row_lo = qi * block_q
        row_hi = row_lo + block_q - 1
        col_lo = ki * block_kv
        col_hi = col_lo + block_kv - 1
        offset = seqlen_k - seqlen_q
        left, right = window
        interior = jnp.logical_and(col_hi < seqlen_k, row_hi < seqlen_q)
        if causal or right >= 0:
            r = 0 if causal and right < 0 else right
            interior = jnp.logical_and(interior, col_hi <= row_lo + offset + r)
        if left >= 0:
            interior = jnp.logical_and(interior, col_lo >= row_hi + offset - left)
        if attention_chunk > 0:
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

        @pl.when(jnp.logical_and(should_run, interior))
        def _interior():
            _compute(with_mask=False)

        @pl.when(jnp.logical_and(should_run, jnp.logical_not(interior)))
        def _edge():
            _compute(with_mask=True)

    @pl.when(chain_end)
    def _finalize():
        dk_ref[0, 0] = dk_scr[...].astype(out_dtype)
        dv_ref[0, 0] = dv_scr[...].astype(out_dtype)


def _bwd_dq_kernel(
    *refs,
    seqlen_q: int, seqlen_k: int,
    block_q: int, block_kv: int,
    num_kv_blocks: int,
    scale: float, causal: bool, window: Tuple[int, int],
    attention_chunk: int, sink_token_length: int, softcap: float, dropout_p: float,
    has_bias: bool, bias_grad: bool, has_alibi: bool, alibi_batched: bool,
    has_segments: bool, has_qv: bool = False,
    score_mod=None, mask_mod=None,
    num_aux: int = 0, aux_shapes: tuple = (), num_aux_scalars: int = 0,
    out_dtype=None,
    fold_r: int = 0, fold_num_q: int = 0,
):
    idx = 0
    q_ref = refs[idx]; idx += 1
    k_ref = refs[idx]; idx += 1
    v_ref = refs[idx]; idx += 1
    qv_ref = None
    if has_qv:
        qv_ref = refs[idx]; idx += 1
    do_ref = refs[idx]; idx += 1
    lse_ref = refs[idx]; idx += 1
    delta_ref = refs[idx]; idx += 1
    bias_ref = slopes_ref = seed_ref = qseg_ref = kseg_ref = None
    if has_bias:
        bias_ref = refs[idx]; idx += 1
    if has_alibi:
        slopes_ref = refs[idx]; idx += 1
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
    dq_ref = refs[idx]; idx += 1
    dbias_ref = dqv_ref = None
    if bias_grad:
        dbias_ref = refs[idx]; idx += 1
    if has_qv:
        dqv_ref = refs[idx]; idx += 1
    dq_scr = refs[idx]; idx += 1
    dqv_scr = None
    if has_qv:
        dqv_scr = refs[idx]; idx += 1

    b = pl.program_id(0)
    h = pl.program_id(1)
    if fold_r > 0:
        # Folded causal grid, identical construction to the forward
        # (flash_fwd.py): q tile p paired with N-1-p, constant r*(N+1)
        # trip count, only visible tiles enumerated.
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

    # Write-through chain start on the folded grid (see the dkv kernel) —
    # and on unfolded dq grids whose ki==0 step is provably live (causal and
    # dense chains always see kv block 0; only left windows / chunking can
    # raise the lower bound).
    write_through = fold_r > 0 or (
        not is_local(window) and attention_chunk == 0
    )
    if not write_through:
        @pl.when(chain_start)
        def _init():
            dq_scr[...] = jnp.zeros_like(dq_scr)
            if has_qv:
                dqv_scr[...] = jnp.zeros_like(dqv_scr)

    if fold_r == 0:
        min_kv_blk, max_kv_blk = make_causal_window_bounds(
            seqlen_q=seqlen_q, seqlen_k=seqlen_k, window=window,
            block_q=block_q, block_kv=block_kv, num_kv_blocks=num_kv_blocks,
            attention_chunk=attention_chunk,
        )
        should_run = jnp.logical_and(
            ki >= min_kv_blk(qi), ki <= max_kv_blk(qi)
        )
        if sink_token_length > 0:
            should_run = jnp.logical_or(
                should_run, ki * block_kv < sink_token_length
            )

    needs_mask = (
        causal or is_local(window) or attention_chunk > 0 or has_segments
        or (mask_mod is not None)
        or (seqlen_k % block_kv != 0) or (seqlen_q % block_q != 0)
    )

    if bias_grad:
        # Every (qi, ki) tile is visited exactly once; zero skipped tiles.
        dbias_ref[0, 0] = jnp.zeros_like(dbias_ref[0, 0])

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
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0].astype(jnp.float32)
        lse2 = lse_ref[0, 0] * LOG2E
        delta = delta_ref[0, 0]
        p, p_drop, ds_scaled, dbias_tile = _recompute_p_and_ds(
            q, k, v, do, lse2, delta,
            b=b, h=h, qi=qi, ki=ki,
            block_q=block_q, block_kv=block_kv,
            seqlen_q=seqlen_q, seqlen_k=seqlen_k,
            scale=scale, causal=causal, window=window,
            attention_chunk=attention_chunk,
            sink_token_length=sink_token_length,
            softcap=softcap, has_bias=has_bias, bias_ref=bias_ref,
            has_alibi=has_alibi, slopes_ref=slopes_ref,
            alibi_batched=alibi_batched,
            dropout_p=dropout_p, seed_ref=seed_ref,
            has_segments=has_segments, qseg_ref=qseg_ref, kseg_ref=kseg_ref,
            with_mask=with_mask,
            score_mod=score_mod, mask_mod=mask_mod, aux=aux,
            qv=qv_ref[0, 0] if has_qv else None,
        )
        # dQ += dS K
        if write_through:
            dq_prev = jnp.where(
                chain_start, jnp.zeros_like(dq_scr), dq_scr[...]
            )
        else:
            dq_prev = dq_scr[...]
        dq_scr[...] = dq_prev + jax.lax.dot_general(
            ds_scaled, k.astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if has_qv:
            # dQv += dS V (MLA absorbed scores).
            if write_through:
                dqv_prev = jnp.where(
                    chain_start, jnp.zeros_like(dqv_scr), dqv_scr[...]
                )
            else:
                dqv_prev = dqv_scr[...]
            dqv_scr[...] = dqv_prev + jax.lax.dot_general(
                ds_scaled, v.astype(jnp.float32), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        if bias_grad:
            dbias_ref[0, 0] = dbias_tile.astype(dbias_ref.dtype)

    if not needs_mask:
        @pl.when(should_run)
        def _fast():
            _compute(with_mask=False)
    else:
        row_lo = qi * block_q
        row_hi = row_lo + block_q - 1
        col_lo = ki * block_kv
        col_hi = col_lo + block_kv - 1
        offset = seqlen_k - seqlen_q
        left, right = window
        interior = jnp.logical_and(col_hi < seqlen_k, row_hi < seqlen_q)
        if causal or right >= 0:
            r = 0 if causal and right < 0 else right
            interior = jnp.logical_and(interior, col_hi <= row_lo + offset + r)
        if left >= 0:
            interior = jnp.logical_and(interior, col_lo >= row_hi + offset - left)
        if attention_chunk > 0:
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

        @pl.when(jnp.logical_and(should_run, interior))
        def _interior():
            _compute(with_mask=False)

        @pl.when(jnp.logical_and(should_run, jnp.logical_not(interior)))
        def _edge():
            _compute(with_mask=True)

    @pl.when(chain_end)
    def _finalize():
        dq_ref[0, 0] = dq_scr[...].astype(out_dtype)
        if has_qv:
            dqv_ref[0, 0] = dqv_scr[...].astype(out_dtype)


def flash_attention_bwd(
    q: jnp.ndarray,   # (b, h, sq, d)
    k: jnp.ndarray,   # (b, hk, sk, d)
    v: jnp.ndarray,   # (b, hk, sk, d)
    out: jnp.ndarray,  # (b, h, sq, d)
    lse: jnp.ndarray,  # (b, h, sq) fp32 natural log
    do: jnp.ndarray,   # (b, h, sq, d)
    *,
    qv: Optional[jnp.ndarray] = None,  # (b, h, sq, d_v) MLA absorbed
    bias: Optional[jnp.ndarray] = None,
    bias_grad: bool = False,
    alibi_slopes: Optional[jnp.ndarray] = None,
    q_segment_ids: Optional[jnp.ndarray] = None,
    kv_segment_ids: Optional[jnp.ndarray] = None,
    softmax_scale: Optional[float] = None,
    causal: bool = False,
    window_size: Tuple[int, int] = (-1, -1),
    attention_chunk: int = 0,
    sink_token_length: int = 0,
    softcap: float = 0.0,
    dropout_p: float = 0.0,
    dropout_seed: Optional[jnp.ndarray] = None,
    score_mod=None,
    mask_mod=None,
    aux_tensors=(),
    aux_scalars=(),
    block_sizes: Optional[BlockSizes] = None,
    interpret: Optional[bool] = None,
):
    """Flash-attention backward. Returns (dq, dk, dv[, dbias][, dqv]).

    dk/dv come back per *kv* head (GQA groups summed). With `qv`, dqv is
    appended last.
    """
    batch, num_heads, seqlen_q, head_dim = q.shape
    _, num_heads_kv, seqlen_k, _ = k.shape
    group_size = num_heads // num_heads_kv
    has_qv = qv is not None
    if softmax_scale is None:
        softmax_scale = (
            (head_dim + v.shape[3]) ** -0.5 if has_qv else head_dim**-0.5
        )
    window = normalize_window(window_size, causal, seqlen_k)
    if interpret is None:
        interpret = interpret_mode()
    if block_sizes is None:
        block_sizes = choose_block_sizes(seqlen_q, seqlen_k, head_dim, dtype=q.dtype)
    bq_kv = block_sizes.block_q_dkv
    bkv_kv = block_sizes.block_kv_dkv
    bq_dq = block_sizes.block_q_dq
    bkv_dq = block_sizes.block_kv_dq

    d_pad = round_up(head_dim, NUM_LANES)
    head_dim_v = v.shape[3]  # may differ from head_dim (MLA / hdimdiff)
    dv_pad = round_up(head_dim_v, NUM_LANES)
    out_dtype = q.dtype

    # delta = rowsum(dO * O) in fp32 (preprocess kernel equivalent).
    delta = jnp.sum(
        do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
    )  # (b, h, sq)

    if dropout_seed is None:
        dropout_seed = jnp.zeros((), jnp.int32)
    seed_arr = jnp.asarray(dropout_seed, jnp.int32).reshape(1, 1)

    has_bias = bias is not None
    has_alibi = alibi_slopes is not None
    has_segments = q_segment_ids is not None
    alibi_batched = False
    slopes = None
    if has_alibi:
        slopes = jnp.asarray(alibi_slopes, jnp.float32)
        if slopes.ndim == 1:
            slopes = slopes[None, :]
        alibi_batched = slopes.shape[0] > 1

    aux_tensors = tuple(aux_tensors or ())
    aux_scalars = tuple(aux_scalars or ())
    aux_shapes = []
    aux_arrays = []
    for a in aux_tensors:
        a = jnp.asarray(a)
        if a.ndim <= 1:
            a = pad_aux_table(a.reshape(-1))
        aux_shapes.append(a.shape)
        aux_arrays.append(a.reshape((1,) * max(0, 2 - a.ndim) + a.shape))
    aux_shapes = tuple(aux_shapes)
    aux_sc = None
    if aux_scalars:
        aux_sc = jnp.stack(
            [jnp.asarray(x, jnp.float32) for x in aux_scalars]
        )[None, :]

    def common_specs(block_q, block_kv, clamp_q, clamp_kv):
        """in_specs + args for q,k,v,do,lse,delta and the optional extras."""
        qp = pad_to_block(pad_to_block(q, 3, d_pad), 2, block_q)
        kp = pad_to_block(pad_to_block(k, 3, d_pad), 2, block_kv)
        vp = pad_to_block(pad_to_block(v, 3, dv_pad), 2, block_kv)
        dop = pad_to_block(pad_to_block(do, 3, dv_pad), 2, block_q)
        lsep = pad_to_block(lse, 2, block_q)[..., None]  # (b,h,sqp,1)
        deltap = pad_to_block(delta, 2, block_q)[..., None]
        specs = [
            pl.BlockSpec((1, 1, block_q, d_pad),
                         lambda b, h, i, j: (b, h, clamp_q(i, j), 0)),
            pl.BlockSpec((1, 1, block_kv, d_pad),
                         lambda b, h, i, j: (b, h // group_size, clamp_kv(i, j), 0)),
            pl.BlockSpec((1, 1, block_kv, dv_pad),
                         lambda b, h, i, j: (b, h // group_size, clamp_kv(i, j), 0)),
            pl.BlockSpec((1, 1, block_q, dv_pad),
                         lambda b, h, i, j: (b, h, clamp_q(i, j), 0)),
            pl.BlockSpec((1, 1, block_q, 1),
                         lambda b, h, i, j: (b, h, clamp_q(i, j), 0)),
            pl.BlockSpec((1, 1, block_q, 1),
                         lambda b, h, i, j: (b, h, clamp_q(i, j), 0)),
        ]
        args = [qp, kp, vp, dop, lsep, deltap]
        if has_qv:
            qvp = pad_to_block(pad_to_block(qv, 3, dv_pad), 2, block_q)
            specs.insert(3, pl.BlockSpec(
                (1, 1, block_q, dv_pad),
                lambda b, h, i, j: (b, h, clamp_q(i, j), 0),
            ))
            args.insert(3, qvp)
        if has_bias:
            bb = 0 if bias.shape[0] == 1 else None
            bh = 0 if bias.shape[1] == 1 else None
            bias_p = pad_to_block(pad_to_block(bias, 3, block_kv), 2, block_q)
            specs.append(
                pl.BlockSpec(
                    (1, 1, block_q, block_kv),
                    lambda b, h, i, j, bb=bb, bh=bh: (
                        0 if bb == 0 else b, 0 if bh == 0 else h,
                        clamp_q(i, j), clamp_kv(i, j),
                    ),
                )
            )
            args.append(bias_p)
        if has_alibi:
            specs.append(
                pl.BlockSpec(slopes.shape, lambda b, h, i, j: (0, 0),
                             memory_space=pltpu.SMEM)
            )
            args.append(slopes)
        if dropout_p > 0.0:
            specs.append(
                pl.BlockSpec((1, 1), lambda b, h, i, j: (0, 0),
                             memory_space=pltpu.SMEM)
            )
            args.append(seed_arr)
        if has_segments:
            qseg = pad_to_block(
                jnp.asarray(q_segment_ids, jnp.int32), 1, block_q, value=-1
            )[..., None]
            kseg = pad_to_block(
                jnp.asarray(kv_segment_ids, jnp.int32), 1, block_kv, value=-2
            )[..., None]
            specs.append(
                pl.BlockSpec((1, block_q, 1), lambda b, h, i, j: (b, clamp_q(i, j), 0))
            )
            specs.append(
                pl.BlockSpec((1, block_kv, 1), lambda b, h, i, j: (b, clamp_kv(i, j), 0))
            )
            args.extend([qseg, kseg])
        for a in aux_arrays:
            specs.append(
                pl.BlockSpec(a.shape, lambda b, h, i, j, _n=a.ndim: (0,) * _n)
            )
            args.append(a)
        if aux_scalars:
            specs.append(
                pl.BlockSpec(aux_sc.shape, lambda b, h, i, j: (0, 0),
                             memory_space=pltpu.SMEM)
            )
            args.append(aux_sc)
        return specs, args, qp.shape[2], kp.shape[2]

    # Folded causal grids (see flash_fwd.py fold_r): gated to the pure
    # bottom-right-diagonal case with tile-aligned equal seqlens and an
    # affine visible-count (divisible tile ratio).
    fold_ok = (
        causal
        and attention_chunk == 0
        and sink_token_length == 0
        and window == (-1, 0)
        and seqlen_q == seqlen_k
    )

    # ---------------- dK/dV kernel (grid: b, h, kv, q) ----------------
    num_q_blocks_kv = cdiv(round_up(seqlen_q, bq_kv), bq_kv)
    num_kv_blocks_kv = cdiv(round_up(seqlen_k, bkv_kv), bkv_kv)
    min_qb, max_qb = _make_inverse_bounds(
        seqlen_q=seqlen_q, seqlen_k=seqlen_k, window=window,
        block_q=bq_kv, block_kv=bkv_kv, num_q_blocks=num_q_blocks_kv,
        attention_chunk=attention_chunk,
    )

    def clamp_q_kv(ki, qi):
        lo = min_qb(ki)
        hi = max_qb(ki)
        return jnp.clip(qi, lo, hi)

    fold_m = 0
    if (
        fold_ok
        and bkv_kv % bq_kv == 0
        and round_up(seqlen_q, bq_kv) == round_up(seqlen_k, bkv_kv)
        and num_kv_blocks_kv % 2 == 0
        and num_kv_blocks_kv >= 2
    ):
        fold_m = bkv_kv // bq_kv

    if fold_m:
        _Nkv = num_kv_blocks_kv
        _Nq = num_q_blocks_kv

        def kv_idx_dkv(p, j):
            return jnp.where(j < _Nq - fold_m * p, p, _Nkv - 1 - p)

        def q_idx_dkv(p, j):
            seg1 = _Nq - fold_m * p
            return jnp.where(
                j < seg1, fold_m * p + j,
                fold_m * (_Nkv - 1 - p) + j - seg1,
            )

        dkv_grid = (
            batch, num_heads, _Nkv // 2,
            2 * _Nq - fold_m * (_Nkv - 1),
        )
    else:
        def kv_idx_dkv(ki, qi):
            return ki

        def q_idx_dkv(ki, qi):
            return clamp_q_kv(ki, qi)

        dkv_grid = (batch, num_heads, num_kv_blocks_kv, num_q_blocks_kv)

    specs, args, sqp, skp = common_specs(
        bq_kv, bkv_kv,
        clamp_q=q_idx_dkv,
        clamp_kv=kv_idx_dkv,
    )

    dkv_kernel = functools.partial(
        _bwd_dkv_kernel,
        seqlen_q=seqlen_q, seqlen_k=seqlen_k,
        block_q=bq_kv, block_kv=bkv_kv, num_q_blocks=num_q_blocks_kv,
        scale=float(softmax_scale), causal=causal, window=window,
        attention_chunk=int(attention_chunk),
        sink_token_length=sink_token_length, softcap=float(softcap),
        dropout_p=float(dropout_p),
        has_bias=has_bias, has_alibi=has_alibi, alibi_batched=alibi_batched,
        has_segments=has_segments, has_qv=has_qv,
        score_mod=score_mod, mask_mod=mask_mod,
        num_aux=len(aux_tensors), aux_shapes=aux_shapes,
        num_aux_scalars=len(aux_scalars),
        out_dtype=jnp.float32,
        fold_m=fold_m, fold_num_kv=num_kv_blocks_kv,
    )
    dk_gh, dv_gh = pl.pallas_call(
        dkv_kernel,
        grid=dkv_grid,
        in_specs=specs,
        out_specs=[
            pl.BlockSpec(
                (1, 1, bkv_kv, d_pad),
                lambda b, h, ki, qi: (b, h, kv_idx_dkv(ki, qi), 0),
            ),
            pl.BlockSpec(
                (1, 1, bkv_kv, dv_pad),
                lambda b, h, ki, qi: (b, h, kv_idx_dkv(ki, qi), 0),
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((batch, num_heads, skp, d_pad), jnp.float32),
            jax.ShapeDtypeStruct((batch, num_heads, skp, dv_pad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bkv_kv, d_pad), jnp.float32),
            pltpu.VMEM((bkv_kv, dv_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*args)

    # Reduce GQA groups: (b, h, sk, d) -> (b, hk, sk, d).
    dk_gh = dk_gh[:, :, :seqlen_k, :head_dim]
    dv_gh = dv_gh[:, :, :seqlen_k, :head_dim_v]
    if group_size > 1:
        dk = dk_gh.reshape(
            batch, num_heads_kv, group_size, seqlen_k, head_dim
        ).sum(axis=2)
        dv = dv_gh.reshape(
            batch, num_heads_kv, group_size, seqlen_k, head_dim_v
        ).sum(axis=2)
    else:
        dk, dv = dk_gh, dv_gh
    dk = dk.astype(out_dtype)
    dv = dv.astype(out_dtype)

    # ---------------- dQ kernel (grid: b, h, q, kv) ----------------
    num_q_blocks_dq = cdiv(round_up(seqlen_q, bq_dq), bq_dq)
    num_kv_blocks_dq = cdiv(round_up(seqlen_k, bkv_dq), bkv_dq)
    min_kvb, max_kvb = make_causal_window_bounds(
        seqlen_q=seqlen_q, seqlen_k=seqlen_k, window=window,
        block_q=bq_dq, block_kv=bkv_dq, num_kv_blocks=num_kv_blocks_dq,
        attention_chunk=attention_chunk,
    )

    def clamp_kv_dq(qi, ki):
        lo = min_kvb(qi)
        if sink_token_length > 0:
            lo = 0
        return jnp.clip(ki, lo, max_kvb(qi))

    # bias_grad writes dbias tiles only for visited (qi, ki) pairs — the
    # rectangular grid visits (and zeroes) every tile, the folded grid does
    # not, so folding is disabled when a dbias output exists.
    fold_r = 0
    if (
        fold_ok
        and not bias_grad
        and bq_dq % bkv_dq == 0
        and round_up(seqlen_q, bq_dq) == round_up(seqlen_k, bkv_dq)
        and num_q_blocks_dq % 2 == 0
        and num_q_blocks_dq >= 2
    ):
        fold_r = bq_dq // bkv_dq

    if fold_r:
        _Nq_dq = num_q_blocks_dq

        def q_idx_dq(p, j):
            return jnp.where(j < fold_r * (p + 1), p, _Nq_dq - 1 - p)

        def kv_idx_dq(p, j):
            cross = fold_r * (p + 1)
            return jnp.where(j < cross, j, j - cross)

        dq_grid = (
            batch, num_heads, _Nq_dq // 2, fold_r * (_Nq_dq + 1)
        )
    else:
        def q_idx_dq(qi, ki):
            return qi

        def kv_idx_dq(qi, ki):
            return clamp_kv_dq(qi, ki)

        dq_grid = (batch, num_heads, num_q_blocks_dq, num_kv_blocks_dq)

    specs, args, sqp, skp = common_specs(
        bq_dq, bkv_dq,
        clamp_q=q_idx_dq,
        clamp_kv=kv_idx_dq,
    )

    dq_kernel = functools.partial(
        _bwd_dq_kernel,
        seqlen_q=seqlen_q, seqlen_k=seqlen_k,
        block_q=bq_dq, block_kv=bkv_dq, num_kv_blocks=num_kv_blocks_dq,
        scale=float(softmax_scale), causal=causal, window=window,
        attention_chunk=int(attention_chunk),
        sink_token_length=sink_token_length, softcap=float(softcap),
        dropout_p=float(dropout_p),
        has_bias=has_bias, bias_grad=bias_grad,
        has_alibi=has_alibi, alibi_batched=alibi_batched,
        has_segments=has_segments, has_qv=has_qv,
        score_mod=score_mod, mask_mod=mask_mod,
        num_aux=len(aux_tensors), aux_shapes=aux_shapes,
        num_aux_scalars=len(aux_scalars),
        out_dtype=out_dtype,
        fold_r=fold_r, fold_num_q=num_q_blocks_dq,
    )
    out_specs = [
        pl.BlockSpec(
            (1, 1, bq_dq, d_pad),
            lambda b, h, qi, ki: (b, h, q_idx_dq(qi, ki), 0),
        ),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((batch, num_heads, sqp, d_pad), out_dtype),
    ]
    if bias_grad:
        out_specs.append(
            pl.BlockSpec((1, 1, bq_dq, bkv_dq), lambda b, h, qi, ki: (b, h, qi, ki))
        )
        out_shape.append(
            jax.ShapeDtypeStruct((batch, num_heads, sqp, skp), jnp.float32)
        )
    scratch_shapes = [pltpu.VMEM((bq_dq, d_pad), jnp.float32)]
    if has_qv:
        out_specs.append(
            pl.BlockSpec(
                (1, 1, bq_dq, dv_pad),
                lambda b, h, qi, ki: (b, h, q_idx_dq(qi, ki), 0),
            )
        )
        out_shape.append(
            jax.ShapeDtypeStruct((batch, num_heads, sqp, dv_pad), out_dtype)
        )
        scratch_shapes.append(pltpu.VMEM((bq_dq, dv_pad), jnp.float32))
    results = pl.pallas_call(
        dq_kernel,
        grid=dq_grid,
        in_specs=specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*args)
    dq = results[0][:, :, :seqlen_q, :head_dim]

    ret = [dq, dk, dv]
    if bias_grad:
        dbias_full = results[1][:, :, :seqlen_q, :seqlen_k]
        # Sum over broadcast dims to match the bias's declared shape.
        if bias.shape[0] == 1:
            dbias_full = dbias_full.sum(axis=0, keepdims=True)
        if bias.shape[1] == 1:
            dbias_full = dbias_full.sum(axis=1, keepdims=True)
        ret.append(dbias_full.astype(bias.dtype))
    if has_qv:
        ret.append(results[-1][:, :, :seqlen_q, :head_dim_v])
    return tuple(ret)
