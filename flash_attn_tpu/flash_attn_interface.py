"""Public flash-attention API (reference: flash_attn/flash_attn_interface.py).

The reference wraps its CUDA extensions in torch.autograd.Functions
(flash_attn/flash_attn_interface.py:453-1009). The TPU-native equivalent is a
single `jax.custom_vjp` over the Pallas forward/backward kernels; the C++
host-dispatch layer (csrc/flash_attn/flash_api.cpp static_switch tree)
collapses into trace-time Python configuration because XLA retraces per
static shape.

Layouts: the reference API is (batch, seqlen, nheads, headdim) ["bshd"].
That is kept as the default for drop-in parity; the TPU kernels natively use
(batch, nheads, seqlen, headdim) ["bhsd"], selectable via `layout=` to avoid
transposes in TPU-first model code.

Determinism note: the reference exposes `deterministic=` for its
atomics-based dQ accumulation (flash_attn/flash_attn_interface.py:862). The
TPU backward is grid-sequential and therefore always deterministic; the flag
is accepted and ignored.
"""

from __future__ import annotations

import dataclasses
import functools
import logging
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from flash_attn_tpu.kernels.common import BlockSizes
from flash_attn_tpu.kernels.flash_fwd import flash_attention_fwd
from flash_attn_tpu.kernels.flash_bwd import flash_attention_bwd

__all__ = [
    "flash_attn_func",
    "flash_attn_qkvpacked_func",
    "flash_attn_kvpacked_func",
    "flash_attn_with_kvcache",
]


class _StaticPlan:
    """Identity-hashed host-side block-sparsity plan (the jit cache keys on
    object identity: reuse one plan object across layers/steps for cache
    hits — matching the reference's build-once amortization,
    cute/compute_block_sparsity.py:334)."""

    __slots__ = ("bst",)

    def __init__(self, bst):
        self.bst = bst

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other


@dataclasses.dataclass(frozen=True)
class _Config:
    softmax_scale: Optional[float]
    causal: bool
    window_size: Tuple[int, int]
    attention_chunk: int
    sink_token_length: int
    softcap: float
    dropout_p: float
    bias_grad: bool
    has_descale: bool
    score_mod: Optional[object]
    mask_mod: Optional[object]
    num_aux: int
    num_aux_scalars: int
    block_sizes: Optional[BlockSizes]
    interpret: Optional[bool]
    block_sparse: Optional[_StaticPlan] = None


def _zero_cotangent(x):
    if x is None:
        return None
    if jnp.issubdtype(x.dtype, jnp.integer) or jnp.issubdtype(x.dtype, jnp.bool_):
        import numpy as np

        return np.zeros(x.shape, dtype=jax.dtypes.float0)
    return jnp.zeros_like(x)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _flash_attn_core(tensors: dict, config: _Config):
    out, lse = _core_fwd(tensors, config)
    return out, lse


def _aux_from(tensors, config):
    return (
        tuple(tensors[f"aux_t{i}"] for i in range(config.num_aux)),
        tuple(tensors[f"aux_s{i}"] for i in range(config.num_aux_scalars)),
    )


def _core_fwd(tensors, config):
    aux_tensors, aux_scalars = _aux_from(tensors, config)
    if config.block_sparse is not None:
        from flash_attn_tpu.kernels.block_sparsity import (
            flash_attention_blocksparse_fwd,
        )

        return flash_attention_blocksparse_fwd(
            tensors["q"], tensors["k"], tensors["v"],
            config.block_sparse.bst,
            mask_mod=config.mask_mod,
            score_mod=config.score_mod,
            aux_tensors=aux_tensors,
            aux_scalars=aux_scalars,
            softmax_scale=config.softmax_scale,
            softcap=config.softcap,
            interpret=config.interpret,
        )
    return flash_attention_fwd(
        tensors["q"], tensors["k"], tensors["v"],
        qv=tensors.get("qv"),
        bias=tensors.get("bias"),
        alibi_slopes=tensors.get("alibi_slopes"),
        sink=tensors.get("sink"),
        q_segment_ids=tensors.get("q_segment_ids"),
        kv_segment_ids=tensors.get("kv_segment_ids"),
        q_descale=tensors.get("q_descale"),
        k_descale=tensors.get("k_descale"),
        v_descale=tensors.get("v_descale"),
        softmax_scale=config.softmax_scale,
        causal=config.causal,
        window_size=config.window_size,
        attention_chunk=config.attention_chunk,
        sink_token_length=config.sink_token_length,
        softcap=config.softcap,
        dropout_p=config.dropout_p,
        dropout_seed=tensors.get("dropout_seed"),
        score_mod=config.score_mod,
        mask_mod=config.mask_mod,
        aux_tensors=aux_tensors,
        aux_scalars=aux_scalars,
        block_sizes=config.block_sizes,
        interpret=config.interpret,
    )


def _core_fwd_vjp(tensors, config):
    out, lse = _core_fwd(tensors, config)
    return (out, lse), (tensors, out, lse)


def _core_bwd_vjp(config, residuals, cotangents):
    tensors, out, lse = residuals
    do, _dlse = cotangents
    if config.has_descale:
        raise NotImplementedError(
            "backward through quantized (descaled) attention is not supported"
            " — matches the reference (FP8 is forward-only)"
        )
    aux_tensors, aux_scalars = _aux_from(tensors, config)
    if config.block_sparse is not None:
        from flash_attn_tpu.kernels.block_sparsity import (
            flash_attention_blocksparse_bwd,
        )

        dq, dk, dv = flash_attention_blocksparse_bwd(
            tensors["q"], tensors["k"], tensors["v"], out, lse, do,
            config.block_sparse.bst,
            mask_mod=config.mask_mod,
            score_mod=config.score_mod,
            aux_tensors=aux_tensors,
            aux_scalars=aux_scalars,
            softmax_scale=config.softmax_scale,
            softcap=config.softcap,
            interpret=config.interpret,
        )
        grads = {}
        for name, val in tensors.items():
            if name == "q":
                grads[name] = dq
            elif name == "k":
                grads[name] = dk
            elif name == "v":
                grads[name] = dv
            else:
                grads[name] = _zero_cotangent(val)
        return (grads,)
    res = flash_attention_bwd(
        tensors["q"], tensors["k"], tensors["v"], out, lse, do,
        qv=tensors.get("qv"),
        bias=tensors.get("bias"),
        bias_grad=config.bias_grad and tensors.get("bias") is not None,
        alibi_slopes=tensors.get("alibi_slopes"),
        q_segment_ids=tensors.get("q_segment_ids"),
        kv_segment_ids=tensors.get("kv_segment_ids"),
        softmax_scale=config.softmax_scale,
        causal=config.causal,
        window_size=config.window_size,
        attention_chunk=config.attention_chunk,
        sink_token_length=config.sink_token_length,
        softcap=config.softcap,
        dropout_p=config.dropout_p,
        dropout_seed=tensors.get("dropout_seed"),
        score_mod=config.score_mod,
        mask_mod=config.mask_mod,
        aux_tensors=aux_tensors,
        aux_scalars=aux_scalars,
        block_sizes=config.block_sizes,
        interpret=config.interpret,
    )
    res = list(res)
    dq, dk, dv = res[:3]
    rest = res[3:]
    dbias = rest.pop(0) if (
        config.bias_grad and tensors.get("bias") is not None
    ) else None
    dqv = rest.pop(0) if "qv" in tensors else None
    grads = {}
    for name, val in tensors.items():
        if name == "q":
            grads[name] = dq
        elif name == "k":
            grads[name] = dk
        elif name == "v":
            grads[name] = dv
        elif name == "qv":
            grads[name] = dqv
        elif name == "bias" and dbias is not None:
            grads[name] = dbias
        elif name == "sink":
            # The sink adds exp(sink_h)/Z_r to each row's normalizer, so
            # dL/dsink_h = -sum_{b,r} delta_{bhr} * exp(sink_h - lse_{bhr})
            # with delta = rowsum(dO*O). The q/k/v grads need no change:
            # p = exp(s - lse) already reflects the sink through the lse.
            delta = jnp.sum(
                do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
            )  # (b, h, sq)
            w = jnp.exp(val[None, :, None].astype(jnp.float32) - lse)
            w = jnp.where(jnp.isfinite(lse), w, 0.0)
            grads[name] = -(delta * w).sum(axis=(0, 2)).astype(val.dtype)
        else:
            grads[name] = _zero_cotangent(val)
    return (grads,)


_flash_attn_core.defvjp(_core_fwd_vjp, _core_bwd_vjp)


def _topk_gather_attention(
    q,   # (b, sq, h, d)
    k,   # (b, sk, hk, d)
    v,   # (b, sk, hk, d_v)
    qv,  # (b, sq, h, d_v) or None
    indices,  # (b, sq, topk) int32; negative entries are masked out
    *,
    softmax_scale=None,
    causal=False,
    softcap=0.0,
):
    b, sq, h, d = q.shape
    _, sk, hk, dv = v.shape
    group = h // hk
    if softmax_scale is None:
        softmax_scale = (d + dv) ** -0.5 if qv is not None else d**-0.5
    idx = jnp.asarray(indices, jnp.int32)
    valid = jnp.logical_and(idx >= 0, idx < sk)
    safe = jnp.clip(idx, 0, sk - 1)  # (b, sq, t)
    # Per-row gathered KV: (b, sq, t, hk, d).
    kg = jnp.take_along_axis(k[:, None], safe[..., None, None], axis=2)
    vg = jnp.take_along_axis(v[:, None], safe[..., None, None], axis=2)
    qg = q.reshape(b, sq, hk, group, d)
    s = jnp.einsum(
        "bsngd,bstnd->bsngt", qg.astype(jnp.float32), kg.astype(jnp.float32),
        precision="highest",
    )
    if qv is not None:
        qvg = qv.reshape(b, sq, hk, group, dv)
        s = s + jnp.einsum(
            "bsnge,bstne->bsngt", qvg.astype(jnp.float32),
            vg.astype(jnp.float32), precision="highest",
        )
    if softcap > 0.0:
        s = jnp.tanh(s * (softmax_scale / softcap)) * softcap
    else:
        s = s * softmax_scale
    mask = valid[:, :, None, None, :]
    if causal:
        rows = (jnp.arange(sq) + (sk - sq))[None, :, None]
        mask = jnp.logical_and(mask, (safe <= rows)[:, :, None, None, :])
    s = jnp.where(mask, s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    p = jnp.where(jnp.any(mask, -1, keepdims=True), p, 0.0)
    out = jnp.einsum("bsngt,bstne->bsnge", p, vg.astype(jnp.float32), precision="highest")
    return out.reshape(b, sq, h, dv).astype(q.dtype)


def flash_attn_func(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    dropout_p: float = 0.0,
    softmax_scale: Optional[float] = None,
    causal: bool = False,
    window_size: Tuple[int, int] = (-1, -1),
    softcap: float = 0.0,
    alibi_slopes: Optional[jnp.ndarray] = None,
    deterministic: bool = True,  # accepted for parity; TPU bwd always is
    return_attn_probs: bool = False,
    *,
    qv: Optional[jnp.ndarray] = None,  # MLA absorbed scores (FA4 qv)
    gather_kv_indices: Optional[jnp.ndarray] = None,  # (b, sq, topk) int32
    attn_bias: Optional[jnp.ndarray] = None,
    bias_grad: bool = True,
    sink: Optional[jnp.ndarray] = None,
    attention_chunk: int = 0,  # chunked causal attention (FA3/FA4 surface)
    sink_token_length: int = 0,
    q_segment_ids: Optional[jnp.ndarray] = None,
    kv_segment_ids: Optional[jnp.ndarray] = None,
    q_descale: Optional[jnp.ndarray] = None,
    k_descale: Optional[jnp.ndarray] = None,
    v_descale: Optional[jnp.ndarray] = None,
    score_mod=None,  # callable(scores, b, h, q_idx, kv_idx[, aux]) -> scores
    mask_mod=None,   # callable(b, h, q_idx, kv_idx[, aux]) -> bool keep-mask
    aux_tensors=(),  # runtime arrays for mods (FA4 aux_tensors; AuxData arg)
    aux_scalars=(),  # runtime fp32 scalars for mods (FA4 aux_scalars)
    block_sparse_tensors=None,  # BlockSparseTensors plan: execute mask_mod
    # block-sparsely — skipped/full/partial tiles from compute_block_sparsity
    # (FA4 block sparsity, cute/interface.py:392)
    dropout_seed: Optional[jnp.ndarray] = None,
    layout: str = "bshd",
    block_sizes: Optional[BlockSizes] = None,
    interpret: Optional[bool] = None,
):
    """Drop-in analog of the reference `flash_attn_func`
    (flash_attn/flash_attn_interface.py:1148).

    Args follow the reference; TPU-only extensions are keyword-only.
    q: (b, sq, h, d); k/v: (b, sk, hk, d) with h % hk == 0 (GQA/MQA).
    Returns out (same layout as q); with return_attn_probs=True returns
    (out, softmax_lse, None) — per-probability dropout masks are not
    materialized (the reference returns them for debugging only).
    """
    del deterministic
    if gather_kv_indices is not None:
        # Top-k sparse attention (FA4 gather_kv_indices,
        # cute/topk_gather_kv.py CpasyncGatherKVManager; interface.py:3073):
        # each q row attends only its own top-k key positions. On TPU the
        # per-row gather is an XLA gather feeding a dense softmax over the
        # gathered set — pure jnp ops, so autodiff covers the backward.
        if layout == "bhsd":
            q, k, v = (x.transpose(0, 2, 1, 3) for x in (q, k, v))
            if qv is not None:
                qv = qv.transpose(0, 2, 1, 3)
        out = _topk_gather_attention(
            q, k, v, qv, gather_kv_indices,
            softmax_scale=softmax_scale, causal=causal, softcap=softcap,
        )
        if layout == "bhsd":
            out = out.transpose(0, 2, 1, 3)
        if return_attn_probs:
            return out, None, None
        return out
    if layout == "bshd":
        q_, k_, v_ = (x.transpose(0, 2, 1, 3) for x in (q, k, v))
    elif layout == "bhsd":
        q_, k_, v_ = q, k, v
    else:
        raise ValueError(f"unknown layout {layout!r}")

    tensors = {"q": q_, "k": k_, "v": v_}
    if qv is not None:
        tensors["qv"] = (
            qv.transpose(0, 2, 1, 3) if layout == "bshd" else qv
        )
    if attn_bias is not None:
        tensors["bias"] = attn_bias
    if alibi_slopes is not None:
        tensors["alibi_slopes"] = jnp.asarray(alibi_slopes, jnp.float32)
    if sink is not None:
        tensors["sink"] = jnp.asarray(sink, jnp.float32)
    if q_segment_ids is not None:
        tensors["q_segment_ids"] = q_segment_ids
        tensors["kv_segment_ids"] = kv_segment_ids
    has_descale = any(x is not None for x in (q_descale, k_descale, v_descale))
    if has_descale:
        for name, val in (
            ("q_descale", q_descale), ("k_descale", k_descale),
            ("v_descale", v_descale),
        ):
            if val is not None:
                tensors[name] = jnp.asarray(val, jnp.float32)
    if dropout_p > 0.0:
        if dropout_seed is None:
            dropout_seed = jnp.zeros((), jnp.int32)
        tensors["dropout_seed"] = jnp.asarray(dropout_seed, jnp.int32)
    aux_tensors = tuple(aux_tensors or ())
    aux_scalars = tuple(aux_scalars or ())
    for i, a in enumerate(aux_tensors):
        tensors[f"aux_t{i}"] = jnp.asarray(a)
    for i, x in enumerate(aux_scalars):
        tensors[f"aux_s{i}"] = jnp.asarray(x, jnp.float32)

    block_sparse = None
    if block_sparse_tensors is not None:
        unsupported = {
            "attn_bias": attn_bias, "alibi_slopes": alibi_slopes,
            "sink": sink, "q_segment_ids": q_segment_ids, "qv": qv,
        }
        bad = [k2 for k2, v2 in unsupported.items() if v2 is not None]
        if causal or window_size != (-1, -1) or attention_chunk or \
                sink_token_length or dropout_p > 0.0 or has_descale or bad:
            raise ValueError(
                "block_sparse_tensors composes with mask_mod/score_mod/"
                "softcap only — express causality/windows inside the "
                f"mask_mod (got causal={causal}, window={window_size}, "
                f"chunk={attention_chunk}, dropout={dropout_p}, "
                f"extras={bad})"
            )
        from flash_attn_tpu.kernels.block_sparsity import BlockSparseTensors

        if not isinstance(block_sparse_tensors, BlockSparseTensors):
            block_sparse_tensors = BlockSparseTensors(*block_sparse_tensors)
        block_sparse = _StaticPlan(block_sparse_tensors.host())

    config = _Config(
        softmax_scale=None if softmax_scale is None else float(softmax_scale),
        causal=bool(causal),
        window_size=tuple(int(w) for w in window_size),
        attention_chunk=int(attention_chunk),
        sink_token_length=int(sink_token_length),
        softcap=float(softcap),
        dropout_p=float(dropout_p),
        bias_grad=bool(bias_grad),
        has_descale=has_descale,
        score_mod=score_mod,
        mask_mod=mask_mod,
        num_aux=len(aux_tensors),
        num_aux_scalars=len(aux_scalars),
        block_sizes=block_sizes,
        interpret=interpret,
        block_sparse=block_sparse,
    )
    out, lse = _flash_attn_core(tensors, config)
    if layout == "bshd":
        out = out.transpose(0, 2, 1, 3)
    if return_attn_probs:
        return out, lse, None
    return out


def flash_attn_qkvpacked_func(
    qkv: jnp.ndarray,  # (b, s, 3, h, d)
    dropout_p: float = 0.0,
    softmax_scale: Optional[float] = None,
    causal: bool = False,
    window_size: Tuple[int, int] = (-1, -1),
    softcap: float = 0.0,
    alibi_slopes: Optional[jnp.ndarray] = None,
    deterministic: bool = True,
    return_attn_probs: bool = False,
    **kwargs,
):
    """Reference flash_attn_qkvpacked_func (flash_attn_interface.py:1011)."""
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    return flash_attn_func(
        q, k, v, dropout_p, softmax_scale, causal, window_size, softcap,
        alibi_slopes, deterministic, return_attn_probs, **kwargs
    )


def flash_attn_kvpacked_func(
    q: jnp.ndarray,  # (b, sq, h, d)
    kv: jnp.ndarray,  # (b, sk, 2, hk, d)
    dropout_p: float = 0.0,
    softmax_scale: Optional[float] = None,
    causal: bool = False,
    window_size: Tuple[int, int] = (-1, -1),
    softcap: float = 0.0,
    alibi_slopes: Optional[jnp.ndarray] = None,
    deterministic: bool = True,
    return_attn_probs: bool = False,
    **kwargs,
):
    """Reference flash_attn_kvpacked_func (flash_attn_interface.py:1077)."""
    k, v = kv[:, :, 0], kv[:, :, 1]
    return flash_attn_func(
        q, k, v, dropout_p, softmax_scale, causal, window_size, softcap,
        alibi_slopes, deterministic, return_attn_probs, **kwargs
    )


def flash_attn_with_kvcache(
    q: jnp.ndarray,        # (b, sq, h, d)
    k_cache: jnp.ndarray,  # (b, smax, hk, d) | paged (npages, page, hk, d)
    v_cache: jnp.ndarray,
    k: Optional[jnp.ndarray] = None,  # (b, snew, hk, d) to append
    v: Optional[jnp.ndarray] = None,
    rotary_cos: Optional[jnp.ndarray] = None,  # (smax_rot, rot/2)
    rotary_sin: Optional[jnp.ndarray] = None,
    cache_seqlens: Optional[jnp.ndarray] = None,  # (b,) lengths BEFORE append
    cache_batch_idx: Optional[jnp.ndarray] = None,
    cache_leftpad: Optional[jnp.ndarray] = None,
    block_table: Optional[jnp.ndarray] = None,  # (b, max_pages)
    softmax_scale: Optional[float] = None,
    causal: bool = False,
    window_size: Tuple[int, int] = (-1, -1),
    softcap: float = 0.0,
    rotary_interleaved: bool = False,
    alibi_slopes: Optional[jnp.ndarray] = None,
    num_splits: int = 0,  # accepted for parity; TPU grids are sequential
    return_softmax_lse: bool = False,
    *,
    sink: Optional[jnp.ndarray] = None,
    attention_chunk: int = 0,  # chunked causal attention (Llama-4 serving)
    sink_token_length: int = 0,
    k_scale: Optional[jnp.ndarray] = None,  # quantized-cache descales
    v_scale: Optional[jnp.ndarray] = None,
    layout: str = "bshd",
    block_kv: Optional[int] = None,
    interpret: Optional[bool] = None,
):
    """Decode-step attention over a (paged) KV cache; analog of the reference
    `flash_attn_with_kvcache` (flash_attn/flash_attn_interface.py:1477 ->
    mha_fwd_kvcache, csrc/flash_attn/flash_api.cpp:1309).

    JAX is functional, so instead of mutating the caches in place this
    returns them: `out[, lse][, (k_cache, v_cache)]` — the cache pair is
    appended to the return value whenever `k`/`v` are given. Donate the cache
    buffers into the surrounding jit to get true in-place updates.

    `layout="bshd"` matches the reference tensor layouts; `layout="bhsd"`
    takes caches in the TPU-native (b, hk, s, d) / (npages, hk, page, d)
    layout with no transposes (used by the model runtime).
    """
    del num_splits
    from flash_attn_tpu.kernels.flash_decode import flash_attention_decode
    from flash_attn_tpu.ops.rotary import apply_rotary_emb
    from flash_attn_tpu.runtime.kv_cache import (
        update_kv_cache,
        update_paged_kv_cache,
    )

    paged = block_table is not None
    if layout == "bshd":
        if paged:
            kc = k_cache.transpose(0, 2, 1, 3)  # (npages, hk, page, d)
            vc = v_cache.transpose(0, 2, 1, 3)
        else:
            kc = k_cache.transpose(0, 2, 1, 3)  # (b, hk, smax, d)
            vc = v_cache.transpose(0, 2, 1, 3)
    elif layout == "bhsd":
        kc, vc = k_cache, v_cache
    else:
        raise ValueError(f"unknown layout {layout!r}")

    batch, sq = q.shape[0], q.shape[1]
    if cache_seqlens is None:
        smax = kc.shape[2] if not paged else kc.shape[2] * block_table.shape[1]
        cache_seqlens = jnp.full((batch,), smax - (0 if k is None else k.shape[1]),
                                 jnp.int32)
    elif jnp.ndim(cache_seqlens) == 0:
        cache_seqlens = jnp.full((batch,), cache_seqlens, jnp.int32)
    cache_seqlens = jnp.asarray(cache_seqlens, jnp.int32)

    if rotary_cos is not None:
        q = apply_rotary_emb(
            q, rotary_cos, rotary_sin,
            interleaved=rotary_interleaved, seqlen_offsets=cache_seqlens,
        )
        if k is not None:
            k = apply_rotary_emb(
                k, rotary_cos, rotary_sin,
                interleaved=rotary_interleaved, seqlen_offsets=cache_seqlens,
            )

    appended = k is not None
    if appended:
        if paged:
            kc, vc = update_paged_kv_cache(
                kc, vc, k, v, cache_seqlens, block_table
            )
        else:
            kc, vc = update_kv_cache(
                kc, vc, k, v, cache_seqlens, cache_batch_idx=cache_batch_idx
            )
        total = cache_seqlens + k.shape[1]
    else:
        total = cache_seqlens

    out, lse = flash_attention_decode(
        q, kc, vc, total,
        block_table=block_table,
        cache_batch_idx=cache_batch_idx,
        cache_leftpad=cache_leftpad,
        alibi_slopes=alibi_slopes,
        sink=sink,
        k_scale=k_scale,
        v_scale=v_scale,
        softmax_scale=softmax_scale,
        causal=causal or sq == 1,
        window_left=int(window_size[0]),
        attention_chunk=int(attention_chunk),
        sink_token_length=sink_token_length,
        softcap=softcap,
        block_kv=block_kv,
        interpret=interpret,
    )

    ret = [out]
    if return_softmax_lse:
        ret.append(lse)
    if appended:
        if layout == "bshd":
            ret.append((kc.transpose(0, 2, 1, 3), vc.transpose(0, 2, 1, 3)))
        else:
            ret.append((kc, vc))
    return ret[0] if len(ret) == 1 else tuple(ret)


# ---------------------------------------------------------------------------
# Varlen API (reference flash_attn_varlen_func, flash_attn_interface.py:1260).
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class _VarlenConfig:
    softmax_scale: Optional[float]
    causal: bool
    window_size: Tuple[int, int]
    attention_chunk: int
    softcap: float
    dropout_p: float
    bias_grad: bool
    score_mod: Optional[object]
    mask_mod: Optional[object]
    num_aux: int
    num_aux_scalars: int
    block_q: Optional[int]  # None -> per-pass tuned defaults
    block_kv: Optional[int]
    interpret: Optional[bool]
    layout: str = "thd"
    sched_plan: Optional[_StaticPlan] = None  # host VarlenPlan wrapper


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _flash_attn_varlen_core(tensors: dict, config: _VarlenConfig):
    return _varlen_fwd(tensors, config)


def _varlen_default_tiles(tensors, config):
    """Varlen fwd tiles. Round-5 sweep on v5e (random AND uniform lens,
    thd AND hsd layouts): (1024, 1024) dominates every shape measured —
    4x8k 63.3/78.1 (thd/hsd), 8x2k 39.2/49.3, 16x1k 23.4/29.0 TF/s vs the
    round-4 mean-keyed defaults' 55.6/35.5/22.8. Bigger q tiles halve the
    chain count (amortizing chain init), bigger kv tiles halve per-chain
    step count; the balance beats both rectangles."""
    del tensors, config
    return (1024, 1024)


def _varlen_fwd(tensors, config):
    from flash_attn_tpu.kernels.flash_varlen import flash_attention_varlen_fwd

    aux_tensors, aux_scalars = _aux_from(tensors, config)
    def_bq, def_bkv = _varlen_default_tiles(tensors, config)
    return flash_attention_varlen_fwd(
        tensors["q"], tensors["k"], tensors["v"],
        tensors["cu_seqlens_q"], tensors["cu_seqlens_k"],
        qv=tensors.get("qv"),
        seqused_q=tensors.get("seqused_q"),
        seqused_k=tensors.get("seqused_k"),
        alibi_slopes=tensors.get("alibi_slopes"),
        softmax_scale=config.softmax_scale,
        causal=config.causal,
        window_size=config.window_size,
        attention_chunk=config.attention_chunk,
        softcap=config.softcap,
        dropout_p=config.dropout_p,
        dropout_seed=tensors.get("dropout_seed"),
        attn_bias=tensors.get("bias"),
        score_mod=config.score_mod,
        mask_mod=config.mask_mod,
        aux_tensors=aux_tensors,
        aux_scalars=aux_scalars,
        block_q=config.block_q or def_bq,
        block_kv=config.block_kv or def_bkv,
        layout=config.layout,
        plan=(
            config.sched_plan.bst if config.sched_plan is not None else None
        ),
        interpret=config.interpret,
    )


def _varlen_fwd_vjp(tensors, config):
    out, lse = _varlen_fwd(tensors, config)
    return (out, lse), (tensors, out, lse)


def _varlen_bwd_vjp(config, residuals, cotangents):
    from flash_attn_tpu.kernels.flash_varlen import flash_attention_varlen_bwd

    tensors, out, lse = residuals
    do, _ = cotangents
    aux_tensors, aux_scalars = _aux_from(tensors, config)
    bias_grad = config.bias_grad and tensors.get("bias") is not None
    res = flash_attention_varlen_bwd(
        tensors["q"], tensors["k"], tensors["v"], out, lse, do,
        tensors["cu_seqlens_q"], tensors["cu_seqlens_k"],
        qv=tensors.get("qv"),
        seqused_q=tensors.get("seqused_q"),
        seqused_k=tensors.get("seqused_k"),
        alibi_slopes=tensors.get("alibi_slopes"),
        softmax_scale=config.softmax_scale,
        causal=config.causal,
        window_size=config.window_size,
        attention_chunk=config.attention_chunk,
        softcap=config.softcap,
        dropout_p=config.dropout_p,
        dropout_seed=tensors.get("dropout_seed"),
        attn_bias=tensors.get("bias"),
        bias_grad=bias_grad,
        score_mod=config.score_mod,
        mask_mod=config.mask_mod,
        aux_tensors=aux_tensors,
        aux_scalars=aux_scalars,
        block_q=config.block_q or 256,
        block_kv=config.block_kv or 256,
        layout=config.layout,
        interpret=config.interpret,
    )
    res = list(res)
    dq, dk, dv = res[:3]
    rest = res[3:]
    dbias = rest.pop(0) if bias_grad else None
    dqv = rest.pop(0) if "qv" in tensors else None
    grads = {}
    for name, val in tensors.items():
        if name == "q":
            grads[name] = dq
        elif name == "k":
            grads[name] = dk
        elif name == "v":
            grads[name] = dv
        elif name == "qv":
            grads[name] = dqv
        elif name == "bias" and dbias is not None:
            grads[name] = dbias
        else:
            grads[name] = _zero_cotangent(val)
    return (grads,)


_flash_attn_varlen_core.defvjp(_varlen_fwd_vjp, _varlen_bwd_vjp)


def flash_attn_varlen_func(
    q: jnp.ndarray,  # (total_q, h, d)
    k: jnp.ndarray,  # (total_k, hk, d)
    v: jnp.ndarray,
    cu_seqlens_q: jnp.ndarray,  # (nseq+1,) int32
    cu_seqlens_k: jnp.ndarray,
    max_seqlen_q: Optional[int] = None,  # accepted for parity (static on TPU)
    max_seqlen_k: Optional[int] = None,
    dropout_p: float = 0.0,
    softmax_scale: Optional[float] = None,
    causal: bool = False,
    window_size: Tuple[int, int] = (-1, -1),
    softcap: float = 0.0,
    alibi_slopes: Optional[jnp.ndarray] = None,
    deterministic: bool = True,
    return_attn_probs: bool = False,
    *,
    qv: Optional[jnp.ndarray] = None,  # (total_q, h, d_v) MLA absorbed
    gather_kv_indices: Optional[jnp.ndarray] = None,  # (total_q, topk)
    attention_chunk: int = 0,  # chunked causal attention (FA3/FA4 surface)
    seqused_q: Optional[jnp.ndarray] = None,
    seqused_k: Optional[jnp.ndarray] = None,
    dropout_seed: Optional[jnp.ndarray] = None,
    attn_bias: Optional[jnp.ndarray] = None,  # (h|1, total_q, total_k) packed
    bias_grad: bool = False,
    score_mod=None,  # callable(scores, b, h, q_idx, kv_idx[, aux]) -> scores
    mask_mod=None,   # callable(b, h, q_idx, kv_idx[, aux]) -> bool
    aux_tensors=(),  # runtime arrays for mods (FA4 aux_tensors; AuxData arg)
    aux_scalars=(),
    block_sparse_tensors=None,  # varlen block-sparse plan from
    # compute_block_sparsity_varlen (FA4 varlen block sparsity,
    # cute/interface.py:3015 + block_sparsity cu_total_m_blocks)
    block_q: Optional[int] = None,  # None -> per-pass tuned defaults
    block_kv: Optional[int] = None,
    layout: str = "thd",  # "hsd": q/k/v (and qv/out/grads) head-major
    # (h, total, d) — the kernel-native layout; skips the per-call
    # transpose prep entirely (PROFILE_VARLEN.md residue). Keep tensors
    # head-major across layers to serve varlen at dense speed.
    plan=None,  # kernels/flash_varlen.VarlenPlan from make_varlen_plan:
    # a host-built exact worklist, reusable across layers/steps and the
    # only way to get the exact grid under jit (traced seqlens fall back
    # to the rectangular grid otherwise). Forward only; tiles must match.
    interpret: Optional[bool] = None,
):
    """Packed variable-length attention; analog of the reference
    `flash_attn_varlen_func` (flash_attn/flash_attn_interface.py:1260,
    vllm_flash_attn/flash_attn_interface.py:136).

    Tensors are packed along one token axis; cu_seqlens give sequence
    boundaries. Bottom-right-aligned causal masking per sequence, seqused_k
    truncation, GQA, sliding windows, softcap, ALiBi, and dropout are
    supported.

    Programmable attention (FA4 varlen, cute/interface.py:3015 + :363-427):
    score_mod/mask_mod with aux_tensors/aux_scalars run on the varlen path
    too. Mods see PER-SEQUENCE coordinates — `b` is the segment id of each
    query row (a (block_q, 1) int32 column, broadcastable against kv_idx),
    q_idx/kv_idx are in-sequence token positions. `attn_bias` is additive
    bias in packed coordinates (h|1, total_q, total_k); bias_grad=True
    returns dbias after dq.
    """
    del max_seqlen_q, max_seqlen_k, deterministic
    if layout not in ("thd", "hsd"):
        raise ValueError(f"unknown varlen layout {layout!r}")
    if layout == "hsd" and (
        block_sparse_tensors is not None or gather_kv_indices is not None
    ):
        raise ValueError(
            "layout='hsd' is not supported with block_sparse_tensors/"
            "gather_kv_indices (those routes consume packed (total, h, d))"
        )
    if block_sparse_tensors is not None:
        bad = [
            nm for nm, vv in (
                ("attn_bias", attn_bias), ("alibi_slopes", alibi_slopes),
                ("qv", qv), ("gather_kv_indices", gather_kv_indices),
            ) if vv is not None
        ]
        if causal or window_size != (-1, -1) or attention_chunk or \
                dropout_p > 0.0 or bad:
            raise ValueError(
                "varlen block_sparse_tensors composes with mask_mod/"
                "score_mod/softcap only — express causality inside the "
                f"mask_mod (got causal={causal}, extras={bad})"
            )
        return _varlen_blocksparse(
            q, k, v, cu_seqlens_q, cu_seqlens_k,
            seqused_q=seqused_q, seqused_k=seqused_k,
            mask_mod=mask_mod, score_mod=score_mod,
            aux_tensors=aux_tensors, aux_scalars=aux_scalars,
            block_sparse_tensors=block_sparse_tensors,
            softmax_scale=softmax_scale, softcap=softcap,
            return_attn_probs=return_attn_probs, interpret=interpret,
        )
    if gather_kv_indices is not None:
        out = _topk_gather_attention_varlen(
            q, k, v, qv, gather_kv_indices,
            jnp.asarray(cu_seqlens_q, jnp.int32),
            jnp.asarray(cu_seqlens_k, jnp.int32),
            softmax_scale=softmax_scale, causal=causal, softcap=softcap,
        )
        if return_attn_probs:
            return out, None, None
        return out
    tensors = {
        "q": q, "k": k, "v": v,
        "cu_seqlens_q": jnp.asarray(cu_seqlens_q, jnp.int32),
        "cu_seqlens_k": jnp.asarray(cu_seqlens_k, jnp.int32),
    }
    if qv is not None:
        tensors["qv"] = qv
    if seqused_q is not None:
        tensors["seqused_q"] = jnp.asarray(seqused_q, jnp.int32)
    if seqused_k is not None:
        tensors["seqused_k"] = jnp.asarray(seqused_k, jnp.int32)
    if alibi_slopes is not None:
        tensors["alibi_slopes"] = jnp.asarray(alibi_slopes, jnp.float32)
    if dropout_p > 0.0:
        if dropout_seed is None:
            dropout_seed = jnp.zeros((), jnp.int32)
        tensors["dropout_seed"] = jnp.asarray(dropout_seed, jnp.int32)
    if attn_bias is not None:
        tensors["bias"] = attn_bias
    aux_tensors = tuple(aux_tensors or ())
    aux_scalars = tuple(aux_scalars or ())
    for i, a in enumerate(aux_tensors):
        tensors[f"aux_t{i}"] = jnp.asarray(a)
    for i, s in enumerate(aux_scalars):
        tensors[f"aux_s{i}"] = jnp.asarray(s, jnp.float32)
    config = _VarlenConfig(
        softmax_scale=None if softmax_scale is None else float(softmax_scale),
        causal=bool(causal),
        window_size=tuple(int(w) for w in window_size),
        attention_chunk=int(attention_chunk),
        softcap=float(softcap),
        dropout_p=float(dropout_p),
        bias_grad=bool(bias_grad),
        score_mod=score_mod,
        mask_mod=mask_mod,
        num_aux=len(aux_tensors),
        num_aux_scalars=len(aux_scalars),
        block_q=None if block_q is None else int(block_q),
        block_kv=None if block_kv is None else int(block_kv),
        interpret=interpret,
        layout=str(layout),
        sched_plan=None if plan is None else _StaticPlan(plan),
    )
    out, lse = _flash_attn_varlen_core(tensors, config)
    if return_attn_probs:
        return out, lse, None
    return out


def _varlen_blocksparse(
    q, k, v, cu_seqlens_q, cu_seqlens_k, *,
    seqused_q, seqused_k, mask_mod, score_mod,
    aux_tensors, aux_scalars, block_sparse_tensors,
    softmax_scale, softcap, return_attn_probs, interpret,
):
    """Varlen block-sparse execution (FA4 varlen block sparsity).

    The packed batch is unpadded to a left-aligned (nseq, smax) layout
    sized to the PLAN's block grid, per-sequence bounds are folded into
    the mask_mod (kernels/block_sparsity.py wrap_varlen_mask_mod — the
    same wrap compute_block_sparsity_varlen planned with), the dense
    block-sparse kernel runs, and outputs repack to (total, h, d) with
    lse in the reference (h, total_q) layout. Unpack/repack are jnp
    gathers, so autodiff covers the backward through the block-sparse
    custom-vjp core. cu_seqlens must be host-concrete (static plan)."""
    import numpy as np

    from flash_attn_tpu.kernels.block_sparsity import (
        BlockSparseTensors,
        wrap_varlen_mask_mod,
    )

    if not isinstance(block_sparse_tensors, BlockSparseTensors):
        block_sparse_tensors = BlockSparseTensors(*block_sparse_tensors)
    tile_m, tile_n = block_sparse_tensors.block_size
    nm = np.asarray(block_sparse_tensors.mask_block_idx).shape[2]
    nn = np.asarray(block_sparse_tensors.mask_block_idx).shape[3]
    sq, sk = nm * tile_m, nn * tile_n

    cu_q = np.asarray(jax.device_get(cu_seqlens_q), np.int64)
    cu_k = np.asarray(jax.device_get(cu_seqlens_k), np.int64)
    nseq = len(cu_q) - 1
    lq = np.diff(cu_q)
    if seqused_q is not None:
        lq = np.minimum(lq, np.asarray(jax.device_get(seqused_q), np.int64))
    lk = np.diff(cu_k)
    if seqused_k is not None:
        lk = np.minimum(lk, np.asarray(jax.device_get(seqused_k), np.int64))
    total_q, num_heads, _ = q.shape
    total_k = k.shape[0]

    def unpack(x, cu, smax, total):
        row = jnp.arange(smax, dtype=jnp.int32)[None, :]
        src = jnp.asarray(cu[:-1], jnp.int32)[:, None] + row
        safe = jnp.clip(src, 0, max(total - 1, 0))
        return jnp.take(x, safe.reshape(-1), axis=0).reshape(
            nseq, smax, *x.shape[1:]
        ), src

    qp, qsrc = unpack(q, cu_q, sq, total_q)
    kp, _ = unpack(k, cu_k, sk, total_k)
    vp, _ = unpack(v, cu_k, sk, total_k)

    user_aux = tuple(aux_tensors or ())
    user_has_aux = bool(user_aux or aux_scalars)
    wrapped = wrap_varlen_mask_mod(mask_mod, len(user_aux), user_has_aux)
    aux_ext = user_aux + (
        jnp.asarray(lq, jnp.int32), jnp.asarray(lk, jnp.int32),
    )
    if score_mod is not None and not user_has_aux:
        # The extended aux makes call_mod pass an aux argument; preserve
        # the user's 5-arg signature.
        def score_w(s, b, h, qi, ki, aux, _sm=score_mod):
            return _sm(s, b, h, qi, ki)
    else:
        score_w = score_mod

    out_p, lse_p, _ = flash_attn_func(
        qp, kp, vp,
        softmax_scale=softmax_scale, softcap=softcap,
        mask_mod=wrapped, score_mod=score_w,
        aux_tensors=aux_ext, aux_scalars=aux_scalars,
        block_sparse_tensors=block_sparse_tensors,
        return_attn_probs=True, interpret=interpret,
    )  # out (nseq, sq, h, dv); lse (nseq, h, sq)

    valid = jnp.arange(sq, dtype=jnp.int32)[None, :] \
        < jnp.asarray(lq, jnp.int32)[:, None]
    dst = jnp.where(valid, qsrc, total_q).reshape(-1)
    flat_out = out_p.reshape(nseq * sq, num_heads, -1)
    out = jnp.zeros(
        (total_q + 1, num_heads, flat_out.shape[-1]), out_p.dtype
    ).at[dst].set(flat_out)[:total_q]
    flat_lse = lse_p.transpose(0, 2, 1).reshape(nseq * sq, num_heads)
    # Unwritten rows (seqused_q-trimmed) must read -inf, matching the
    # varlen kernel's lse contract ("out rows zero, lse rows -inf") so
    # logsumexp-weighted combines treat them as zero mass.
    lse = jnp.full((total_q + 1, num_heads), -jnp.inf, jnp.float32) \
        .at[dst].set(flat_lse)[:total_q].T
    if return_attn_probs:
        return out, lse, None
    return out


def flash_attn_varlen_qkvpacked_func(
    qkv: jnp.ndarray,  # (total, 3, h, d)
    cu_seqlens: jnp.ndarray,
    max_seqlen: Optional[int] = None,
    dropout_p: float = 0.0,
    softmax_scale: Optional[float] = None,
    causal: bool = False,
    window_size: Tuple[int, int] = (-1, -1),
    softcap: float = 0.0,
    alibi_slopes: Optional[jnp.ndarray] = None,
    deterministic: bool = True,
    return_attn_probs: bool = False,
    **kwargs,
):
    """Reference flash_attn_varlen_qkvpacked_func (flash_attn_interface.py:1180)."""
    return flash_attn_varlen_func(
        qkv[:, 0], qkv[:, 1], qkv[:, 2], cu_seqlens, cu_seqlens,
        max_seqlen, max_seqlen, dropout_p, softmax_scale, causal,
        window_size, softcap, alibi_slopes, deterministic, return_attn_probs,
        **kwargs,
    )


def flash_attn_varlen_kvpacked_func(
    q: jnp.ndarray,
    kv: jnp.ndarray,  # (total_k, 2, hk, d)
    cu_seqlens_q: jnp.ndarray,
    cu_seqlens_k: jnp.ndarray,
    max_seqlen_q: Optional[int] = None,
    max_seqlen_k: Optional[int] = None,
    dropout_p: float = 0.0,
    softmax_scale: Optional[float] = None,
    causal: bool = False,
    window_size: Tuple[int, int] = (-1, -1),
    softcap: float = 0.0,
    alibi_slopes: Optional[jnp.ndarray] = None,
    deterministic: bool = True,
    return_attn_probs: bool = False,
    **kwargs,
):
    """Reference flash_attn_varlen_kvpacked_func (flash_attn_interface.py:1220)."""
    return flash_attn_varlen_func(
        q, kv[:, 0], kv[:, 1], cu_seqlens_q, cu_seqlens_k,
        max_seqlen_q, max_seqlen_k, dropout_p, softmax_scale, causal,
        window_size, softcap, alibi_slopes, deterministic, return_attn_probs,
        **kwargs,
    )


def _topk_gather_attention_varlen(
    q,   # (total_q, h, d) packed
    k,   # (total_k, hk, d)
    v,   # (total_k, hk, d_v)
    qv,  # (total_q, h, d_v) or None
    indices,  # (total_q, topk) int32, RELATIVE to each row's own sequence
    cu_q, cu_k,
    *,
    softmax_scale=None,
    causal=False,
    softcap=0.0,
):
    """Varlen top-k gather attention (reference FA4 varlen
    gather_kv_indices, cute/interface.py:3056). Indices are per-sequence
    key positions; negative entries are masked."""
    tq, h, d = q.shape
    tk, hk, dv = v.shape
    group = h // hk
    if softmax_scale is None:
        softmax_scale = (d + dv) ** -0.5 if qv is not None else d**-0.5
    rows = jnp.arange(tq, dtype=jnp.int32)
    nseq = cu_q.shape[0] - 1
    qseg = jnp.clip(
        jnp.searchsorted(cu_q, rows, side="right").astype(jnp.int32) - 1,
        0, nseq - 1,
    )
    qpos = rows - cu_q[qseg]
    klen = cu_k[qseg + 1] - cu_k[qseg]
    qlen = cu_q[qseg + 1] - cu_q[qseg]
    idx = jnp.asarray(indices, jnp.int32)  # (tq, t)
    valid = jnp.logical_and(idx >= 0, idx < klen[:, None])
    if causal:
        # Bottom-right diagonal per sequence.
        valid = jnp.logical_and(valid, idx <= (qpos + klen - qlen)[:, None])
    abs_idx = jnp.clip(idx, 0, tk - 1) + cu_k[qseg][:, None]
    safe = jnp.clip(abs_idx, 0, tk - 1)
    kg = jnp.take(k, safe.reshape(-1), axis=0).reshape(
        tq, -1, hk, d
    )  # (tq, t, hk, d)
    vg = jnp.take(v, safe.reshape(-1), axis=0).reshape(tq, -1, hk, dv)
    qg = q.reshape(tq, hk, group, d)
    s = jnp.einsum(
        "qngd,qtnd->qngt", qg.astype(jnp.float32), kg.astype(jnp.float32),
        precision="highest",
    )
    if qv is not None:
        qvg = qv.reshape(tq, hk, group, dv)
        s = s + jnp.einsum(
            "qnge,qtne->qngt", qvg.astype(jnp.float32),
            vg.astype(jnp.float32), precision="highest",
        )
    if softcap > 0.0:
        s = jnp.tanh(s * (softmax_scale / softcap)) * softcap
    else:
        s = s * softmax_scale
    mask = valid[:, None, None, :]
    s = jnp.where(mask, s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    p = jnp.where(jnp.any(mask, -1, keepdims=True), p, 0.0)
    o = jnp.einsum("qngt,qtne->qnge", p, vg.astype(jnp.float32), precision="highest")
    return o.reshape(tq, h, dv).astype(q.dtype)


def sparse_attn_func(
    q,  # (b, sq, h, d)
    k,  # (b, sk, hk, d)
    v,
    block_count,   # (b, h, cdiv(sq, 64))
    block_offset,  # (b, h, nqb, NNZ_S)
    column_count,  # (b, h, nqb)
    column_index,  # (b, h, nqb, NNZ_V)
    dropout_p: float = 0.0,
    softmax_scale: Optional[float] = None,
    causal: bool = False,
    softcap: float = 0.0,
    alibi_slopes: Optional[jnp.ndarray] = None,
    deterministic: bool = False,
    return_attn_probs: bool = False,
    *,
    return_softmax_lse: bool = False,
    seqlens_q: Optional[jnp.ndarray] = None,  # (b,) varlen per-entry lens
    seqlens_k: Optional[jnp.ndarray] = None,
    dropout_seed: Optional[jnp.ndarray] = None,
    layout: str = "bshd",
    interpret: Optional[bool] = None,
):
    """Vertical-and-slash sparse attention (reference
    vllm_flash_attn/flash_attn_interface.py:313 `sparse_attn_func`,
    csrc/flash_attn/flash_api_sparse.cpp:166). The reference build is
    forward-only; here the pass is differentiable (custom VJP over the
    sparse backward kernels — the FA4 block-sparse bwd analog). Metadata
    semantics per MInference (arXiv 2407.02490) Appendix C.4.2 with
    BLOCK_M = BLOCK_N = 64."""
    del deterministic, return_attn_probs

    # Crossover advisory (utils/sparse_crossover.py): below the measured
    # boundary exact dense attention is FASTER — log when host-known
    # metadata shows this call is on the losing side. Gated on the logger
    # being enabled so the silent case never pays a blocking device_get.
    from flash_attn_tpu.utils.fa_logging import get_logger

    if get_logger().isEnabledFor(logging.INFO):
        try:
            import numpy as _np

            import jax as _jax
            from flash_attn_tpu.utils.sparse_crossover import warn_if_slow

            _sk = k.shape[1] if layout == "bshd" else k.shape[2]
            _sq = q.shape[1] if layout == "bshd" else q.shape[2]
            _bc = _np.asarray(_jax.device_get(block_count), dtype=_np.int64)
            _cc = _np.asarray(_jax.device_get(column_count), dtype=_np.int64)
            _dens = float(
                (_bc.sum() * 64 * 64 + _cc.sum() * 64)
                / max(_bc.shape[0] * _bc.shape[1] * _sq * _sk, 1)
            )
            warn_if_slow(int(_sk), _dens)
        except Exception:
            pass  # traced metadata: no advisory

    if layout == "bshd":
        q_, k_, v_ = (x.transpose(0, 2, 1, 3) for x in (q, k, v))
    else:
        q_, k_, v_ = q, k, v
    tensors = {
        "q": q_, "k": k_, "v": v_,
        "block_count": jnp.asarray(block_count, jnp.int32),
        "block_offset": jnp.asarray(block_offset, jnp.int32),
        "column_count": jnp.asarray(column_count, jnp.int32),
        "column_index": jnp.asarray(column_index, jnp.int32),
    }
    if alibi_slopes is not None:
        tensors["alibi_slopes"] = jnp.asarray(alibi_slopes, jnp.float32)
    if seqlens_q is not None:
        tensors["seqlens_q"] = jnp.asarray(seqlens_q, jnp.int32)
    if seqlens_k is not None:
        tensors["seqlens_k"] = jnp.asarray(seqlens_k, jnp.int32)
    if dropout_p > 0.0:
        if dropout_seed is None:
            dropout_seed = jnp.zeros((), jnp.int32)
        tensors["dropout_seed"] = jnp.asarray(dropout_seed, jnp.int32)
    config = _SparseConfig(
        softmax_scale=None if softmax_scale is None else float(softmax_scale),
        causal=bool(causal), softcap=float(softcap),
        dropout_p=float(dropout_p), interpret=interpret,
    )
    out, lse = _sparse_attn_core(tensors, config)
    if layout == "bshd":
        out = out.transpose(0, 2, 1, 3)
    return (out, lse) if return_softmax_lse else out


@dataclasses.dataclass(frozen=True)
class _SparseConfig:
    softmax_scale: Optional[float]
    causal: bool
    softcap: float
    dropout_p: float
    interpret: Optional[bool]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _sparse_attn_core(tensors: dict, config: "_SparseConfig"):
    return _sparse_fwd_impl(tensors, config)


def _sparse_fwd_impl(tensors, config):
    from flash_attn_tpu.kernels.flash_sparse import flash_attention_sparse_fwd

    return flash_attention_sparse_fwd(
        tensors["q"], tensors["k"], tensors["v"],
        tensors["block_count"], tensors["block_offset"],
        tensors["column_count"], tensors["column_index"],
        alibi_slopes=tensors.get("alibi_slopes"),
        softmax_scale=config.softmax_scale, causal=config.causal,
        softcap=config.softcap, interpret=config.interpret,
        seqlens_q=tensors.get("seqlens_q"),
        seqlens_k=tensors.get("seqlens_k"),
        dropout_p=config.dropout_p,
        dropout_seed=tensors.get("dropout_seed"),
    )


def _sparse_fwd_vjp(tensors, config):
    out, lse = _sparse_fwd_impl(tensors, config)
    return (out, lse), (tensors, out, lse)


def _sparse_bwd_vjp(config, residuals, cotangents):
    from flash_attn_tpu.kernels.flash_sparse import flash_attention_sparse_bwd

    tensors, out, lse = residuals
    do, _ = cotangents
    dq, dk, dv = flash_attention_sparse_bwd(
        tensors["q"], tensors["k"], tensors["v"], out, lse, do,
        tensors["block_count"], tensors["block_offset"],
        tensors["column_count"], tensors["column_index"],
        softmax_scale=config.softmax_scale, causal=config.causal,
        softcap=config.softcap, interpret=config.interpret,
        alibi_slopes=tensors.get("alibi_slopes"),
        seqlens_q=tensors.get("seqlens_q"),
        seqlens_k=tensors.get("seqlens_k"),
        dropout_p=config.dropout_p,
        dropout_seed=tensors.get("dropout_seed"),
    )
    grads = {}
    for name, val in tensors.items():
        if name == "q":
            grads[name] = dq
        elif name == "k":
            grads[name] = dk
        elif name == "v":
            grads[name] = dv
        else:
            grads[name] = _zero_cotangent(val)
    return (grads,)


_sparse_attn_core.defvjp(_sparse_fwd_vjp, _sparse_bwd_vjp)


def compile_flash_attn_varlen_func_from_specs(
    *,
    total_q: int,
    total_k: int,
    nseq: int,
    num_heads: int,
    num_heads_kv: Optional[int] = None,
    head_dim: int,
    head_dim_v: Optional[int] = None,
    has_qv: bool = False,
    dtype=jnp.bfloat16,
    causal: bool = False,
    window_size: Tuple[int, int] = (-1, -1),
    softcap: float = 0.0,
    softmax_scale: Optional[float] = None,
    block_q: int = 256,
    block_kv: int = 256,
):
    """Ahead-of-time compile the varlen attention for fixed static specs
    (reference FA4 `compile_flash_attn_varlen_func_from_specs`,
    cute/interface.py:3109). Returns an already-compiled callable
    `(q, k, v, cu_seqlens_q, cu_seqlens_k[, qv]) -> out` — use at serving
    startup to pay compilation before traffic arrives. XLA's persistent
    cache (utils/jit_cache.enable_persistent_cache) makes it survive
    restarts.
    """
    hk = num_heads_kv or num_heads
    dv = head_dim_v or head_dim
    s = jax.ShapeDtypeStruct

    def fn(q, k, v, cu_q, cu_k, qv=None):
        return flash_attn_varlen_func(
            q, k, v, cu_q, cu_k,
            softmax_scale=softmax_scale, causal=causal,
            window_size=window_size, softcap=softcap, qv=qv,
            block_q=block_q, block_kv=block_kv,
        )

    args = [
        s((total_q, num_heads, head_dim), dtype),
        s((total_k, hk, head_dim), dtype),
        s((total_k, hk, dv), dtype),
        s((nseq + 1,), jnp.int32),
        s((nseq + 1,), jnp.int32),
    ]
    if has_qv:
        args.append(s((total_q, num_heads, dv), dtype))
    return jax.jit(fn).lower(*args).compile()


def flash_attn_combine(
    out_partial: jnp.ndarray,  # (nsplits, ..., h, d) fp32 partials
    lse_partial: jnp.ndarray,  # (nsplits, ..., h)
    out=None,
    out_dtype=None,
    return_lse: bool = True,
):
    """Public split-attention combine (reference FA4 `flash_attn_combine`,
    cute/interface.py:3337; combine kernel hopper/flash_fwd_combine_kernel.h).

    Accepts both batched (n, b, s, h, d) and varlen (n, total, h, d)
    layouts — the merge is positionwise, so the layout is pass-through.
    Partials must be normalized by their own softmax sum (the kernels'
    convention), lse in natural log.
    """
    del out
    from flash_attn_tpu.kernels.flash_decode import combine_partials

    # combine_partials reduces over axis 0 with lse shaped like o minus the
    # trailing feature dim; move heads next to lse's layout.
    o, lse = combine_partials(
        out_partial.astype(jnp.float32), lse_partial.astype(jnp.float32)
    )
    if out_dtype is not None:
        o = o.astype(out_dtype)
    return (o, lse) if return_lse else o
