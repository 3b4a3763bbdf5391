"""KV-cache containers and functional append.

The reference appends new K/V inside the decode kernel (`knew_ptr`,
csrc/flash_attn/flash_api.cpp:1309 + Append_KV switch,
flash_fwd_launch_template.h:114). On TPU the idiomatic equivalent is a
functional `dynamic_update_slice` / scatter that XLA performs in place when
the cache buffer is donated into the jitted decode step — same zero-copy
semantics, no kernel complexity.

Native cache layout is (batch, kv_heads, max_seqlen, head_dim) — contiguous
(seqlen, head_dim) tiles per head, the DMA-friendly layout for the decode
kernel. Paged caches are (num_pages, kv_heads, page_size, head_dim) with a
(batch, max_pages) int32 block table (maps hopper/paged_kv.h).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax
import jax
import jax.numpy as jnp


@flax.struct.dataclass
class QuantPagedKV:
    """Quantized paged KV pool + per-head dequant scales, one engine layer.

    The serving analog of the reference's fp8 KV-cache dequant contract
    (flash_attn/cute/interface.py:482-497: bf16 Q x fp8 paged KV with
    k/v descales): `k`/`v` hold 1-byte pages (int8 or float8_e4m3fn), and
    dequantization is `x_q * scale` per kv head. For the fused K|V layout
    `v` is None and `k` is the fused pool (allocate_fused_paged_kv_cache
    layout with a 1-byte dtype)."""

    k: jnp.ndarray
    v: Optional[jnp.ndarray]
    k_scale: jnp.ndarray  # (hk,) float32
    v_scale: jnp.ndarray  # (hk,) float32

    @property
    def fused(self) -> bool:
        return self.v is None


def quantize_to_cache_dtype(x: jnp.ndarray, scale: jnp.ndarray,
                            dtype) -> jnp.ndarray:
    """Quantize new K/V tokens (b, s, hk, d) for a 1-byte cache.

    `scale` is the per-head DEQUANT scale (hk,): stored value is
    x / scale, saturating-clipped to the target dtype's range (int8
    symmetric +-127; e4m3 +-448). Subnormal-flush keeps e4m3 exactly
    representable by the fast bit-dequant path."""
    xs = x.astype(jnp.float32) / scale.reshape(1, 1, -1, 1)
    if dtype == jnp.int8:
        return jnp.clip(jnp.round(xs), -127, 127).astype(jnp.int8)
    info = jnp.finfo(dtype)
    xs = jnp.clip(xs, float(info.min), float(info.max))
    # Flush e4m3 subnormals (|x| < 2^-6) to zero: keeps every stored bit
    # pattern normal so integer-domain dequant tricks stay exact.
    xs = jnp.where(jnp.abs(xs) < float(info.tiny), 0.0, xs)
    return xs.astype(dtype)


def update_kv_cache(
    k_cache: jnp.ndarray,  # (b, hk, smax, d)
    v_cache: jnp.ndarray,
    k_new: jnp.ndarray,    # (b, snew, hk, d)
    v_new: jnp.ndarray,
    cache_seqlens: jnp.ndarray,  # (b,) int32 — lengths BEFORE append
    *,
    cache_batch_idx: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Append new tokens at each sequence's current length. Returns updated
    (k_cache, v_cache). Donate the caches into the enclosing jit for true
    in-place updates."""
    kn = k_new.transpose(0, 2, 1, 3)  # (b, hk, snew, d)
    vn = v_new.transpose(0, 2, 1, 3)
    batch = kn.shape[0]
    bidx = (
        jnp.asarray(cache_batch_idx, jnp.int32)
        if cache_batch_idx is not None
        else jnp.arange(batch, dtype=jnp.int32)
    )

    def upd_one(cache, new, row, start):
        # cache: (hk, smax, d); new: (hk, snew, d)
        return jax.lax.dynamic_update_slice(cache, new, (0, start, 0))

    def upd(cache, new):
        updated = jax.vmap(
            lambda i: upd_one(cache[bidx[i]], new[i], bidx[i], cache_seqlens[i])
        )(jnp.arange(batch))
        return cache.at[bidx].set(updated)

    return upd(k_cache, kn), upd(v_cache, vn)


def update_paged_kv_cache(
    k_pages: jnp.ndarray,  # (npages, hk, page_size, d)
    v_pages: jnp.ndarray,
    k_new: jnp.ndarray,    # (b, snew, hk, d)
    v_new: jnp.ndarray,
    cache_seqlens: jnp.ndarray,  # (b,) lengths BEFORE append
    block_table: jnp.ndarray,    # (b, max_pages) int32
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scatter new tokens into their pages. Returns updated page pools."""
    b, snew, hk, d = k_new.shape
    page_size = k_pages.shape[2]
    pos = cache_seqlens[:, None] + jnp.arange(snew)[None, :]  # (b, snew)
    page_idx = jnp.take_along_axis(
        block_table, pos // page_size, axis=1
    )  # (b, snew)
    slot = pos % page_size

    kn = k_new.reshape(b * snew, hk, d)
    # v may have a different head dim (MLA latent pools).
    vn = v_new.reshape(b * snew, hk, v_new.shape[3])
    pi = page_idx.reshape(-1)
    si = slot.reshape(-1)
    k_pages = k_pages.at[pi, :, si, :].set(kn)
    v_pages = v_pages.at[pi, :, si, :].set(vn)
    return k_pages, v_pages


def allocate_kv_cache(
    batch: int,
    max_seqlen: int,
    num_heads_kv: int,
    head_dim: int,
    dtype=jnp.bfloat16,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Contiguous cache pair in native (b, hk, s, d) layout (maps
    flash_attn/utils/generation.py:589 allocate_inference_cache)."""
    shape = (batch, num_heads_kv, max_seqlen, head_dim)
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)


def allocate_paged_kv_cache(
    num_pages: int,
    page_size: int,
    num_heads_kv: int,
    head_dim: int,
    dtype=jnp.bfloat16,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    shape = (num_pages, num_heads_kv, page_size, head_dim)
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)


def _lane_pad(d: int) -> int:
    return -(-d // 128) * 128


def allocate_fused_paged_kv_cache(
    num_pages: int,
    page_size: int,
    num_heads_kv: int,
    head_dim: int,
    head_dim_v: Optional[int] = None,
    dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """One pool holding K|V fused on the last dim: each page's K and V are
    memory-adjacent, so the decode kernel gathers a page in ONE DMA of
    double the size — the lever for permuted small-page block tables
    (flash_decode_multipage.py fused_kv_dim). K lives at [:, :head_dim]
    and V at [:, Kpad:Kpad+head_dim_v] with each section padded to the
    128-lane boundary, so in-kernel K/V slices are lane-aligned for any
    head dim."""
    dv = head_dim if head_dim_v is None else head_dim_v
    return jnp.zeros(
        (num_pages, num_heads_kv, page_size, _lane_pad(head_dim) + _lane_pad(dv)),
        dtype,
    )


def update_fused_paged_kv_cache(
    kv_pages: jnp.ndarray,  # (npages, hk, page_size, Kpad + Vpad)
    k_new: jnp.ndarray,     # (b, snew, hk, d)
    v_new: jnp.ndarray,     # (b, snew, hk, dv)
    cache_seqlens: jnp.ndarray,  # (b,) lengths BEFORE append
    block_table: jnp.ndarray,    # (b, max_pages) int32
) -> jnp.ndarray:
    """Scatter new tokens into the fused pool — one scatter for K and V."""
    b, snew, hk, d = k_new.shape
    dv = v_new.shape[3]
    page_size = kv_pages.shape[2]
    pos = cache_seqlens[:, None] + jnp.arange(snew)[None, :]  # (b, snew)
    page_idx = jnp.take_along_axis(
        block_table, pos // page_size, axis=1
    )
    slot = pos % page_size

    def pad_last(x, to):
        if x.shape[-1] == to:
            return x
        cfg = [(0, 0)] * (x.ndim - 1) + [(0, to - x.shape[-1])]
        return jnp.pad(x, cfg)

    kvn = jnp.concatenate(
        [pad_last(k_new, _lane_pad(d)), pad_last(v_new, _lane_pad(dv))],
        axis=-1,
    ).reshape(b * snew, hk, kv_pages.shape[3])
    pi = page_idx.reshape(-1)
    si = slot.reshape(-1)
    return kv_pages.at[pi, :, si, :].set(kvn)


def quantize_kv(
    k: jnp.ndarray,  # (..., hk, s, d) or any layout with head axis given
    v: jnp.ndarray,
    dtype=jnp.int8,
    head_axis: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-kv-head symmetric quantization of a KV cache.

    Returns (k_q, v_q, k_scale, v_scale) where scales have shape (hk,) and
    dequantization is `x_q * scale` — the contract the decode kernel's
    in-kernel dequant expects (maps vLLM's fp8 KV quant ops tested in
    tests/cute/test_flash_attn_fp8_kv_cache.py:57-100).
    """
    axes = tuple(i for i in range(k.ndim) if i != head_axis)

    if dtype == jnp.int8:
        qmax = 127.0
    else:
        qmax = float(jnp.finfo(dtype).max)

    def quant(x):
        amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axes)
        scale = jnp.maximum(amax / qmax, 1e-8)
        shape = [1] * x.ndim
        shape[head_axis] = -1
        xq = x.astype(jnp.float32) / scale.reshape(shape)
        if dtype == jnp.int8:
            xq = jnp.clip(jnp.round(xq), -127, 127)
        return xq.astype(dtype), scale

    k_q, k_scale = quant(k)
    v_q, v_scale = quant(v)
    return k_q, v_q, k_scale, v_scale
