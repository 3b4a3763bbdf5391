"""Multi-head attention module (reference: flash_attn/modules/mha.py:373 MHA,
:707 ParallelMHA).

Differences by design (TPU-first):
  * flax.linen instead of torch.nn; parameters are pytrees.
  * Tensor parallelism is NOT a separate ParallelMHA class — the same module
    runs sharded when its parameters carry PartitionSpecs from
    flash_attn_tpu.parallel.sharding rules (Megatron column/row semantics:
    Wqkv out-dim sharded, out_proj in-dim sharded; XLA GSPMD inserts the
    collectives the reference issues by hand in ops/fused_dense.py:27-118).
  * The decode fast path calls the native-layout KV-cache kernel
    (flash_attn_with_kvcache analog) exactly like the reference's
    _update_kv_cache + kvcache branch (mha.py:344,602).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from flash_attn_tpu.flash_attn_interface import flash_attn_func
from flash_attn_tpu.kernels.flash_decode import flash_attention_decode
from flash_attn_tpu.layers.rotary import RotaryEmbedding
from flash_attn_tpu.ops.rotary import apply_rotary_emb
from flash_attn_tpu.runtime.kv_cache import update_kv_cache


@dataclasses.dataclass
class InferenceParams:
    """KV-cache container for generation (reference
    flash_attn/utils/generation.py:24). Caches are a dict
    layer_idx -> (k_cache, v_cache), either contiguous in native
    (b, hk, smax, d) layout or paged (npages, hk, page, d) when
    `block_table` is set (reference paged path, hopper/paged_kv.h)."""

    max_seqlen: int
    max_batch_size: int
    seqlen_offset: Any = 0  # int or (b,) int32
    key_value_memory_dict: dict = dataclasses.field(default_factory=dict)
    lengths_per_sample: Optional[jnp.ndarray] = None
    block_table: Optional[jnp.ndarray] = None  # (b, max_pages) int32

    def reset(self, max_seqlen, max_batch_size):
        self.max_seqlen = max_seqlen
        self.max_batch_size = max_batch_size
        self.seqlen_offset = 0


class MHA(nn.Module):
    """Self/cross attention with fused QKV, rotary, GQA/MQA, sliding window,
    ALiBi, softcap, and a KV-cache decode path."""

    embed_dim: int
    num_heads: int
    num_heads_kv: Optional[int] = None
    head_dim: Optional[int] = None  # default embed_dim // num_heads
    cross_attn: bool = False
    qkv_proj_bias: bool = True
    out_proj_bias: bool = True
    dropout: float = 0.0
    softmax_scale: Optional[float] = None
    causal: bool = False
    window_size: Tuple[int, int] = (-1, -1)
    softcap: float = 0.0
    use_alibi: bool = False
    dwconv: bool = False  # causal depthwise conv on q/k/v (mha.py dwconv)
    rotary_emb_dim: int = 0
    rotary_emb_base: float = 10000.0
    rotary_emb_interleaved: bool = False
    dtype: Any = jnp.bfloat16
    layer_idx: Optional[int] = None

    def setup(self):
        h = self.num_heads
        hk = self.num_heads_kv if self.num_heads_kv is not None else h
        assert h % hk == 0
        d = (
            self.head_dim
            if self.head_dim is not None
            else self.embed_dim // self.num_heads
        )
        self._h, self._hk, self._d = h, hk, d
        # Separate q/k/v projections: the reference fuses Wqkv into one matmul
        # (modules/mha.py:450) because torch launches are expensive; on TPU
        # separate Dense layers shard cleanly on the head axis under GSPMD
        # (a fused output axis would put the q|k|v boundary inside a TP
        # shard), and XLA fuses the three matmuls' epilogues anyway.
        # Checkpoint adapters split fused Wqkv weights on load.
        self.Wq = nn.Dense(
            h * d, use_bias=self.qkv_proj_bias, dtype=self.dtype, name="Wq"
        )
        self.Wk = nn.Dense(
            hk * d, use_bias=self.qkv_proj_bias, dtype=self.dtype, name="Wk"
        )
        self.Wv = nn.Dense(
            hk * d, use_bias=self.qkv_proj_bias, dtype=self.dtype, name="Wv"
        )
        self.out_proj = nn.Dense(
            self.embed_dim, use_bias=self.out_proj_bias, dtype=self.dtype,
            name="out_proj",
        )
        if self.dwconv:
            # Width-3 causal depthwise conv per projection (reference
            # modules/mha.py dwconv=True: Conv1d(groups=dim, k=3, pad=2)
            # sliced [..., :-2]).
            self.dwconv_q = self.param(
                "dwconv_q", nn.initializers.normal(0.02), (3, h * d)
            )
            self.dwconv_k = self.param(
                "dwconv_k", nn.initializers.normal(0.02), (3, hk * d)
            )
            self.dwconv_v = self.param(
                "dwconv_v", nn.initializers.normal(0.02), (3, hk * d)
            )
        if self.rotary_emb_dim > 0:
            self.rotary = RotaryEmbedding(
                self.rotary_emb_dim,
                base=self.rotary_emb_base,
                interleaved=self.rotary_emb_interleaved,
            )
        if self.use_alibi:
            from flash_attn_tpu.kernels.common import default_alibi_slopes

            self._alibi_slopes = default_alibi_slopes(h)
        else:
            self._alibi_slopes = None

    def __call__(
        self,
        x: jnp.ndarray,  # (b, s, embed_dim)
        x_kv: Optional[jnp.ndarray] = None,  # cross-attn source
        inference_params: Optional[InferenceParams] = None,
        *,
        key_padding_mask: Optional[jnp.ndarray] = None,  # (b, skv) bool
        deterministic: bool = True,
    ):
        b, s, _ = x.shape
        h, hk, d = self._h, self._hk, self._d
        kv_src = x_kv if (self.cross_attn and x_kv is not None) else x
        skv = kv_src.shape[1]
        q = self.Wq(x)
        k = self.Wk(kv_src)
        v = self.Wv(kv_src)
        if self.dwconv:
            if inference_params is not None:
                q, k, v = self._dwconv_step(q, k, v, inference_params)
            else:

                def causal_dw(y, w):
                    # y[t] += w[0]*y[t-2] + w[1]*y[t-1] + w[2]*y[t]
                    y0 = jnp.pad(y, ((0, 0), (2, 0), (0, 0)))[:, :-2]
                    y1 = jnp.pad(y, ((0, 0), (1, 0), (0, 0)))[:, :-1]
                    return (y0 * w[0] + y1 * w[1] + y * w[2]).astype(y.dtype)

                q = causal_dw(q, self.dwconv_q)
                k = causal_dw(k, self.dwconv_k)
                v = causal_dw(v, self.dwconv_v)
        q = q.reshape(b, s, h, d)
        k = k.reshape(b, skv, hk, d)
        v = v.reshape(b, skv, hk, d)

        dropout_p = 0.0 if deterministic else self.dropout

        if inference_params is None:
            if self.rotary_emb_dim > 0:
                cos, sin = self.rotary.cos_sin(s)
                q = apply_rotary_emb(
                    q, cos, sin, interleaved=self.rotary_emb_interleaved
                )
                k = apply_rotary_emb(
                    k, cos, sin, interleaved=self.rotary_emb_interleaved
                )
            seg_kw = {}
            if key_padding_mask is not None:
                # Padding tokens as mismatching segment ids: fully-masked q
                # rows produce zeros (the reference's unpad-everywhere BERT
                # path achieves the same effect, models/bert.py:340).
                seg_kw = dict(
                    q_segment_ids=jnp.where(
                        key_padding_mask[:, : x.shape[1]], 0, -1
                    ).astype(jnp.int32),
                    kv_segment_ids=jnp.where(
                        key_padding_mask, 0, -2
                    ).astype(jnp.int32),
                )
            context = flash_attn_func(
                q, k, v,
                dropout_p=dropout_p,
                softmax_scale=self.softmax_scale,
                causal=self.causal,
                window_size=self.window_size,
                softcap=self.softcap,
                alibi_slopes=self._alibi_slopes,
                **seg_kw,
            )
        else:
            context = self._decode_step(q, k, v, inference_params)

        return self.out_proj(context.reshape(b, s, h * d))

    def _dwconv_step(self, q, k, v, inference_params: InferenceParams):
        """Causal depthwise conv with streaming state for decode.

        The conv needs the two previous *raw* (pre-conv) projections; they
        live in the cache dict under key `~layer_idx` (bitwise complement —
        negative ints keep the dict's pytree key set homogeneous and
        sortable next to the positive KV-cache layer keys). State starts as
        zeros (== the training-time causal left-pad) and is rolled forward
        every call, so chunked prefill + one-token decode both match the
        full-sequence conv. Rejected speculative tokens would poison this
        state — dwconv and speculative decoding are mutually exclusive.
        """
        key = ~(self.layer_idx if self.layer_idx is not None else 0)
        b = q.shape[0]
        state = inference_params.key_value_memory_dict.get(key)
        if state is None:
            state = tuple(
                jnp.zeros((b, 2, y.shape[-1]), y.dtype) for y in (q, k, v)
            )

        def conv(y, w, st):
            ycat = jnp.concatenate([st.astype(y.dtype), y], axis=1)
            out = (
                ycat[:, :-2] * w[0] + ycat[:, 1:-1] * w[1] + ycat[:, 2:] * w[2]
            ).astype(y.dtype)
            return out, ycat[:, -2:]

        q, s_q = conv(q, self.dwconv_q, state[0])
        k, s_k = conv(k, self.dwconv_k, state[1])
        v, s_v = conv(v, self.dwconv_v, state[2])
        inference_params.key_value_memory_dict[key] = (s_q, s_k, s_v)
        return q, k, v

    def _decode_step(self, q, k, v, inference_params: InferenceParams):
        """Prefill (seqlen_offset == 0 fills the cache) or incremental decode
        against the layer's cache. Mirrors MHA._update_kv_cache + the
        flash_attn_with_kvcache branch (modules/mha.py:344-705)."""
        b, s = q.shape[0], q.shape[1]
        layer = self.layer_idx if self.layer_idx is not None else 0
        entry = inference_params.key_value_memory_dict[layer]
        from flash_attn_tpu.runtime.kv_cache import QuantPagedKV

        # Entry forms: QuantPagedKV (1-byte pool + per-head descales), a
        # bare array (fused bf16 K|V page pool), or a (k, v) tuple.
        quant_entry = isinstance(entry, QuantPagedKV)
        if quant_entry:
            fused = entry.fused
            if fused:
                kv_cache, k_cache, v_cache = entry.k, None, None
            else:
                k_cache, v_cache, kv_cache = entry.k, entry.v, None
        else:
            fused = not isinstance(entry, tuple)
            if fused:
                kv_cache, k_cache, v_cache = entry, None, None
            else:
                k_cache, v_cache = entry
        offset = inference_params.seqlen_offset
        if isinstance(offset, int):
            offsets = jnp.full((b,), offset, jnp.int32)
        else:
            offsets = jnp.asarray(offset, jnp.int32)

        if self.rotary_emb_dim > 0:
            cos, sin = self.rotary.cos_sin(inference_params.max_seqlen)
            q = apply_rotary_emb(
                q, cos, sin, interleaved=self.rotary_emb_interleaved,
                seqlen_offsets=offsets,
            )
            k = apply_rotary_emb(
                k, cos, sin, interleaved=self.rotary_emb_interleaved,
                seqlen_offsets=offsets,
            )

        table = inference_params.block_table
        if quant_entry:
            # Quantized serving cache: new K/V quantize ON WRITE with the
            # pool's per-head descales; decode dequantizes in-kernel
            # (reference fp8_kv_dequant serving contract,
            # cute/interface.py:482-497).
            assert table is not None, "quantized caches are paged (engine)"
            assert self._alibi_slopes is None
            from flash_attn_tpu.runtime.kv_cache import (
                quantize_to_cache_dtype,
                update_fused_paged_kv_cache,
                update_paged_kv_cache,
            )

            pool_dtype = (kv_cache if fused else k_cache).dtype
            k_q = quantize_to_cache_dtype(k, entry.k_scale, pool_dtype)
            v_q = quantize_to_cache_dtype(v, entry.v_scale, pool_dtype)
            if fused:
                kv_cache = update_fused_paged_kv_cache(
                    kv_cache, k_q, v_q, offsets, table
                )
                entry = entry.replace(k=kv_cache)
                inference_params.key_value_memory_dict[layer] = entry
                out, _ = flash_attention_decode(
                    q, kv_cache, None, offsets + s,
                    block_table=table,
                    fused_kv_dim=k.shape[-1],
                    fused_kv_dim_v=v.shape[-1],
                    k_scale=entry.k_scale, v_scale=entry.v_scale,
                    softmax_scale=self.softmax_scale,
                    causal=True,
                    window_left=self.window_size[0],
                    softcap=self.softcap,
                )
                return out
            k_cache, v_cache = update_paged_kv_cache(
                k_cache, v_cache, k_q, v_q, offsets, table
            )
            entry = entry.replace(k=k_cache, v=v_cache)
            inference_params.key_value_memory_dict[layer] = entry
            out, _ = flash_attention_decode(
                q, k_cache, v_cache, offsets + s,
                block_table=table,
                k_scale=entry.k_scale, v_scale=entry.v_scale,
                softmax_scale=self.softmax_scale,
                causal=True,
                window_left=self.window_size[0],
                softcap=self.softcap,
            )
            return out
        if table is not None:
            if fused:
                assert self._alibi_slopes is None, (
                    "fused K|V page pools do not support ALiBi — allocate "
                    "split pools (EngineConfig.fused_kv_pages=False)"
                )
                from flash_attn_tpu.runtime.kv_cache import (
                    update_fused_paged_kv_cache,
                )

                kv_cache = update_fused_paged_kv_cache(
                    kv_cache, k, v, offsets, table
                )
                inference_params.key_value_memory_dict[layer] = kv_cache
                out, _ = flash_attention_decode(
                    q, kv_cache, None, offsets + s,
                    block_table=table,
                    fused_kv_dim=k.shape[-1],
                    fused_kv_dim_v=v.shape[-1],
                    softmax_scale=self.softmax_scale,
                    causal=True,
                    window_left=self.window_size[0],
                    softcap=self.softcap,
                )
                return out
            from flash_attn_tpu.runtime.kv_cache import update_paged_kv_cache

            k_cache, v_cache = update_paged_kv_cache(
                k_cache, v_cache, k, v, offsets, table
            )
        else:
            k_cache, v_cache = update_kv_cache(k_cache, v_cache, k, v, offsets)
        inference_params.key_value_memory_dict[layer] = (k_cache, v_cache)
        total = offsets + s
        out, _ = flash_attention_decode(
            q, k_cache, v_cache, total,
            block_table=table,
            alibi_slopes=self._alibi_slopes,
            softmax_scale=self.softmax_scale,
            causal=True,
            window_left=self.window_size[0],
            softcap=self.softcap,
        )
        return out
