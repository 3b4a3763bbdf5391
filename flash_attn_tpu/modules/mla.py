"""Multi-head Latent Attention (DeepSeek-style MLA) on the absorbed-qv
kernels.

Reference: the FA4 MLA kernel family (flash_attn/cute/flash_fwd_mla_sm100.py,
flash_bwd_mla_*.py; decode benchmark hopper/benchmark_mla_decode.py:33-49)
and the weight-absorbed formula documented at cute/interface.py:3066:

    O = softmax(scale * (Q K^T + Qv V^T)) V
    with  Q = q_rope,  K = rope_cache,  Qv = W_UK^T q_nope,  V = latent cache.

The reference ships the kernels; the module layer lives in serving stacks.
Here both live in one place: this module runs the absorbed form for
training (the qv backward computes dQv/dV exactly) AND for decode against a
latent KV cache of only (d_latent + d_rope) per token — the MLA memory win
(e.g. 512+64 floats/token instead of num_heads * (d_nope + d_rope + d_v)).

Cache layout per layer: (rope_cache (b, 1, smax, d_rope),
latent_cache (b, 1, smax, d_latent)) — ONE kv head (MQA over the latent).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from flash_attn_tpu.flash_attn_interface import flash_attn_func
from flash_attn_tpu.kernels.flash_decode import flash_attention_decode
from flash_attn_tpu.layers.rotary import RotaryEmbedding
from flash_attn_tpu.modules.mha import InferenceParams
from flash_attn_tpu.ops.rotary import apply_rotary_emb
from flash_attn_tpu.runtime.kv_cache import update_kv_cache


class MLA(nn.Module):
    """DeepSeek-V2-style attention: low-rank KV compression + decoupled
    RoPE key, computed in the weight-absorbed latent space end to end."""

    embed_dim: int
    num_heads: int
    kv_lora_rank: int = 512          # d_latent (c^KV dim)
    q_lora_rank: Optional[int] = None  # optional low-rank q (None = dense)
    qk_nope_head_dim: int = 128
    qk_rope_head_dim: int = 64
    v_head_dim: int = 128
    rotary_emb_base: float = 10000.0
    causal: bool = True
    dtype: Any = jnp.bfloat16
    layer_idx: Optional[int] = None

    def setup(self):
        h = self.num_heads
        dn, dr = self.qk_nope_head_dim, self.qk_rope_head_dim
        dc, dv = self.kv_lora_rank, self.v_head_dim
        if self.q_lora_rank:
            self.W_dq = nn.Dense(self.q_lora_rank, use_bias=False,
                                 dtype=self.dtype, name="W_dq")
            self.W_uq = nn.Dense(h * (dn + dr), use_bias=False,
                                 dtype=self.dtype, name="W_uq")
        else:
            self.W_q = nn.Dense(h * (dn + dr), use_bias=False,
                                dtype=self.dtype, name="W_q")
        # Joint KV down-projection: latent + shared rope key.
        self.W_dkv = nn.Dense(dc + dr, use_bias=False, dtype=self.dtype,
                              name="W_dkv")
        # Per-head up-projections, kept as explicit tensors so they can be
        # absorbed into q (W_uk) and out (W_uv) instead of expanding the KV.
        self.W_uk = self.param(
            "W_uk", nn.initializers.lecun_normal(), (h, dn, dc)
        )
        self.W_uv = self.param(
            "W_uv", nn.initializers.lecun_normal(), (h, dc, dv)
        )
        self.out_proj = nn.Dense(self.embed_dim, use_bias=False,
                                 dtype=self.dtype, name="out_proj")
        self.rotary = RotaryEmbedding(dr, base=self.rotary_emb_base)
        # True attention scale: over the CONCEPTUAL per-head qk dim, not the
        # absorbed operand dims (d_rope + d_latent).
        self._scale = (dn + dr) ** -0.5

    def _project(self, x, offsets, rot_len):
        b, s, _ = x.shape
        h = self.num_heads
        dn, dr = self.qk_nope_head_dim, self.qk_rope_head_dim
        dc = self.kv_lora_rank
        q = (self.W_uq(self.W_dq(x)) if self.q_lora_rank else self.W_q(x))
        q = q.reshape(b, s, h, dn + dr)
        q_nope, q_rope = q[..., :dn], q[..., dn:]
        ckv = self.W_dkv(x)
        c, k_rope = ckv[..., :dc], ckv[..., dc:]
        cos, sin = self.rotary.cos_sin(rot_len)
        q_rope = apply_rotary_emb(q_rope, cos, sin, seqlen_offsets=offsets)
        k_rope = apply_rotary_emb(
            k_rope[:, :, None], cos, sin, seqlen_offsets=offsets
        )
        # Absorb W_UK into q: qv[b,s,h,dc] = q_nope . W_uk[h]
        qv = jnp.einsum(
            "bshn,hnc->bshc", q_nope.astype(jnp.float32),
            self.W_uk.astype(jnp.float32),
        ).astype(q_nope.dtype)
        return q_rope, qv, k_rope, c[:, :, None]  # k_rope/c: (b, s, 1, .)

    def __call__(
        self,
        x: jnp.ndarray,  # (b, s, embed_dim)
        inference_params: Optional[InferenceParams] = None,
        *,
        deterministic: bool = True,  # accepted for Block parity (no dropout)
    ):
        del deterministic
        b, s, _ = x.shape
        h, dc, dv = self.num_heads, self.kv_lora_rank, self.v_head_dim

        if inference_params is None:
            offsets = jnp.zeros((b,), jnp.int32)
            q_rope, qv, k_rope, c = self._project(x, offsets, s)
            o_lat = flash_attn_func(
                q_rope, k_rope, c, qv=qv, causal=self.causal,
                softmax_scale=self._scale,
            )  # (b, s, h, dc)
        else:
            layer = self.layer_idx if self.layer_idx is not None else 0
            entry = inference_params.key_value_memory_dict[layer]
            # A bare array marks the fused rope|latent page pool (one
            # gather DMA per page; runtime/kv_cache.py).
            lat_fused = not isinstance(entry, tuple)
            if lat_fused:
                kv_cache, kr_cache, c_cache = entry, None, None
            else:
                kr_cache, c_cache = entry
            offset = inference_params.seqlen_offset
            offsets = (
                jnp.full((b,), offset, jnp.int32)
                if isinstance(offset, int) else jnp.asarray(offset, jnp.int32)
            )
            q_rope, qv, k_rope, c = self._project(
                x, offsets, inference_params.max_seqlen
            )
            # Append to the latent cache: contiguous (b, 1, smax, d) or
            # paged pools (npages, 1, page, d) under a block table — the
            # serving-engine path; small pages route the multipage
            # DMA-pipeline kernel with absorbed qv.
            table = inference_params.block_table
            if table is not None and lat_fused:
                from flash_attn_tpu.runtime.kv_cache import (
                    update_fused_paged_kv_cache,
                )

                kv_cache = update_fused_paged_kv_cache(
                    kv_cache, k_rope, c, offsets, table
                )
                inference_params.key_value_memory_dict[layer] = kv_cache
                o_lat, _ = flash_attention_decode(
                    q_rope, kv_cache, None, offsets + s, qv=qv,
                    block_table=table,
                    fused_kv_dim=k_rope.shape[-1],
                    fused_kv_dim_v=c.shape[-1],
                    softmax_scale=self._scale, causal=True,
                )  # (b, s, h, dc)
            else:
                if table is not None:
                    from flash_attn_tpu.runtime.kv_cache import (
                        update_paged_kv_cache,
                    )

                    kr_cache, c_cache = update_paged_kv_cache(
                        kr_cache, c_cache, k_rope, c, offsets, table
                    )
                else:
                    kr_cache, c_cache = update_kv_cache(
                        kr_cache, c_cache, k_rope, c, offsets
                    )
                inference_params.key_value_memory_dict[layer] = (
                    kr_cache, c_cache
                )
                o_lat, _ = flash_attention_decode(
                    q_rope, kr_cache, c_cache, offsets + s, qv=qv,
                    block_table=table,
                    softmax_scale=self._scale, causal=True,
                )  # (b, s, h, dc)

        # Un-absorb W_UV: out[b,s,h,dv] = o_lat . W_uv[h]
        out = jnp.einsum(
            "bshc,hcv->bshv", o_lat.astype(jnp.float32),
            self.W_uv.astype(jnp.float32),
        ).astype(x.dtype)
        return self.out_proj(out.reshape(b, s, h * dv))

    def allocate_cache(self, batch: int, max_seqlen: int):
        """Per-layer latent cache: (rope, latent), (b, 1, smax, d)."""
        return (
            jnp.zeros((batch, 1, max_seqlen, self.qk_rope_head_dim),
                      self.dtype),
            jnp.zeros((batch, 1, max_seqlen, self.kv_lora_rank), self.dtype),
        )
