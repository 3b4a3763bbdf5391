"""RotaryEmbedding layer (reference: flash_attn/layers/rotary.py:331),
including interleaved (GPT-J) style, xPos scale_base, partial rotary
fraction, and variable base/scaling.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

from flash_attn_tpu.ops.rotary import apply_rotary_emb


class RotaryEmbedding:
    """Stateless (pytree-free) rotary cache; call .cos_sin(max_seqlen) to get
    tables and apply via ops.rotary.apply_rotary_emb. Mirrors the reference's
    lazy cache update (_update_cos_sin_cache, rotary.py:394)."""

    def __init__(
        self,
        dim: int,
        base: float = 10000.0,
        interleaved: bool = False,
        scale_base: Optional[float] = None,
        pos_idx_in_fp32: bool = True,
    ):
        self.dim = dim
        self.base = float(base)
        self.interleaved = interleaved
        self.scale_base = scale_base
        self.pos_idx_in_fp32 = pos_idx_in_fp32
        self._cached: Tuple[int, Optional[jnp.ndarray], Optional[jnp.ndarray]] = (
            0, None, None,
        )

    def cos_sin(self, seqlen: int, dtype=jnp.float32):
        cached_len, cos, sin = self._cached
        if cached_len < seqlen:
            inv_freq = 1.0 / (
                self.base ** (jnp.arange(0, self.dim, 2, dtype=jnp.float32) / self.dim)
            )
            t = jnp.arange(seqlen, dtype=jnp.float32)
            freqs = jnp.outer(t, inv_freq)
            if self.scale_base is not None:
                # xPos scaling (rotary.py:420): power = (pos - s/2) / scale_base
                scale = (
                    (jnp.arange(0, self.dim, 2, dtype=jnp.float32) + 0.4 * self.dim)
                    / (1.4 * self.dim)
                )
                power = (t - seqlen // 2) / self.scale_base
                scale_t = scale[None, :] ** power[:, None]
                cos = jnp.cos(freqs) * scale_t
                sin = jnp.sin(freqs) * scale_t
            else:
                cos = jnp.cos(freqs)
                sin = jnp.sin(freqs)
            self._cached = (seqlen, cos, sin)
        return self._cached[1][:seqlen], self._cached[2][:seqlen]

    def __call__(
        self,
        qkv: jnp.ndarray,  # (b, s, 3, h, d) or q (b, s, h, d) with kv
                           # separate; with cu_seqlens: (total, 3, h, d) /
                           # (total, h, d) packed varlen layouts
        kv: Optional[jnp.ndarray] = None,
        seqlen_offset: Union[int, jnp.ndarray] = 0,
        max_seqlen: Optional[int] = None,
        cu_seqlens: Optional[jnp.ndarray] = None,
    ):
        if max_seqlen is None:
            s = qkv.shape[0] if cu_seqlens is not None else qkv.shape[1]
            max_seqlen = s + (
                int(seqlen_offset) if isinstance(seqlen_offset, int) else 0
            )
        cos, sin = self.cos_sin(max_seqlen)
        rot = dict(
            interleaved=self.interleaved, seqlen_offsets=seqlen_offset,
            cu_seqlens=cu_seqlens,
        )
        packed_dim = 1 if cu_seqlens is not None else 2
        if kv is None and qkv.ndim == (5 if cu_seqlens is None else 4):
            q = apply_rotary_emb(
                jnp.take(qkv, 0, axis=packed_dim), cos, sin, **rot
            )
            k = apply_rotary_emb(
                jnp.take(qkv, 1, axis=packed_dim), cos, sin, **rot
            )
            return jnp.stack(
                [q, k, jnp.take(qkv, 2, axis=packed_dim)], axis=packed_dim
            )
        q = apply_rotary_emb(qkv, cos, sin, **rot)
        if kv is not None:
            k = apply_rotary_emb(
                jnp.take(kv, 0, axis=packed_dim), cos, sin, **rot
            )
            kv = jnp.stack(
                [k, jnp.take(kv, 1, axis=packed_dim)], axis=packed_dim
            )
            return q, kv
        return q
