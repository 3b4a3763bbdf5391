"""Rotary position embeddings (reference: flash_attn/layers/rotary.py,
flash_attn/ops/triton/rotary.py:13-102 `apply_rotary`).

On TPU these are pure-XLA elementwise ops: XLA fuses the rotation into the
surrounding matmuls, so no Pallas kernel is needed (the reference needs a
Triton kernel only because torch eager would materialize intermediates).
"""

from __future__ import annotations

from typing import Union

import jax
import jax.numpy as jnp


def apply_rotary_emb(
    x: jnp.ndarray,  # (b, s, h, d), or (total, h, d) with cu_seqlens
    cos: jnp.ndarray,  # (smax, rot_dim/2)
    sin: jnp.ndarray,
    *,
    interleaved: bool = False,
    seqlen_offsets: Union[int, jnp.ndarray] = 0,
    cu_seqlens: jnp.ndarray = None,  # (nseq+1,) packed varlen boundaries
    max_seqlen: int = None,  # accepted for reference parity (unused)
) -> jnp.ndarray:
    """Rotate the first rot_dim features of x; the rest pass through.

    seqlen_offsets: scalar or (b,) per-sequence position offset (the decode
    path passes cache_seqlens, matching the reference's in-kernel rotary at
    csrc/flash_attn/src/rotary.h).

    cu_seqlens: packed varlen layout (reference layers/rotary.py:194,267 —
    apply_rotary_emb over (total, h, d) with per-sequence position reset).
    With cu_seqlens, x is (total, h, d) and seqlen_offsets is a scalar or
    (nseq,) per-sequence offset.
    """
    del max_seqlen
    if cu_seqlens is not None:
        total, h, d = x.shape
        half = cos.shape[-1]
        rot = 2 * half
        assert rot <= d
        cu = jnp.asarray(cu_seqlens, jnp.int32)
        idx = jnp.arange(total, dtype=jnp.int32)
        seg = jnp.clip(
            jnp.searchsorted(cu, idx, side="right").astype(jnp.int32) - 1,
            0, cu.shape[0] - 2,
        )
        pos = idx - cu[seg]
        if isinstance(seqlen_offsets, int):
            pos = pos + seqlen_offsets
        else:
            pos = pos + jnp.asarray(seqlen_offsets, jnp.int32)[seg]
        cos_s = cos[pos][:, None, :].astype(jnp.float32)  # (total, 1, half)
        sin_s = sin[pos][:, None, :].astype(jnp.float32)
    else:
        b, s, h, d = x.shape
        half = cos.shape[-1]
        rot = 2 * half
        assert rot <= d

        if isinstance(seqlen_offsets, int):
            pos = seqlen_offsets + jnp.arange(s)  # (s,)
            cos_s = cos[pos][None]  # (1, s, half)
            sin_s = sin[pos][None]
        else:
            pos = seqlen_offsets[:, None] + jnp.arange(s)[None, :]  # (b, s)
            cos_s = cos[pos]  # (b, s, half)
            sin_s = sin[pos]

        cos_s = cos_s[:, :, None, :].astype(jnp.float32)  # (b|1, s, 1, half)
        sin_s = sin_s[:, :, None, :].astype(jnp.float32)

    xf = x.astype(jnp.float32)
    if not interleaved:
        x1 = xf[..., :half]
        x2 = xf[..., half:rot]
        o1 = x1 * cos_s - x2 * sin_s
        o2 = x2 * cos_s + x1 * sin_s
        rotated = jnp.concatenate([o1, o2], axis=-1)
    else:
        x1 = xf[..., 0:rot:2]
        x2 = xf[..., 1:rot:2]
        o1 = x1 * cos_s - x2 * sin_s
        o2 = x2 * cos_s + x1 * sin_s
        rotated = jnp.stack([o1, o2], axis=-1).reshape(*x.shape[:-1], rot)
    if rot < d:
        rotated = jnp.concatenate([rotated, xf[..., rot:]], axis=-1)
    return rotated.astype(x.dtype)
