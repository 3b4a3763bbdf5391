"""Ops/losses tests (reference: tests/ops/test_dropout_layer_norm.py,
tests/losses/test_cross_entropy.py, tests/layers/test_rotary.py)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attn_tpu.losses.cross_entropy import CrossEntropyLoss, cross_entropy_loss
from flash_attn_tpu.ops.layer_norm import (
    dropout_add_layer_norm,
    dropout_add_layer_norm_parallel_residual,
    dropout_add_rms_norm,
    layer_norm,
    rms_norm,
)
from flash_attn_tpu.ops.rotary import apply_rotary_emb


def test_layer_norm_matches_numpy():
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 32), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (32,))
    b = jax.random.normal(jax.random.PRNGKey(2), (32,))
    y = layer_norm(x, w, b)
    xn = np.asarray(x)
    ref = (xn - xn.mean(-1, keepdims=True)) / np.sqrt(
        xn.var(-1, keepdims=True) + 1e-5
    ) * np.asarray(w) + np.asarray(b)
    assert np.abs(np.asarray(y) - ref).max() < 1e-5


def test_dropout_add_ln_prenorm_residual():
    x0 = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 16), jnp.bfloat16)
    res = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 16), jnp.float32)
    w = jnp.ones((16,))
    y, new_res = dropout_add_layer_norm(
        x0, res, w, None, prenorm=True, residual_in_fp32=True
    )
    assert new_res.dtype == jnp.float32
    assert jnp.allclose(
        new_res, res + x0.astype(jnp.float32), atol=1e-6
    )
    assert jnp.abs(
        y.astype(jnp.float32) - layer_norm(new_res, w).astype(jnp.float32)
    ).max() < 2e-2


def test_dropout_add_rms_norm_dropout_deterministic():
    x0 = jax.random.normal(jax.random.PRNGKey(0), (4, 64), jnp.float32)
    w = jnp.ones((64,))
    k = jax.random.PRNGKey(3)
    a = dropout_add_rms_norm(x0, None, w, dropout_p=0.3, dropout_key=k)
    b = dropout_add_rms_norm(x0, None, w, dropout_p=0.3, dropout_key=k)
    assert jnp.array_equal(a, b)


def test_parallel_residual_dual_norm():
    x0 = jax.random.normal(jax.random.PRNGKey(0), (2, 16), jnp.float32)
    x1 = jax.random.normal(jax.random.PRNGKey(1), (2, 16), jnp.float32)
    w0 = jax.random.normal(jax.random.PRNGKey(2), (16,))
    w1 = jax.random.normal(jax.random.PRNGKey(3), (16,))
    y0, y1, res = dropout_add_layer_norm_parallel_residual(
        x0, x1, None, w0, None, w1, None, prenorm=True
    )
    assert jnp.allclose(res, x0 + x1, atol=1e-6)
    assert jnp.allclose(y0, layer_norm(res, w0), atol=1e-5)
    assert jnp.allclose(y1, layer_norm(res, w1), atol=1e-5)


def test_cross_entropy_matches_manual():
    logits = jax.random.normal(jax.random.PRNGKey(0), (8, 32), jnp.float32)
    labels = jax.random.randint(jax.random.PRNGKey(1), (8,), 0, 32)
    loss = cross_entropy_loss(logits, labels)
    lse = jax.scipy.special.logsumexp(logits, -1)
    manual = (lse - logits[jnp.arange(8), labels]).mean()
    assert abs(float(loss - manual)) < 1e-6


def test_cross_entropy_ignore_and_smoothing_zloss():
    logits = jax.random.normal(jax.random.PRNGKey(0), (6, 16), jnp.float32)
    labels = jnp.array([1, 2, -100, 4, -100, 0])
    loss = cross_entropy_loss(logits, labels, label_smoothing=0.1,
                              lse_square_scale=1e-4)
    valid = labels != -100
    lse = jax.scipy.special.logsumexp(logits, -1)
    ll = logits[jnp.arange(6), jnp.where(valid, labels, 0)]
    manual = lse - 0.9 * ll - 0.1 * logits.mean(-1) + 1e-4 * lse**2
    manual = jnp.where(valid, manual, 0.0).sum() / valid.sum()
    assert abs(float(loss - manual)) < 1e-6
    # class API with z-loss return
    ce = CrossEntropyLoss(label_smoothing=0.1, lse_square_scale=1e-4,
                          return_z_loss=True)
    l2, z = ce(logits, labels)
    assert abs(float(l2 - loss)) < 1e-6
    assert float(z) > 0


def test_fused_linear_cross_entropy_matches_unfused():
    """Value AND grads (hidden + head weight) must match computing the full
    logits then cross_entropy_loss — including a ragged final chunk and
    ignore_index positions."""
    from flash_attn_tpu.losses.cross_entropy import fused_linear_cross_entropy

    b, s, h, v = 2, 13, 16, 37
    hidden = jax.random.normal(jax.random.PRNGKey(0), (b, s, h), jnp.float32)
    weight = jax.random.normal(jax.random.PRNGKey(1), (v, h), jnp.float32)
    labels = jax.random.randint(jax.random.PRNGKey(2), (b, s), 0, v)
    labels = labels.at[0, 3].set(-100).at[1, 10].set(-100)

    def unfused(hd, w):
        return cross_entropy_loss((hd @ w.T).astype(jnp.float32), labels,
                                  label_smoothing=0.1, lse_square_scale=1e-4)

    def fused(hd, w):
        return fused_linear_cross_entropy(
            hd, w, labels, chunk=4, label_smoothing=0.1,
            lse_square_scale=1e-4,
        )

    l0, (gh0, gw0) = jax.value_and_grad(unfused, argnums=(0, 1))(hidden, weight)
    l1, (gh1, gw1) = jax.value_and_grad(fused, argnums=(0, 1))(hidden, weight)
    assert abs(float(l0 - l1)) < 1e-5
    assert float(jnp.abs(gh0 - gh1).max()) < 1e-5
    assert float(jnp.abs(gw0 - gw1).max()) < 1e-5


def test_rotary_norm_preserving_and_inverse():
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 2, 32), jnp.float32)
    inv = 1.0 / (10000 ** (jnp.arange(0, 32, 2) / 32))
    t = jnp.arange(64)[:, None] * inv[None, :]
    cos, sin = jnp.cos(t), jnp.sin(t)
    y = apply_rotary_emb(x, cos, sin)
    #

    # Norm preserved per 2d rotation pair.
    assert jnp.allclose(
        jnp.linalg.norm(y, axis=-1), jnp.linalg.norm(x, axis=-1), atol=1e-4
    )
    # Inverse rotation restores input.
    x_back = apply_rotary_emb(y, cos, -sin)
    assert jnp.abs(x_back - x).max() < 1e-5


def test_rotary_offset_equivalence():
    """Rotating with offset k must equal rotating a shifted sequence —
    the property the decode path depends on."""
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 2, 16), jnp.float32)
    inv = 1.0 / (10000 ** (jnp.arange(0, 16, 2) / 16))
    t = jnp.arange(32)[:, None] * inv[None, :]
    cos, sin = jnp.cos(t), jnp.sin(t)
    full = apply_rotary_emb(
        jnp.concatenate([jnp.zeros_like(x[:, :4]), x], 1), cos, sin
    )[:, 4:]
    shifted = apply_rotary_emb(x, cos, sin, seqlen_offsets=4)
    assert jnp.abs(full - shifted).max() < 1e-5
    # per-batch offsets
    shifted_b = apply_rotary_emb(x, cos, sin,
                                 seqlen_offsets=jnp.array([4], jnp.int32))
    assert jnp.abs(full - shifted_b).max() < 1e-5


def test_rotary_interleaved_partial():
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 2, 32), jnp.float32)
    inv = 1.0 / (10000 ** (jnp.arange(0, 16, 2) / 16))
    t = jnp.arange(8)[:, None] * inv[None, :]
    cos, sin = jnp.cos(t), jnp.sin(t)
    y = apply_rotary_emb(x, cos, sin, interleaved=True)
    # Pass-through of non-rotated tail.
    assert jnp.array_equal(y[..., 16:], x[..., 16:])
    assert not jnp.allclose(y[..., :16], x[..., :16])


def test_rotary_varlen_cu_seqlens():
    """Packed varlen rotary (reference layers/rotary.py:194,267): positions
    reset per sequence; per-sequence offsets supported."""
    import numpy as np

    lens = [7, 19, 3]
    total = sum(lens)
    x = jax.random.normal(jax.random.PRNGKey(1), (total, 2, 32), jnp.float32)
    inv = 1.0 / (10000 ** (jnp.arange(0, 32, 2) / 32))
    t = jnp.arange(64)[:, None] * inv[None, :]
    cos, sin = jnp.cos(t), jnp.sin(t)
    cu = jnp.asarray(np.concatenate([[0], np.cumsum(lens)]), jnp.int32)

    packed = apply_rotary_emb(x, cos, sin, cu_seqlens=cu)
    off = 0
    for ln in lens:
        dense = apply_rotary_emb(x[off:off + ln][None], cos, sin)[0]
        assert jnp.abs(packed[off:off + ln] - dense).max() < 1e-5
        off += ln

    # Per-sequence offsets (chunked-prefill resume positions).
    offs = jnp.asarray([5, 0, 11], jnp.int32)
    packed_o = apply_rotary_emb(x, cos, sin, cu_seqlens=cu,
                                seqlen_offsets=offs)
    off = 0
    for j, ln in enumerate(lens):
        dense = apply_rotary_emb(
            x[off:off + ln][None], cos, sin, seqlen_offsets=offs[j:j + 1]
        )[0]
        assert jnp.abs(packed_o[off:off + ln] - dense).max() < 1e-5
        off += ln

    # Interleaved variant round-trips through the same packed positions.
    y = apply_rotary_emb(x, cos, sin, cu_seqlens=cu, interleaved=True)
    x_back = apply_rotary_emb(y, cos, -sin, cu_seqlens=cu, interleaved=True)
    assert jnp.abs(x_back - x).max() < 1e-5
