"""Fused dropout + residual-add + LayerNorm/RMSNorm (reference:
csrc/layer_norm/ln_api.cpp:105 `dropout_add_ln_fwd`,
flash_attn/ops/layer_norm.py, flash_attn/ops/rms_norm.py:14-136,
flash_attn/ops/triton/layer_norm.py:174-1229).

The reference compiles one CUDA kernel per hidden size (15 fwd + 15 bwd .cu
files) because torch eager can't fuse. On TPU the whole chain —
dropout -> rowscale/colscale -> residual add -> normalize — is a single XLA
fusion; these are pure-jnp functions with the reference's exact semantics
(incl. prenorm residual output, residual_in_fp32, rowscale/colscale,
parallel dual-norm) and native autodiff.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _maybe_dropout(x, p, key, rowscale=None, colscale=None):
    if colscale is not None:
        x = x * colscale
    if rowscale is not None:
        x = x * rowscale[..., None]
    if p > 0.0:
        assert key is not None, "dropout_p > 0 requires a PRNG key"
        keep = jax.random.bernoulli(key, 1.0 - p, x.shape)
        x = jnp.where(keep, x / (1.0 - p), 0.0)
    return x


def layer_norm(x, weight, bias=None, epsilon: float = 1e-5):
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), -1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + epsilon)
    y = y * weight.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def rms_norm(x, weight, epsilon: float = 1e-5):
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), -1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + epsilon)
    y = y * weight.astype(jnp.float32)
    return y.astype(x.dtype)


def dropout_add_layer_norm(
    x0: jnp.ndarray,
    residual: Optional[jnp.ndarray],
    weight: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    dropout_p: float = 0.0,
    epsilon: float = 1e-5,
    *,
    rowscale: Optional[jnp.ndarray] = None,
    layerscale: Optional[jnp.ndarray] = None,
    prenorm: bool = False,
    residual_in_fp32: bool = False,
    is_rms_norm: bool = False,
    dropout_key: Optional[jax.Array] = None,
):
    """y = Norm(dropout(x0 * rowscale * layerscale) + residual).

    prenorm=True also returns the pre-norm sum (the residual stream),
    matching ln_api.cpp's (z, x) dual output. residual_in_fp32 keeps the
    stream in fp32 (models/gpt.py residual_in_fp32 flag).
    """
    dtype = x0.dtype
    x = _maybe_dropout(x0, dropout_p, dropout_key, rowscale, layerscale)
    acc_dtype = jnp.float32 if residual_in_fp32 else dtype
    total = x.astype(acc_dtype)
    if residual is not None:
        total = total + residual.astype(acc_dtype)
    norm_fn = rms_norm if is_rms_norm else layer_norm
    if is_rms_norm:
        y = norm_fn(total, weight, epsilon=epsilon)
    else:
        y = norm_fn(total, weight, bias, epsilon=epsilon)
    y = y.astype(dtype)
    return (y, total) if prenorm else y


def dropout_add_rms_norm(
    x0, residual, weight, bias=None, dropout_p=0.0, epsilon=1e-5, **kw
):
    """RMSNorm flavor (flash_attn/ops/rms_norm.py:124)."""
    return dropout_add_layer_norm(
        x0, residual, weight, bias, dropout_p, epsilon, is_rms_norm=True, **kw
    )


def dropout_add_layer_norm_parallel_residual(
    x0: jnp.ndarray,
    x1: Optional[jnp.ndarray],
    residual: Optional[jnp.ndarray],
    weight0: jnp.ndarray,
    bias0: Optional[jnp.ndarray],
    weight1: Optional[jnp.ndarray],
    bias1: Optional[jnp.ndarray],
    dropout_p: float = 0.0,
    epsilon: float = 1e-5,
    *,
    prenorm: bool = False,
    residual_in_fp32: bool = False,
    is_rms_norm: bool = False,
    dropout_key: Optional[jax.Array] = None,
):
    """Parallel-residual (GPT-J/NeoX style) dual norm
    (csrc/layer_norm/ln_api.cpp:482 dropout_add_ln_parallel_residual_fwd):
    one residual stream, two normalized outputs with separate weights."""
    dtype = x0.dtype
    k0 = k1 = None
    if dropout_key is not None:
        k0, k1 = jax.random.split(dropout_key)
    acc = jnp.float32 if residual_in_fp32 else dtype
    total = _maybe_dropout(x0, dropout_p, k0).astype(acc)
    if x1 is not None:
        total = total + _maybe_dropout(x1, dropout_p, k1).astype(acc)
    if residual is not None:
        total = total + residual.astype(acc)
    norm = rms_norm if is_rms_norm else layer_norm
    if is_rms_norm:
        y0 = norm(total, weight0, epsilon=epsilon).astype(dtype)
        y1 = (
            norm(total, weight1, epsilon=epsilon).astype(dtype)
            if weight1 is not None else None
        )
    else:
        y0 = norm(total, weight0, bias0, epsilon=epsilon).astype(dtype)
        y1 = (
            norm(total, weight1, bias1, epsilon=epsilon).astype(dtype)
            if weight1 is not None else None
        )
    return (y0, y1, total) if prenorm else (y0, y1)
