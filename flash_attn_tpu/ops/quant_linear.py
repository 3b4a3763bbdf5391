"""Quantized linear / fused MLP (reference: flash_attn/ops/triton/linear.py
`triton_linear_act` fused matmul+activation, flash_attn/ops/triton/mlp.py:13
`FusedDenseSqreluDenseFunc` / :116 `FusedDenseSqreluDense`).

TPU-native design: the reference fuses activation epilogues into a Triton
GEMM and (in the fp8 branch of its kernels) runs reduced-precision matmuls.
On TPU:
  * activation fusion is free — XLA fuses the epilogue into the MXU matmul,
    so the fp32/bf16 path is just dot+act;
  * the quantized path uses the MXU's native int8 x int8 -> int32 product
    (v5e) or fp8-e4m3 (v6+; XLA upconverts transparently where hardware
    lacks it), with per-output-channel weight scales and dynamic per-row
    activation scales folded in AFTER the matmul — one rescale multiply,
    same structure the attention kernels use for QKV descale.

Weights are quantized once (`quantize_weight`); activations per call.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

_QMAX = {jnp.int8: 127.0, jnp.float8_e4m3fn: 448.0}


def _qmax(dtype) -> float:
    for k, v in _QMAX.items():
        if dtype == k:
            return v
    raise ValueError(f"unsupported quant dtype {dtype}")


def quantize_weight(w: jnp.ndarray, dtype=jnp.int8):
    """Per-output-channel absmax quantization. w: (in, out) as stored by
    nn.Dense. Returns (w_q (in, out) dtype, scale (out,) f32)."""
    qmax = _qmax(dtype)
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0)
    scale = jnp.maximum(amax / qmax, 1e-8)
    wq = w.astype(jnp.float32) / scale[None, :]
    if dtype == jnp.int8:
        wq = jnp.clip(jnp.round(wq), -127, 127)
    return wq.astype(dtype), scale


def quantize_activation(x: jnp.ndarray, dtype=jnp.int8):
    """Dynamic per-row (last-axis-reduced) absmax quantization."""
    qmax = _qmax(dtype)
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(amax / qmax, 1e-8)
    xq = x.astype(jnp.float32) / scale
    if dtype == jnp.int8:
        xq = jnp.clip(jnp.round(xq), -127, 127)
    return xq.astype(dtype), scale[..., 0]


def _sqrelu(x):
    return jnp.square(jax.nn.relu(x))


_ACTS = {
    "id": lambda x: x,
    "gelu": jax.nn.gelu,
    "gelu_approx": lambda x: jax.nn.gelu(x, approximate=True),
    "squared_relu": _sqrelu,
    "relu": jax.nn.relu,
}


def quant_linear_act(
    x: jnp.ndarray,            # (..., in) bf16/f32
    w_q: jnp.ndarray,          # (in, out) int8 / fp8-e4m3
    w_scale: jnp.ndarray,      # (out,) f32
    bias: Optional[jnp.ndarray] = None,
    activation: str = "id",
    out_dtype=None,
):
    """activation(dequant(x_q @ w_q) + bias) — the TPU analog of
    `triton_linear_act` (ops/triton/linear.py:258) with a W8A8 matmul.
    int8 accumulates in int32 on the MXU; fp8 accumulates in f32."""
    assert activation in _ACTS, activation
    out_dtype = out_dtype or x.dtype
    x_q, x_scale = quantize_activation(x, w_q.dtype)
    if w_q.dtype == jnp.int8:
        acc = jax.lax.dot_general(
            x_q, w_q, (((x_q.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
    else:
        acc = jax.lax.dot_general(
            x_q, w_q, (((x_q.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    y = acc * x_scale[..., None] * w_scale
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return _ACTS[activation](y).astype(out_dtype)


class QuantDense(nn.Module):
    """Linear layer storing bf16 master weights, running W8A8 (int8) or
    W8A8-fp8 matmuls at call time. For inference, pre-quantize with
    `quantize_weight` and call `quant_linear_act` directly to skip the
    per-step weight quantization."""

    features: int
    use_bias: bool = True
    quant_dtype: Any = jnp.int8
    activation: str = "id"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (x.shape[-1], self.features),
        )
        b = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias else None
        )
        w_q, w_s = quantize_weight(w, self.quant_dtype)
        return quant_linear_act(
            x, w_q, w_s, b, activation=self.activation, out_dtype=self.dtype
        )


class FusedDenseSqreluDense(nn.Module):
    """fc1 -> squared-relu -> fc2 (reference ops/triton/mlp.py:116
    FusedDenseSqreluDense). checkpoint_lvl semantics are owned by
    jax.checkpoint at the block level on TPU."""

    in_features: int
    hidden_features: Optional[int] = None
    out_features: Optional[int] = None
    bias1: bool = True
    bias2: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        hidden = self.hidden_features or 4 * self.in_features
        y = nn.Dense(hidden, use_bias=self.bias1, dtype=self.dtype,
                     name="fc1")(x)
        y = _sqrelu(y)
        return nn.Dense(self.out_features or self.in_features,
                        use_bias=self.bias2, dtype=self.dtype, name="fc2")(y)
