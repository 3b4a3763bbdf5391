"""MLP modules (reference: flash_attn/modules/mlp.py:25-139 Mlp/GatedMlp/
ParallelMLP, flash_attn/ops/fused_dense.py:531 FusedMLP).

On TPU the reference's fused_dense_lib (cuBLASLt epilogues,
csrc/fused_dense_lib/fused_dense.cpp:40-155) is unnecessary: XLA fuses
bias+activation into the matmul. Tensor parallelism comes from parameter
PartitionSpecs (fc1 column-sharded, fc2 row-sharded) via
flash_attn_tpu.parallel.sharding — the same module serves Mlp, FusedMLP and
ParallelMLP roles.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


ACT2FN = {
    "gelu": jax.nn.gelu,
    "gelu_new": lambda x: jax.nn.gelu(x, approximate=True),
    "gelu_approx": lambda x: jax.nn.gelu(x, approximate=True),
    "gelu_pytorch_tanh": lambda x: jax.nn.gelu(x, approximate=True),
    "relu": jax.nn.relu,
    "sqrelu": lambda x: jnp.square(jax.nn.relu(x)),
    "silu": jax.nn.silu,
    "swiglu": jax.nn.silu,  # gate activation for GatedMlp
    "swiglu_gelu": lambda x: jax.nn.gelu(x, approximate=True),  # Gemma gate
    "glu": jax.nn.sigmoid,
}


class Mlp(nn.Module):
    """fc1 -> activation -> fc2 (modules/mlp.py:25)."""

    in_features: int
    hidden_features: Optional[int] = None
    out_features: Optional[int] = None
    activation: str = "gelu_approx"
    bias1: bool = True
    bias2: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        hidden = self.hidden_features or 4 * self.in_features
        out = self.out_features or self.in_features
        y = nn.Dense(hidden, use_bias=self.bias1, dtype=self.dtype, name="fc1")(x)
        y = ACT2FN[self.activation](y)
        return nn.Dense(out, use_bias=self.bias2, dtype=self.dtype, name="fc2")(y)


class GatedMlp(nn.Module):
    """SwiGLU-style gated MLP (modules/mlp.py:96 GatedMlp): fc1 produces
    2*hidden (gate ++ up); out = fc2(act(gate) * up)."""

    in_features: int
    hidden_features: Optional[int] = None
    out_features: Optional[int] = None
    activation: str = "silu"
    bias1: bool = False
    bias2: bool = False
    multiple_of: int = 128
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        out = self.out_features or self.in_features
        if self.hidden_features is not None:
            hidden = self.hidden_features
        else:
            hidden = int(8 * self.in_features / 3)
            hidden = (
                (hidden + self.multiple_of - 1)
                // self.multiple_of * self.multiple_of
            )
        # Separate gate/up projections (the reference fuses them into fc1,
        # mlp.py:96) so the hidden axis shards cleanly under tensor
        # parallelism; checkpoint adapters split fused fc1 weights on load.
        gate = nn.Dense(
            hidden, use_bias=self.bias1, dtype=self.dtype, name="fc1_gate"
        )(x)
        up = nn.Dense(
            hidden, use_bias=self.bias1, dtype=self.dtype, name="fc1_up"
        )(x)
        y = ACT2FN[self.activation](gate) * up
        return nn.Dense(out, use_bias=self.bias2, dtype=self.dtype, name="fc2")(y)
