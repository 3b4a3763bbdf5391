"""FusedDense / parallel linear layers (reference: flash_attn/ops/
fused_dense.py — FusedDense :139, ColumnParallelLinear :166,
RowParallelLinear :206, FusedMLP :531, ParallelFusedMLP :613, backed by
csrc/fused_dense_lib cuBLASLt epilogues).

On TPU, matmul+bias+activation is one XLA fusion — FusedDense is nn.Dense.
The parallel classes exist for API parity: they are nn.Dense whose kernels
the sharding rules (flash_attn_tpu/parallel/sharding.py) place on the
"model" axis; GSPMD inserts the all-gather/reduce-scatter the reference
issues by hand. `sequence_parallel` semantics (all-gather activations
before column matmuls, reduce-scatter after row matmuls) come from sharding
the activations' sequence axis — see parallel/sharding.py docstring.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from flash_attn_tpu.modules.mlp import ACT2FN


class FusedDense(nn.Dense):
    """Matmul + bias in one fused op (XLA does the fusion)."""


class FusedDenseGeluDense(nn.Module):
    """fc1 -> gelu -> fc2 (the FusedMLP fast path, ops/fused_dense.py:531)."""

    in_features: int
    hidden_features: int
    out_features: Optional[int] = None
    activation: str = "gelu_approx"
    bias1: bool = True
    bias2: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        y = nn.Dense(self.hidden_features, use_bias=self.bias1,
                     dtype=self.dtype, name="fc1")(x)
        y = ACT2FN[self.activation](y)
        return nn.Dense(self.out_features or self.in_features,
                        use_bias=self.bias2, dtype=self.dtype, name="fc2")(y)


FusedMLP = FusedDenseGeluDense


class ColumnParallelLinear(nn.Dense):
    """Output-dim sharded linear. Identical compute to nn.Dense; apply
    flash_attn_tpu.parallel.sharding specs (kernel P(None, "model")) and run
    under a mesh — GSPMD all-gathers sequence-parallel inputs exactly like
    the reference's explicit all_gather_raw (ops/fused_dense.py:27-118)."""


class RowParallelLinear(nn.Dense):
    """Input-dim sharded linear (kernel P("model", None)); GSPMD inserts the
    trailing reduce-scatter/all-reduce."""
