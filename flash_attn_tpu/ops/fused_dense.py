"""FusedDense / parallel linear layers (reference: flash_attn/ops/
fused_dense.py — FusedDense :139, ColumnParallelLinear :166,
RowParallelLinear :206, FusedMLP :531, ParallelFusedMLP :613, backed by
csrc/fused_dense_lib cuBLASLt epilogues).

On TPU, matmul+bias+activation is one XLA fusion — FusedDense is nn.Dense.
The parallel classes are REAL sharded layers (not pass-through veneers):
each applies a Megatron PartitionSpec to its kernel/bias via
`with_sharding_constraint` against the active mesh, so GSPMD inserts the
all-gather/reduce-scatter the reference issues by hand
(ops/fused_dense.py:27-118). Constructing one without a mesh in scope (and
without `mesh=`/`strict=False`) raises at call time instead of silently
computing an unsharded Dense. `sequence_parallel` activations come from
parallel/sharding.py's sequence_parallel_constraint.
"""

from __future__ import annotations

import warnings
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

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


def _active_mesh(explicit: Optional[Mesh]) -> Optional[Mesh]:
    """The mesh governing sharding constraints: explicit arg, then the
    jax.sharding.set_mesh/use_mesh abstract mesh, then a `with mesh:`
    context."""
    if explicit is not None:
        return explicit
    am = jax.sharding.get_abstract_mesh()
    if am is not None and not am.empty:
        return am
    try:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", DeprecationWarning)
            from jax.interpreters import pxla

            pm = pxla.thread_resources.env.physical_mesh
        if pm is not None and not pm.empty:
            return pm
    except Exception:
        pass
    return None


def _constrain(x, mesh, spec: P):
    if isinstance(mesh, Mesh):
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))
    return jax.lax.with_sharding_constraint(x, spec)


class _ParallelLinearBase(nn.Dense):
    """nn.Dense whose kernel/bias carry a Megatron TP PartitionSpec.

    tp_axis:  mesh axis name holding the shard (default "model").
    mesh:     explicit mesh; otherwise the ambient mesh context is used.
    strict:   when True (default), calling without any mesh raises — a
              ColumnParallelLinear can never silently be a plain Dense.
    """

    tp_axis: str = "model"
    mesh: Optional[Mesh] = None
    strict: bool = True

    def _kernel_spec(self) -> P:
        raise NotImplementedError

    def _bias_spec(self) -> P:
        raise NotImplementedError

    @nn.compact
    def __call__(self, inputs):
        kernel = self.param(
            "kernel", self.kernel_init,
            (jnp.shape(inputs)[-1], self.features), self.param_dtype,
        )
        bias = (
            self.param("bias", self.bias_init, (self.features,),
                       self.param_dtype)
            if self.use_bias else None
        )
        mesh = _active_mesh(self.mesh)
        if mesh is None:
            if self.strict:
                raise ValueError(
                    f"{type(self).__name__} requires a mesh: pass mesh=, "
                    "enter `with mesh:` / jax.sharding.set_mesh, or set "
                    "strict=False to run unsharded (reference "
                    "ColumnParallelLinear/RowParallelLinear always shard — "
                    "flash_attn/ops/fused_dense.py:166,206)."
                )
        else:
            if self.tp_axis not in mesh.axis_names:
                raise ValueError(
                    f"{type(self).__name__}: mesh {mesh.axis_names} has no "
                    f"axis {self.tp_axis!r}"
                )
            kernel = _constrain(kernel, mesh, self._kernel_spec())
            if bias is not None:
                bias = _constrain(bias, mesh, self._bias_spec())
        if bias is not None:
            inputs, kernel, bias = nn.dtypes.promote_dtype(
                inputs, kernel, bias, dtype=self.dtype
            )
        else:
            inputs, kernel = nn.dtypes.promote_dtype(
                inputs, kernel, dtype=self.dtype
            )
        y = jax.lax.dot_general(
            inputs, kernel,
            (((inputs.ndim - 1,), (0,)), ((), ())),
            precision=self.precision,
        )
        if bias is not None:
            y = y + jnp.reshape(bias, (1,) * (y.ndim - 1) + (-1,))
        return y


class ColumnParallelLinear(_ParallelLinearBase):
    """Output-dim sharded linear: kernel P(None, tp_axis), bias P(tp_axis).
    GSPMD all-gathers sequence-parallel inputs exactly like the reference's
    explicit all_gather_raw (ops/fused_dense.py:27-118)."""

    def _kernel_spec(self) -> P:
        return P(None, self.tp_axis)

    def _bias_spec(self) -> P:
        return P(self.tp_axis)


class RowParallelLinear(_ParallelLinearBase):
    """Input-dim sharded linear: kernel P(tp_axis, None), bias replicated;
    GSPMD inserts the trailing reduce-scatter/all-reduce."""

    def _kernel_spec(self) -> P:
        return P(self.tp_axis, None)

    def _bias_spec(self) -> P:
        return P()
