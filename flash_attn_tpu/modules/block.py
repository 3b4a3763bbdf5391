"""Transformer block (reference: flash_attn/modules/block.py:21 Block,
:259 ParallelBlock).

Pre/post-norm, fused dropout-add-norm semantics, fp32 residual stream, and
the GPT-J/NeoX "parallel block" (attention and MLP on the same normalized
input, single residual add). TP needs no separate class — sharding comes
from parameter PartitionSpecs.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from flash_attn_tpu.modules.mha import MHA, InferenceParams
from flash_attn_tpu.modules.mlp import Mlp


class Block(nn.Module):
    """Pre-norm (default) or post-norm block:
      prenorm:  x' = x + drop(mixer(norm1(x))); x'' = x' + drop(mlp(norm2(x')))
    with the residual stream optionally in fp32 (block.py:108 fused path).
    """

    dim: int
    mixer: Callable[..., nn.Module]  # factory -> MHA-like module
    mlp: Callable[..., nn.Module]    # factory -> Mlp-like module
    norm_eps: float = 1e-5
    prenorm: bool = True
    resid_dropout1: float = 0.0
    resid_dropout2: float = 0.0
    # Stochastic depth (reference block.py drop_path1/2, torchvision
    # StochasticDepth "row" mode): drops the whole residual branch per
    # SAMPLE, scaled by 1/(1-p) — a per-batch-row dropout.
    drop_path1: float = 0.0
    drop_path2: float = 0.0
    residual_in_fp32: bool = True
    rms_norm: bool = False
    parallel_block: bool = False
    parallel_block_tied_norm: bool = False
    dtype: Any = jnp.bfloat16

    def setup(self):
        self.mixer_mod = self.mixer(name="mixer")
        self.mlp_mod = self.mlp(name="mlp")
        norm_cls = nn.RMSNorm if self.rms_norm else nn.LayerNorm
        self.norm1 = norm_cls(epsilon=self.norm_eps, dtype=jnp.float32, name="norm1")
        if not (self.parallel_block and self.parallel_block_tied_norm):
            self.norm2 = norm_cls(epsilon=self.norm_eps, dtype=jnp.float32, name="norm2")
        self.drop1 = nn.Dropout(self.resid_dropout1)
        self.drop2 = nn.Dropout(self.resid_dropout2)
        # broadcast over (seq, feature) -> one keep/drop decision per sample
        self.droppath1 = nn.Dropout(self.drop_path1, broadcast_dims=(1, 2))
        self.droppath2 = nn.Dropout(self.drop_path2, broadcast_dims=(1, 2))

    def __call__(
        self,
        hidden_states: jnp.ndarray,
        residual: Optional[jnp.ndarray] = None,
        inference_params: Optional[InferenceParams] = None,
        *,
        deterministic: bool = True,
        mixer_kwargs: Optional[dict] = None,
        mixer_subset: Optional[slice] = None,
    ):
        """prenorm: takes/returns (hidden_states, residual) with residual the
        fp32 stream; postnorm: plain (hidden_states,). Mirrors block.py:108.

        mixer_subset (reference block.py mixer_subset, ViT/BERT last-layer
        cls-token optimization): the mixer attends only the given query
        slice over the full key/value sequence; the residual stream narrows
        to that slice.
        """
        if self.prenorm:
            acc = jnp.float32 if self.residual_in_fp32 else hidden_states.dtype
            hidden_states = self.droppath1(
                self.drop1(hidden_states, deterministic=deterministic),
                deterministic=deterministic,
            )
            res = hidden_states.astype(acc) if residual is None else (
                residual + hidden_states.astype(acc)
            )
            normed1 = self.norm1(res).astype(self.dtype)
            if self.parallel_block:
                normed2 = (
                    normed1
                    if self.parallel_block_tied_norm
                    else self.norm2(res).astype(self.dtype)
                )
                attn_out = self.mixer_mod(
                    normed1, inference_params=inference_params,
                    deterministic=deterministic, **(mixer_kwargs or {}),
                )
                mlp_out = self.mlp_mod(normed2)
                return attn_out + mlp_out, res
            if mixer_subset is not None:
                attn_out = self.mixer_mod(
                    normed1[:, mixer_subset], normed1,
                    inference_params=inference_params,
                    deterministic=deterministic, **(mixer_kwargs or {}),
                )
                res = res[:, mixer_subset]
            else:
                attn_out = self.mixer_mod(
                    normed1, inference_params=inference_params,
                    deterministic=deterministic, **(mixer_kwargs or {}),
                )
            attn_out = self.droppath2(
                self.drop2(attn_out, deterministic=deterministic),
                deterministic=deterministic,
            )
            res = res + attn_out.astype(acc)
            normed2 = self.norm2(res).astype(self.dtype)
            mlp_out = self.mlp_mod(normed2)
            return mlp_out, res
        else:
            attn_out = self.mixer_mod(
                hidden_states, inference_params=inference_params,
                deterministic=deterministic, **(mixer_kwargs or {}),
            )
            x = self.norm1(hidden_states + attn_out).astype(self.dtype)
            mlp_out = self.mlp_mod(x)
            return self.norm2(x + mlp_out).astype(self.dtype)
