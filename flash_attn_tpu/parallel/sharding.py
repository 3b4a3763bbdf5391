"""Megatron-style tensor-parallel sharding rules for the model family.

Replaces the reference's explicit parallel layers
(ColumnParallelLinear/RowParallelLinear, flash_attn/ops/fused_dense.py:166,206;
ParallelMHA head slicing, modules/mha.py:754-760; VocabParallelEmbedding,
modules/embedding.py:114; shard_state_dict_tp, models/gpt.py:698) with
PartitionSpec rules applied to the parameter pytree: under jit + mesh, XLA
GSPMD inserts exactly the collectives those classes issue by hand (all-gather
of sequence-parallel inputs before column matmuls, reduce-scatter/all-reduce
after row matmuls).

Rules (kernel shapes are (in, out) in flax):
  Wq/Wk/Wv      column-parallel: out-dim (heads) on "model"
  out_proj      row-parallel:    in-dim on "model"
  fc1*/fc1_gate/fc1_up  column-parallel
  fc2           row-parallel
  word_embeddings      vocab-parallel: vocab dim on "model"
  lm_head       column-parallel (vocab out on "model")
  norms/biases of row-parallel layers: replicated
"""

from __future__ import annotations

import re
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_RULES = [
    (r"\bWq\b.*kernel$", P(None, "model")),
    (r"\bWk\b.*kernel$", P(None, "model")),
    (r"\bWv\b.*kernel$", P(None, "model")),
    (r"\bWq\b.*bias$", P("model")),
    (r"\bWk\b.*bias$", P("model")),
    (r"\bWv\b.*bias$", P("model")),
    (r"out_proj.*kernel$", P("model", None)),
    (r"out_proj.*bias$", P()),
    (r"fc1(_gate|_up)?.*kernel$", P(None, "model")),
    (r"fc1(_gate|_up)?.*bias$", P("model")),
    (r"fc2.*kernel$", P("model", None)),
    (r"fc2.*bias$", P()),
    (r"word_embeddings.*embedding$", P("model", None)),
    (r"position_embeddings.*embedding$", P()),
    (r"lm_head.*kernel$", P(None, "model")),
    # MLA (modules/mla.py): q up-projections are head-column-parallel; the
    # per-head absorbed tensors shard on their head axis; the latent
    # down-projection W_dkv produces the SHARED single-kv-head latent and
    # stays replicated (every rank attends the full latent cache).
    (r"W_q/kernel$", P(None, "model")),
    (r"W_uq/kernel$", P(None, "model")),
    (r"W_dq/kernel$", P()),
    (r"W_dkv/kernel$", P()),
    (r"W_uk$", P("model", None, None)),
    (r"W_uv$", P("model", None, None)),
]


def partition_spec_for(path: str) -> P:
    for pattern, spec in _RULES:
        if re.search(pattern, path):
            return spec
    return P()


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Return `params` device_put with TP PartitionSpecs by parameter path.

    The functional analog of shard_state_dict_tp (models/gpt.py:698) — but
    no resharding utilities are needed: the same full checkpoint maps onto
    any mesh by re-running this function.
    """
    flat = jax.tree_util.tree_flatten_with_path(params)
    leaves, treedef = flat

    def path_str(kp):
        return "/".join(
            getattr(k, "key", getattr(k, "name", str(k))) for k in kp
        )

    out = [
        jax.device_put(leaf, NamedSharding(mesh, partition_spec_for(path_str(kp))))
        for kp, leaf in leaves
    ]
    return jax.tree_util.tree_unflatten(treedef, out)


def param_shardings(params: Any, mesh: Mesh) -> Any:
    """Sharding pytree (for jit in_shardings/out_shardings) without moving
    data."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)

    def path_str(kp):
        return "/".join(
            getattr(k, "key", getattr(k, "name", str(k))) for k in kp
        )

    return jax.tree_util.tree_unflatten(
        treedef,
        [
            NamedSharding(mesh, partition_spec_for(path_str(kp)))
            for kp, _ in flat
        ],
    )


def sequence_parallel_constraint(x, mesh: Mesh, axis: str = "model",
                                 seq_dim: int = 1):
    """Megatron-style sequence parallelism: pin an activation's sequence axis
    to the TP axis between blocks (reference sequence_parallel=True,
    ops/fused_dense.py:27-118 — there the all-gather before column matmuls
    and reduce-scatter after row matmuls are manual; here the constraint
    makes GSPMD place exactly those collectives)."""
    spec = [None] * x.ndim
    spec[seq_dim] = axis
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(*spec))
    )
