"""ZeRO-style optimizer/gradient/parameter sharding over the data axis.

The reference ships ZeRO-1 through a DDP strategy wrapper
(training/src/utils/ddp_zero1.py:62 DDPStrategyZero1); the TPU-native form
is a PartitionSpec transform: extend each parameter's tensor-parallel spec
by sharding one eligible dimension over the "data" mesh axis, then pin the
relevant pytrees to those specs inside the jitted train step. GSPMD turns
the pins into exactly the ZeRO collectives:

  stage 1 — optimizer state pinned  -> adam moments live dp-sharded; the
            update math runs sharded and the weight delta is all-gathered.
  stage 2 — gradients also pinned   -> the grad all-reduce becomes
            reduce-scatter (verified in HLO by tests/test_parallel.py).
  stage 3 — parameters also pinned  -> FSDP: weights live dp-sharded and
            are all-gathered per-use at matmul sites.

Parameters with no dimension divisible by the data-axis size stay
replicated (real ZeRO implementations pad these; skipping costs only the
few small norm/bias vectors).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from flash_attn_tpu.parallel.sharding import partition_spec_for


def _axis_size(mesh: Mesh, entry) -> int:
    if entry is None:
        return 1
    if isinstance(entry, str):
        return mesh.shape[entry]
    return math.prod(mesh.shape[a] for a in entry) if entry else 1


def _extend_spec(spec: P, shape, mesh: Mesh, data_axis: str) -> P:
    """Add `data_axis` to the largest dimension whose (already-sharded)
    per-device extent it divides; replicated if none qualifies."""
    dp = mesh.shape[data_axis]
    if dp <= 1 or not shape:
        return spec
    entries = list(spec) + [None] * (len(shape) - len(spec))
    best, best_size = None, 0
    for i, dim in enumerate(shape):
        entry = entries[i]
        if entry is not None and (
            entry == data_axis or (isinstance(entry, tuple) and data_axis in entry)
        ):
            return spec  # already dp-sharded
        local = dim // _axis_size(mesh, entry)
        if local % dp == 0 and local > best_size:
            best, best_size = i, local
    if best is None:
        return spec
    entry = entries[best]
    if entry is None:
        entries[best] = data_axis
    elif isinstance(entry, str):
        entries[best] = (entry, data_axis)
    else:
        entries[best] = tuple(entry) + (data_axis,)
    return P(*entries)


def zero_param_specs(
    params: Any,
    mesh: Mesh,
    *,
    data_axis: str = "data",
    base_spec_fn=partition_spec_for,
) -> Any:
    """PartitionSpec pytree: TP rules extended with data-axis sharding."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)

    def path_str(kp):
        return "/".join(
            getattr(k, "key", getattr(k, "name", str(k))) for k in kp
        )

    specs = [
        _extend_spec(base_spec_fn(path_str(kp)), getattr(leaf, "shape", ()),
                     mesh, data_axis)
        for kp, leaf in flat
    ]
    return jax.tree_util.tree_unflatten(treedef, specs)


def tp_param_specs(params: Any, *, base_spec_fn=partition_spec_for) -> Any:
    """Base tensor-parallel PartitionSpec pytree WITHOUT the ZeRO data-axis
    extension — what parameters are pinned back to after the optimizer
    update at stages 1-2 (stage 3 keeps them dp-sharded)."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)

    def path_str(kp):
        return "/".join(
            getattr(k, "key", getattr(k, "name", str(k))) for k in kp
        )

    specs = [base_spec_fn(path_str(kp)) for kp, _ in flat]
    return jax.tree_util.tree_unflatten(treedef, specs)


def _constrain_tree(tree: Any, specs: Any, mesh: Mesh) -> Any:
    def pin(x, spec):
        if not isinstance(spec, P):
            return x
        if getattr(x, "ndim", 0) == 0:
            return x
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(
        pin, tree, specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def constrain_params(params: Any, specs: Any, mesh: Mesh) -> Any:
    """Pin a parameter pytree to the given PartitionSpec tree (used to
    gather stage-1/2 weights back to base TP layout post-update)."""
    return _constrain_tree(params, specs, mesh)


def zero_constrain_grads(grads: Any, specs: Any, mesh: Mesh) -> Any:
    """ZeRO-2: pin gradients so GSPMD reduce-scatters instead of
    all-reducing (each dp rank keeps only its shard)."""
    return _constrain_tree(grads, specs, mesh)


def zero_constrain_opt_state(opt_state: Any, param_specs: Any, mesh: Mesh) -> Any:
    """ZeRO-1: pin adam moments (any opt-state leaf shaped like a parameter
    pytree) to the dp-extended specs; scalar counts stay replicated."""
    param_leaves = len(jax.tree_util.tree_leaves(
        param_specs, is_leaf=lambda x: isinstance(x, P)))

    def handle(node):
        # optax states are tuples/namedtuples whose array-pytree fields (mu,
        # nu, trace, ...) mirror the params tree.
        try:
            leaves = jax.tree_util.tree_leaves(node)
        except Exception:
            return node
        if len(leaves) == param_leaves:
            try:
                return _constrain_tree(node, param_specs, mesh)
            except ValueError:
                return node  # different structure with same leaf count
        return node

    return _map_state(opt_state, handle)


def _map_state(state, handle):
    out = handle(state)
    if out is not state:
        return out
    if hasattr(state, "_fields"):  # namedtuple (e.g. ScaleByAdamState)
        return type(state)(**{
            f: handle(getattr(state, f)) for f in state._fields
        })
    if isinstance(state, tuple):
        items = [_map_state(s, handle) for s in state]
        return tuple(items) if type(state) is tuple else type(state)(items)
    return state


def apply_zero(
    *,
    stage: int,
    mesh: Optional[Mesh],
    param_specs: Any,
    grads: Any = None,
    opt_state: Any = None,
    params: Any = None,
):
    """Pin the pytrees a given ZeRO stage shards; returns the pinned
    (grads, opt_state, params). Call inside the jitted train step."""
    if mesh is None or stage <= 0:
        return grads, opt_state, params
    if stage >= 2 and grads is not None:
        grads = zero_constrain_grads(grads, param_specs, mesh)
    if stage >= 1 and opt_state is not None:
        opt_state = zero_constrain_opt_state(opt_state, param_specs, mesh)
    if stage >= 3 and params is not None:
        params = _constrain_tree(params, param_specs, mesh)
    return grads, opt_state, params
