"""Context parallelism: ring attention over the mesh "context" axis.

The reference's CP is kernel-level, fwd-only: KV is round-robin sharded
across ranks, the FA3 kernel masks with the absolute key index
(hopper/mask.h:103-105 `abs_k_idx = local_k_idx * cp_world_size + cp_rank`),
and the *caller* merges per-rank partial O/LSE with the combine math
(hopper/flash_fwd_combine_kernel.h:26). On TPU we go one step further
(SURVEY.md §5 long-context plan): KV shards rotate around the ICI ring with
`ppermute` while each chip computes flash attention on its resident shard,
and partials merge online with the LSE-combine — ring attention, which
subsumes the reference's one-shot CP merge.

Sharding layout: Q, K, V are sharded contiguously on the sequence axis
(shard i owns rows [i*s_local, (i+1)*s_local)). Causal visibility between
shard i (queries) and shard j (keys) is then block-triangular:
    j <  i : fully visible     (unmasked kernel call)
    j == i : diagonal          (causal kernel call)
    j >  i : fully masked      (contribution dropped via lse = -inf)
so each ring step needs only a static mask pattern; the per-step visibility
select is data-dependent on axis_index but shape-static, which keeps XLA
happy. The j > i steps waste compute (the classic ring-attention imbalance);
a zig-zag layout is a planned optimization.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from flash_attn_tpu.kernels.flash_decode import combine_partials
from flash_attn_tpu.kernels.flash_fwd import flash_attention_fwd


def _ring_attention_local(
    q, k, v,  # local shards (b, h, s_local, d) — kernel-native layout
    *,
    axis_name: str,
    causal: bool,
    softmax_scale: Optional[float],
    interpret: Optional[bool],
):
    axis_size = jax.lax.psum(1, axis_name)
    my = jax.lax.axis_index(axis_name)
    perm = [(i, (i + 1) % axis_size) for i in range(axis_size)]

    def step_fn(carry, step):
        o_acc, lse_acc, k_cur, v_cur = carry
        src = (my - step) % axis_size  # origin shard of k_cur/v_cur

        if causal:
            o_diag, lse_diag = flash_attention_fwd(
                q, k_cur, v_cur, softmax_scale=softmax_scale, causal=True,
                interpret=interpret,
            )
            o_full, lse_full = flash_attention_fwd(
                q, k_cur, v_cur, softmax_scale=softmax_scale, causal=False,
                interpret=interpret,
            )
            is_diag = src == my
            visible = src < my
            o_part = jnp.where(is_diag, o_diag, o_full)
            lse_part = jnp.where(
                is_diag, lse_diag, jnp.where(visible, lse_full, -jnp.inf)
            )
        else:
            o_part, lse_part = flash_attention_fwd(
                q, k_cur, v_cur, softmax_scale=softmax_scale, causal=False,
                interpret=interpret,
            )

        o_new, lse_new = combine_partials(
            jnp.stack([o_acc, o_part.astype(jnp.float32)]),
            jnp.stack([lse_acc, lse_part]),
        )
        # Rotate KV shards around the ring (overlappable with the next
        # step's compute by XLA's latency-hiding scheduler).
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        return (o_new, lse_new, k_nxt, v_nxt), None

    o0 = jnp.zeros(q.shape, jnp.float32)
    lse0 = jnp.full(q.shape[:3], -jnp.inf, jnp.float32)
    (o, lse, _, _), _ = jax.lax.scan(
        step_fn, (o0, lse0, k, v), jnp.arange(axis_size)
    )
    return o.astype(q.dtype), lse


def ring_flash_attention(
    q: jnp.ndarray,  # (b, h, s, d) global, seq sharded on `axis_name`
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    *,
    axis_name: str = "context",
    causal: bool = False,
    softmax_scale: Optional[float] = None,
    interpret: Optional[bool] = None,
):
    """Context-parallel exact attention. Returns (out, lse) with the same
    sharding as q. Drop-in long-context scaling: memory and compute per chip
    are O(s/cp) for KV, with the KV rotation riding the ICI ring."""
    fn = shard_map(
        functools.partial(
            _ring_attention_local,
            axis_name=axis_name,
            causal=causal,
            softmax_scale=softmax_scale,
            interpret=interpret,
        ),
        mesh=mesh,
        in_specs=(
            P(None, None, axis_name, None),
            P(None, None, axis_name, None),
            P(None, None, axis_name, None),
        ),
        out_specs=(
            P(None, None, axis_name, None),
            P(None, None, axis_name),
        ),
        check_vma=False,
    )
    return fn(q, k, v)
