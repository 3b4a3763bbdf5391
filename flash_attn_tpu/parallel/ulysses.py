"""Ulysses-style (DeepSpeed-Ulysses) sequence parallelism: all-to-all
head/sequence re-partitioning around ONE exact local attention call.

Complement to ring CP (parallel/context.py). Ring keeps heads whole and
rotates KV chunks around the ICI ring — cp ppermute steps, O(s/cp) KV
memory, and causal masking needs the chunk-visibility lattice. Ulysses
instead re-partitions with two all-to-alls: shard heads, gather sequence.
Each chip then runs the stock kernel on h/cp heads with FULL context, so
every attention feature (causal, windows, sinks, dropout, mods, GQA,
softcap, MLA qv) works unchanged, and the backward is just the transposed
all-to-alls around the kernel's custom_vjp — no bespoke CP backward.

Trade-off: activations are O(s) per chip (for h/cp heads) instead of
O(s/cp), and query heads must divide by cp (KV heads are exactly
repeated when GQA leaves them indivisible). Use ring for memory-bound
extreme context, Ulysses for feature breadth / when two all-to-alls beat
cp ppermutes on the fabric.

No counterpart in the reference repo (its CP surface is the FA3
round-robin cp_* args, SURVEY §2.4); the design follows the public
DeepSpeed-Ulysses recipe re-expressed as shard_map + lax.all_to_all.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from flash_attn_tpu.flash_attn_interface import flash_attn_func


def ulysses_flash_attention(
    q,  # (b, h, s, d) global, seq sharded on `axis_name` (like ring CP)
    k,
    v,
    mesh: Mesh,
    *,
    axis_name: str = "context",
    **attn_kwargs,
):
    """Exact attention over sequence-sharded q/k/v via head all-to-all.

    Inputs and the returned output are (b, h, s, d) with the sequence axis
    sharded over ``axis_name`` — the same convention as
    ring_flash_attention. ``attn_kwargs`` pass straight to flash_attn_func
    (causal, window_size, softcap, dropout_p, score_mod, ...), which also
    makes the whole thing differentiable through its custom_vjp.
    """
    cp = mesh.shape[axis_name]
    b, h, s, d = q.shape
    hk = k.shape[1]
    if h % cp:
        raise ValueError(
            f"Ulysses needs query heads divisible by the axis: h={h} "
            f"cp={cp} (use ring_flash_attention otherwise)"
        )
    if hk % cp:
        # GQA with fewer KV heads than chips: repeating KV heads is exact
        # (each query group attends the same K/V), so expand the groups
        # until the head all-to-all divides. jnp.repeat keeps the
        # group->head mapping aligned with the kernel's GQA packing.
        rep = h // hk
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)
        hk = h

    def local(q_, k_, v_):
        # (b, h, s/cp, d) --all_to_all--> (b, h/cp, s, d): scatter heads,
        # gather sequence (rank-ordered concat keeps positions in order).
        def fwd(x):
            return jax.lax.all_to_all(
                x, axis_name, split_axis=1, concat_axis=2, tiled=True
            )

        o = flash_attn_func(
            fwd(q_), fwd(k_), fwd(v_), layout="bhsd", **attn_kwargs
        )
        # (b, h/cp, s, d) --> (b, h, s/cp, d): scatter sequence, gather heads.
        return jax.lax.all_to_all(
            o, axis_name, split_axis=2, concat_axis=1, tiled=True
        )

    spec = P(None, None, axis_name, None)
    return jax.shard_map(
        local, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )(q, k, v)
