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


# ---------------------------------------------------------------------------
# Ring attention BACKWARD (beyond the reference: its CP is forward-only,
# hopper/flash_api.cpp cp args feed inference; this enables long-context
# *training* over the context axis).
#
# Correctness hinge: with the GLOBAL lse saved from the forward, each KV
# block's backward contributions (computed via p = exp(s - lse)) simply sum
# — the same identity the dense two-pass backward uses across kv tiles. So
# the ring backward rotates (k, v, dk_acc, dv_acc) together: each step
# computes this shard's contribution to local dQ and to the RESIDENT
# shard's dK/dV; after a full cycle the dK/dV accumulators arrive back at
# their home devices.
# ---------------------------------------------------------------------------

def _ring_attention_bwd_local(
    q, k, v, out, lse, do,
    *,
    axis_name: str,
    causal: bool,
    softmax_scale,
    interpret,
):
    from flash_attn_tpu.kernels.flash_bwd import flash_attention_bwd

    axis_size = jax.lax.psum(1, axis_name)
    my = jax.lax.axis_index(axis_name)
    perm = [(i, (i + 1) % axis_size) for i in range(axis_size)]

    def step_fn(carry, step):
        dq_acc, k_cur, v_cur, dk_cur, dv_cur = carry
        src = (my - step) % axis_size

        if causal:
            dq_d, dk_d, dv_d = flash_attention_bwd(
                q, k_cur, v_cur, out, lse, do,
                softmax_scale=softmax_scale, causal=True, interpret=interpret,
            )
            dq_f, dk_f, dv_f = flash_attention_bwd(
                q, k_cur, v_cur, out, lse, do,
                softmax_scale=softmax_scale, causal=False, interpret=interpret,
            )
            is_diag = src == my
            visible = src < my
            w_full = jnp.where(visible, 1.0, 0.0)
            dq_p = jnp.where(is_diag, dq_d, dq_f * w_full)
            dk_p = jnp.where(is_diag, dk_d, dk_f * w_full)
            dv_p = jnp.where(is_diag, dv_d, dv_f * w_full)
        else:
            dq_p, dk_p, dv_p = flash_attention_bwd(
                q, k_cur, v_cur, out, lse, do,
                softmax_scale=softmax_scale, causal=False, interpret=interpret,
            )

        dq_acc = dq_acc + dq_p.astype(jnp.float32)
        dk_cur = dk_cur + dk_p.astype(jnp.float32)
        dv_cur = dv_cur + dv_p.astype(jnp.float32)
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        dk_nxt = jax.lax.ppermute(dk_cur, axis_name, perm)
        dv_nxt = jax.lax.ppermute(dv_cur, axis_name, perm)
        return (dq_acc, k_nxt, v_nxt, dk_nxt, dv_nxt), None

    dq0 = jnp.zeros(q.shape, jnp.float32)
    dk0 = jnp.zeros(k.shape, jnp.float32)
    dv0 = jnp.zeros(v.shape, jnp.float32)
    (dq, _, _, dk, dv), _ = jax.lax.scan(
        step_fn, (dq0, k, v, dk0, dv0), jnp.arange(axis_size)
    )
    # After axis_size rotations the accumulators are home again.
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


def ring_flash_attention_with_grad(
    q, k, v, mesh, *, axis_name: str = "context", causal: bool = False,
    softmax_scale=None, interpret=None,
):
    """Differentiable ring attention: returns out (same sharding as q) with a
    custom VJP running the ring backward. Unlike `ring_flash_attention` this
    returns only `out` (lse is an internal residual)."""

    spec3 = P(None, None, axis_name, None)

    @jax.custom_vjp
    def _ring(q, k, v):
        out, _ = ring_flash_attention(
            q, k, v, mesh, axis_name=axis_name, causal=causal,
            softmax_scale=softmax_scale, interpret=interpret,
        )
        return out

    def _fwd(q, k, v):
        out, lse = ring_flash_attention(
            q, k, v, mesh, axis_name=axis_name, causal=causal,
            softmax_scale=softmax_scale, interpret=interpret,
        )
        return out, (q, k, v, out, lse)

    def _bwd(res, do):
        q, k, v, out, lse = res
        fn = shard_map(
            functools.partial(
                _ring_attention_bwd_local,
                axis_name=axis_name, causal=causal,
                softmax_scale=softmax_scale, interpret=interpret,
            ),
            mesh=mesh,
            in_specs=(spec3, spec3, spec3, spec3,
                      P(None, None, axis_name), spec3),
            out_specs=(spec3, spec3, spec3),
            check_vma=False,
        )
        return fn(q, k, v, out, lse, do)

    _ring.defvjp(_fwd, _bwd)
    return _ring(q, k, v)
