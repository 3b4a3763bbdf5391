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
dispatch is a `lax.cond` on axis_index — data-dependent but shape-static,
which keeps XLA happy, and the fully-masked j > i steps skip their kernel
entirely (the conditional's dead branch is never executed on TPU).

Load balance: with the contiguous layout the causal work is still skewed
(shard 0 sees 1/N of the keys, shard N-1 all of them), and the ring is as
slow as its busiest rank. `layout="zigzag"` fixes this: the sequence is
split into 2N chunks and rank r owns chunks (r, 2N-1-r), so every rank does
the same ~50% of a full step's work at every ring step — the standard
zig-zag/striped schedule for ring attention. Use `zigzag_shard` /
`zigzag_unshard` to convert between natural and zig-zag sequence order.

Comm/compute overlap: each step issues its `ppermute` BEFORE the step's
kernels so XLA's latency-hiding scheduler can run the ICI transfer behind
the attention compute (async collective-permute start/done pairs).
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
    q, k, v, qv,  # local shards (b, h, s_local, d[,dv]) — kernel layout
    *,
    axis_name: str,
    causal: bool,
    softmax_scale: Optional[float],
    interpret: Optional[bool],
):
    axis_size = jax.lax.psum(1, axis_name)
    my = jax.lax.axis_index(axis_name)
    perm = [(i, (i + 1) % axis_size) for i in range(axis_size)]
    if qv is not None and qv.ndim != 4:
        qv = None  # zero-size placeholder from the wrapper

    def attn(qq, kk, vv, is_causal):
        o, lse = flash_attention_fwd(
            qq, kk, vv, qv=qv, softmax_scale=softmax_scale, causal=is_causal,
            interpret=interpret,
        )
        return o.astype(jnp.float32), lse

    def skip(qq, kk, vv):
        return (
            jnp.zeros(qq.shape[:3] + (v.shape[3],), jnp.float32),
            jnp.full(qq.shape[:3], -jnp.inf, jnp.float32),
        )

    def step_fn(carry, step):
        o_acc, lse_acc, k_cur, v_cur = carry
        # Issue the rotation BEFORE this step's compute: the async
        # collective-permute then overlaps the ICI transfer with the kernels.
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        src = (my - step) % axis_size  # origin shard of k_cur/v_cur

        if causal:
            # Dispatch on visibility: diagonal -> causal kernel, past ->
            # full kernel, future -> no kernel at all (lax.cond skips it).
            o_part, lse_part = jax.lax.cond(
                src == my,
                lambda qq, kk, vv: attn(qq, kk, vv, True),
                lambda qq, kk, vv: jax.lax.cond(
                    src < my,
                    lambda a, b, c: attn(a, b, c, False),
                    skip, qq, kk, vv,
                ),
                q, k_cur, v_cur,
            )
        else:
            o_part, lse_part = attn(q, k_cur, v_cur, False)

        o_new, lse_new = combine_partials(
            jnp.stack([o_acc, o_part]),
            jnp.stack([lse_acc, lse_part]),
        )
        return (o_new, lse_new, k_nxt, v_nxt), None

    o0 = jnp.zeros(q.shape[:3] + (v.shape[3],), jnp.float32)
    lse0 = jnp.full(q.shape[:3], -jnp.inf, jnp.float32)
    (o, lse, _, _), _ = jax.lax.scan(
        step_fn, (o0, lse0, k, v), jnp.arange(axis_size)
    )
    return o.astype(q.dtype), lse


# ---------------------------------------------------------------------------
# Zig-zag layout (causal load balance).
# ---------------------------------------------------------------------------

def zigzag_permutation(seqlen: int, axis_size: int):
    """Indices permuting natural order -> zig-zag shard order: the sequence
    splits into 2*axis_size chunks and shard r owns chunks (r, 2N-1-r)."""
    c, rem = divmod(seqlen, 2 * axis_size)
    assert rem == 0, (seqlen, axis_size)
    idx = []
    for r in range(axis_size):
        idx.extend(range(r * c, (r + 1) * c))
        idx.extend(range((2 * axis_size - 1 - r) * c, (2 * axis_size - r) * c))
    return jnp.asarray(idx, jnp.int32)


def zigzag_shard(x: jnp.ndarray, axis_size: int, seq_axis: int = 2):
    """Reorder a natural-order sequence axis into zig-zag shard order."""
    return jnp.take(x, zigzag_permutation(x.shape[seq_axis], axis_size),
                    axis=seq_axis)


def zigzag_unshard(x: jnp.ndarray, axis_size: int, seq_axis: int = 2):
    """Inverse of zigzag_shard."""
    perm = zigzag_permutation(x.shape[seq_axis], axis_size)
    inv = jnp.zeros_like(perm).at[perm].set(
        jnp.arange(perm.shape[0], dtype=jnp.int32)
    )
    return jnp.take(x, inv, axis=seq_axis)


def _ring_attention_zigzag_local(
    q, k, v, qv,  # local (b, h, s_local, d[,dv]); chunks (my, 2N-1-my)
    *,
    axis_name: str,
    softmax_scale: Optional[float],
    interpret: Optional[bool],
):
    """Causal ring attention on the zig-zag layout. Each rank holds a low
    chunk a1=my and a high chunk a2=2N-1-my; the resident KV pair (b1, b2)
    comes from rank src. Chunk-level visibility:
        (a1,b1): full if src<my, diag if src==my, none otherwise
        (a1,b2): never (b2 >= N > a1)
        (a2,b1): always full (b1 < N <= a2)
        (a2,b2): full if src>my, diag if src==my, none otherwise
    => exactly ~2 chunk-pairs of work per rank per step: balanced."""
    axis_size = jax.lax.psum(1, axis_name)
    my = jax.lax.axis_index(axis_name)
    perm = [(i, (i + 1) % axis_size) for i in range(axis_size)]
    if qv is not None and qv.ndim != 4:
        qv = None  # zero-size placeholder from the wrapper
    c = q.shape[2] // 2
    qa1, qa2 = q[:, :, :c], q[:, :, c:]
    qva = (None, None) if qv is None else (qv[:, :, :c], qv[:, :, c:])

    def attn(qq, kk, vv, is_causal, qvh=None):
        o, lse = flash_attention_fwd(
            qq, kk, vv, qv=qvh, softmax_scale=softmax_scale,
            causal=is_causal, interpret=interpret,
        )
        return o.astype(jnp.float32), lse

    def skip(qq, kk, vv):
        return (
            jnp.zeros(qq.shape[:3] + (v.shape[3],), jnp.float32),
            jnp.full(qq.shape[:3], -jnp.inf, jnp.float32),
        )

    def step_fn(carry, step):
        o1, l1, o2, l2, k_cur, v_cur = carry
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        src = (my - step) % axis_size
        kb1, vb1 = k_cur[:, :, :c], v_cur[:, :, :c]
        kb2, vb2 = k_cur[:, :, c:], v_cur[:, :, c:]

        # (a2, b1): always visible.
        o21, l21 = attn(qa2, kb1, vb1, False, qva[1])
        # (a1, b1): past/diag/none.
        o11, l11 = jax.lax.cond(
            src == my,
            lambda qq, kk, vv: attn(qq, kk, vv, True, qva[0]),
            lambda qq, kk, vv: jax.lax.cond(
                src < my, lambda a, b, cc: attn(a, b, cc, False, qva[0]),
                skip, qq, kk, vv,
            ),
            qa1, kb1, vb1,
        )
        # (a2, b2): diag/future-of-ring (src>my means b2 < a2)/none.
        o22, l22 = jax.lax.cond(
            src == my,
            lambda qq, kk, vv: attn(qq, kk, vv, True, qva[1]),
            lambda qq, kk, vv: jax.lax.cond(
                src > my, lambda a, b, cc: attn(a, b, cc, False, qva[1]),
                skip, qq, kk, vv,
            ),
            qa2, kb2, vb2,
        )

        o1n, l1n = combine_partials(jnp.stack([o1, o11]), jnp.stack([l1, l11]))
        o2n, l2n = combine_partials(
            jnp.stack([o2, o21, o22]), jnp.stack([l2, l21, l22])
        )
        return (o1n, l1n, o2n, l2n, k_nxt, v_nxt), None

    z = lambda qq: (jnp.zeros(qq.shape[:3] + (v.shape[3],), jnp.float32),
                    jnp.full(qq.shape[:3], -jnp.inf, jnp.float32))
    o10, l10 = z(qa1)
    o20, l20 = z(qa2)
    (o1, l1, o2, l2, _, _), _ = jax.lax.scan(
        step_fn, (o10, l10, o20, l20, k, v), jnp.arange(axis_size)
    )
    o = jnp.concatenate([o1, o2], axis=2).astype(q.dtype)
    lse = jnp.concatenate([l1, l2], axis=2)
    return o, lse


def ring_flash_attention(
    q: jnp.ndarray,  # (b, h, s, d) global, seq sharded on `axis_name`
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    *,
    qv: Optional[jnp.ndarray] = None,  # (b, h, s, d_v) MLA absorbed scores
    axis_name: str = "context",
    causal: bool = False,
    softmax_scale: Optional[float] = None,
    interpret: Optional[bool] = None,
    layout: str = "contiguous",  # or "zigzag" (causal load balance)
):
    """Context-parallel exact attention. Returns (out, lse) with the same
    sharding as q. Drop-in long-context scaling: memory and compute per chip
    are O(s/cp) for KV, with the KV rotation riding the ICI ring.

    layout="zigzag" expects q/k/v already in zig-zag order (zigzag_shard);
    out/lse come back in the same order. Only meaningful for causal — every
    rank then does equal work each step instead of rank N-1 dominating."""
    if layout == "zigzag" and causal:
        local = functools.partial(
            _ring_attention_zigzag_local,
            axis_name=axis_name,
            softmax_scale=softmax_scale,
            interpret=interpret,
        )
    else:
        assert layout in ("contiguous", "zigzag"), layout
        local = functools.partial(
            _ring_attention_local,
            axis_name=axis_name,
            causal=causal,
            softmax_scale=softmax_scale,
            interpret=interpret,
        )
    spec = P(None, None, axis_name, None)
    fn = shard_map(
        lambda q_, k_, v_, qv_: local(q_, k_, v_, qv_),
        mesh=mesh,
        in_specs=(spec, spec, spec, spec if qv is not None else P()),
        out_specs=(spec, P(None, None, axis_name)),
        check_vma=False,
    )
    if qv is None:
        # Zero-size placeholder keeps the shard_map signature static.
        qv_arg = jnp.zeros((0,), q.dtype)
    else:
        qv_arg = qv
    return fn(q, k, v, qv_arg)


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

    def bwd(qq, kk, vv, oo, ll, dd, is_causal):
        dq_p, dk_p, dv_p = flash_attention_bwd(
            qq, kk, vv, oo, ll, dd,
            softmax_scale=softmax_scale, causal=is_causal, interpret=interpret,
        )
        return (dq_p.astype(jnp.float32), dk_p.astype(jnp.float32),
                dv_p.astype(jnp.float32))

    def skip(qq, kk, vv, oo, ll, dd):
        return (jnp.zeros(qq.shape, jnp.float32),
                jnp.zeros(kk.shape, jnp.float32),
                jnp.zeros(vv.shape, jnp.float32))

    def step_fn(carry, step):
        dq_acc, k_cur, v_cur, dk_cur, dv_cur = carry
        # Rotations first: overlap the four ICI transfers with the kernels.
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        src = (my - step) % axis_size

        if causal:
            dq_p, dk_p, dv_p = jax.lax.cond(
                src == my,
                lambda *a: bwd(*a, True),
                lambda *a: jax.lax.cond(
                    src < my, lambda *b: bwd(*b, False), skip, *a
                ),
                q, k_cur, v_cur, out, lse, do,
            )
        else:
            dq_p, dk_p, dv_p = bwd(q, k_cur, v_cur, out, lse, do, False)

        dq_acc = dq_acc + dq_p
        dk_nxt = jax.lax.ppermute(dk_cur + dk_p, axis_name, perm)
        dv_nxt = jax.lax.ppermute(dv_cur + dv_p, axis_name, perm)
        return (dq_acc, k_nxt, v_nxt, dk_nxt, dv_nxt), None

    dq0 = jnp.zeros(q.shape, jnp.float32)
    dk0 = jnp.zeros(k.shape, jnp.float32)
    dv0 = jnp.zeros(v.shape, jnp.float32)
    (dq, _, _, dk, dv), _ = jax.lax.scan(
        step_fn, (dq0, k, v, dk0, dv0), jnp.arange(axis_size)
    )
    # After axis_size rotations the accumulators are home again.
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


def _ring_attention_bwd_zigzag_local(
    q, k, v, out, lse, do,
    *,
    axis_name: str,
    softmax_scale,
    interpret,
):
    """Zig-zag causal ring backward: same chunk-visibility table as the
    forward; dK/dV accumulators ride the ring with their shards."""
    from flash_attn_tpu.kernels.flash_bwd import flash_attention_bwd

    axis_size = jax.lax.psum(1, axis_name)
    my = jax.lax.axis_index(axis_name)
    perm = [(i, (i + 1) % axis_size) for i in range(axis_size)]
    c = q.shape[2] // 2

    def half_q(x, lo):  # (b, h, s_local, ...) -> chunk half
        return x[:, :, :c] if lo else x[:, :, c:]

    qa = (half_q(q, True), half_q(q, False))
    oa = (half_q(out, True), half_q(out, False))
    la = (lse[:, :, :c], lse[:, :, c:])
    da = (half_q(do, True), half_q(do, False))

    def bwd(qq, kk, vv, oo, ll, dd, is_causal):
        dq_p, dk_p, dv_p = flash_attention_bwd(
            qq, kk, vv, oo, ll, dd,
            softmax_scale=softmax_scale, causal=is_causal, interpret=interpret,
        )
        return (dq_p.astype(jnp.float32), dk_p.astype(jnp.float32),
                dv_p.astype(jnp.float32))

    def skip(qq, kk, vv, oo, ll, dd):
        return (jnp.zeros(qq.shape, jnp.float32),
                jnp.zeros(kk.shape, jnp.float32),
                jnp.zeros(vv.shape, jnp.float32))

    def step_fn(carry, step):
        dq1, dq2, k_cur, v_cur, dk_cur, dv_cur = carry
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        src = (my - step) % axis_size
        kb1, vb1 = k_cur[:, :, :c], v_cur[:, :, :c]
        kb2, vb2 = k_cur[:, :, c:], v_cur[:, :, c:]

        # (a2, b1): always fully visible.
        g21 = bwd(qa[1], kb1, vb1, oa[1], la[1], da[1], False)
        # (a1, b1): past / diag / none.
        g11 = jax.lax.cond(
            src == my,
            lambda *a: bwd(*a, True),
            lambda *a: jax.lax.cond(
                src < my, lambda *b: bwd(*b, False), skip, *a
            ),
            qa[0], kb1, vb1, oa[0], la[0], da[0],
        )
        # (a2, b2): diag / src>my / none.
        g22 = jax.lax.cond(
            src == my,
            lambda *a: bwd(*a, True),
            lambda *a: jax.lax.cond(
                src > my, lambda *b: bwd(*b, False), skip, *a
            ),
            qa[1], kb2, vb2, oa[1], la[1], da[1],
        )

        dq1 = dq1 + g11[0]
        dq2 = dq2 + g21[0] + g22[0]
        dkv_new = (
            jnp.concatenate([g11[1] + g21[1], g22[1]], axis=2),
            jnp.concatenate([g11[2] + g21[2], g22[2]], axis=2),
        )
        dk_nxt = jax.lax.ppermute(dk_cur + dkv_new[0], axis_name, perm)
        dv_nxt = jax.lax.ppermute(dv_cur + dkv_new[1], axis_name, perm)
        return (dq1, dq2, k_nxt, v_nxt, dk_nxt, dv_nxt), None

    z = lambda x: jnp.zeros(x.shape, jnp.float32)
    (dq1, dq2, _, _, dk, dv), _ = jax.lax.scan(
        step_fn,
        (z(qa[0]), z(qa[1]), k, v, z(k), z(v)),
        jnp.arange(axis_size),
    )
    dq = jnp.concatenate([dq1, dq2], axis=2)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


def ring_flash_attention_with_grad(
    q, k, v, mesh, *, axis_name: str = "context", causal: bool = False,
    softmax_scale=None, interpret=None, layout: str = "contiguous",
):
    """Differentiable ring attention: returns out (same sharding as q) with a
    custom VJP running the ring backward. Unlike `ring_flash_attention` this
    returns only `out` (lse is an internal residual). layout="zigzag"
    balances the causal ring (inputs/outputs in zigzag_shard order)."""

    spec3 = P(None, None, axis_name, None)
    zig = layout == "zigzag" and causal

    @jax.custom_vjp
    def _ring(q, k, v):
        out, _ = ring_flash_attention(
            q, k, v, mesh, axis_name=axis_name, causal=causal,
            softmax_scale=softmax_scale, interpret=interpret, layout=layout,
        )
        return out

    def _fwd(q, k, v):
        out, lse = ring_flash_attention(
            q, k, v, mesh, axis_name=axis_name, causal=causal,
            softmax_scale=softmax_scale, interpret=interpret, layout=layout,
        )
        return out, (q, k, v, out, lse)

    def _bwd(res, do):
        q, k, v, out, lse = res
        if zig:
            local = functools.partial(
                _ring_attention_bwd_zigzag_local,
                axis_name=axis_name,
                softmax_scale=softmax_scale, interpret=interpret,
            )
        else:
            local = functools.partial(
                _ring_attention_bwd_local,
                axis_name=axis_name, causal=causal,
                softmax_scale=softmax_scale, interpret=interpret,
            )
        fn = shard_map(
            local,
            mesh=mesh,
            in_specs=(spec3, spec3, spec3, spec3,
                      P(None, None, axis_name), spec3),
            out_specs=(spec3, spec3, spec3),
            check_vma=False,
        )
        return fn(q, k, v, out, lse, do)

    _ring.defvjp(_fwd, _bwd)
    return _ring(q, k, v)
