"""Sparse attention + programmable attention tests.

Sparse mirrors the reference construction (tests/test_vllm_flash_attn.py:387
test_sparse_attention): partition seqlen_k into NNZ_S slash tiles + the rest
as vertical columns — the union covers everything, so the sparse kernel must
equal dense attention. A second test uses a genuinely sparse random pattern
against a masked-oracle.

score_mod/mask_mod mirror the FA4 flex-attention conformance pattern
(tests/cute/test_mask_mod.py): each mod defined twice — kernel-side and
oracle-side (as a bias/mask) — and cross-checked."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attn_tpu import flash_attn_func, sparse_attn_func
from flash_attn_tpu.utils.testing import attention_ref


def check(out, ref, pt, eps=1e-5, factor=2.0):
    err = jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)).max()
    pt_err = jnp.abs(pt.astype(jnp.float32) - ref.astype(jnp.float32)).max()
    assert err <= factor * pt_err + eps, f"err={err} vs baseline={pt_err}"


def make_qkv(key, b, sq, sk, h, hk, d, dtype=jnp.bfloat16):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, sq, h, d), jnp.float32).astype(dtype)
    k = jax.random.normal(kk, (b, sk, hk, d), jnp.float32).astype(dtype)
    v = jax.random.normal(kv, (b, sk, hk, d), jnp.float32).astype(dtype)
    return q, k, v


@pytest.mark.parametrize("nnz_s", [0, 1, 3, 7])
@pytest.mark.parametrize("sq,sk", [(65, 65), (129, 129), (128, 512)])
def test_sparse_covers_dense(sq, sk, nnz_s):
    """Slash tiles + verticals partition all of seqlen_k => equals dense."""
    if nnz_s * 64 > sk:
        pytest.skip("too many slash tiles for this seqlen")
    b, h, d = 1, 2, 128
    q, k, v = make_qkv(jax.random.PRNGKey(0), b, sq, sk, h, h, d)
    nqb = (sq + 63) // 64
    nnz_v = sk - nnz_s * 64
    block_count = jnp.full((b, h, nqb), nnz_s, jnp.int32)
    block_offset = jnp.broadcast_to(
        jnp.arange(nnz_s, dtype=jnp.int32) * 64, (b, h, nqb, nnz_s)
    )
    column_count = jnp.full((b, h, nqb), nnz_v, jnp.int32)
    column_index = jnp.broadcast_to(
        nnz_s * 64 + jnp.arange(max(nnz_v, 1), dtype=jnp.int32),
        (b, h, nqb, max(nnz_v, 1)),
    )
    out, lse = sparse_attn_func(
        q, k, v, block_count, block_offset, column_count, column_index,
        return_softmax_lse=True,
    )
    ref, _ = attention_ref(q, k, v)
    pt, _ = attention_ref(q, k, v, upcast=False, reorder_ops=True)
    check(out, ref, pt)
    # LSE parity with the dense kernel.
    _, lse_d, _ = flash_attn_func(q, k, v, return_attn_probs=True)
    assert jnp.abs(lse - lse_d).max() < 2e-2


def test_sparse_random_pattern_vs_masked_oracle():
    b, h, sq, sk, d = 1, 2, 128, 384, 64
    q, k, v = make_qkv(jax.random.PRNGKey(1), b, sq, sk, h, h, d)
    nqb = sq // 64
    rng = np.random.RandomState(0)
    nnz_s, nnz_v = 2, 37
    block_offset = np.zeros((b, h, nqb, nnz_s), np.int32)
    column_index = np.zeros((b, h, nqb, nnz_v), np.int32)
    keep = np.zeros((b, h, sq, sk), bool)
    for bi in range(b):
        for hi in range(h):
            for qb in range(nqb):
                blocks = rng.choice(sk // 64, nnz_s, replace=False) * 64
                block_offset[bi, hi, qb] = np.sort(blocks)
                taken = set()
                for off in blocks:
                    for c in range(off, off + 64):
                        taken.add(c)
                avail = [c for c in range(sk) if c not in taken]
                cols = np.sort(rng.choice(avail, nnz_v, replace=False))
                column_index[bi, hi, qb] = cols
                rows = slice(qb * 64, (qb + 1) * 64)
                for off in blocks:
                    keep[bi, hi, rows, off : off + 64] = True
                keep[bi, hi, rows, cols] = True
    out = sparse_attn_func(
        q, k, v,
        jnp.full((b, h, nqb), nnz_s, jnp.int32), jnp.asarray(block_offset),
        jnp.full((b, h, nqb), nnz_v, jnp.int32), jnp.asarray(column_index),
    )
    bias = jnp.where(jnp.asarray(keep), 0.0, -jnp.inf)
    ref, _ = attention_ref(q, k, v, attn_bias=bias)
    pt, _ = attention_ref(q, k, v, attn_bias=bias, upcast=False,
                          reorder_ops=True)
    check(out, ref, pt)


def test_sparse_causal():
    b, h, s, d = 1, 2, 192, 64
    q, k, v = make_qkv(jax.random.PRNGKey(2), b, s, s, h, h, d)
    nqb = (s + 63) // 64
    # All columns vertical => sparse+causal == dense causal.
    block_count = jnp.zeros((b, h, nqb), jnp.int32)
    block_offset = jnp.zeros((b, h, nqb, 1), jnp.int32)
    column_count = jnp.full((b, h, nqb), s, jnp.int32)
    column_index = jnp.broadcast_to(
        jnp.arange(s, dtype=jnp.int32), (b, h, nqb, s)
    )
    out = sparse_attn_func(
        q, k, v, block_count, block_offset, column_count, column_index,
        causal=True,
    )
    ref, _ = attention_ref(q, k, v, causal=True)
    pt, _ = attention_ref(q, k, v, causal=True, upcast=False, reorder_ops=True)
    check(out, ref, pt)


# ---------------------------------------------------------------------------
# score_mod / mask_mod (FA4 programmable attention parity)
# ---------------------------------------------------------------------------

def test_score_mod_relative_bias():
    """score_mod adding a relative-position bias == oracle with that bias."""
    b, h, s, d = 1, 2, 130, 64
    q, k, v = make_qkv(jax.random.PRNGKey(3), b, s, s, h, h, d)

    def score_mod(scores, bi, hi, q_idx, kv_idx):
        return scores - 0.01 * jnp.abs(q_idx - kv_idx).astype(jnp.float32)

    out = flash_attn_func(q, k, v, score_mod=score_mod)
    rel = -0.01 * jnp.abs(
        jnp.arange(s)[:, None] - jnp.arange(s)[None, :]
    ).astype(jnp.float32)
    ref, _ = attention_ref(q, k, v, attn_bias=rel[None, None])
    pt, _ = attention_ref(q, k, v, attn_bias=rel[None, None], upcast=False,
                          reorder_ops=True)
    check(out, ref, pt)


def test_score_mod_head_dependent():
    b, h, s, d = 1, 4, 128, 64
    q, k, v = make_qkv(jax.random.PRNGKey(4), b, s, s, h, h, d)

    def score_mod(scores, bi, hi, q_idx, kv_idx):
        return scores * (1.0 + 0.1 * hi.astype(jnp.float32))

    out = flash_attn_func(q, k, v, score_mod=score_mod)
    outs = []
    for hi in range(h):
        scale = (d ** -0.5) * (1.0 + 0.1 * hi)
        o, _ = attention_ref(
            q[:, :, hi : hi + 1], k[:, :, hi : hi + 1], v[:, :, hi : hi + 1],
            softmax_scale=scale,
        )
        outs.append(o)
    ref = jnp.concatenate(outs, axis=2)
    assert jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)).max() < 3e-2


def test_mask_mod_doc_mask():
    """Document-block mask via mask_mod == segment-id masking."""
    b, h, s, d = 1, 2, 256, 64
    q, k, v = make_qkv(jax.random.PRNGKey(5), b, s, s, h, h, d)
    boundary = 100

    def mask_mod(bi, hi, q_idx, kv_idx):
        return (q_idx < boundary) == (kv_idx < boundary)

    out = flash_attn_func(q, k, v, causal=True, mask_mod=mask_mod)
    seg = (jnp.arange(s) >= boundary).astype(jnp.int32)[None]
    out_ref = flash_attn_func(
        q, k, v, causal=True, q_segment_ids=seg, kv_segment_ids=seg
    )
    assert jnp.array_equal(out, out_ref)


def test_legacy_blocksparse():
    """Legacy fixed-blockmask API (flash_blocksparse_attn_interface.py:7)."""
    from flash_attn_tpu.flash_blocksparse_attention import (
        flash_blocksparse_attn_func,
    )

    b, h, s, d, blk = 1, 2, 256, 64, 64
    q, k, v = make_qkv(jax.random.PRNGKey(9), b, s, s, h, h, d)
    nb = s // blk
    rng = np.random.RandomState(0)
    blockmask = jnp.asarray(rng.rand(nb, nb) > 0.4)
    # Ensure no fully-empty rows (softmax undefined otherwise).
    blockmask = blockmask.at[:, 0].set(True)
    out = flash_blocksparse_attn_func(q, k, v, blockmask)
    dense_mask = jnp.repeat(jnp.repeat(blockmask, blk, 0), blk, 1)
    bias = jnp.where(dense_mask, 0.0, -jnp.inf)[None, None]
    ref, _ = attention_ref(q, k, v, attn_bias=bias)
    pt, _ = attention_ref(q, k, v, attn_bias=bias, upcast=False,
                          reorder_ops=True)
    check(out, ref, pt)


def test_score_mod_backward():
    """Gradients flow through score_mod (vjp traced into the bwd kernels);
    must equal gradients of the bias-equivalent attention."""
    b, h, s, d = 1, 2, 130, 64
    q, k, v = make_qkv(jax.random.PRNGKey(13), b, s, s, h, h, d)
    g = jax.random.normal(jax.random.PRNGKey(14), q.shape, jnp.float32
                          ).astype(q.dtype)

    def score_mod(scores, bi, hi, q_idx, kv_idx):
        return scores - 0.01 * jnp.abs(q_idx - kv_idx).astype(jnp.float32)

    rel = -0.01 * jnp.abs(
        jnp.arange(s)[:, None] - jnp.arange(s)[None, :]
    ).astype(jnp.float32)[None, None]

    def loss(fn, *xs):
        return jnp.sum(fn(*xs).astype(jnp.float32) * g.astype(jnp.float32))

    ga = jax.grad(lambda *xs: loss(
        lambda a, b_, c: flash_attn_func(a, b_, c, causal=True,
                                         score_mod=score_mod), *xs
    ), argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(lambda *xs: loss(
        lambda a, b_, c: attention_ref(a, b_, c, causal=True,
                                       attn_bias=rel)[0], *xs
    ), argnums=(0, 1, 2))(q, k, v)
    gp = jax.grad(lambda *xs: loss(
        lambda a, b_, c: attention_ref(a, b_, c, causal=True, attn_bias=rel,
                                       upcast=False, reorder_ops=True)[0], *xs
    ), argnums=(0, 1, 2))(q, k, v)
    for name, a, r, p in zip(("dq", "dk", "dv"), ga, gr, gp):
        err = jnp.abs(a.astype(jnp.float32) - r.astype(jnp.float32)).max()
        base = jnp.abs(p.astype(jnp.float32) - r.astype(jnp.float32)).max()
        assert err <= 2 * base + 1e-4, (name, err, base)


def test_mask_mod_backward():
    """mask_mod gradients equal the segment-id-equivalent gradients exactly."""
    b, h, s, d = 1, 2, 192, 64
    q, k, v = make_qkv(jax.random.PRNGKey(15), b, s, s, h, h, d)
    g = jax.random.normal(jax.random.PRNGKey(16), q.shape, jnp.float32
                          ).astype(q.dtype)
    boundary = 80

    def mask_mod(bi, hi, q_idx, kv_idx):
        return (q_idx < boundary) == (kv_idx < boundary)

    seg = (jnp.arange(s) >= boundary).astype(jnp.int32)[None]

    def loss(fn, *xs):
        return jnp.sum(fn(*xs).astype(jnp.float32) * g.astype(jnp.float32))

    ga = jax.grad(lambda *xs: loss(
        lambda a, b_, c: flash_attn_func(a, b_, c, causal=True,
                                         mask_mod=mask_mod), *xs
    ), argnums=(0, 1, 2))(q, k, v)
    gb = jax.grad(lambda *xs: loss(
        lambda a, b_, c: flash_attn_func(a, b_, c, causal=True,
                                         q_segment_ids=seg,
                                         kv_segment_ids=seg), *xs
    ), argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(ga, gb):
        assert jnp.array_equal(a, b_)


@pytest.mark.parametrize("causal", [False, True])
def test_sparse_backward(causal):
    """Sparse attention is differentiable (beyond the fwd-only reference
    build; FA4's block sparsity has a bwd): grads match a masked oracle."""
    b, h, sq, sk, d = 1, 2, 128, 384, 64
    rng = np.random.RandomState(3)
    q = jnp.asarray(rng.randn(b, sq, h, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, sk, h, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, sk, h, d) * 0.3, jnp.float32)
    nqb = sq // 64
    nnz_s, nnz_v = 2, 37
    block_offset = np.zeros((b, h, nqb, nnz_s), np.int32)
    column_index = np.zeros((b, h, nqb, nnz_v), np.int32)
    keep = np.zeros((b, h, sq, sk), bool)
    for bi in range(b):
        for hi in range(h):
            for qb in range(nqb):
                blocks = rng.choice(sk // 64, nnz_s, replace=False) * 64
                block_offset[bi, hi, qb] = np.sort(blocks)
                taken = set()
                for off in blocks:
                    taken.update(range(off, off + 64))
                avail = [c for c in range(sk) if c not in taken]
                cols = np.sort(rng.choice(avail, nnz_v, replace=False))
                column_index[bi, hi, qb] = cols
                rows = slice(qb * 64, (qb + 1) * 64)
                for off in blocks:
                    keep[bi, hi, rows, off:off + 64] = True
                keep[bi, hi, rows, cols] = True
    bc = jnp.full((b, h, nqb), nnz_s, jnp.int32)
    bo = jnp.asarray(block_offset)
    cc = jnp.full((b, h, nqb), nnz_v, jnp.int32)
    ci = jnp.asarray(column_index)
    kp = jnp.asarray(keep)
    if causal:
        rr = jnp.arange(sq)[:, None]
        ccol = jnp.arange(sk)[None, :]
        kp = jnp.logical_and(kp, (ccol <= rr + (sk - sq))[None, None])

    def loss(q, k, v):
        o = sparse_attn_func(q, k, v, bc, bo, cc, ci, causal=causal)
        return (o.astype(jnp.float32) ** 2).sum()

    def oloss(q, k, v):
        qt, kt, vt = (x.transpose(0, 2, 1, 3) for x in (q, k, v))
        s = jnp.einsum("bhqd,bhkd->bhqk", qt, kt) * (d ** -0.5)
        s = jnp.where(kp, s, -jnp.inf)
        p = jax.nn.softmax(s, -1)
        p = jnp.where(jnp.any(kp, -1, keepdims=True), p, 0.0)
        return (jnp.einsum("bhqk,bhkd->bhqd", p, vt) ** 2).sum()

    g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    go = jax.grad(oloss, argnums=(0, 1, 2))(q, k, v)
    for name, a, bb in zip(("dq", "dk", "dv"), g, go):
        err = jnp.abs(a - bb).max()
        assert err < 1e-3 * max(float(jnp.abs(bb).max()), 1.0), (name, err)


@pytest.mark.parametrize("causal", [False, True])
def test_sparse_backward_alibi(causal):
    """Sparse backward with ALiBi slopes (reference supports alibi on every
    kernel path, csrc/flash_attn/flash_api.cpp:375): grads match a masked
    oracle with the additive -slope*|j - i - (sk-sq)| bias."""
    b, h, sq, sk, d = 1, 2, 128, 384, 64
    rng = np.random.RandomState(7)
    q = jnp.asarray(rng.randn(b, sq, h, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, sk, h, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, sk, h, d) * 0.3, jnp.float32)
    slopes = jnp.asarray([0.0625, 0.25], jnp.float32)
    nqb = sq // 64
    nnz_s, nnz_v = 2, 37
    block_offset = np.zeros((b, h, nqb, nnz_s), np.int32)
    column_index = np.zeros((b, h, nqb, nnz_v), np.int32)
    keep = np.zeros((b, h, sq, sk), bool)
    for bi in range(b):
        for hi in range(h):
            for qb in range(nqb):
                blocks = rng.choice(sk // 64, nnz_s, replace=False) * 64
                block_offset[bi, hi, qb] = np.sort(blocks)
                taken = set()
                for off in blocks:
                    taken.update(range(off, off + 64))
                avail = [c for c in range(sk) if c not in taken]
                cols = np.sort(rng.choice(avail, nnz_v, replace=False))
                column_index[bi, hi, qb] = cols
                rows = slice(qb * 64, (qb + 1) * 64)
                for off in blocks:
                    keep[bi, hi, rows, off:off + 64] = True
                keep[bi, hi, rows, cols] = True
    bc = jnp.full((b, h, nqb), nnz_s, jnp.int32)
    bo = jnp.asarray(block_offset)
    cc = jnp.full((b, h, nqb), nnz_v, jnp.int32)
    ci = jnp.asarray(column_index)
    kp = jnp.asarray(keep)
    if causal:
        rr = jnp.arange(sq)[:, None]
        ccol = jnp.arange(sk)[None, :]
        kp = jnp.logical_and(kp, (ccol <= rr + (sk - sq))[None, None])

    def loss(q, k, v):
        o = sparse_attn_func(q, k, v, bc, bo, cc, ci, causal=causal,
                             alibi_slopes=slopes)
        return (o.astype(jnp.float32) ** 2).sum()

    def oloss(q, k, v):
        qt, kt, vt = (x.transpose(0, 2, 1, 3) for x in (q, k, v))
        s = jnp.einsum("bhqd,bhkd->bhqk", qt, kt) * (d ** -0.5)
        rr = jnp.arange(sq)[:, None]
        ccol = jnp.arange(sk)[None, :]
        rel = jnp.abs(ccol - rr - (sk - sq)).astype(jnp.float32)
        s = s - slopes[None, :, None, None] * rel[None, None]
        s = jnp.where(kp, s, -jnp.inf)
        p = jax.nn.softmax(s, -1)
        p = jnp.where(jnp.any(kp, -1, keepdims=True), p, 0.0)
        return (jnp.einsum("bhqk,bhkd->bhqd", p, vt) ** 2).sum()

    g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    go = jax.grad(oloss, argnums=(0, 1, 2))(q, k, v)
    for name, a, bb in zip(("dq", "dk", "dv"), g, go):
        err = jnp.abs(a - bb).max()
        assert err < 1e-3 * max(float(jnp.abs(bb).max()), 1.0), (name, err)


def test_sparse_backward_gqa():
    """Sparse backward with GQA (grouped kv heads): grads match the
    repeat-expanded masked oracle, dk/dv group-reduced."""
    from flash_attn_tpu import sparse_attn_func as saf

    b, h, hk, sq, sk, d = 1, 4, 2, 64, 128, 32
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(b, sq, h, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, sk, hk, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, sk, hk, d) * 0.3, jnp.float32)
    bc = jnp.ones((b, h, 1), jnp.int32)
    bo = jnp.zeros((b, h, 1, 1), jnp.int32)
    cc = jnp.full((b, h, 1), 30, jnp.int32)
    ci = jnp.broadcast_to(64 + jnp.arange(30, dtype=jnp.int32), (b, h, 1, 30))
    keep = np.zeros((sq, sk), bool)
    keep[:, :64] = True
    keep[:, 64:94] = True

    def loss(q, k, v):
        return (saf(q, k, v, bc, bo, cc, ci).astype(jnp.float32) ** 2).sum()

    def oloss(q, k, v):
        qt = q.transpose(0, 2, 1, 3)
        kt = jnp.repeat(k.transpose(0, 2, 1, 3), h // hk, axis=1)
        vt = jnp.repeat(v.transpose(0, 2, 1, 3), h // hk, axis=1)
        s = jnp.einsum("bhqd,bhkd->bhqk", qt, kt) * (d ** -0.5)
        s = jnp.where(jnp.asarray(keep)[None, None], s, -jnp.inf)
        o = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s, -1), vt)
        return (o ** 2).sum()

    g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    go = jax.grad(oloss, argnums=(0, 1, 2))(q, k, v)
    for name, a, bb in zip(("dq", "dk", "dv"), g, go):
        assert jnp.abs(a - bb).max() < 1e-3, name


def test_sparse_dropout_fwd_bwd():
    """Sparse dropout (legacy blocksparse trains with dropout,
    flash_attn/flash_blocksparse_attention.py:15): deterministic for a
    seed, different across seeds, correct keep statistics, and the backward
    regenerates the identical mask (grad determinism)."""
    b, h, sq, sk, d = 1, 2, 128, 512, 64
    p_drop = 0.3
    q, k, v = make_qkv(jax.random.PRNGKey(50), b, sq, sk, h, h, d)
    nqb = sq // 64
    # Full coverage so the dropout statistics are measurable vs dense.
    nnz_s = sk // 64
    block_count = jnp.full((b, h, nqb), nnz_s, jnp.int32)
    block_offset = jnp.broadcast_to(
        jnp.arange(nnz_s, dtype=jnp.int32) * 64, (b, h, nqb, nnz_s))
    column_count = jnp.zeros((b, h, nqb), jnp.int32)
    column_index = jnp.zeros((b, h, nqb, 1), jnp.int32)

    def run(seed):
        return sparse_attn_func(
            q, k, v, block_count, block_offset, column_count, column_index,
            dropout_p=p_drop, dropout_seed=jnp.asarray(seed, jnp.int32),
        )

    o1, o2 = run(7), run(7)
    assert jnp.array_equal(o1, o2), "dropout must be deterministic per seed"
    o3 = run(8)
    assert not jnp.array_equal(o1, o3), "different seeds must differ"
    # Mean preserved within drift tolerance (inverted dropout).
    base = sparse_attn_func(
        q, k, v, block_count, block_offset, column_count, column_index)
    drift = jnp.abs(o1.astype(jnp.float32).mean() -
                    base.astype(jnp.float32).mean())
    assert drift < 0.05, f"dropout mean drift {drift}"

    g = jax.random.normal(jax.random.PRNGKey(51), q.shape,
                          jnp.float32).astype(q.dtype)

    def loss(q_, k_, v_):
        return jnp.sum(run(7).astype(jnp.float32) * g.astype(jnp.float32))

    g1 = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for a, c in zip(g1, g2):
        assert jnp.array_equal(a, c), "bwd must regenerate the same mask"


def test_legacy_blocksparse_dropout():
    """flash_blocksparse_attn_func with dropout (reference legacy module
    trains with dropout)."""
    from flash_attn_tpu.flash_blocksparse_attention import (
        flash_blocksparse_attn_func,
    )

    b, s, h, d = 1, 256, 2, 64
    q, k, v = make_qkv(jax.random.PRNGKey(52), b, s, s, h, h, d)
    nb = s // 64
    blockmask = jax.random.bernoulli(
        jax.random.PRNGKey(53), 0.6, (nb, nb))
    blockmask = blockmask.at[:, 0].set(True)  # every row attends something
    out1 = flash_blocksparse_attn_func(
        q, k, v, blockmask, dropout_p=0.2,
        dropout_seed=jnp.asarray(3, jnp.int32))
    out2 = flash_blocksparse_attn_func(
        q, k, v, blockmask, dropout_p=0.2,
        dropout_seed=jnp.asarray(3, jnp.int32))
    assert jnp.array_equal(out1, out2)
    base = flash_blocksparse_attn_func(q, k, v, blockmask, dropout_p=0.0)
    assert not jnp.array_equal(out1, base)


def test_sparse_crossover_routing_boundary():
    """Pin the measured sparse-vs-dense routing boundary (VERDICT r3 #6;
    benchmarks/SPARSE_CROSSOVER.md): sparse only wins at long context, low
    density, slash-dominated patterns."""
    from flash_attn_tpu.utils.sparse_crossover import should_use_sparse

    assert should_use_sparse(8192, 0.04, 0.98)
    assert should_use_sparse(4096, 0.048, 0.98)
    assert should_use_sparse(16384, 0.028, 0.9)
    assert not should_use_sparse(2048, 0.04, 0.98)   # short context
    assert not should_use_sparse(8192, 0.10, 0.98)   # density 0.1 lost 0.39-0.6x
    assert not should_use_sparse(8192, 0.30, 0.98)   # too dense
    assert not should_use_sparse(8192, 0.04, 0.30)   # vertical-heavy lost 0.4x
