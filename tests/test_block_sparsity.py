"""Block-sparse mask_mod execution (FA4 block sparsity parity).

Reference surfaces covered: compute_block_sparsity classification
(flash_attn/cute/compute_block_sparsity.py:32 exact + :189 fast sampling),
BlockSparseTensors (block_sparsity.py:17), block_sparse_tensors on the
public func fwd+bwd (cute/interface.py:392,2982). The TPU contract is
stronger than the reference's: the block-sparse forward is BITWISE equal to
the dense-masked path at matching tile sizes (skipped tiles provably
contribute nothing to the online softmax).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attn_tpu import (
    BlockSparseTensors,
    compute_block_sparsity,
    flash_attn_func,
)
from flash_attn_tpu.kernels.common import BlockSizes, aux_take

B, H, S, D = 2, 4, 512, 64
TILE = 128
BS = BlockSizes(block_q=TILE, block_kv=TILE)


def _assert_match(a, b, msg=""):
    """Block-sparse vs dense-masked comparison.

    On TPU (compiled) the paths are bitwise identical — the MXU dot order
    is fixed, and skipped tiles provably contribute nothing. On the CPU
    interpreter XLA may fuse the (smaller) unmasked full-block body
    differently, reassociating the dot accumulation by ~1 bf16 ulp — so
    CPU asserts a 1-ulp band instead (measured: an all-true `where` on the
    scores restores bitwise equality, i.e. the drift is codegen context,
    not semantics)."""
    if jax.default_backend() == "tpu":
        assert jnp.array_equal(a, b), msg
    else:
        af = jnp.asarray(a, jnp.float32)
        bf = jnp.asarray(b, jnp.float32)
        tol = 2e-3 * (jnp.abs(af).max() + 1.0)
        assert jnp.abs(af - bf).max() <= tol, msg


@functools.lru_cache(maxsize=None)
def qkv(h=H, hk=H, s=S):
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    q = jax.random.normal(ks[0], (B, s, h, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, s, hk, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, s, hk, D), jnp.bfloat16)
    return q, k, v


def _doc_ids(s):
    # Uneven documents; boundaries intentionally off tile boundaries.
    bounds = [0, 100, 230, 300, s]
    ids = np.zeros(s, np.int32)
    for i, (a, b) in enumerate(zip(bounds[:-1], bounds[1:])):
        ids[a:b] = i
    return jnp.asarray(ids)


def doc_mask_mod(s):
    doc = _doc_ids(s)

    def mask_mod(b, h, q_idx, kv_idx, aux):
        d = aux.tensors[0]
        return jnp.logical_and(
            kv_idx <= q_idx,
            aux_take(d, q_idx) == aux_take(d, kv_idx),
        )

    return mask_mod, (doc,)


MODS = {
    "causal": (lambda b, h, q, k: k <= q, ()),
    "sliding_window": (
        lambda b, h, q, k: jnp.logical_and(k <= q, q - k < 150), ()),
    "prefix_lm": (
        lambda b, h, q, k: jnp.logical_or(k < 130, k <= q), ()),
    "head_alternating": (
        lambda b, h, q, k: jnp.logical_or(h % 2 == 1, k <= q), ()),
    "batch_diag": (
        lambda b, h, q, k: jnp.abs(q - k) <= 64 * (b + 1), ()),
    "dilated": (
        lambda b, h, q, k: jnp.logical_and(k <= q, (q - k) % 2 == 0), ()),
}


def _brute_classify(mask_fn, aux_tensors, s, tile):
    """Numpy oracle classification for a jnp mask_mod."""
    ri = jnp.arange(s)[:, None]
    ci = jnp.arange(s)[None, :]
    nm = nn = s // tile
    partial = np.zeros((B, H, nm, nn), bool)
    fullb = np.zeros((B, H, nm, nn), bool)
    for b in range(B):
        for h in range(H):
            if aux_tensors:
                from flash_attn_tpu.kernels.common import (
                    AuxData,
                    _xla_mod_eval,
                )

                with _xla_mod_eval():
                    keep = np.asarray(
                        mask_fn(b, h, ri, ci, AuxData(tensors=aux_tensors))
                    )
            else:
                keep = np.asarray(mask_fn(b, h, ri, ci))
            keep = np.broadcast_to(keep, (s, s))
            t = keep.reshape(nm, tile, nn, tile)
            anyk = t.any(axis=(1, 3))
            allk = t.all(axis=(1, 3))
            partial[b, h] = anyk & ~allk
            fullb[b, h] = allk
    return partial, fullb


@pytest.mark.parametrize("name", sorted(MODS))
def test_planner_exact_classification(name):
    fn, aux = MODS[name]
    bst = compute_block_sparsity(
        fn, batch_size=B, num_heads=H, seqlen_q=S, seqlen_k=S,
        tile_m=TILE, tile_n=TILE, aux_tensors=aux,
    )
    partial_ref, full_ref = _brute_classify(fn, aux, S, TILE)
    cnt = np.asarray(bst.mask_block_cnt)
    fcnt = np.asarray(bst.full_block_cnt)
    assert (cnt == partial_ref.sum(-1)).all()
    assert (fcnt == full_ref.sum(-1)).all()
    # Packed indices enumerate exactly the classified blocks, ascending.
    idx = np.asarray(bst.mask_block_idx)
    for b in range(B):
        for h in range(H):
            for m in range(cnt.shape[2]):
                got = sorted(idx[b, h, m, : cnt[b, h, m]])
                want = list(np.nonzero(partial_ref[b, h, m])[0])
                assert got == want, (name, b, h, m)


def test_planner_fast_sampling_doc_mask():
    """5-point sampling is exact for contiguous-interval masks (the
    reference's use_fast_sampling contract)."""
    mask_mod, aux = doc_mask_mod(S)
    exact = compute_block_sparsity(
        mask_mod, batch_size=1, num_heads=1, seqlen_q=S, seqlen_k=S,
        tile_m=TILE, tile_n=TILE, aux_tensors=aux,
    )
    fast = compute_block_sparsity(
        mask_mod, batch_size=1, num_heads=1, seqlen_q=S, seqlen_k=S,
        tile_m=TILE, tile_n=TILE, aux_tensors=aux, use_fast_sampling=True,
    )
    # Fast sampling may misclassify partial-vs-full but must agree on
    # LIVE blocks for interval masks; for the doc mask (corner-decidable)
    # it agrees exactly.
    assert (np.asarray(exact.mask_block_cnt)
            == np.asarray(fast.mask_block_cnt)).all()
    assert (np.asarray(exact.full_block_cnt)
            == np.asarray(fast.full_block_cnt)).all()


@pytest.mark.parametrize("name", sorted(MODS))
def test_blocksparse_fwd_bitwise(name):
    fn, aux = MODS[name]
    q, k, v = qkv()
    bst = compute_block_sparsity(
        fn, batch_size=B, num_heads=H, seqlen_q=S, seqlen_k=S,
        tile_m=TILE, tile_n=TILE, aux_tensors=aux,
    )
    dense = flash_attn_func(
        q, k, v, mask_mod=fn, aux_tensors=aux, block_sizes=BS)
    sparse = flash_attn_func(
        q, k, v, mask_mod=fn, aux_tensors=aux,
        block_sparse_tensors=bst, block_sizes=BS)
    _assert_match(dense, sparse, name)


def test_blocksparse_fwd_doc_mask_bitwise():
    mask_mod, aux = doc_mask_mod(S)
    q, k, v = qkv()
    bst = compute_block_sparsity(
        mask_mod, batch_size=B, num_heads=H, seqlen_q=S, seqlen_k=S,
        tile_m=TILE, tile_n=TILE, aux_tensors=aux,
    )
    # The doc mask at these sizes actually skips blocks.
    live = (np.asarray(bst.mask_block_cnt).sum()
            + np.asarray(bst.full_block_cnt).sum())
    total = B * H * (S // TILE) ** 2
    assert live < total * 0.6
    dense = flash_attn_func(
        q, k, v, mask_mod=mask_mod, aux_tensors=aux, block_sizes=BS)
    sparse = flash_attn_func(
        q, k, v, mask_mod=mask_mod, aux_tensors=aux,
        block_sparse_tensors=bst, block_sizes=BS)
    _assert_match(dense, sparse)


@pytest.mark.parametrize("name", ["causal", "sliding_window", "prefix_lm"])
def test_blocksparse_bwd_matches_dense(name):
    fn, aux = MODS[name]
    q, k, v = qkv()
    bst = compute_block_sparsity(
        fn, batch_size=B, num_heads=H, seqlen_q=S, seqlen_k=S,
        tile_m=TILE, tile_n=TILE, aux_tensors=aux,
    )

    def loss(use_bst, q, k, v):
        out = flash_attn_func(
            q, k, v, mask_mod=fn, aux_tensors=aux,
            block_sparse_tensors=bst if use_bst else None,
            block_sizes=BS)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    gd = jax.grad(functools.partial(loss, False), argnums=(0, 1, 2))(q, k, v)
    gs = jax.grad(functools.partial(loss, True), argnums=(0, 1, 2))(q, k, v)
    for nm_, a, b in zip(("dq", "dk", "dv"), gd, gs):
        err = jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)).max()
        ref = jnp.abs(a.astype(jnp.float32)).max()
        assert err <= 1e-3 * (ref + 1.0), (name, nm_, float(err))


def test_blocksparse_doc_mask_bwd():
    mask_mod, aux = doc_mask_mod(S)
    q, k, v = qkv()
    bst = compute_block_sparsity(
        mask_mod, batch_size=B, num_heads=H, seqlen_q=S, seqlen_k=S,
        tile_m=TILE, tile_n=TILE, aux_tensors=aux,
    )

    def loss(use_bst, q, k, v):
        out = flash_attn_func(
            q, k, v, mask_mod=mask_mod, aux_tensors=aux,
            block_sparse_tensors=bst if use_bst else None,
            block_sizes=BS)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    gd = jax.grad(functools.partial(loss, False), argnums=(0, 1, 2))(q, k, v)
    gs = jax.grad(functools.partial(loss, True), argnums=(0, 1, 2))(q, k, v)
    for nm_, a, b in zip(("dq", "dk", "dv"), gd, gs):
        err = jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)).max()
        ref = jnp.abs(a.astype(jnp.float32)).max()
        assert err <= 1e-3 * (ref + 1.0), (nm_, float(err))


def test_blocksparse_gqa_and_score_mod():
    """GQA heads + score_mod compose with block sparsity (FA4 composes
    score_mod with block_sparse_tensors, cute/interface.py:392)."""
    q, k, v = qkv(h=4, hk=2)
    fn = MODS["sliding_window"][0]

    def score_mod(scores, b, h, q_idx, kv_idx):
        return scores * 1.1

    bst = compute_block_sparsity(
        fn, batch_size=B, num_heads=4, seqlen_q=S, seqlen_k=S,
        tile_m=TILE, tile_n=TILE,
    )
    dense = flash_attn_func(
        q, k, v, mask_mod=fn, score_mod=score_mod, block_sizes=BS)
    sparse = flash_attn_func(
        q, k, v, mask_mod=fn, score_mod=score_mod,
        block_sparse_tensors=bst, block_sizes=BS)
    _assert_match(dense, sparse)


def test_blocksparse_single_head_metadata_broadcast():
    """Head-invariant plans may carry h-dim 1 (reference pack_gqa path
    requires it; here it broadcasts)."""
    q, k, v = qkv()
    fn = MODS["causal"][0]
    bst = compute_block_sparsity(
        fn, batch_size=1, num_heads=1, seqlen_q=S, seqlen_k=S,
        tile_m=TILE, tile_n=TILE,
    )
    bst = BlockSparseTensors(
        np.broadcast_to(np.asarray(bst.mask_block_cnt), (B, 1, S // TILE)),
        np.broadcast_to(
            np.asarray(bst.mask_block_idx), (B, 1, S // TILE, S // TILE)),
        np.broadcast_to(np.asarray(bst.full_block_cnt), (B, 1, S // TILE)),
        np.broadcast_to(
            np.asarray(bst.full_block_idx), (B, 1, S // TILE, S // TILE)),
        (TILE, TILE),
    )
    dense = flash_attn_func(q, k, v, mask_mod=fn, block_sizes=BS)
    sparse = flash_attn_func(
        q, k, v, mask_mod=fn, block_sparse_tensors=bst, block_sizes=BS)
    _assert_match(dense, sparse)


def test_blocksparse_unaligned_seqlen():
    """Off-tile seqlens: boundary tiles get bounds masking even when FULL."""
    s = 384 + 70  # not a tile multiple
    q, k, v = qkv(s=s)
    fn = MODS["causal"][0]
    bst = compute_block_sparsity(
        fn, batch_size=B, num_heads=H, seqlen_q=s, seqlen_k=s,
        tile_m=TILE, tile_n=TILE,
    )
    dense = flash_attn_func(q, k, v, mask_mod=fn, block_sizes=BS)
    sparse = flash_attn_func(
        q, k, v, mask_mod=fn, block_sparse_tensors=bst, block_sizes=BS)
    _assert_match(dense, sparse)


def test_blocksparse_rejects_feature_combos():
    q, k, v = qkv()
    fn = MODS["causal"][0]
    bst = compute_block_sparsity(
        fn, batch_size=B, num_heads=H, seqlen_q=S, seqlen_k=S,
        tile_m=TILE, tile_n=TILE,
    )
    with pytest.raises(ValueError, match="block_sparse_tensors"):
        flash_attn_func(
            q, k, v, causal=True, mask_mod=fn, block_sparse_tensors=bst)
    with pytest.raises(ValueError, match="block_sparse_tensors"):
        flash_attn_func(
            q, k, v, dropout_p=0.1, mask_mod=fn, block_sparse_tensors=bst)


def test_blocksparse_varlen_matches_varlen_kernel():
    """Varlen block sparsity (reference varlen block_sparsity with
    cu_total_m_blocks): the block-sparse route must match the exact
    varlen kernel's causal path when the plan encodes causality."""
    from flash_attn_tpu import (
        compute_block_sparsity_varlen,
        flash_attn_varlen_func,
    )

    lens = [200, 380, 120]
    total = sum(lens)
    cu = jnp.asarray(np.concatenate([[0], np.cumsum(lens)]), jnp.int32)
    ks = jax.random.split(jax.random.PRNGKey(11), 3)
    q = jax.random.normal(ks[0], (total, H, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (total, H, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (total, H, D), jnp.bfloat16)

    def causal_mod(b, h, q_idx, kv_idx):
        return kv_idx <= q_idx

    bst, _, _ = compute_block_sparsity_varlen(
        causal_mod, cu_seqlens_q=cu, cu_seqlens_k=cu, num_heads=H,
        tile_m=TILE, tile_n=TILE,
    )
    got = flash_attn_varlen_func(
        q, k, v, cu, cu, mask_mod=causal_mod, block_sparse_tensors=bst)
    want = flash_attn_varlen_func(q, k, v, cu, cu, causal=True)
    err = jnp.abs(got.astype(jnp.float32) - want.astype(jnp.float32)).max()
    assert err <= 2e-2, float(err)
    # Sequence-tail skipping really happened: live blocks < full grid.
    live = (np.asarray(bst.mask_block_cnt).sum()
            + np.asarray(bst.full_block_cnt).sum())
    nm = np.asarray(bst.mask_block_idx).shape[2]
    nn = np.asarray(bst.mask_block_idx).shape[3]
    assert live < 3 * H * nm * nn * 0.5


def test_blocksparse_varlen_doc_mod_bwd():
    """Varlen block-sparse with a per-sequence aux mod, fwd + grads vs
    the dense-masked varlen path."""
    from flash_attn_tpu import (
        compute_block_sparsity_varlen,
        flash_attn_varlen_func,
    )

    lens = [256, 250]
    total = sum(lens)
    cu = jnp.asarray(np.concatenate([[0], np.cumsum(lens)]), jnp.int32)
    ks = jax.random.split(jax.random.PRNGKey(13), 3)
    q = jax.random.normal(ks[0], (total, H, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (total, H, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (total, H, D), jnp.bfloat16)

    def window_mod(b, h, q_idx, kv_idx):
        return jnp.logical_and(kv_idx <= q_idx, q_idx - kv_idx < 100)

    bst, _, _ = compute_block_sparsity_varlen(
        window_mod, cu_seqlens_q=cu, cu_seqlens_k=cu, num_heads=H,
        tile_m=TILE, tile_n=TILE,
    )

    def loss(use_bst, q, k, v):
        out = flash_attn_varlen_func(
            q, k, v, cu, cu, mask_mod=window_mod,
            block_sparse_tensors=bst if use_bst else None)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    ld = functools.partial(loss, False)
    ls = functools.partial(loss, True)
    fd = ld(q, k, v)
    fs = ls(q, k, v)
    assert jnp.abs(fd - fs) <= 1e-2 * (jnp.abs(fd) + 1.0)
    gd = jax.grad(ld, argnums=(0, 1, 2))(q, k, v)
    gs = jax.grad(ls, argnums=(0, 1, 2))(q, k, v)
    for nm_, a, b in zip(("dq", "dk", "dv"), gd, gs):
        err = jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)).max()
        ref = jnp.abs(a.astype(jnp.float32)).max()
        assert err <= 2e-2 * (ref + 1.0), (nm_, float(err))


def test_blocksparse_without_mod_is_blockmask():
    """A plan without mask_mod acts as a pure block mask (legacy
    blocksparse granularity): listed blocks attend fully."""
    q, k, v = qkv()
    nm = S // TILE
    # Block-causal pattern at tile granularity.
    keepb = np.tril(np.ones((nm, nm), bool))
    partial = np.zeros((B, H, nm, nm), bool)
    fullb = np.broadcast_to(keepb, (B, H, nm, nm))
    cnt = fullb.sum(-1).astype(np.int32)
    idx = np.argsort(~fullb, axis=-1, kind="stable").astype(np.int32)
    bst = BlockSparseTensors(
        partial.sum(-1).astype(np.int32),
        np.argsort(~partial, axis=-1, kind="stable").astype(np.int32),
        cnt, idx, (TILE, TILE),
    )
    got = flash_attn_func(q, k, v, block_sparse_tensors=bst, block_sizes=BS)

    def block_mask_mod(b, h, q_idx, kv_idx):
        return (kv_idx // TILE) <= (q_idx // TILE)

    want = flash_attn_func(q, k, v, mask_mod=block_mask_mod, block_sizes=BS)
    _assert_match(got, want)


def test_blocksparse_plan_grid_mismatch_rejected():
    """A plan built for one (seqlen, tile) grid must be rejected on a
    call with a different grid — the worklist row decode would otherwise
    silently produce corrupt output (round-5 hardening)."""
    def causal_mod(b, h, q_idx, kv_idx):
        return kv_idx <= q_idx

    bst = compute_block_sparsity(
        causal_mod, batch_size=B, num_heads=H, seqlen_q=S, seqlen_k=S,
        tile_m=TILE, tile_n=TILE,
    )
    q, k, v = qkv()
    q_short = q[:, : S // 2]
    with pytest.raises(AssertionError, match="different"):
        flash_attn_func(
            q_short, k, v, mask_mod=causal_mod,
            block_sparse_tensors=bst, block_sizes=BS)
    k_short, v_short = k[:, : S // 2], v[:, : S // 2]
    with pytest.raises(AssertionError, match="different"):
        flash_attn_func(
            q, k_short, v_short, mask_mod=causal_mod,
            block_sparse_tensors=bst, block_sizes=BS)


def test_blocksparse_varlen_lse_trimmed_rows_neg_inf():
    """seqused_q-trimmed rows must read lse=-inf (zero mass), matching
    the varlen kernel's contract, so logsumexp-weighted combines stay
    correct (round-5 fix: the scatter initializer was 0.0)."""
    from flash_attn_tpu import (
        compute_block_sparsity_varlen,
        flash_attn_varlen_func,
    )

    lens = [200, 380, 120]
    used_q = np.asarray([150, 380, 96])
    total = sum(lens)
    cu = jnp.asarray(np.concatenate([[0], np.cumsum(lens)]), jnp.int32)
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    q = jax.random.normal(ks[0], (total, H, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (total, H, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (total, H, D), jnp.bfloat16)

    def causal_mod(b, h, q_idx, kv_idx):
        return kv_idx <= q_idx

    bst, _, _ = compute_block_sparsity_varlen(
        causal_mod, cu_seqlens_q=cu, cu_seqlens_k=cu, num_heads=H,
        tile_m=TILE, tile_n=TILE,
    )
    out, lse, _ = flash_attn_varlen_func(
        q, k, v, cu, cu, mask_mod=causal_mod, block_sparse_tensors=bst,
        seqused_q=jnp.asarray(used_q, jnp.int32), return_attn_probs=True)
    lse = np.asarray(lse, np.float32)  # (h, total_q)
    cu_np = np.asarray(cu)
    for i, (lo, hi) in enumerate(zip(cu_np[:-1], cu_np[1:])):
        kept = lse[:, lo : lo + used_q[i]]
        trimmed = lse[:, lo + used_q[i] : hi]
        assert np.isfinite(kept).all(), i
        if trimmed.size:
            assert np.isneginf(trimmed).all(), i
