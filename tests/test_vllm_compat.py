"""vLLM-compat surface tests, porting the reference's serving test
(tests/test_vllm_flash_attn.py: test_flash_attn_varlen_func with paged KV +
chunked prefill vs ref_paged_attn)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attn_tpu.vllm_compat import (
    flash_attn_varlen_func,
    get_scheduler_metadata,
)


def ref_paged_attn(query, key_cache, value_cache, query_lens, kv_lens,
                   block_tables, scale, sliding_window=None, soft_cap=None):
    """Port of the reference oracle (tests/test_vllm_flash_attn.py ref_paged_attn)."""
    num_seqs = len(query_lens)
    block_tables = np.asarray(block_tables)
    _, page, num_kv_heads, head_size = key_cache.shape
    outputs = []
    start = 0
    for i in range(num_seqs):
        qlen, klen = int(query_lens[i]), int(kv_lens[i])
        q = np.asarray(query[start : start + qlen], np.float32)
        npages = (klen + page - 1) // page
        k = np.asarray(key_cache, np.float32)[block_tables[i, :npages]]
        k = k.reshape(-1, num_kv_heads, head_size)[:klen]
        v = np.asarray(value_cache, np.float32)[block_tables[i, :npages]]
        v = v.reshape(-1, num_kv_heads, head_size)[:klen]
        g = q.shape[1] // num_kv_heads
        k = np.repeat(k, g, axis=1)
        v = np.repeat(v, g, axis=1)
        s = np.einsum("qhd,khd->hqk", q, k) * scale
        if soft_cap:
            s = np.tanh(s / soft_cap) * soft_cap
        # bottom-right causal
        qi = np.arange(qlen)[:, None]
        ki = np.arange(klen)[None, :]
        mask = ki > qi + (klen - qlen)
        if sliding_window is not None:
            mask |= ki < qi + (klen - qlen) - sliding_window + 1
        s = np.where(mask[None], -np.inf, s)
        p = np.exp(s - s.max(-1, keepdims=True))
        p = p / p.sum(-1, keepdims=True)
        outputs.append(np.einsum("hqk,khd->qhd", p, v))
        start += qlen
    return np.concatenate(outputs)


@pytest.mark.parametrize("seq_lens", [
    [(1, 132), (5, 18)],                 # decode-ish
    [(100, 180), (17, 463), (30, 57)],   # chunked prefill mixes
])
@pytest.mark.parametrize("sliding_window", [None, 64])
@pytest.mark.parametrize("soft_cap", [None, 30.0])
def test_varlen_paged_vs_ref(seq_lens, sliding_window, soft_cap):
    page = 128
    h, hk, d = 8, 2, 64
    query_lens = [q for q, _ in seq_lens]
    kv_lens = [k for _, k in seq_lens]
    nseq = len(seq_lens)
    total_q = sum(query_lens)
    max_klen = max(kv_lens)
    max_pages = (max_klen + page - 1) // page
    total_pages = nseq * max_pages + 1

    rng = np.random.RandomState(0)
    q = rng.randn(total_q, h, d).astype(np.float32)
    key_cache = rng.randn(total_pages, page, hk, d).astype(np.float32)
    value_cache = rng.randn(total_pages, page, hk, d).astype(np.float32)
    block_tables = rng.permutation(total_pages - 1)[: nseq * max_pages]
    block_tables = (block_tables + 1).reshape(nseq, max_pages).astype(np.int32)

    cu_q = np.concatenate([[0], np.cumsum(query_lens)]).astype(np.int32)
    scale = d**-0.5

    qb = jnp.asarray(q, jnp.bfloat16)
    kb = jnp.asarray(key_cache, jnp.bfloat16)
    vb = jnp.asarray(value_cache, jnp.bfloat16)
    out, lse = flash_attn_varlen_func(
        qb, kb, vb,
        max_seqlen_q=max(query_lens),
        cu_seqlens_q=jnp.asarray(cu_q),
        max_seqlen_k=max_klen,
        seqused_k=jnp.asarray(kv_lens, jnp.int32),
        causal=True,
        window_size=(sliding_window - 1, 0) if sliding_window else (-1, -1),
        softcap=soft_cap if soft_cap else 0.0,
        block_table=jnp.asarray(block_tables),
        softmax_scale=scale,
        return_softmax_lse=True,
    )
    ref = ref_paged_attn(
        np.asarray(qb, np.float32),
        np.asarray(kb, np.float32), np.asarray(vb, np.float32),
        query_lens, kv_lens, block_tables, scale,
        sliding_window=sliding_window, soft_cap=soft_cap,
    )
    err = np.abs(np.asarray(out, np.float32) - ref).max()
    assert err < 2.5e-2, err
    assert lse.shape == (h, total_q)
    assert np.isfinite(np.asarray(lse)).all()


def test_scheduler_metadata_roundtrip():
    md = get_scheduler_metadata(
        batch_size=2, max_seqlen_q=1, max_seqlen_k=1024, num_heads_q=8,
        num_heads_kv=2, headdim=64, causal=True,
    )
    assert md.num_heads_q == 8

    # Passing it through the varlen call validates head count.
    page, h, hk, d = 128, 8, 2, 64
    q = jnp.zeros((2, h, d), jnp.bfloat16)
    kc = jnp.zeros((4, page, hk, d), jnp.bfloat16)
    out = flash_attn_varlen_func(
        q, kc, kc,
        max_seqlen_q=1,
        cu_seqlens_q=jnp.asarray([0, 1, 2], jnp.int32),
        seqused_k=jnp.asarray([100, 50], jnp.int32),
        causal=True,
        block_table=jnp.asarray([[0, 1], [2, 3]], jnp.int32),
        scheduler_metadata=md,
    )
    assert out.shape == (2, h, d)


def test_sparse_attn_varlen():
    """Port of the reference test_sparse_attention_varlen construction:
    per-sequence metadata covering all of each sequence's keys => equals
    dense varlen attention."""
    from flash_attn_tpu.vllm_compat import sparse_attn_varlen_func
    from flash_attn_tpu import flash_attn_varlen_func as dense_varlen

    seq_lens = [(100, 132), (64, 200)]
    h, d = 2, 64
    q_lens = [a for a, _ in seq_lens]
    k_lens = [b for _, b in seq_lens]
    nseq = len(seq_lens)
    total_q, total_k = sum(q_lens), sum(k_lens)
    sq, sk = max(q_lens), max(k_lens)
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(total_q, h, d), jnp.bfloat16)
    k = jnp.asarray(rng.randn(total_k, h, d), jnp.bfloat16)
    v = jnp.asarray(rng.randn(total_k, h, d), jnp.bfloat16)
    cu_q = jnp.asarray(np.concatenate([[0], np.cumsum(q_lens)]), jnp.int32)
    cu_k = jnp.asarray(np.concatenate([[0], np.cumsum(k_lens)]), jnp.int32)

    nqb = (sq + 63) // 64
    nnz_s = 1
    # Slash tile [0, 64) + verticals for the rest, per sequence.
    block_count = jnp.full((nseq, h, nqb), nnz_s, jnp.int32)
    block_offset = jnp.zeros((nseq, h, nqb, nnz_s), jnp.int32)
    nnz_v = sk - 64
    column_count = jnp.asarray(
        np.broadcast_to(
            (np.array(k_lens) - 64)[:, None, None], (nseq, h, nqb)
        ).copy(), jnp.int32,
    )
    column_index = jnp.broadcast_to(
        64 + jnp.arange(nnz_v, dtype=jnp.int32), (nseq, h, nqb, nnz_v)
    )

    out, lse = sparse_attn_varlen_func(
        q, k, v, block_count, block_offset, column_count, column_index,
        cu_q, cu_k, sq, sk, return_softmax_lse=True,
    )
    ref = dense_varlen(q, k, v, cu_q, cu_k, causal=False)
    err = np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32)).max()
    assert err < 2.5e-2, err
    assert lse.shape == (h, total_q)

    # causal=True: per-sequence bottom-right alignment must match the dense
    # varlen causal path (reference mha_varlen_fwd_sparse is_causal).
    out_c = sparse_attn_varlen_func(
        q, k, v, block_count, block_offset, column_count, column_index,
        cu_q, cu_k, sq, sk, causal=True,
    )
    ref_c = dense_varlen(q, k, v, cu_q, cu_k, causal=True)
    err_c = np.abs(
        np.asarray(out_c, np.float32) - np.asarray(ref_c, np.float32)
    ).max()
    assert err_c < 2.5e-2, err_c


def test_varlen_cp_round_robin():
    """CP args on the vLLM varlen path (reference flash_attn_interface.py:166):
    two ranks over round-robin KV shards, LSE-merged, equal full varlen."""
    from flash_attn_tpu.vllm_compat import flash_attn_varlen_func
    from flash_attn_tpu.kernels.flash_decode import combine_partials

    lens_q = [60, 100]
    lens_k = [128, 200]  # even so the round-robin split is exact
    h, d, W = 2, 64, 2
    total_q, total_k = sum(lens_q), sum(lens_k)
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(total_q, h, d), jnp.bfloat16)
    k = jnp.asarray(rng.randn(total_k, h, d), jnp.bfloat16)
    v = jnp.asarray(rng.randn(total_k, h, d), jnp.bfloat16)
    cu_q = jnp.asarray(np.concatenate([[0], np.cumsum(lens_q)]), jnp.int32)
    cu_k = jnp.asarray(np.concatenate([[0], np.cumsum(lens_k)]), jnp.int32)

    full, lse_full = flash_attn_varlen_func(
        q, k, v, cu_seqlens_q=cu_q, cu_seqlens_k=cu_k, causal=True,
        return_softmax_lse=True,
    )

    # Build per-rank round-robin shards of each sequence's keys.
    parts = []
    for rank in range(W):
        k_parts, v_parts, lens_local = [], [], []
        for j in range(len(lens_k)):
            seg_k = k[int(cu_k[j]):int(cu_k[j + 1])]
            seg_v = v[int(cu_k[j]):int(cu_k[j + 1])]
            k_parts.append(seg_k[rank::W])
            v_parts.append(seg_v[rank::W])
            lens_local.append(seg_k[rank::W].shape[0])
        k_r = jnp.concatenate(k_parts)
        v_r = jnp.concatenate(v_parts)
        cu_k_r = jnp.asarray(
            np.concatenate([[0], np.cumsum(lens_local)]), jnp.int32
        )
        o_r, lse_r = flash_attn_varlen_func(
            q, k_r, v_r, cu_seqlens_q=cu_q, cu_seqlens_k=cu_k_r, causal=True,
            cp_world_size=W, cp_rank=rank,
            cp_tot_seqused_k=jnp.asarray(lens_k, jnp.int32),
            return_softmax_lse=True,
        )
        parts.append((o_r.astype(jnp.float32), lse_r.T))  # lse -> (total_q, h)
    o, lse = combine_partials(
        jnp.stack([p[0] for p in parts]), jnp.stack([p[1] for p in parts])
    )
    assert np.abs(np.asarray(o) - np.asarray(full, np.float32)).max() < 2e-2
    assert np.abs(np.asarray(lse).T - np.asarray(lse_full)).max() < 1e-3


def test_sparse_attn_varlen_backward():
    """Varlen sparse attention is differentiable end-to-end (the reference
    sparse path is fwd-only): grads through unpack -> sparse VJP -> repack
    match a per-sequence masked oracle."""
    from flash_attn_tpu.vllm_compat import sparse_attn_varlen_func

    seq_lens = [(40, 70), (30, 64)]
    h, d = 2, 64
    q_lens = [a for a, _ in seq_lens]
    k_lens = [b for _, b in seq_lens]
    nseq, tq, tk = 2, sum(q_lens), sum(k_lens)
    sq, sk = max(q_lens), max(k_lens)
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(tq, h, d), jnp.float32)
    k = jnp.asarray(rng.randn(tk, h, d), jnp.float32)
    v = jnp.asarray(rng.randn(tk, h, d) * 0.3, jnp.float32)
    cu_q = jnp.asarray(np.concatenate([[0], np.cumsum(q_lens)]), jnp.int32)
    cu_k = jnp.asarray(np.concatenate([[0], np.cumsum(k_lens)]), jnp.int32)
    nqb = (sq + 63) // 64
    bc = jnp.ones((nseq, h, nqb), jnp.int32)
    bo = jnp.zeros((nseq, h, nqb, 1), jnp.int32)
    cc = jnp.asarray(np.broadcast_to(
        (np.array(k_lens) - 64)[:, None, None], (nseq, h, nqb)).copy(),
        jnp.int32)
    nnz_v = sk - 64
    ci = jnp.broadcast_to(64 + jnp.arange(max(nnz_v, 1), dtype=jnp.int32),
                          (nseq, h, nqb, max(nnz_v, 1)))

    def loss(q, k, v):
        o = sparse_attn_varlen_func(q, k, v, bc, bo, cc, ci, cu_q, cu_k,
                                    sq, sk, causal=True)
        return (o.astype(jnp.float32) ** 2).sum()

    def oloss(q, k, v):
        tot = 0.0
        for i in range(nseq):
            qs = q[cu_q[i]:cu_q[i + 1]]
            ks = k[cu_k[i]:cu_k[i + 1]]
            vs = v[cu_k[i]:cu_k[i + 1]]
            s = jnp.einsum("qhd,khd->hqk", qs, ks) * (d ** -0.5)
            ski, sqi = ks.shape[0], qs.shape[0]
            rows = jnp.arange(sqi)[:, None]
            cols = jnp.arange(ski)[None, :]
            s = jnp.where(cols <= rows + (ski - sqi), s, -jnp.inf)
            p = jax.nn.softmax(s, -1)
            tot = tot + (jnp.einsum("hqk,khd->qhd", p, vs) ** 2).sum()
        return tot

    g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    go = jax.grad(oloss, argnums=(0, 1, 2))(q, k, v)
    # fp32-exact on CPU interpret; TPU f32 matmuls run in bf16 passes.
    tol = 1e-3 if jax.default_backend() == "cpu" else 5e-3
    for name, a, bb in zip(("dq", "dk", "dv"), g, go):
        assert jnp.abs(a - bb).max() < tol, name


def test_varlen_paged_q_descale():
    """FP8-style q_descale on the paged varlen serving path (reference
    hopper/flash_api.cpp FP8 descale params,
    vllm_flash_attn/flash_attn_interface.py:136-169): q_descale is per
    (batch, kv-head) and folds multiplicatively into the score scale."""
    page = 128
    h, hk, d = 4, 2, 64
    seq_lens = [(1, 132), (3, 57)]
    query_lens = [q for q, _ in seq_lens]
    kv_lens = [k for _, k in seq_lens]
    nseq = len(seq_lens)
    total_q = sum(query_lens)
    max_klen = max(kv_lens)
    max_pages = (max_klen + page - 1) // page
    total_pages = nseq * max_pages + 1

    rng = np.random.RandomState(7)
    q = rng.randn(total_q, h, d).astype(np.float32)
    key_cache = rng.randn(total_pages, page, hk, d).astype(np.float32)
    value_cache = rng.randn(total_pages, page, hk, d).astype(np.float32)
    block_tables = np.arange(1, nseq * max_pages + 1).reshape(
        nseq, max_pages).astype(np.int32)
    cu_q = np.concatenate([[0], np.cumsum(query_lens)]).astype(np.int32)
    scale = d**-0.5

    # Simulate FP8 serving: q pre-divided by a per-kv-head descale that the
    # kernel must multiply back in.
    q_descale = np.array([1.7, 0.6], np.float32)  # (hk,)
    q_scaled = q.reshape(total_q, hk, h // hk, d) / q_descale[None, :, None, None]
    q_scaled = q_scaled.reshape(total_q, h, d)

    out = flash_attn_varlen_func(
        jnp.asarray(q_scaled, jnp.bfloat16),
        jnp.asarray(key_cache, jnp.bfloat16),
        jnp.asarray(value_cache, jnp.bfloat16),
        max_seqlen_q=max(query_lens),
        cu_seqlens_q=jnp.asarray(cu_q),
        max_seqlen_k=max_klen,
        seqused_k=jnp.asarray(kv_lens, jnp.int32),
        causal=True,
        block_table=jnp.asarray(block_tables),
        softmax_scale=scale,
        q_descale=jnp.asarray(q_descale),
    )
    ref = ref_paged_attn(
        q, np.asarray(key_cache), np.asarray(value_cache),
        query_lens, kv_lens, block_tables, scale,
    )
    err = np.abs(np.asarray(out, np.float32) - ref).max()
    assert err < 4e-2, err


def _mk_paged(page=512, h=4, hk=2, d=128, lens=(300, 900), npages=12,
              seed=0):
    rng = np.random.RandomState(seed)
    nseq = len(lens)
    maxp = max(-(-l // page) for l in lens)
    cu_q = jnp.asarray(np.concatenate([[0], np.cumsum(lens)]), jnp.int32)
    seqused = jnp.asarray(lens, jnp.int32)
    total_q = int(sum(lens))
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(ks[0], (total_q, h, d), jnp.bfloat16)
    k_phd = jax.random.normal(ks[1], (npages, page, hk, d), jnp.bfloat16)
    v_phd = jax.random.normal(ks[2], (npages, page, hk, d), jnp.bfloat16)
    bt = jnp.asarray(
        rng.permutation(npages)[: nseq * maxp].reshape(nseq, maxp),
        jnp.int32,
    )
    return q, k_phd, v_phd, cu_q, seqused, bt


def test_paged_prefill_inkernel_block_table_reads():
    """In-kernel block-table reads (reference hopper/paged_kv.h:18): the
    head-major pool route must match the gather route, eager and jitted
    (jit being the serving pattern the plan machinery exists for)."""
    q, k_phd, v_phd, cu_q, seqused, bt = _mk_paged()
    ref = flash_attn_varlen_func(
        q, k_phd, v_phd, max_seqlen_q=1024, cu_seqlens_q=cu_q,
        seqused_k=seqused, causal=True, block_table=bt)
    k_hpd = k_phd.transpose(0, 2, 1, 3)
    v_hpd = v_phd.transpose(0, 2, 1, 3)
    got = flash_attn_varlen_func(
        q, k_hpd, v_hpd, max_seqlen_q=1024, cu_seqlens_q=cu_q,
        seqused_k=seqused, causal=True, block_table=bt,
        kv_cache_layout="hpd")
    err = jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32)).max()
    assert err <= 5e-3, float(err)
    jfn = jax.jit(lambda q: flash_attn_varlen_func(
        q, k_hpd, v_hpd, max_seqlen_q=1024, cu_seqlens_q=cu_q,
        seqused_k=seqused, causal=True, block_table=bt,
        kv_cache_layout="hpd"))
    errj = jnp.abs(
        ref.astype(jnp.float32) - jfn(q).astype(jnp.float32)).max()
    assert errj <= 5e-3, float(errj)
    # Fused K|V pool (engine layout).
    kv_fused = jnp.concatenate([k_hpd, v_hpd], axis=-1)
    got_f = flash_attn_varlen_func(
        q, kv_fused, None, max_seqlen_q=1024, cu_seqlens_q=cu_q,
        seqused_k=seqused, causal=True, block_table=bt,
        kv_cache_layout="hpd_fused")
    err_f = jnp.abs(
        ref.astype(jnp.float32) - got_f.astype(jnp.float32)).max()
    assert err_f <= 5e-3, float(err_f)


def test_paged_prefill_quantized_pools():
    """Quantized (int8/fp8) pools ride the varlen prefill path with
    gathered 1-byte pages + XLA upcast/descale (round-5: no more padded
    decode-kernel fallback for the engine-default quantized caches)."""
    q, k_phd, v_phd, cu_q, seqused, bt = _mk_paged()
    ref = flash_attn_varlen_func(
        q, k_phd, v_phd, max_seqlen_q=1024, cu_seqlens_q=cu_q,
        seqused_k=seqused, causal=True, block_table=bt)
    for qdtype in (jnp.int8, jnp.float8_e4m3fn):
        if qdtype == jnp.int8:
            scale = 0.04
            kq = jnp.clip(jnp.round(
                k_phd.astype(jnp.float32) / scale), -127, 127).astype(qdtype)
            vq = jnp.clip(jnp.round(
                v_phd.astype(jnp.float32) / scale), -127, 127).astype(qdtype)
        else:
            scale = 1.0
            kq = k_phd.astype(qdtype)
            vq = v_phd.astype(qdtype)
        hk = k_phd.shape[2]
        sc = jnp.full((hk,), scale, jnp.float32)
        got = flash_attn_varlen_func(
            q, kq, vq, max_seqlen_q=1024, cu_seqlens_q=cu_q,
            seqused_k=seqused, causal=True, block_table=bt,
            k_descale=sc, v_descale=sc)
        err = jnp.abs(
            ref.astype(jnp.float32) - got.astype(jnp.float32)).max()
        # int8 @ 0.04 scale quantizes finer than fp8 e4m3's 3-bit mantissa.
        bound = 0.12 if qdtype == jnp.int8 else 0.3
        assert err <= bound, (str(qdtype), float(err))


def test_scheduler_metadata_real_plan_reuse():
    """get_scheduler_metadata now builds the actual worklist plan
    (reference flash_prepare_scheduler.cu:43); the varlen func consumes
    it without re-planning, and the result is identical."""
    page = 512
    q, k_phd, v_phd, cu_q, seqused, bt = _mk_paged(page=page)
    k_hpd = k_phd.transpose(0, 2, 1, 3)
    v_hpd = v_phd.transpose(0, 2, 1, 3)
    sm = get_scheduler_metadata(
        batch_size=2, max_seqlen_q=1024, max_seqlen_k=1024,
        num_heads_q=4, num_heads_kv=2, headdim=128,
        cache_seqlens=seqused, cu_seqlens_q=cu_q, causal=True,
        page_size=page,
    )
    assert sm.plan is not None and sm.plan.n_steps > 0
    base = flash_attn_varlen_func(
        q, k_hpd, v_hpd, max_seqlen_q=1024, cu_seqlens_q=cu_q,
        seqused_k=seqused, causal=True, block_table=bt,
        kv_cache_layout="hpd")
    with_plan = flash_attn_varlen_func(
        q, k_hpd, v_hpd, max_seqlen_q=1024, cu_seqlens_q=cu_q,
        seqused_k=seqused, causal=True, block_table=bt,
        kv_cache_layout="hpd", scheduler_metadata=sm)
    assert jnp.array_equal(base, with_plan)


def test_varlen_plan_main_interface():
    """make_varlen_plan + flash_attn_varlen_func(plan=...) on the packed
    (non-paged) path: identical output to self-planned, eager and jit."""
    from flash_attn_tpu import flash_attn_varlen_func as main_varlen
    from flash_attn_tpu import make_varlen_plan

    lens = [200, 380, 120]
    total = sum(lens)
    cu = jnp.asarray(np.concatenate([[0], np.cumsum(lens)]), jnp.int32)
    ks = jax.random.split(jax.random.PRNGKey(5), 3)
    H, D = 4, 64
    q = jax.random.normal(ks[0], (total, H, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (total, H, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (total, H, D), jnp.bfloat16)
    plan = make_varlen_plan(
        cu, cu, block_q=512, block_kv=512, causal=True)
    base = main_varlen(q, k, v, cu, cu, causal=True,
                       block_q=512, block_kv=512)
    got = main_varlen(q, k, v, cu, cu, causal=True,
                      block_q=512, block_kv=512, plan=plan)
    assert jnp.array_equal(base, got)
    jfn = jax.jit(lambda q, k, v: main_varlen(
        q, k, v, cu, cu, causal=True, block_q=512, block_kv=512,
        plan=plan))
    gotj = jfn(q, k, v)
    err = jnp.abs(
        base.astype(jnp.float32) - gotj.astype(jnp.float32)).max()
    assert err <= 5e-3, float(err)
    # Mismatched plan config is rejected loudly.
    with pytest.raises(AssertionError):
        main_varlen(q, k, v, cu, cu, causal=False,
                    block_q=512, block_kv=512, plan=plan)


def test_paged_prefill_fused_pool_gather_fallback():
    """hpd_fused pools the in-kernel gate rejects (small pages; quantized
    pools — the ENGINE-DEFAULT quant layout) must ride the gather route
    with the fused pool split into its K|V sections, not crash."""
    # page=128 < the 512 in-kernel threshold -> gather, bf16 fused pool.
    q, k_phd, v_phd, cu_q, seqused, bt = _mk_paged(page=128, npages=16)
    ref = flash_attn_varlen_func(
        q, k_phd, v_phd, max_seqlen_q=1024, cu_seqlens_q=cu_q,
        seqused_k=seqused, causal=True, block_table=bt)
    k_hpd = k_phd.transpose(0, 2, 1, 3)
    v_hpd = v_phd.transpose(0, 2, 1, 3)
    kv_fused = jnp.concatenate([k_hpd, v_hpd], axis=-1)
    got = flash_attn_varlen_func(
        q, kv_fused, None, max_seqlen_q=1024, cu_seqlens_q=cu_q,
        seqused_k=seqused, causal=True, block_table=bt,
        kv_cache_layout="hpd_fused")
    err = jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32)).max()
    assert err <= 5e-3, float(err)

    # Quantized fused pool at page=512: in-kernel gate rejects 1-byte
    # pools -> gather + upcast/descale on the sliced sections.
    q, k_phd, v_phd, cu_q, seqused, bt = _mk_paged(page=512)
    ref = flash_attn_varlen_func(
        q, k_phd, v_phd, max_seqlen_q=1024, cu_seqlens_q=cu_q,
        seqused_k=seqused, causal=True, block_table=bt)
    scale = 0.04
    kv_fused = jnp.concatenate(
        [k_phd.transpose(0, 2, 1, 3), v_phd.transpose(0, 2, 1, 3)],
        axis=-1)
    kv_q = jnp.clip(jnp.round(
        kv_fused.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    hk = k_phd.shape[2]
    sc = jnp.full((hk,), scale, jnp.float32)
    got_q = flash_attn_varlen_func(
        q, kv_q, None, max_seqlen_q=1024, cu_seqlens_q=cu_q,
        seqused_k=seqused, causal=True, block_table=bt,
        kv_cache_layout="hpd_fused", k_descale=sc, v_descale=sc)
    err_q = jnp.abs(
        ref.astype(jnp.float32) - got_q.astype(jnp.float32)).max()
    assert err_q <= 0.12, float(err_q)


def test_paged_prefill_alibi_routes_to_gather():
    """ALiBi serving calls on head-major page>=512 pools must route to the
    gather path (the in-kernel paged kernel asserts alibi away) and match
    the phd-layout gather result."""
    q, k_phd, v_phd, cu_q, seqused, bt = _mk_paged()
    h = q.shape[1]
    slopes = jnp.asarray(
        [2.0 ** (-(i + 1)) for i in range(h)], jnp.float32)
    ref = flash_attn_varlen_func(
        q, k_phd, v_phd, max_seqlen_q=1024, cu_seqlens_q=cu_q,
        seqused_k=seqused, causal=True, block_table=bt,
        alibi_slopes=slopes)
    got = flash_attn_varlen_func(
        q, k_phd.transpose(0, 2, 1, 3), v_phd.transpose(0, 2, 1, 3),
        max_seqlen_q=1024, cu_seqlens_q=cu_q,
        seqused_k=seqused, causal=True, block_table=bt,
        kv_cache_layout="hpd", alibi_slopes=slopes)
    err = jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32)).max()
    assert err <= 5e-3, float(err)


def test_stale_plan_rejected_and_metadata_replans():
    """A VarlenPlan is only valid for the exact per-sequence lengths it
    was built from: stale reuse is a silent-wrong-output hazard, so the
    kernel rejects it loudly, and the vllm route re-plans instead of
    reusing a stale scheduler_metadata plan."""
    from flash_attn_tpu import flash_attn_varlen_func as main_varlen
    from flash_attn_tpu import make_varlen_plan

    lens = [200, 380, 120]
    total = sum(lens)
    cu = jnp.asarray(np.concatenate([[0], np.cumsum(lens)]), jnp.int32)
    # Same totals, different per-sequence split -> must be rejected.
    lens2 = [300, 280, 120]
    cu2 = jnp.asarray(np.concatenate([[0], np.cumsum(lens2)]), jnp.int32)
    ks = jax.random.split(jax.random.PRNGKey(7), 3)
    H, D = 4, 64
    q = jax.random.normal(ks[0], (total, H, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (total, H, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (total, H, D), jnp.bfloat16)
    plan = make_varlen_plan(cu, cu, block_q=512, block_kv=512, causal=True)
    with pytest.raises(AssertionError, match="stale"):
        main_varlen(q, k, v, cu2, cu2, causal=True,
                    block_q=512, block_kv=512, plan=plan)

    # Serving surface: scheduler_metadata built for SHORTER lengths (a
    # previous chunked-prefill step) with identical page counts/totals
    # silently re-plans — output must match the plan-free call.
    page = 512
    qp, k_phd, v_phd, cu_q, seqused, bt = _mk_paged(page=page)
    k_hpd = k_phd.transpose(0, 2, 1, 3)
    v_hpd = v_phd.transpose(0, 2, 1, 3)
    stale_used = seqused - 16  # same pages-per-seq, earlier step
    sm = get_scheduler_metadata(
        batch_size=2, max_seqlen_q=1024, max_seqlen_k=1024,
        num_heads_q=4, num_heads_kv=2, headdim=128,
        cache_seqlens=stale_used, cu_seqlens_q=cu_q, causal=True,
        page_size=page,
    )
    assert sm.plan is not None
    base = flash_attn_varlen_func(
        qp, k_hpd, v_hpd, max_seqlen_q=1024, cu_seqlens_q=cu_q,
        seqused_k=seqused, causal=True, block_table=bt,
        kv_cache_layout="hpd")
    got = flash_attn_varlen_func(
        qp, k_hpd, v_hpd, max_seqlen_q=1024, cu_seqlens_q=cu_q,
        seqused_k=seqused, causal=True, block_table=bt,
        kv_cache_layout="hpd", scheduler_metadata=sm)
    assert jnp.array_equal(base, got)


def test_scheduler_metadata_skips_unconsumable_plans():
    """No host planning pass when no route can consume the plan (small
    pages and quantized pools ride the gather route)."""
    _, _, _, cu_q, seqused, _ = _mk_paged(page=128, npages=16)
    sm = get_scheduler_metadata(
        batch_size=2, max_seqlen_q=1024, max_seqlen_k=1024,
        num_heads_q=4, num_heads_kv=2, headdim=128,
        cache_seqlens=seqused, cu_seqlens_q=cu_q, causal=True,
        page_size=128,
    )
    assert sm.plan is None
    _, _, _, cu_q, seqused, _ = _mk_paged(page=512)
    sm = get_scheduler_metadata(
        batch_size=2, max_seqlen_q=1024, max_seqlen_k=1024,
        num_heads_q=4, num_heads_kv=2, headdim=128,
        cache_seqlens=seqused, cu_seqlens_q=cu_q, causal=True,
        page_size=512, qkv_dtype=jnp.int8,
    )
    assert sm.plan is None
