"""KV-cache decode tests (reference: tests/test_flash_attn.py::test_flash_attn_kvcache
:1907, hopper/test_kvcache.py): contiguous + paged caches, append, rotary,
per-batch lengths, leftpad, batch indirection, and the LSE combine."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attn_tpu import flash_attn_func, flash_attn_with_kvcache
from flash_attn_tpu.kernels.flash_decode import combine_partials, flash_attention_decode
from flash_attn_tpu.ops.rotary import apply_rotary_emb
from flash_attn_tpu.utils.testing import attention_ref


def check(out, ref, pt, eps=1e-5, factor=2.0):
    err = jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)).max()
    pt_err = jnp.abs(pt.astype(jnp.float32) - ref.astype(jnp.float32)).max()
    assert err <= factor * pt_err + eps, f"err={err} vs baseline={pt_err}"


def make_cache(key, b, smax, hk, d, dtype=jnp.bfloat16):
    kk, kv = jax.random.split(key)
    kc = jax.random.normal(kk, (b, smax, hk, d), jnp.float32).astype(dtype)
    vc = jax.random.normal(kv, (b, smax, hk, d), jnp.float32).astype(dtype)
    return kc, vc


def ref_decode(q, kc, vc, seqlens, causal=True, window=(None, None), **kw):
    b, smax = kc.shape[0], kc.shape[1]
    kpm = jnp.arange(smax)[None, :] < seqlens[:, None]
    ref, _ = attention_ref(q, kc, vc, key_padding_mask=kpm, causal=causal,
                           window_size=window, **kw)
    pt, _ = attention_ref(q, kc, vc, key_padding_mask=kpm, causal=causal,
                          window_size=window, upcast=False, reorder_ops=True, **kw)
    return ref, pt


@pytest.mark.parametrize("hk,h", [(4, 4), (2, 8)])
@pytest.mark.parametrize("sq", [1, 4])
def test_kvcache_decode(sq, hk, h):
    b, smax, d = 2, 512, 64
    key = jax.random.PRNGKey(0)
    kq, kc_key = jax.random.split(key)
    q = jax.random.normal(kq, (b, sq, h, d), jnp.float32).astype(jnp.bfloat16)
    kc, vc = make_cache(kc_key, b, smax, hk, d)
    seqlens = jnp.array([317, 128], jnp.int32)

    out = flash_attn_with_kvcache(q, kc, vc, cache_seqlens=seqlens, causal=True)
    ref, pt = ref_decode(q, kc, vc, seqlens)
    check(out, ref, pt)


def test_kvcache_append_and_rotary():
    b, smax, h, d, snew = 2, 256, 4, 64, 3
    key = jax.random.PRNGKey(1)
    kq, kc_key, kn_key = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, snew, h, d), jnp.float32).astype(jnp.bfloat16)
    kc, vc = make_cache(kc_key, b, smax, h, d)
    k_new = jax.random.normal(kn_key, (b, snew, h, d), jnp.float32).astype(jnp.bfloat16)
    v_new = jax.random.normal(
        jax.random.split(kn_key)[0], (b, snew, h, d), jnp.float32
    ).astype(jnp.bfloat16)
    seqlens = jnp.array([100, 57], jnp.int32)
    inv = 1.0 / (10000 ** (jnp.arange(0, d, 2) / d))
    t = jnp.arange(smax)[:, None] * inv[None, :]
    cos, sin = jnp.cos(t), jnp.sin(t)

    out, (kc2, vc2) = flash_attn_with_kvcache(
        q, kc, vc, k_new, v_new, rotary_cos=cos, rotary_sin=sin,
        cache_seqlens=seqlens, causal=True,
    )

    # Build the reference: rotate q/k_new at their absolute positions, place
    # into the cache, run masked attention with per-batch total lengths.
    q_rot = apply_rotary_emb(q, cos, sin, seqlen_offsets=seqlens)
    k_rot = apply_rotary_emb(k_new, cos, sin, seqlen_offsets=seqlens)
    kc_ref, vc_ref = kc, vc
    for i in range(b):
        kc_ref = jax.lax.dynamic_update_slice(
            kc_ref, k_rot[i : i + 1], (i, int(seqlens[i]), 0, 0)
        )
        vc_ref = jax.lax.dynamic_update_slice(
            vc_ref, v_new[i : i + 1], (i, int(seqlens[i]), 0, 0)
        )
    total = seqlens + snew
    ref, pt = ref_decode(q_rot, kc_ref, vc_ref, total)
    check(out, ref, pt)
    # Cache contents must match the manual update.
    assert jnp.array_equal(kc2, kc_ref)
    assert jnp.array_equal(vc2, vc_ref)


def test_kvcache_paged_matches_contiguous():
    b, smax, h, d, page = 2, 512, 4, 64, 128
    key = jax.random.PRNGKey(2)
    kq, kc_key = jax.random.split(key)
    q = jax.random.normal(kq, (b, 1, h, d), jnp.float32).astype(jnp.bfloat16)
    kc, vc = make_cache(kc_key, b, smax, h, d)
    seqlens = jnp.array([389, 233], jnp.int32)

    out_ref = flash_attn_with_kvcache(q, kc, vc, cache_seqlens=seqlens, causal=True)

    # Scatter the same cache into pages with a shuffled block table.
    npages_per = smax // page
    rng = np.random.RandomState(0)
    table = rng.permutation(b * npages_per).reshape(b, npages_per).astype(np.int32)
    k_pages = jnp.zeros((b * npages_per, page, h, d), jnp.bfloat16)
    v_pages = jnp.zeros((b * npages_per, page, h, d), jnp.bfloat16)
    for i in range(b):
        for p in range(npages_per):
            k_pages = k_pages.at[table[i, p]].set(kc[i, p * page : (p + 1) * page])
            v_pages = v_pages.at[table[i, p]].set(vc[i, p * page : (p + 1) * page])

    out_paged = flash_attn_with_kvcache(
        q, k_pages, v_pages, cache_seqlens=seqlens,
        block_table=jnp.asarray(table), causal=True,
    )
    assert jnp.abs(
        out_paged.astype(jnp.float32) - out_ref.astype(jnp.float32)
    ).max() < 1e-3


def test_kvcache_window():
    b, smax, h, d = 1, 512, 2, 64
    key = jax.random.PRNGKey(3)
    kq, kc_key = jax.random.split(key)
    q = jax.random.normal(kq, (b, 1, h, d), jnp.float32).astype(jnp.bfloat16)
    kc, vc = make_cache(kc_key, b, smax, h, d)
    seqlens = jnp.array([400], jnp.int32)
    out = flash_attn_with_kvcache(
        q, kc, vc, cache_seqlens=seqlens, causal=True, window_size=(100, 0)
    )
    ref, pt = ref_decode(q, kc, vc, seqlens, window=(100, 0))
    check(out, ref, pt)


def test_kvcache_leftpad():
    b, smax, h, d = 2, 256, 2, 64
    key = jax.random.PRNGKey(4)
    kq, kc_key = jax.random.split(key)
    q = jax.random.normal(kq, (b, 1, h, d), jnp.float32).astype(jnp.bfloat16)
    kc, vc = make_cache(kc_key, b, smax, h, d)
    seqlens = jnp.array([200, 150], jnp.int32)
    leftpad = jnp.array([16, 0], jnp.int32)
    out = flash_attn_with_kvcache(
        q, kc, vc, cache_seqlens=seqlens, cache_leftpad=leftpad, causal=True
    )
    # Reference: zero out the left-padded region via key padding mask.
    valid = (jnp.arange(smax)[None, :] < seqlens[:, None]) & (
        jnp.arange(smax)[None, :] >= leftpad[:, None]
    )
    ref, _ = attention_ref(q, kc, vc, key_padding_mask=valid)
    pt, _ = attention_ref(q, kc, vc, key_padding_mask=valid, upcast=False,
                          reorder_ops=True)
    check(out, ref, pt)


def test_kvcache_batch_idx():
    b_cache, b, smax, h, d = 4, 2, 256, 2, 64
    key = jax.random.PRNGKey(5)
    kq, kc_key = jax.random.split(key)
    q = jax.random.normal(kq, (b, 1, h, d), jnp.float32).astype(jnp.bfloat16)
    kc, vc = make_cache(kc_key, b_cache, smax, h, d)
    seqlens = jnp.array([100, 200], jnp.int32)
    bidx = jnp.array([3, 1], jnp.int32)
    out = flash_attn_with_kvcache(
        q, kc, vc, cache_seqlens=seqlens, cache_batch_idx=bidx, causal=True
    )
    ref, pt = ref_decode(q, kc[bidx], vc[bidx], seqlens)
    check(out, ref, pt)


def test_kvcache_sink():
    b, smax, h, d = 1, 256, 2, 64
    key = jax.random.PRNGKey(6)
    kq, kc_key, ks = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, 1, h, d), jnp.float32).astype(jnp.bfloat16)
    kc, vc = make_cache(kc_key, b, smax, h, d)
    sink = jax.random.normal(ks, (h,), jnp.float32)
    seqlens = jnp.array([200], jnp.int32)
    out = flash_attn_with_kvcache(
        q, kc, vc, cache_seqlens=seqlens, causal=True, sink=sink
    )
    kpm = jnp.arange(smax)[None, :] < seqlens[:, None]
    ref, _ = attention_ref(q, kc, vc, key_padding_mask=kpm, learnable_sink=sink)
    pt, _ = attention_ref(q, kc, vc, key_padding_mask=kpm, learnable_sink=sink,
                          upcast=False, reorder_ops=True)
    check(out, ref, pt)


def test_combine_partials():
    """Splitting KV and LSE-merging must equal unsplit attention
    (the reference combine kernel contract, flash_fwd_combine_kernel.h:26)."""
    b, s, h, d = 1, 256, 2, 64
    key = jax.random.PRNGKey(7)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, s, h, d), jnp.float32).astype(jnp.bfloat16)
    k = jax.random.normal(kk, (b, s, h, d), jnp.float32).astype(jnp.bfloat16)
    v = jax.random.normal(kv, (b, s, h, d), jnp.float32).astype(jnp.bfloat16)

    out_full, lse_full, _ = flash_attn_func(q, k, v, return_attn_probs=True)

    half = s // 2
    o1, l1, _ = flash_attn_func(q, k[:, :half], v[:, :half], return_attn_probs=True)
    o2, l2, _ = flash_attn_func(q, k[:, half:], v[:, half:], return_attn_probs=True)
    o_parts = jnp.stack(
        [o1.astype(jnp.float32).transpose(0, 2, 1, 3),
         o2.astype(jnp.float32).transpose(0, 2, 1, 3)]
    )  # (2, b, h, s, d)
    lse_parts = jnp.stack([l1, l2])  # (2, b, h, s)
    o, lse = combine_partials(o_parts, lse_parts)
    o = o.transpose(0, 2, 1, 3)
    assert jnp.abs(o - out_full.astype(jnp.float32)).max() < 2e-2
    assert jnp.abs(lse - lse_full).max() < 1e-3


def test_decode_native_layout_lse():
    """Native-layout decode entry point: LSE must match the dense kernel."""
    b, smax, h, d = 1, 256, 2, 64
    key = jax.random.PRNGKey(8)
    kq, kc_key = jax.random.split(key)
    q = jax.random.normal(kq, (b, 1, h, d), jnp.float32).astype(jnp.bfloat16)
    kc, vc = make_cache(kc_key, b, smax, h, d)
    seqlens = jnp.array([256], jnp.int32)
    out, lse = flash_attention_decode(
        q, kc.transpose(0, 2, 1, 3), vc.transpose(0, 2, 1, 3), seqlens
    )
    out2, lse2, _ = flash_attn_func(q, kc, vc, causal=True, return_attn_probs=True)
    assert jnp.abs(
        out.astype(jnp.float32) - out2[:, -1:].astype(jnp.float32)
    ).max() < 2e-2
    assert jnp.abs(lse[:, :, 0] - lse2[:, :, -1]).max() < 1e-3


@pytest.mark.parametrize("page", [16, 64])
def test_kvcache_small_pages_multipage_kernel(page):
    """Small pages dispatch to the multi-page DMA-pipeline kernel
    (kernels/flash_decode_multipage.py) and must match the oracle."""
    b, smax, h, d = 2, 256, 4, 64
    key = jax.random.PRNGKey(11)
    kq, kc_key = jax.random.split(key)
    q = jax.random.normal(kq, (b, 1, h, d), jnp.float32).astype(jnp.bfloat16)
    kc, vc = make_cache(kc_key, b, smax, h, d)
    seqlens = jnp.array([200, 117], jnp.int32)

    npages_per = smax // page
    rng = np.random.RandomState(3)
    table = rng.permutation(b * npages_per).reshape(b, npages_per).astype(np.int32)
    k_pages = jnp.zeros((b * npages_per, page, h, d), jnp.bfloat16)
    v_pages = jnp.zeros((b * npages_per, page, h, d), jnp.bfloat16)
    for i in range(b):
        for p in range(npages_per):
            k_pages = k_pages.at[table[i, p]].set(kc[i, p * page : (p + 1) * page])
            v_pages = v_pages.at[table[i, p]].set(vc[i, p * page : (p + 1) * page])

    out = flash_attn_with_kvcache(
        q, k_pages, v_pages, cache_seqlens=seqlens,
        block_table=jnp.asarray(table), causal=True,
    )
    ref, pt = ref_decode(q, kc, vc, seqlens)
    check(out, ref, pt)


def alibi_decode_bias(slopes, seqlens, sq, smax, b, h):
    """ALiBi bias for decode: row i sits at absolute position
    seqlens_b - sq + i; bias = -slope * |col - pos|."""
    slopes = jnp.asarray(slopes, jnp.float32)
    if slopes.ndim == 1:
        slopes = jnp.broadcast_to(slopes[None], (b, h))
    pos = seqlens[:, None] - sq + jnp.arange(sq)[None, :]  # (b, sq)
    rel = jnp.abs(
        jnp.arange(smax)[None, None, :] - pos[:, :, None]
    ).astype(jnp.float32)  # (b, sq, sk)
    return -slopes[:, :, None, None] * rel[:, None, :, :]


@pytest.mark.parametrize("hk,h", [(4, 4), (2, 8)])
def test_kvcache_alibi_gqa(hk, h):
    """ALiBi in decode for any GQA packing (reference mha_fwd_kvcache
    supports alibi unconditionally, csrc/flash_attn/flash_api.cpp:375,1309)."""
    b, smax, d, sq = 2, 512, 64, 3
    key = jax.random.PRNGKey(40)
    kq, kc_key = jax.random.split(key)
    q = jax.random.normal(kq, (b, sq, h, d), jnp.float32).astype(jnp.bfloat16)
    kc, vc = make_cache(kc_key, b, smax, hk, d)
    seqlens = jnp.array([317, 128], jnp.int32)
    slopes = 2.0 ** (-8.0 * (jnp.arange(h, dtype=jnp.float32) + 1) / h)

    out = flash_attn_with_kvcache(
        q, kc, vc, cache_seqlens=seqlens, causal=True, alibi_slopes=slopes
    )
    bias = alibi_decode_bias(slopes, seqlens, sq, smax, b, h)
    ref, pt = ref_decode(q, kc, vc, seqlens, attn_bias=bias)
    check(out, ref, pt)


def test_kvcache_alibi_gqa_batched_slopes():
    b, smax, h, hk, d, sq = 2, 384, 8, 2, 64, 1
    key = jax.random.PRNGKey(41)
    kq, kc_key, ks = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, sq, h, d), jnp.float32).astype(jnp.bfloat16)
    kc, vc = make_cache(kc_key, b, smax, hk, d)
    seqlens = jnp.array([220, 97], jnp.int32)
    slopes = jax.random.uniform(ks, (b, h), jnp.float32, 0.01, 0.2)

    out = flash_attn_with_kvcache(
        q, kc, vc, cache_seqlens=seqlens, causal=True, alibi_slopes=slopes
    )
    bias = alibi_decode_bias(slopes, seqlens, sq, smax, b, h)
    ref, pt = ref_decode(q, kc, vc, seqlens, attn_bias=bias)
    check(out, ref, pt)


@pytest.mark.parametrize("d,dv", [(64, 64), (128, 128), (48, 80)])
def test_fused_kv_pool_parity(d, dv):
    """Fused K|V page pool (one gather DMA per page; K at [:, :d], V at
    [:, Kpad:Kpad+dv], sections lane-padded) must match the split pools
    bitwise through both the update path and the multipage decode kernel."""
    from flash_attn_tpu.kernels.flash_decode_multipage import (
        flash_attention_decode_multipage,
    )
    from flash_attn_tpu.runtime.kv_cache import (
        allocate_fused_paged_kv_cache,
        allocate_paged_kv_cache,
        update_fused_paged_kv_cache,
        update_paged_kv_cache,
    )

    b, h, hk, page, npages = 2, 4, 2, 16, 16
    keys = jax.random.split(jax.random.PRNGKey(3), 4)
    k_pages, _ = allocate_paged_kv_cache(npages, page, hk, d)
    _, v_pages = allocate_paged_kv_cache(npages, page, hk, dv)
    kv_pages = allocate_fused_paged_kv_cache(npages, page, hk, d, dv)
    table = jax.random.permutation(keys[0], npages).astype(jnp.int32)
    table = table.reshape(b, -1)
    seqlens = jnp.array([37, 5], jnp.int32)
    snew = 3
    k_new = jax.random.normal(keys[1], (b, snew, hk, d), jnp.bfloat16)
    v_new = jax.random.normal(keys[2], (b, snew, hk, dv), jnp.bfloat16)
    k_pages, v_pages = update_paged_kv_cache(
        k_pages, v_pages, k_new, v_new, seqlens, table)
    kv_pages = update_fused_paged_kv_cache(
        kv_pages, k_new, v_new, seqlens, table)

    q = jax.random.normal(keys[3], (b, 1, h, d), jnp.bfloat16)
    total = seqlens + snew
    o1, l1 = flash_attention_decode_multipage(
        q, k_pages, v_pages, total, table)
    o2, l2 = flash_attention_decode_multipage(
        q, kv_pages, None, total, table, fused_kv_dim=d, fused_kv_dim_v=dv)
    assert jnp.array_equal(o1, o2)
    assert jnp.array_equal(l1, l2)


def test_fused_kv_pool_mla_qv_parity():
    """Fused rope|latent pool with MLA absorbed qv scores: the fused
    multipage decode must match the split-pool call bitwise (rope d=64
    pads to 128 inside the pool; latent d_v=256; S = Q K^T + Qv V^T)."""
    from flash_attn_tpu.kernels.flash_decode_multipage import (
        flash_attention_decode_multipage,
    )

    b, h, page, npages, d, dv = 2, 4, 16, 16, 64, 256
    keys = jax.random.split(jax.random.PRNGKey(5), 5)
    q = jax.random.normal(keys[0], (b, 1, h, d), jnp.bfloat16)
    qv = jax.random.normal(keys[1], (b, 1, h, dv), jnp.bfloat16)
    kr = jax.random.normal(keys[2], (npages, 1, page, d), jnp.bfloat16)
    c = jax.random.normal(keys[3], (npages, 1, page, dv), jnp.bfloat16)
    kr_pad = jnp.pad(kr, ((0, 0), (0, 0), (0, 0), (0, 128 - d)))
    fusedp = jnp.concatenate([kr_pad, c], axis=-1)
    table = jax.random.permutation(keys[4], npages).astype(jnp.int32)
    table = table.reshape(b, -1)
    seqlens = jnp.array([97, 33], jnp.int32)
    o1, l1 = flash_attention_decode_multipage(q, kr, c, seqlens, table, qv=qv)
    o2, l2 = flash_attention_decode_multipage(
        q, fusedp, None, seqlens, table, qv=qv,
        fused_kv_dim=d, fused_kv_dim_v=dv)
    assert jnp.array_equal(o1, o2)
    assert jnp.array_equal(l1, l2)


def test_multipage_row_blocking_large_chunk():
    """Prefill-sized queries (rows = sq*group large enough to exceed the
    VMEM row budget) split over the row-block grid dim; each row block
    re-streams the KV. Cross-kernel check against the contiguous-cache
    decode path on the gathered pages."""
    from flash_attn_tpu.kernels.flash_decode import flash_attention_decode
    from flash_attn_tpu.kernels.flash_decode_multipage import (
        flash_attention_decode_multipage,
    )

    b, h, hk, d, page, smax, sq = 1, 8, 2, 64, 64, 256, 512
    keys = jax.random.split(jax.random.PRNGKey(11), 4)
    q = jax.random.normal(keys[0], (b, sq, h, d), jnp.bfloat16)
    npages = smax // page
    k_pages = jax.random.normal(keys[1], (npages, hk, page, d), jnp.bfloat16)
    v_pages = jax.random.normal(keys[2], (npages, hk, page, d), jnp.bfloat16)
    table = jax.random.permutation(keys[3], npages).astype(jnp.int32)
    table = table.reshape(b, -1)
    # Query longer than the cache is the chunked-prefill shape: token t
    # attends to positions <= seqlen - sq + t (negative -> nothing).
    seqlens = jnp.array([smax], jnp.int32)
    out, lse = flash_attention_decode_multipage(
        q, k_pages, v_pages, seqlens, table)
    gathered_k = k_pages[table[0]].transpose(1, 0, 2, 3).reshape(
        1, hk, smax, d)
    gathered_v = v_pages[table[0]].transpose(1, 0, 2, 3).reshape(
        1, hk, smax, d)
    ref, ref_lse = flash_attention_decode(
        q, gathered_k, gathered_v, seqlens)
    valid = smax  # rows beyond the cache-backed span still defined
    err = jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)).max()
    assert err < 2e-2, float(err)
