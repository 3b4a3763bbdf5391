"""Chunked (Llama-4-style) attention tests — `attention_chunk`.

Reference semantics: flash_attn/utils/testing.py:195 `construct_chunk_mask`
(bottom-right aligned; query row i attends only to keys inside its own
`attention_chunk`-sized chunk), exposed on the FA3/FA4 surfaces
(flash_attn/flash_attn_triton_amd/interface_v3.py, cute/interface.py).
Covers dense fwd+bwd, varlen fwd+bwd, interaction with sliding windows, and
the kvcache decode path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attn_tpu import (
    flash_attn_func,
    flash_attn_varlen_func,
    flash_attn_with_kvcache,
)
from flash_attn_tpu.kernels.common import BlockSizes
from flash_attn_tpu.utils.testing import attention_ref

BS = BlockSizes(block_q=128, block_kv=128)


def make_qkv(key, b, sq, sk, h, hk, d, dtype=jnp.bfloat16):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, sq, h, d), jnp.float32).astype(dtype)
    k = jax.random.normal(kk, (b, sk, hk, d), jnp.float32).astype(dtype)
    v = jax.random.normal(kv, (b, sk, hk, d), jnp.float32).astype(dtype)
    return q, k, v


def check(out, ref, pt, eps=1e-5, factor=2.0):
    err = jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)).max()
    base = jnp.abs(pt.astype(jnp.float32) - ref.astype(jnp.float32)).max()
    assert err <= factor * base + eps, f"err={err} vs baseline={base}"


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize(
    "sq,sk,chunk",
    [(256, 256, 64), (128, 256, 64), (257, 257, 100), (256, 256, 1024)],
)
def test_chunk_fwd(sq, sk, chunk, causal):
    q, k, v = make_qkv(jax.random.PRNGKey(0), 2, sq, sk, 4, 4, 64)
    out = flash_attn_func(
        q, k, v, causal=causal, attention_chunk=chunk, block_sizes=BS
    )
    ref, _ = attention_ref(q, k, v, causal=causal, attention_chunk=chunk)
    pt, _ = attention_ref(
        q, k, v, causal=causal, attention_chunk=chunk,
        upcast=False, reorder_ops=True,
    )
    check(out, ref, pt)


@pytest.mark.parametrize("chunk", [64, 100])
def test_chunk_bwd(chunk):
    q, k, v = make_qkv(jax.random.PRNGKey(1), 2, 256, 256, 4, 2, 64)

    def loss(f):
        def inner(q, k, v):
            return jnp.sum(f(q, k, v).astype(jnp.float32))
        return inner

    fk = loss(lambda q, k, v: flash_attn_func(
        q, k, v, causal=True, attention_chunk=chunk, block_sizes=BS))
    fr = loss(lambda q, k, v: attention_ref(
        q, k, v, causal=True, attention_chunk=chunk)[0])
    fp = loss(lambda q, k, v: attention_ref(
        q, k, v, causal=True, attention_chunk=chunk,
        upcast=False, reorder_ops=True)[0])
    gk = jax.grad(fk, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(fr, argnums=(0, 1, 2))(q, k, v)
    gp = jax.grad(fp, argnums=(0, 1, 2))(q, k, v)
    for a, r, p in zip(gk, gr, gp):
        check(a, r, p, eps=1e-4)


def test_chunk_with_window():
    """attention_chunk composes with a sliding window (masks AND)."""
    q, k, v = make_qkv(jax.random.PRNGKey(2), 2, 256, 256, 4, 4, 64)
    out = flash_attn_func(
        q, k, v, causal=True, window_size=(48, -1), attention_chunk=64,
        block_sizes=BS,
    )
    ref, _ = attention_ref(
        q, k, v, causal=True, window_size=(48, None), attention_chunk=64
    )
    pt, _ = attention_ref(
        q, k, v, causal=True, window_size=(48, None), attention_chunk=64,
        upcast=False, reorder_ops=True,
    )
    check(out, ref, pt)


@pytest.mark.parametrize("chunk", [64, 50])
def test_chunk_varlen(chunk):
    lens_q = [97, 128, 63]
    lens_k = [97, 200, 63]
    h, d = 4, 64
    cu_q = jnp.asarray(np.concatenate([[0], np.cumsum(lens_q)]), jnp.int32)
    cu_k = jnp.asarray(np.concatenate([[0], np.cumsum(lens_k)]), jnp.int32)
    key = jax.random.PRNGKey(3)
    ks = jax.random.split(key, 3)
    tq, tk = int(cu_q[-1]), int(cu_k[-1])
    q = jax.random.normal(ks[0], (tq, h, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (tk, h, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (tk, h, d), jnp.bfloat16)
    out = flash_attn_varlen_func(
        q, k, v, cu_q, cu_k, causal=True, attention_chunk=chunk,
        block_q=128, block_kv=128,
    )

    def g(q, k, v):
        return jnp.sum(flash_attn_varlen_func(
            q, k, v, cu_q, cu_k, causal=True, attention_chunk=chunk,
            block_q=128, block_kv=128,
        ).astype(jnp.float32))

    gq, gkk, gv = jax.grad(g, argnums=(0, 1, 2))(q, k, v)

    for i in range(len(lens_q)):
        qs = q[cu_q[i]:cu_q[i + 1]][None]
        kk = k[cu_k[i]:cu_k[i + 1]][None]
        vv = v[cu_k[i]:cu_k[i + 1]][None]
        ref, _ = attention_ref(qs, kk, vv, causal=True, attention_chunk=chunk)
        pt, _ = attention_ref(
            qs, kk, vv, causal=True, attention_chunk=chunk,
            upcast=False, reorder_ops=True,
        )
        check(out[cu_q[i]:cu_q[i + 1]][None], ref, pt)

        def gr(qs, kk, vv):
            return jnp.sum(attention_ref(
                qs, kk, vv, causal=True, attention_chunk=chunk
            )[0].astype(jnp.float32))

        def gp(qs, kk, vv):
            return jnp.sum(attention_ref(
                qs, kk, vv, causal=True, attention_chunk=chunk,
                upcast=False, reorder_ops=True,
            )[0].astype(jnp.float32))

        grads_r = jax.grad(gr, argnums=(0, 1, 2))(qs, kk, vv)
        grads_p = jax.grad(gp, argnums=(0, 1, 2))(qs, kk, vv)
        got = (
            gq[cu_q[i]:cu_q[i + 1]][None],
            gkk[cu_k[i]:cu_k[i + 1]][None],
            gv[cu_k[i]:cu_k[i + 1]][None],
        )
        for a, r, p in zip(got, grads_r, grads_p):
            check(a, r, p, eps=1e-4)


@pytest.mark.parametrize("paged", [False, True])
@pytest.mark.parametrize("chunk", [64, 100])
def test_chunk_kvcache_decode(chunk, paged):
    """Decode with attention_chunk: each new token sees only its own chunk
    (the Llama-4 serving path through mha_fwd_kvcache)."""
    b, sq, h, d = 2, 3, 4, 64
    smax = 256
    key = jax.random.PRNGKey(4)
    ks = jax.random.split(key, 3)
    q = jax.random.normal(ks[0], (b, sq, h, d), jnp.bfloat16)
    kc = jax.random.normal(ks[1], (b, smax, h, d), jnp.bfloat16)
    vc = jax.random.normal(ks[2], (b, smax, h, d), jnp.bfloat16)
    seqlens = jnp.asarray([200, 131], jnp.int32)

    if paged:
        page = 64
        npages_per_seq = smax // page
        kp = kc.reshape(b * npages_per_seq, page, h, d)
        vp = vc.reshape(b * npages_per_seq, page, h, d)
        table = jnp.arange(b * npages_per_seq, dtype=jnp.int32).reshape(
            b, npages_per_seq
        )
        out = flash_attn_with_kvcache(
            q, kp, vp, cache_seqlens=seqlens, block_table=table,
            causal=True, attention_chunk=chunk,
        )
    else:
        out = flash_attn_with_kvcache(
            q, kc, vc, cache_seqlens=seqlens, causal=True,
            attention_chunk=chunk,
        )

    for i in range(b):
        sk = int(seqlens[i])
        ref, _ = attention_ref(
            q[i:i + 1], kc[i:i + 1, :sk], vc[i:i + 1, :sk],
            causal=True, attention_chunk=chunk,
        )
        pt, _ = attention_ref(
            q[i:i + 1], kc[i:i + 1, :sk], vc[i:i + 1, :sk],
            causal=True, attention_chunk=chunk,
            upcast=False, reorder_ops=True,
        )
        check(out[i:i + 1], ref, pt)
