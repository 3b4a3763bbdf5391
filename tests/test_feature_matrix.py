"""Cross-feature interaction matrix.

The reference crosses dtype x causal x local x alibi x softcap x head-dim
(incl. odd 59/111) x seqlen per test (tests/test_flash_attn.py:586,1907);
kernels break at feature *interactions*, not single features. This sweeps a
curated matrix of interacting combinations for the dense and varlen paths,
fwd and bwd, against the oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attn_tpu import flash_attn_func, flash_attn_varlen_func
from flash_attn_tpu.kernels.common import BlockSizes, default_alibi_slopes
from flash_attn_tpu.utils.testing import attention_ref

BS = BlockSizes(block_q=128, block_kv=128)


def mk(key, b, sq, sk, h, hk, d, dv=None, dtype=jnp.bfloat16):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, sq, h, d), jnp.float32).astype(dtype)
    k = jax.random.normal(kk, (b, sk, hk, d), jnp.float32).astype(dtype)
    v = jax.random.normal(kv, (b, sk, hk, dv or d), jnp.float32).astype(dtype)
    return q, k, v


def check(out, ref, pt, eps=1e-5, factor=2.0):
    err = jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)).max()
    base = jnp.abs(pt.astype(jnp.float32) - ref.astype(jnp.float32)).max()
    assert err <= factor * base + eps, f"err={err} baseline={base}"


# Curated interacting combos: (d, gqa, window, alibi, softcap, causal,
# sq, sk, dtype). Windows are (left, right); -1 = unbounded.
DENSE_MATRIX = [
    # odd head dims x causal x GQA
    (59, 2, (-1, -1), False, 0.0, True, 128, 128, jnp.bfloat16),
    (111, 4, (-1, -1), False, 0.0, True, 192, 192, jnp.bfloat16),
    (160, 1, (-1, -1), False, 0.0, True, 128, 128, jnp.bfloat16),
    # window x GQA x odd-d
    (59, 2, (32, -1), False, 0.0, True, 192, 192, jnp.bfloat16),
    (111, 2, (64, 16), False, 0.0, False, 192, 256, jnp.bfloat16),
    # alibi x GQA x window
    (64, 4, (-1, -1), True, 0.0, True, 192, 192, jnp.bfloat16),
    (64, 2, (48, -1), True, 0.0, True, 192, 192, jnp.bfloat16),
    # softcap x alibi x GQA
    (64, 2, (-1, -1), True, 30.0, True, 128, 128, jnp.bfloat16),
    # softcap x window x odd-d
    (111, 1, (32, 8), False, 15.0, False, 160, 224, jnp.bfloat16),
    # off-tile seqlens (97/1025-style) x causal x GQA
    (64, 2, (-1, -1), False, 0.0, True, 97, 257, jnp.bfloat16),
    (128, 4, (-1, -1), False, 0.0, True, 257, 97, jnp.bfloat16),
    # fp32 dtype x window x GQA
    (64, 2, (32, -1), False, 0.0, True, 128, 128, jnp.float32),
    # cross-attention shapes (sq != sk) x window x alibi
    (64, 1, (64, -1), True, 0.0, True, 128, 320, jnp.bfloat16),
]


@pytest.mark.parametrize(
    "d,gqa,window,alibi,softcap,causal,sq,sk,dtype", DENSE_MATRIX
)
def test_dense_matrix(d, gqa, window, alibi, softcap, causal, sq, sk, dtype):
    h = 4
    hk = h // gqa
    q, k, v = mk(jax.random.PRNGKey(0), 2, sq, sk, h, hk, d, dtype=dtype)
    slopes = default_alibi_slopes(h) if alibi else None
    wref = tuple(w if w >= 0 else None for w in window)

    out = flash_attn_func(
        q, k, v, causal=causal, window_size=window, softcap=softcap,
        alibi_slopes=slopes, block_sizes=BS,
    )
    bias = None
    if alibi:
        ri = jnp.arange(sq)[:, None]
        ci = jnp.arange(sk)[None, :]
        bias = -slopes.reshape(1, h, 1, 1) * jnp.abs(
            (ci - ri + (sq - sk)).astype(jnp.float32)
        )[None, None]
    kw = dict(causal=causal, window_size=wref, softcap=softcap,
              attn_bias=bias)
    ref, _ = attention_ref(q, k, v, **kw)
    pt, _ = attention_ref(q, k, v, upcast=False, reorder_ops=True, **kw)
    check(out, ref, pt)

    if dtype == jnp.bfloat16:
        def lk(q, k, v):
            return jnp.sum(flash_attn_func(
                q, k, v, causal=causal, window_size=window,
                softcap=softcap, alibi_slopes=slopes, block_sizes=BS,
            ).astype(jnp.float32))

        def lo(up, ro):
            def f(q, k, v):
                return jnp.sum(attention_ref(
                    q, k, v, upcast=up, reorder_ops=ro, **kw
                )[0].astype(jnp.float32))
            return f

        gk = jax.grad(lk, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(lo(True, False), argnums=(0, 1, 2))(q, k, v)
        gp = jax.grad(lo(False, True), argnums=(0, 1, 2))(q, k, v)
        for nm, a, r, p in zip(("dq", "dk", "dv"), gk, gr, gp):
            check(a, r, p, eps=1e-4)


VARLEN_MATRIX = [
    # (d, gqa, window, softcap, causal)
    (59, 2, (-1, -1), 0.0, True),
    (64, 4, (48, -1), 0.0, True),
    (111, 1, (-1, -1), 20.0, True),
    (64, 2, (32, 8), 0.0, False),
]


@pytest.mark.parametrize("d,gqa,window,softcap,causal", VARLEN_MATRIX)
def test_varlen_matrix(d, gqa, window, softcap, causal):
    h = 4
    hk = h // gqa
    lens_q = [97, 130, 61]
    lens_k = [97, 190, 61]
    cu_q = jnp.asarray(np.concatenate([[0], np.cumsum(lens_q)]), jnp.int32)
    cu_k = jnp.asarray(np.concatenate([[0], np.cumsum(lens_k)]), jnp.int32)
    tq, tk = int(cu_q[-1]), int(cu_k[-1])
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(ks[0], (tq, h, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (tk, hk, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (tk, hk, d), jnp.bfloat16)
    wref = tuple(w if w >= 0 else None for w in window)

    out = flash_attn_varlen_func(
        q, k, v, cu_q, cu_k, causal=causal, window_size=window,
        softcap=softcap, block_q=128, block_kv=128,
    )
    for i in range(len(lens_q)):
        qs = q[cu_q[i]:cu_q[i + 1]][None]
        kk = k[cu_k[i]:cu_k[i + 1]][None]
        vv = v[cu_k[i]:cu_k[i + 1]][None]
        kw = dict(causal=causal, window_size=wref, softcap=softcap)
        ref, _ = attention_ref(qs, kk, vv, **kw)
        pt, _ = attention_ref(qs, kk, vv, upcast=False, reorder_ops=True,
                              **kw)
        check(out[cu_q[i]:cu_q[i + 1]][None], ref, pt)
