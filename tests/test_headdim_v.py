"""Unequal QK/V head dims (reference hdimdiff kernel variants,
hopper/generate_kernels.py: hdim 192->128, 64->512; MLA decode
hopper/benchmark_mla_decode.py: d_qk=576 = 512 latent + 64 rope, d_v=512,
MQA over one latent KV head)."""

import jax
import jax.numpy as jnp
import pytest

from flash_attn_tpu import flash_attn_func, flash_attn_with_kvcache
from flash_attn_tpu.kernels.common import BlockSizes
from flash_attn_tpu.utils.testing import attention_ref

BS = BlockSizes(128, 128, 128, 128, 128, 128)


def make(key, b, sq, sk, h, hk, d, dv, dtype=jnp.bfloat16):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, sq, h, d), jnp.float32).astype(dtype)
    k = jax.random.normal(kk, (b, sk, hk, d), jnp.float32).astype(dtype)
    v = jax.random.normal(kv, (b, sk, hk, dv), jnp.float32).astype(dtype)
    return q, k, v


@pytest.mark.parametrize("d,dv", [(192, 128), (64, 128)])
def test_hdimdiff_fwd(d, dv):
    q, k, v = make(jax.random.PRNGKey(0), 1, 130, 130, 2, 2, d, dv)
    out = flash_attn_func(q, k, v, causal=True, block_sizes=BS)
    assert out.shape == (1, 130, 2, dv)
    ref, _ = attention_ref(q, k, v, causal=True)
    pt, _ = attention_ref(q, k, v, causal=True, upcast=False, reorder_ops=True)
    err = jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)).max()
    base = jnp.abs(pt.astype(jnp.float32) - ref.astype(jnp.float32)).max()
    assert err <= 2 * base + 1e-5


def test_hdimdiff_bwd():
    d, dv = 192, 128
    q, k, v = make(jax.random.PRNGKey(1), 1, 128, 128, 2, 2, d, dv)
    g = jax.random.normal(jax.random.PRNGKey(2), (1, 128, 2, dv), jnp.float32
                          ).astype(jnp.bfloat16)

    def loss(q, k, v, fn):
        return jnp.sum(fn(q, k, v).astype(jnp.float32) * g.astype(jnp.float32))

    ga = jax.grad(lambda *a: loss(*a, lambda q, k, v: flash_attn_func(
        q, k, v, causal=True, block_sizes=BS)), argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(lambda *a: loss(*a, lambda q, k, v: attention_ref(
        q, k, v, causal=True)[0]), argnums=(0, 1, 2))(q, k, v)
    gp = jax.grad(lambda *a: loss(*a, lambda q, k, v: attention_ref(
        q, k, v, causal=True, upcast=False, reorder_ops=True)[0]),
        argnums=(0, 1, 2))(q, k, v)
    for name, a, r, p in zip(("dq", "dk", "dv"), ga, gr, gp):
        err = jnp.abs(a.astype(jnp.float32) - r.astype(jnp.float32)).max()
        base = jnp.abs(p.astype(jnp.float32) - r.astype(jnp.float32)).max()
        assert err <= 2 * base + 1e-4, (name, err, base)


def test_mla_decode():
    """MLA-shaped decode: 8 query heads, ONE latent KV head, d_qk=576,
    d_v=512 — the PackGQA path folds all 8 heads into one matmul tile."""
    b, smax, h, d, dv = 2, 256, 8, 576, 512
    key = jax.random.PRNGKey(3)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, 1, h, d), jnp.float32).astype(jnp.bfloat16)
    kc = jax.random.normal(kk, (b, smax, 1, d), jnp.float32).astype(jnp.bfloat16)
    vc = jax.random.normal(kv, (b, smax, 1, dv), jnp.float32).astype(jnp.bfloat16)
    seqlens = jnp.array([200, 117], jnp.int32)
    out = flash_attn_with_kvcache(q, kc, vc, cache_seqlens=seqlens, causal=True)
    assert out.shape == (b, 1, h, dv)
    kpm = jnp.arange(smax)[None, :] < seqlens[:, None]
    ref, _ = attention_ref(q, kc, vc, key_padding_mask=kpm)
    pt, _ = attention_ref(q, kc, vc, key_padding_mask=kpm, upcast=False,
                          reorder_ops=True)
    err = jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)).max()
    base = jnp.abs(pt.astype(jnp.float32) - ref.astype(jnp.float32)).max()
    assert err <= 2 * base + 1e-5
