"""Determinism stress tests (reference: tests/test_flash_attn.py:2199
test_flash_attn_race_condition reruns fwd+bwd 250x asserting bitwise
equality; tests/cute/test_flash_attn_race_condition.py). TPU grids are
sequential so there are no shared-memory races by construction — these
tests pin that invariant (and XLA scheduling stability) down. Interpreter
mode is slow, so the CPU suite runs a reduced count; scale ITERS up via
FLASH_ATTN_TPU_STRESS_ITERS on real hardware."""

import os

import jax
import jax.numpy as jnp
import pytest

from flash_attn_tpu import flash_attn_func, flash_attn_with_kvcache
from flash_attn_tpu.kernels.common import BlockSizes

ITERS = int(os.environ.get("FLASH_ATTN_TPU_STRESS_ITERS", "10"))
BS = BlockSizes(128, 128, 128, 128, 128, 128)


def test_fwd_bwd_bitwise_stable():
    key = jax.random.PRNGKey(0)
    kq, kk, kv, kg = jax.random.split(key, 4)
    q = jax.random.normal(kq, (1, 257, 4, 64), jnp.float32).astype(jnp.bfloat16)
    k = jax.random.normal(kk, (1, 257, 4, 64), jnp.float32).astype(jnp.bfloat16)
    v = jax.random.normal(kv, (1, 257, 4, 64), jnp.float32).astype(jnp.bfloat16)
    g = jax.random.normal(kg, q.shape, jnp.float32).astype(jnp.bfloat16)

    @jax.jit
    def fwd_bwd(q, k, v):
        def loss(q, k, v):
            out = flash_attn_func(q, k, v, causal=True, block_sizes=BS)
            return jnp.sum(out.astype(jnp.float32) * g.astype(jnp.float32))

        return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    ref = fwd_bwd(q, k, v)
    for _ in range(ITERS):
        got = fwd_bwd(q, k, v)
        for a, b in zip(ref, got):
            assert jnp.array_equal(a, b)


def test_decode_bitwise_stable():
    key = jax.random.PRNGKey(1)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (2, 1, 4, 64), jnp.float32).astype(jnp.bfloat16)
    kc = jax.random.normal(kk, (2, 512, 4, 64), jnp.float32).astype(jnp.bfloat16)
    vc = jax.random.normal(kv, (2, 512, 4, 64), jnp.float32).astype(jnp.bfloat16)
    lens = jnp.array([389, 211], jnp.int32)

    @jax.jit
    def step(q):
        return flash_attn_with_kvcache(q, kc, vc, cache_seqlens=lens,
                                       causal=True)

    ref = step(q)
    for _ in range(ITERS):
        assert jnp.array_equal(step(q), ref)


def test_sparse_bwd_bitwise_deterministic():
    """New sparse backward kernels: bitwise-identical grads across reruns
    (the reference's race-condition test pattern applied to every new
    kernel; TPU grid-sequential accumulation must be exactly stable)."""
    import numpy as np

    from flash_attn_tpu import sparse_attn_func

    b, h, sq, sk, d = 1, 2, 128, 256, 64
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(b, sq, h, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, sk, h, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, sk, h, d), jnp.float32)
    bc = jnp.ones((b, h, 2), jnp.int32)
    bo = jnp.zeros((b, h, 2, 1), jnp.int32)
    cc = jnp.full((b, h, 2), 40, jnp.int32)
    ci = jnp.broadcast_to(64 + jnp.arange(40, dtype=jnp.int32), (b, h, 2, 40))

    gfn = jax.jit(jax.grad(
        lambda q, k, v: (sparse_attn_func(
            q, k, v, bc, bo, cc, ci, causal=True
        ).astype(jnp.float32) ** 2).sum(),
        argnums=(0, 1, 2),
    ))
    base = gfn(q, k, v)
    for _ in range(10):
        again = gfn(q, k, v)
        for a, bb in zip(base, again):
            assert jnp.array_equal(a, bb)


def test_sparse_gather_bitwise_deterministic():
    """DMA-gather sparse kernel: bitwise-identical outputs across reruns
    (async gather issue/wait ordering must not introduce races)."""
    import numpy as np

    from flash_attn_tpu.kernels.flash_sparse_gather import (
        flash_attention_sparse_gather_fwd,
    )

    b, h, sq, sk, d = 1, 2, 128, 384, 64
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(b, h, sq, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, h, sk, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, h, sk, d), jnp.float32)
    nqb = sq // 64
    bc = jnp.ones((b, h, nqb), jnp.int32)
    bo = jnp.broadcast_to(
        jnp.asarray([64, 192], jnp.int32)[None, None, :nqb, None],
        (b, h, nqb, 1),
    )
    cc = jnp.full((b, h, nqb), 17, jnp.int32)
    ci = jnp.broadcast_to(jnp.arange(17, dtype=jnp.int32), (b, h, nqb, 17))

    fn = jax.jit(lambda q, k, v: flash_attention_sparse_gather_fwd(
        q, k, v, bc, bo, cc, ci, causal=True)[0])
    base = fn(q, k, v)
    for _ in range(10):
        assert jnp.array_equal(fn(q, k, v), base)
