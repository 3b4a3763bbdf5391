"""Exact dropout-mask verification (the reference `S_dmask` contract).

The reference returns the dropout pattern and checks it element-exactly plus
its keep fraction (tests/test_flash_attn.py:586 dropout_fraction checks).
Our kernel's keep-mask is a pure function of (seed, batch, head, absolute
row, absolute col) — `_dropout_keep_mask` — so the test regenerates the
exact mask host-side, feeds it to the oracle as `dropout_mask`, and demands
oracle-level agreement of outputs AND gradients (stronger than a
statistical-mean check).
"""

import jax
import jax.numpy as jnp
import pytest

from flash_attn_tpu import flash_attn_func
from flash_attn_tpu.kernels.common import BlockSizes
from flash_attn_tpu.kernels.flash_fwd import _dropout_keep_mask
from flash_attn_tpu.utils.testing import attention_ref

BS = BlockSizes(block_q=128, block_kv=128)


def host_keep_mask(seed, b, h, sq, sk, p):
    """Evaluate the kernel's PRNG on the full grid, outside any kernel."""
    seed_ref = jnp.asarray(seed, jnp.int32).reshape(1, 1)
    return jnp.stack([
        jnp.stack([
            _dropout_keep_mask(seed_ref, bi, hi, 0, 0, (sq, sk), 1.0 - p)
            for hi in range(h)
        ])
        for bi in range(b)
    ])  # (b, h, sq, sk) bool


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("p", [0.17, 0.5])
def test_dropout_exact_mask(p, causal):
    b, sq, sk, h, d = 2, 192, 192, 3, 64
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    q = jax.random.normal(ks[0], (b, sq, h, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, sk, h, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, sk, h, d), jnp.bfloat16)
    seed = jnp.int32(42)

    keep = host_keep_mask(seed, b, h, sq, sk, p)
    # Keep fraction matches p (the reference's dropout_fraction check).
    frac = 1.0 - float(keep.mean())
    assert abs(frac - p) < 0.02, f"dropout fraction {frac} vs p={p}"

    out = flash_attn_func(
        q, k, v, dropout_p=p, causal=causal, dropout_seed=seed,
        block_sizes=BS,
    )
    ref, _ = attention_ref(
        q, k, v, causal=causal, dropout_p=p, dropout_mask=keep
    )
    pt, _ = attention_ref(
        q, k, v, causal=causal, dropout_p=p, dropout_mask=keep,
        upcast=False, reorder_ops=True,
    )
    err = jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)).max()
    base = jnp.abs(pt.astype(jnp.float32) - ref.astype(jnp.float32)).max()
    assert err <= 2 * base + 1e-4, f"err={err} base={base}"


def test_dropout_exact_grads():
    """fwd/bwd mask-regeneration contract: grads match the oracle run with
    the regenerated mask (not merely deterministic)."""
    p = 0.3
    b, s, h, d = 2, 192, 3, 64
    ks = jax.random.split(jax.random.PRNGKey(4), 3)
    q = jax.random.normal(ks[0], (b, s, h, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, s, h, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, s, h, d), jnp.bfloat16)
    seed = jnp.int32(7)
    keep = host_keep_mask(seed, b, h, s, s, p)

    def lk(q, k, v):
        return jnp.sum(flash_attn_func(
            q, k, v, dropout_p=p, causal=True, dropout_seed=seed,
            block_sizes=BS,
        ).astype(jnp.float32))

    def lr(q, k, v):
        return jnp.sum(attention_ref(
            q, k, v, causal=True, dropout_p=p, dropout_mask=keep
        )[0].astype(jnp.float32))

    def lp(q, k, v):
        return jnp.sum(attention_ref(
            q, k, v, causal=True, dropout_p=p, dropout_mask=keep,
            upcast=False, reorder_ops=True,
        )[0].astype(jnp.float32))

    gk = jax.grad(lk, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(lr, argnums=(0, 1, 2))(q, k, v)
    gp = jax.grad(lp, argnums=(0, 1, 2))(q, k, v)
    for nm, a, r, pt_ in zip(("dq", "dk", "dv"), gk, gr, gp):
        err = jnp.abs(a.astype(jnp.float32) - r.astype(jnp.float32)).max()
        base = jnp.abs(pt_.astype(jnp.float32) - r.astype(jnp.float32)).max()
        assert err <= 2 * base + 1e-4, f"{nm}: err={err} base={base}"


def test_dropout_tiling_independent():
    """The mask is keyed on absolute coordinates, so every tiling applies
    the identical pattern: outputs under different block sizes both match
    the oracle run with the regenerated mask (accumulation-order rounding
    differs, so bitwise equality is not expected — mask identity is)."""
    p = 0.25
    b, s, h, d = 1, 256, 2, 64
    ks = jax.random.split(jax.random.PRNGKey(5), 3)
    q = jax.random.normal(ks[0], (b, s, h, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, s, h, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, s, h, d), jnp.bfloat16)
    seed = jnp.int32(11)
    keep = host_keep_mask(seed, b, h, s, s, p)
    ref, _ = attention_ref(q, k, v, dropout_p=p, dropout_mask=keep)
    pt, _ = attention_ref(
        q, k, v, dropout_p=p, dropout_mask=keep,
        upcast=False, reorder_ops=True,
    )
    base = jnp.abs(pt.astype(jnp.float32) - ref.astype(jnp.float32)).max()
    for bq, bkv in ((128, 128), (256, 256), (128, 256)):
        out = flash_attn_func(
            q, k, v, dropout_p=p, dropout_seed=seed,
            block_sizes=BlockSizes(block_q=bq, block_kv=bkv),
        )
        err = jnp.abs(
            out.astype(jnp.float32) - ref.astype(jnp.float32)
        ).max()
        assert err <= 2 * base + 1e-4, f"tiles ({bq},{bkv}): err={err}"
