"""Backward-pass tests: gradients of the Pallas kernels vs the fp32 oracle.

Mirrors the reference pattern (tests/test_flash_attn.py:586 onward): compute
dq/dk/dv via autodiff through the fp32 oracle and through a low-precision
eager reference, and require kernel-grad error <= 2x eager-grad error.
"""

import jax
import jax.numpy as jnp
import pytest

from flash_attn_tpu import flash_attn_func
from flash_attn_tpu.kernels.common import BlockSizes, default_alibi_slopes
from flash_attn_tpu.utils.testing import attention_ref

BS = BlockSizes(128, 128, 128, 128, 128, 128)


def make_qkv(key, b, sq, sk, h, hk, d, dtype=jnp.bfloat16):
    kq, kk, kv, kg = jax.random.split(key, 4)
    q = jax.random.normal(kq, (b, sq, h, d), jnp.float32).astype(dtype)
    k = jax.random.normal(kk, (b, sk, hk, d), jnp.float32).astype(dtype)
    v = jax.random.normal(kv, (b, sk, hk, d), jnp.float32).astype(dtype)
    g = jax.random.normal(kg, (b, sq, h, d), jnp.float32).astype(dtype)
    return q, k, v, g


def grads_of(fn, q, k, v, g):
    def loss(q, k, v):
        out = fn(q, k, v)
        return jnp.sum(out.astype(jnp.float32) * g.astype(jnp.float32))

    return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)


def check_grads(kernel_fn, ref_fn, pt_fn, q, k, v, g, factor=2.0, eps=1e-4):
    dq, dk, dv = grads_of(kernel_fn, q, k, v, g)
    dq_ref, dk_ref, dv_ref = grads_of(ref_fn, q, k, v, g)
    dq_pt, dk_pt, dv_pt = grads_of(pt_fn, q, k, v, g)
    for name, a, r, p in [
        ("dq", dq, dq_ref, dq_pt),
        ("dk", dk, dk_ref, dk_pt),
        ("dv", dv, dv_ref, dv_pt),
    ]:
        err = jnp.abs(a.astype(jnp.float32) - r.astype(jnp.float32)).max()
        base = jnp.abs(p.astype(jnp.float32) - r.astype(jnp.float32)).max()
        assert err <= factor * base + eps, f"{name}: err={err} base={base}"


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("sq,sk", [(128, 128), (128, 256), (97, 257)])
def test_bwd_output(sq, sk, causal):
    q, k, v, g = make_qkv(jax.random.PRNGKey(0), 1, sq, sk, 2, 2, 64)
    check_grads(
        lambda q, k, v: flash_attn_func(q, k, v, causal=causal, block_sizes=BS),
        lambda q, k, v: attention_ref(q, k, v, causal=causal)[0],
        lambda q, k, v: attention_ref(
            q, k, v, causal=causal, upcast=False, reorder_ops=True
        )[0],
        q, k, v, g,
    )


@pytest.mark.parametrize("causal", [False, True])
def test_bwd_gqa(causal):
    q, k, v, g = make_qkv(jax.random.PRNGKey(1), 1, 192, 192, 4, 2, 64)
    check_grads(
        lambda q, k, v: flash_attn_func(q, k, v, causal=causal, block_sizes=BS),
        lambda q, k, v: attention_ref(q, k, v, causal=causal)[0],
        lambda q, k, v: attention_ref(
            q, k, v, causal=causal, upcast=False, reorder_ops=True
        )[0],
        q, k, v, g,
    )


@pytest.mark.parametrize("window", [(16, 16), (31, 0)])
def test_bwd_local(window):
    q, k, v, g = make_qkv(jax.random.PRNGKey(2), 1, 130, 170, 2, 2, 64)
    check_grads(
        lambda q, k, v: flash_attn_func(q, k, v, window_size=window, block_sizes=BS),
        lambda q, k, v: attention_ref(q, k, v, window_size=window)[0],
        lambda q, k, v: attention_ref(
            q, k, v, window_size=window, upcast=False, reorder_ops=True
        )[0],
        q, k, v, g,
    )


def test_bwd_softcap():
    q, k, v, g = make_qkv(jax.random.PRNGKey(3), 1, 130, 130, 2, 2, 64)
    sc = 20.0
    check_grads(
        lambda q, k, v: flash_attn_func(
            q, k, v, causal=True, softcap=sc, block_sizes=BS
        ),
        lambda q, k, v: attention_ref(q, k, v, causal=True, softcap=sc)[0],
        lambda q, k, v: attention_ref(
            q, k, v, causal=True, softcap=sc, upcast=False, reorder_ops=True
        )[0],
        q, k, v, g,
    )


def test_bwd_alibi():
    b, h, s, d = 1, 4, 160, 64
    q, k, v, g = make_qkv(jax.random.PRNGKey(4), b, s, s, h, h, d)
    slopes = default_alibi_slopes(h)
    row = jnp.arange(s, dtype=jnp.float32)[:, None]
    col = jnp.arange(s, dtype=jnp.float32)[None, :]
    bias = -slopes[:, None, None] * jnp.abs(col - row)[None]
    check_grads(
        lambda q, k, v: flash_attn_func(
            q, k, v, causal=True, alibi_slopes=slopes, block_sizes=BS
        ),
        lambda q, k, v: attention_ref(q, k, v, causal=True, attn_bias=bias)[0],
        lambda q, k, v: attention_ref(
            q, k, v, causal=True, attn_bias=bias, upcast=False, reorder_ops=True
        )[0],
        q, k, v, g,
    )


def test_bwd_bias_grad():
    b, h, sq, sk, d = 1, 2, 130, 140, 64
    q, k, v, g = make_qkv(jax.random.PRNGKey(5), b, sq, sk, h, h, d)
    bias = 0.1 * jax.random.normal(jax.random.PRNGKey(6), (b, h, sq, sk), jnp.float32)

    def loss_kernel(bias):
        out = flash_attn_func(q, k, v, attn_bias=bias, block_sizes=BS)
        return jnp.sum(out.astype(jnp.float32) * g.astype(jnp.float32))

    def loss_ref(bias):
        out = attention_ref(q, k, v, attn_bias=bias)[0]
        return jnp.sum(out.astype(jnp.float32) * g.astype(jnp.float32))

    def loss_pt(bias):
        out = attention_ref(q, k, v, attn_bias=bias, upcast=False, reorder_ops=True)[0]
        return jnp.sum(out.astype(jnp.float32) * g.astype(jnp.float32))

    dbias = jax.grad(loss_kernel)(bias)
    dbias_ref = jax.grad(loss_ref)(bias)
    dbias_pt = jax.grad(loss_pt)(bias)
    err = jnp.abs(dbias - dbias_ref).max()
    base = jnp.abs(dbias_pt - dbias_ref).max()
    assert err <= 2.0 * base + 1e-4, f"dbias err={err} base={base}"


def test_bwd_deterministic():
    q, k, v, g = make_qkv(jax.random.PRNGKey(7), 1, 150, 150, 2, 2, 64)

    def grads():
        return grads_of(
            lambda q, k, v: flash_attn_func(q, k, v, causal=True, block_sizes=BS),
            q, k, v, g,
        )

    dq0, dk0, dv0 = grads()
    for _ in range(3):
        dq, dk, dv = grads()
        assert jnp.array_equal(dq, dq0)
        assert jnp.array_equal(dk, dk0)
        assert jnp.array_equal(dv, dv0)


def test_bwd_dropout():
    """Dropout bwd: gradients must be deterministic given a seed and unbiased
    in expectation (exact mask parity fwd/bwd is implied by determinism +
    the analytical relationship being exercised in every other test)."""
    q, k, v, g = make_qkv(jax.random.PRNGKey(8), 1, 128, 128, 2, 2, 64)

    def fn(q, k, v):
        return flash_attn_func(
            q, k, v, dropout_p=0.2, dropout_seed=jnp.int32(3), block_sizes=BS
        )

    dq0, dk0, dv0 = grads_of(fn, q, k, v, g)
    dq1, dk1, dv1 = grads_of(fn, q, k, v, g)
    assert jnp.array_equal(dq0, dq1)
    assert jnp.array_equal(dk0, dk1)
    assert jnp.array_equal(dv0, dv1)
    # Means close to the p=0 gradients (unbiasedness, loose bound).
    dq_nd, dk_nd, dv_nd = grads_of(
        lambda q, k, v: flash_attn_func(q, k, v, block_sizes=BS), q, k, v, g
    )
    assert jnp.abs(
        dv0.astype(jnp.float32).mean() - dv_nd.astype(jnp.float32).mean()
    ) < 0.05


def test_bwd_sink_grads():
    """Gradients with a learnable attention sink: dq/dk/dv fall out of the
    standard formulas (lse already includes the sink) and dsink is an
    analytic reduction — all checked against autodiff through the oracle."""
    from flash_attn_tpu.utils.testing import attention_ref as _ref

    b, h, s, d = 1, 2, 150, 64
    q, k, v, g = make_qkv(jax.random.PRNGKey(20), b, s, s, h, h, d)
    sink = jax.random.normal(jax.random.PRNGKey(21), (h,), jnp.float32)

    def loss_kernel(q, k, v, sink):
        out = flash_attn_func(q, k, v, causal=True, sink=sink, block_sizes=BS)
        return jnp.sum(out.astype(jnp.float32) * g.astype(jnp.float32))

    def loss_ref(q, k, v, sink, upcast=True):
        out, _ = _ref(q, k, v, causal=True, learnable_sink=sink,
                      upcast=upcast, reorder_ops=not upcast)
        return jnp.sum(out.astype(jnp.float32) * g.astype(jnp.float32))

    ga = jax.grad(loss_kernel, argnums=(0, 1, 2, 3))(q, k, v, sink)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, sink)
    gp = jax.grad(lambda *a: loss_ref(*a, upcast=False),
                  argnums=(0, 1, 2, 3))(q, k, v, sink)
    for name, a, r, p in zip(("dq", "dk", "dv", "dsink"), ga, gr, gp):
        err = jnp.abs(a.astype(jnp.float32) - r.astype(jnp.float32)).max()
        base = jnp.abs(p.astype(jnp.float32) - r.astype(jnp.float32)).max()
        assert err <= 2.0 * base + 2e-3, (name, err, base)


@pytest.mark.parametrize("bq2,bkv2", [(256, 256), (256, 512), (512, 256)])
def test_bwd_causal_fold_parity(bq2, bkv2):
    """Folded causal grids in the dK/dV and dQ kernels (pair trick, see
    flash_fwd.py fold_r) must be bitwise identical to the rectangular
    grids. window_size=(sq, -1) is mask-equivalent to causal but disables
    the fold — a same-kernel rectangular control."""
    from flash_attn_tpu.kernels.flash_bwd import flash_attention_bwd
    from flash_attn_tpu.kernels.flash_fwd import flash_attention_fwd

    b, h, hk, s, d = 2, 4, 2, 1024, 64
    q, k, v, g = make_qkv(jax.random.PRNGKey(7), b, s, s, h, hk, d)
    bhsd = lambda x: x.transpose(0, 2, 1, 3)
    q, k, v, g = bhsd(q), bhsd(k), bhsd(v), bhsd(g)
    bs = BlockSizes(256, 256, bq2, bkv2, bq2, bkv2)
    kw = dict(dropout_p=0.1, dropout_seed=jnp.int32(9), block_sizes=bs)
    out, lse = flash_attention_fwd(q, k, v, causal=True, **kw)
    folded = flash_attention_bwd(q, k, v, out, lse, g, causal=True, **kw)
    rect = flash_attention_bwd(
        q, k, v, out, lse, g, causal=True, window_size=(s, -1), **kw
    )
    for name, a, bb in zip(("dq", "dk", "dv"), folded, rect):
        assert jnp.array_equal(a, bb), name
