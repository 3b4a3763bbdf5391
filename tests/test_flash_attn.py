"""Kernel unit tests for the dense flash-attention forward pass.

Mirrors the reference suite's oracle pattern (tests/test_flash_attn.py:586
`test_flash_attn_qkvpacked` etc.): compute the same attention with an fp32
oracle and with a low-precision eager reference, and require
    |kernel - oracle| <= 2 * |eager - oracle| (+ small epsilon)
— tolerance relative to the dtype's own rounding error, not a fixed atol.
"""

import jax
import jax.numpy as jnp
import pytest

from flash_attn_tpu.kernels.common import BlockSizes, default_alibi_slopes
from flash_attn_tpu.kernels.flash_fwd import flash_attention_fwd
from flash_attn_tpu.utils.testing import attention_ref

# Small blocks keep interpreter-mode tests fast while still exercising
# multi-block paths.
BS = BlockSizes(block_q=128, block_kv=128)


def bshd(x):
    return x.transpose(0, 2, 1, 3)


def run_fwd(q, k, v, **kw):
    out, lse = flash_attention_fwd(
        bshd(q), bshd(k), bshd(v), block_sizes=BS, **kw
    )
    return bshd(out), lse


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


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("d", [64, 128])
@pytest.mark.parametrize(
    "sq,sk", [(128, 128), (128, 256), (256, 128), (97, 257)]
)
def test_flash_attn_output(sq, sk, d, causal):
    q, k, v = make_qkv(jax.random.PRNGKey(0), 2, sq, sk, 4, 4, d)
    out, lse = run_fwd(q, k, v, causal=causal)
    ref, _ = attention_ref(q, k, v, causal=causal)
    pt, _ = attention_ref(q, k, v, causal=causal, upcast=False, reorder_ops=True)
    check(out, ref, pt)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_attn_gqa(causal):
    q, k, v = make_qkv(jax.random.PRNGKey(1), 2, 192, 192, 8, 2, 64)
    out, _ = run_fwd(q, k, v, causal=causal)
    ref, _ = attention_ref(q, k, v, causal=causal)
    pt, _ = attention_ref(q, k, v, causal=causal, upcast=False, reorder_ops=True)
    check(out, ref, pt)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("window", [(16, 16), (31, 0), (0, 31), (16, -1)])
def test_flash_attn_local(causal, window):
    q, k, v = make_qkv(jax.random.PRNGKey(2), 1, 200, 257, 2, 2, 64)
    out, _ = run_fwd(q, k, v, causal=causal, window_size=window)
    ref, _ = attention_ref(q, k, v, causal=causal, window_size=window)
    pt, _ = attention_ref(
        q, k, v, causal=causal, window_size=window, upcast=False, reorder_ops=True
    )
    check(out, ref, pt)


@pytest.mark.parametrize("softcap", [15.0, 50.0])
def test_flash_attn_softcap(softcap):
    q, k, v = make_qkv(jax.random.PRNGKey(3), 1, 130, 130, 2, 2, 64)
    out, _ = run_fwd(q, k, v, causal=True, softcap=softcap)
    ref, _ = attention_ref(q, k, v, causal=True, softcap=softcap)
    pt, _ = attention_ref(
        q, k, v, causal=True, softcap=softcap, upcast=False, reorder_ops=True
    )
    check(out, ref, pt)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_attn_alibi(causal):
    b, h, sq, sk, d = 1, 4, 160, 160, 64
    q, k, v = make_qkv(jax.random.PRNGKey(4), b, sq, sk, h, h, d)
    slopes = default_alibi_slopes(h)
    out, _ = run_fwd(q, k, v, causal=causal, alibi_slopes=slopes)
    row = jnp.arange(sq, dtype=jnp.float32)[:, None]
    col = jnp.arange(sk, dtype=jnp.float32)[None, :]
    bias = -slopes[:, None, None] * jnp.abs(col - row - (sk - sq))[None]
    ref, _ = attention_ref(q, k, v, causal=causal, attn_bias=bias)
    pt, _ = attention_ref(
        q, k, v, causal=causal, attn_bias=bias, upcast=False, reorder_ops=True
    )
    check(out, ref, pt)


def test_flash_attn_bias():
    b, h, sq, sk, d = 1, 2, 130, 140, 64
    q, k, v = make_qkv(jax.random.PRNGKey(5), b, sq, sk, h, h, d)
    bias = jax.random.normal(jax.random.PRNGKey(6), (b, h, sq, sk), jnp.float32)
    out, _ = run_fwd(q, k, v, bias=bias)
    ref, _ = attention_ref(q, k, v, attn_bias=bias)
    pt, _ = attention_ref(q, k, v, attn_bias=bias, upcast=False, reorder_ops=True)
    check(out, ref, pt)


def test_flash_attn_sink():
    b, h, s, d = 1, 2, 150, 64
    q, k, v = make_qkv(jax.random.PRNGKey(7), b, s, s, h, h, d)
    sink = jax.random.normal(jax.random.PRNGKey(8), (h,), jnp.float32)
    out, _ = run_fwd(q, k, v, causal=True, sink=sink)
    ref, _ = attention_ref(q, k, v, causal=True, learnable_sink=sink)
    pt, _ = attention_ref(
        q, k, v, causal=True, learnable_sink=sink, upcast=False, reorder_ops=True
    )
    check(out, ref, pt)


def test_flash_attn_segment_ids():
    """Packed multi-document masking — the kernel-level basis of varlen."""
    b, h, s, d = 1, 2, 256, 64
    q, k, v = make_qkv(jax.random.PRNGKey(9), b, s, s, h, h, d)
    seg = jnp.concatenate(
        [jnp.zeros(100, jnp.int32), jnp.ones(80, jnp.int32), 2 * jnp.ones(76, jnp.int32)]
    )[None, :]
    out, _ = run_fwd(
        q, k, v, causal=True, q_segment_ids=seg, kv_segment_ids=seg
    )
    bias = jnp.where(seg[0][:, None] == seg[0][None, :], 0.0, -jnp.inf)[None, None]
    ref, _ = attention_ref(q, k, v, causal=True, attn_bias=bias)
    pt, _ = attention_ref(
        q, k, v, causal=True, attn_bias=bias, upcast=False, reorder_ops=True
    )
    check(out, ref, pt)


def test_flash_attn_lse():
    """LSE must match log(sum(exp(scores))) from the oracle."""
    b, h, s, d = 1, 2, 130, 64
    q, k, v = make_qkv(jax.random.PRNGKey(10), b, s, s, h, h, d)
    _, lse = run_fwd(q, k, v, causal=True)
    scale = d**-0.5
    s_ = jnp.einsum(
        "bqhd,bkhd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)
    ) * scale
    mask = jnp.tril(jnp.ones((s, s), bool))
    s_ = jnp.where(mask[None, None], s_, -jnp.inf)
    lse_ref = jax.scipy.special.logsumexp(s_, axis=-1)
    assert jnp.abs(lse - lse_ref).max() < 5e-2


def test_flash_attn_deterministic():
    """Bitwise determinism across reruns (reference
    tests/test_flash_attn.py:2199 runs 250 iterations; interpreter mode is
    slower so we run fewer — the TPU grid is sequential so nondeterminism
    would come from compiler scheduling, not races)."""
    q, k, v = make_qkv(jax.random.PRNGKey(11), 1, 150, 150, 2, 2, 64)
    out0, lse0 = run_fwd(q, k, v, causal=True)
    for _ in range(5):
        out, lse = run_fwd(q, k, v, causal=True)
        assert jnp.array_equal(out, out0)
        assert jnp.array_equal(lse, lse0)


def test_flash_attn_dropout_statistics():
    """Dropout: output with p>0 differs, is deterministic for a fixed seed,
    and row-means stay near the p=0 output (unbiasedness)."""
    q, k, v = make_qkv(jax.random.PRNGKey(12), 1, 128, 128, 2, 2, 64)
    out0, _ = run_fwd(q, k, v)
    out_a, _ = run_fwd(q, k, v, dropout_p=0.2, dropout_seed=jnp.int32(7))
    out_b, _ = run_fwd(q, k, v, dropout_p=0.2, dropout_seed=jnp.int32(7))
    out_c, _ = run_fwd(q, k, v, dropout_p=0.2, dropout_seed=jnp.int32(8))
    assert jnp.array_equal(out_a, out_b)
    assert not jnp.array_equal(out_a, out_c)
    assert not jnp.array_equal(out_a, out0)
    # Unbiasedness: mean over many elements should be close.
    diff = jnp.abs(
        out_a.astype(jnp.float32).mean() - out0.astype(jnp.float32).mean()
    )
    assert diff < 0.05


@pytest.mark.parametrize("d", [32, 59, 111, 160, 256])
def test_flash_attn_headdim_sweep(d):
    """Reference sweeps head dims 32..256 incl. odd 59/111
    (tests/test_flash_attn.py:586 parametrization)."""
    q, k, v = make_qkv(jax.random.PRNGKey(30 + d), 1, 130, 146, 2, 2, d)
    out, _ = run_fwd(q, k, v, causal=True)
    ref, _ = attention_ref(q, k, v, causal=True)
    pt, _ = attention_ref(q, k, v, causal=True, upcast=False, reorder_ops=True)
    check(out, ref, pt)


@pytest.mark.parametrize("sq,sk", [(1, 147), (3, 1024), (1025, 1025), (8, 8)])
def test_flash_attn_seqlen_sweep(sq, sk):
    """Off-tile seqlens incl. 1025 and tiny (reference :586 sweep)."""
    q, k, v = make_qkv(jax.random.PRNGKey(40), 1, sq, sk, 2, 2, 64)
    out, _ = run_fwd(q, k, v, causal=True)
    ref, _ = attention_ref(q, k, v, causal=True)
    pt, _ = attention_ref(q, k, v, causal=True, upcast=False, reorder_ops=True)
    check(out, ref, pt)


def test_flash_attn_fp32_inputs():
    """fp32 q/k/v must work (reference supports fp16/bf16 only; TPU kernels
    accept fp32 for debugging/small models). On real TPUs fp32 matmuls
    default to bf16-pass precision, so the bound is the standard contract
    against a bf16-eager baseline rather than a fixed 1e-4."""
    q, k, v = make_qkv(jax.random.PRNGKey(50), 1, 130, 130, 2, 2, 64,
                       dtype=jnp.float32)
    out, _ = run_fwd(q, k, v, causal=True)
    assert out.dtype == jnp.float32
    ref, _ = attention_ref(q, k, v, causal=True)
    pt, _ = attention_ref(
        q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
        v.astype(jnp.bfloat16), causal=True, upcast=False, reorder_ops=True,
    )
    check(out, ref, pt)


@pytest.mark.parametrize("sq,bq,bkv", [(512, 128, 128), (1024, 256, 128),
                                       (960, 256, 128)])
@pytest.mark.parametrize("dropout_p", [0.0, 0.17])
def test_flash_attn_causal_fold_parity(sq, bq, bkv, dropout_p):
    """The folded causal grid (q tile p paired with N-1-p; constant trip
    count r*(N+1), no predicated-off steps) must be bitwise identical to the
    rectangular grid. window_size=(sq, -1) is mask-equivalent to causal but
    disables the fold, giving a same-kernel rectangular control."""
    q, k, v = make_qkv(jax.random.PRNGKey(60), 2, sq, sq, 4, 2, 64)
    bs = BlockSizes(block_q=bq, block_kv=bkv)
    kw = dict(dropout_p=dropout_p, dropout_seed=jnp.int32(3))
    slopes = default_alibi_slopes(4)
    folded, lse_f = flash_attention_fwd(
        bshd(q), bshd(k), bshd(v), causal=True, alibi_slopes=slopes,
        block_sizes=bs, **kw)
    rect, lse_r = flash_attention_fwd(
        bshd(q), bshd(k), bshd(v), causal=True, window_size=(sq, -1),
        alibi_slopes=slopes, block_sizes=bs, **kw)
    assert jnp.array_equal(folded, rect)
    assert jnp.array_equal(lse_f, lse_r)
    if dropout_p == 0.0:
        row = jnp.arange(sq, dtype=jnp.float32)[:, None]
        col = jnp.arange(sq, dtype=jnp.float32)[None, :]
        bias = -slopes[:, None, None] * jnp.abs(col - row)[None]
        ref, _ = attention_ref(q, k, v, causal=True, attn_bias=bias)
        pt, _ = attention_ref(q, k, v, causal=True, attn_bias=bias,
                              upcast=False, reorder_ops=True)
        check(bshd(folded), ref, pt)
