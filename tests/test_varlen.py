"""Varlen tests (reference tests/test_flash_attn.py::test_flash_attn_varlen_output
:1172): pack a padded batch, run the packed kernel, unpack, and compare to
the per-batch oracle under the relative-tolerance contract. Exercises fwd,
bwd, GQA, cross-length (sq != sk), windows, seqused_k, and padding utils."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attn_tpu import flash_attn_varlen_func
from flash_attn_tpu.utils.padding import pad_input, unpad_input
from flash_attn_tpu.utils.testing import attention_ref


def check(out, ref, pt, eps=1e-5, factor=2.0):
    err = jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)).max()
    pt_err = jnp.abs(pt.astype(jnp.float32) - ref.astype(jnp.float32)).max()
    assert err <= factor * pt_err + eps, f"err={err} vs baseline={pt_err}"


def make_varlen(key, lens_q, lens_k, h, hk, d, dtype=jnp.bfloat16):
    b = len(lens_q)
    sq, sk = max(lens_q), max(lens_k)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, sq, h, d), jnp.float32).astype(dtype)
    k = jax.random.normal(kk, (b, sk, hk, d), jnp.float32).astype(dtype)
    v = jax.random.normal(kv, (b, sk, hk, d), jnp.float32).astype(dtype)
    qmask = jnp.arange(sq)[None, :] < jnp.asarray(lens_q)[:, None]
    kmask = jnp.arange(sk)[None, :] < jnp.asarray(lens_k)[:, None]
    return q, k, v, qmask, kmask


def pack_run_unpack(q, k, v, qmask, kmask, **kw):
    b, sq = qmask.shape
    q_p, qidx, cu_q, _, _ = unpad_input(q, qmask)
    k_p, _, cu_k, _, _ = unpad_input(k, kmask)
    v_p, _, _, _, _ = unpad_input(v, kmask)
    out_p = flash_attn_varlen_func(q_p, k_p, v_p, cu_q, cu_k, **kw)
    return pad_input(out_p, qidx, b, sq)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("hk,h", [(4, 4), (2, 8)])
def test_varlen_output(causal, hk, h):
    lens = [113, 64, 97]
    q, k, v, qmask, kmask = make_varlen(jax.random.PRNGKey(0), lens, lens, h, hk, 64)
    out = pack_run_unpack(q, k, v, qmask, kmask, causal=causal,
                          block_q=128, block_kv=128)
    ref, _ = attention_ref(q, k, v, qmask, kmask, causal=causal)
    pt, _ = attention_ref(q, k, v, qmask, kmask, causal=causal,
                          upcast=False, reorder_ops=True)
    # Zero padded rows before comparing (padding garbage is unobservable).
    out = jnp.where(qmask[:, :, None, None], out, 0.0)
    check(out, ref, pt)


@pytest.mark.parametrize("causal", [False, True])
def test_varlen_cross_lengths(causal):
    """sq != sk per sequence: bottom-right alignment must hold per-sequence."""
    lens_q = [50, 37]
    lens_k = [113, 71]
    q, k, v, qmask, kmask = make_varlen(
        jax.random.PRNGKey(1), lens_q, lens_k, 2, 2, 64
    )
    out = pack_run_unpack(q, k, v, qmask, kmask, causal=causal,
                          block_q=128, block_kv=128)
    ref, _ = attention_ref(q, k, v, qmask, kmask, causal=causal)
    pt, _ = attention_ref(q, k, v, qmask, kmask, causal=causal,
                          upcast=False, reorder_ops=True)
    out = jnp.where(qmask[:, :, None, None], out, 0.0)
    check(out, ref, pt)


def test_varlen_window():
    lens = [200, 150]
    q, k, v, qmask, kmask = make_varlen(jax.random.PRNGKey(2), lens, lens, 2, 2, 64)
    window = (32, 0)
    out = pack_run_unpack(q, k, v, qmask, kmask, causal=True, window_size=window,
                          block_q=128, block_kv=128)
    ref, _ = attention_ref(q, k, v, qmask, kmask, causal=True, window_size=window)
    pt, _ = attention_ref(q, k, v, qmask, kmask, causal=True, window_size=window,
                          upcast=False, reorder_ops=True)
    out = jnp.where(qmask[:, :, None, None], out, 0.0)
    check(out, ref, pt)


def test_varlen_seqused_k():
    """seqused_k truncates visible keys per sequence (reference seqused_k,
    vllm_flash_attn/flash_attn_interface.py:149)."""
    lens = [128, 128]
    used = jnp.array([100, 64], jnp.int32)
    q, k, v, qmask, kmask = make_varlen(jax.random.PRNGKey(3), lens, lens, 2, 2, 64)
    out = pack_run_unpack(q, k, v, qmask, kmask, causal=True, seqused_k=used,
                          block_q=128, block_kv=128)
    kmask_used = jnp.arange(128)[None, :] < used[:, None]
    ref, _ = attention_ref(q, k, v, qmask, kmask_used, causal=True)
    pt, _ = attention_ref(q, k, v, qmask, kmask_used, causal=True,
                          upcast=False, reorder_ops=True)
    out = jnp.where(qmask[:, :, None, None], out, 0.0)
    check(out, ref, pt)


def test_varlen_seqused_q():
    """seqused_q truncates used query rows per sequence (reference
    hopper/flash_attn_interface.py:30,61): only the first used_q rows
    participate; the bottom-right diagonal aligns used_q against used_k."""
    lens = [128, 128]
    used_q = jnp.array([100, 64], jnp.int32)
    q, k, v, qmask, kmask = make_varlen(jax.random.PRNGKey(30), lens, lens, 2, 2, 64)
    out = pack_run_unpack(q, k, v, qmask, kmask, causal=True, seqused_q=used_q,
                          block_q=128, block_kv=128)
    qmask_used = jnp.arange(128)[None, :] < used_q[:, None]
    ref, _ = attention_ref(q, k, v, qmask_used, kmask, causal=True)
    pt, _ = attention_ref(q, k, v, qmask_used, kmask, causal=True,
                          upcast=False, reorder_ops=True)
    # Only the used rows are observable.
    out = jnp.where(qmask_used[:, :, None, None], out, 0.0)
    ref = jnp.where(qmask_used[:, :, None, None], ref, 0.0)
    pt = jnp.where(qmask_used[:, :, None, None], pt, 0.0)
    check(out, ref, pt)


def test_varlen_seqused_q_and_k_bwd():
    """seqused_q x seqused_k fwd+bwd: inert rows/keys carry zero grads."""
    lens = [128, 96]
    used_q = jnp.array([90, 64], jnp.int32)
    used_k = jnp.array([110, 70], jnp.int32)
    q, k, v, qmask, kmask = make_varlen(jax.random.PRNGKey(31), lens, lens, 2, 2, 64)
    qmask_used = (jnp.arange(128)[None, :] < used_q[:, None]) & qmask
    kmask_used = (jnp.arange(128)[None, :] < used_k[:, None]) & kmask
    g = jax.random.normal(jax.random.PRNGKey(32), q.shape, jnp.float32).astype(q.dtype)
    g = jnp.where(qmask_used[:, :, None, None], g, 0.0)

    def loss_kernel(q, k, v):
        out = pack_run_unpack(q, k, v, qmask, kmask, causal=True,
                              seqused_q=used_q, seqused_k=used_k,
                              block_q=128, block_kv=128)
        out = jnp.where(qmask_used[:, :, None, None], out, 0.0)
        return jnp.sum(out.astype(jnp.float32) * g.astype(jnp.float32))

    def loss_ref(q, k, v, upcast=True):
        out, _ = attention_ref(q, k, v, qmask_used, kmask_used, causal=True,
                               upcast=upcast, reorder_ops=not upcast)
        out = jnp.where(qmask_used[:, :, None, None], out, 0.0)
        return jnp.sum(out.astype(jnp.float32) * g.astype(jnp.float32))

    grads = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    grads_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    grads_pt = jax.grad(lambda a, b, c: loss_ref(a, b, c, upcast=False),
                        argnums=(0, 1, 2))(q, k, v)
    for name, a, r, p in zip(("dq", "dk", "dv"), grads, grads_ref, grads_pt):
        m = qmask_used if name == "dq" else kmask_used
        a = jnp.where(m[:, :, None, None], a, 0.0)
        r = jnp.where(m[:, :, None, None], r, 0.0)
        p = jnp.where(m[:, :, None, None], p, 0.0)
        err = jnp.abs(a.astype(jnp.float32) - r.astype(jnp.float32)).max()
        base = jnp.abs(p.astype(jnp.float32) - r.astype(jnp.float32)).max()
        assert err <= 2.0 * base + 1e-4, f"{name}: err={err} base={base}"


@pytest.mark.parametrize("causal", [False, True])
def test_varlen_bwd(causal):
    lens = [113, 64]
    q, k, v, qmask, kmask = make_varlen(jax.random.PRNGKey(4), lens, lens, 2, 2, 64)
    g = jax.random.normal(jax.random.PRNGKey(5), q.shape, jnp.float32).astype(q.dtype)
    g = jnp.where(qmask[:, :, None, None], g, 0.0)

    def loss_kernel(q, k, v):
        out = pack_run_unpack(q, k, v, qmask, kmask, causal=causal,
                              block_q=128, block_kv=128)
        out = jnp.where(qmask[:, :, None, None], out, 0.0)
        return jnp.sum(out.astype(jnp.float32) * g.astype(jnp.float32))

    def loss_ref(q, k, v, upcast=True):
        out, _ = attention_ref(q, k, v, qmask, kmask, causal=causal,
                               upcast=upcast, reorder_ops=not upcast)
        return jnp.sum(out.astype(jnp.float32) * g.astype(jnp.float32))

    grads = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    grads_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    grads_pt = jax.grad(lambda a, b, c: loss_ref(a, b, c, upcast=False),
                        argnums=(0, 1, 2))(q, k, v)
    for name, a, r, p in zip(("dq", "dk", "dv"), grads, grads_ref, grads_pt):
        # Padding-token grads are unobservable; zero them.
        m = qmask if name == "dq" else kmask
        a = jnp.where(m[:, :, None, None], a, 0.0)
        r = jnp.where(m[:, :, None, None], r, 0.0)
        p = jnp.where(m[:, :, None, None], p, 0.0)
        err = jnp.abs(a.astype(jnp.float32) - r.astype(jnp.float32)).max()
        base = jnp.abs(p.astype(jnp.float32) - r.astype(jnp.float32)).max()
        assert err <= 2.0 * base + 1e-4, f"{name}: err={err} base={base}"


def test_varlen_gqa_bwd():
    lens = [100, 60]
    q, k, v, qmask, kmask = make_varlen(jax.random.PRNGKey(6), lens, lens, 4, 2, 64)
    g = jax.random.normal(jax.random.PRNGKey(7), q.shape, jnp.float32).astype(q.dtype)
    g = jnp.where(qmask[:, :, None, None], g, 0.0)

    def loss(q, k, v, fn):
        out = fn(q, k, v)
        out = jnp.where(qmask[:, :, None, None], out, 0.0)
        return jnp.sum(out.astype(jnp.float32) * g.astype(jnp.float32))

    gk = jax.grad(
        lambda q, k, v: loss(
            q, k, v,
            lambda a, b, c: pack_run_unpack(a, b, c, qmask, kmask, causal=True,
                                            block_q=128, block_kv=128),
        ),
        argnums=(0, 1, 2),
    )(q, k, v)
    gr = jax.grad(
        lambda q, k, v: loss(
            q, k, v, lambda a, b, c: attention_ref(a, b, c, qmask, kmask,
                                                   causal=True)[0]
        ),
        argnums=(0, 1, 2),
    )(q, k, v)
    gp = jax.grad(
        lambda q, k, v: loss(
            q, k, v,
            lambda a, b, c: attention_ref(a, b, c, qmask, kmask, causal=True,
                                          upcast=False, reorder_ops=True)[0],
        ),
        argnums=(0, 1, 2),
    )(q, k, v)
    for name, a, r, p, m in zip(
        ("dq", "dk", "dv"), gk, gr, gp, (qmask, kmask, kmask)
    ):
        a = jnp.where(m[:, :, None, None], a, 0.0)
        r = jnp.where(m[:, :, None, None], r, 0.0)
        p = jnp.where(m[:, :, None, None], p, 0.0)
        err = jnp.abs(a.astype(jnp.float32) - r.astype(jnp.float32)).max()
        base = jnp.abs(p.astype(jnp.float32) - r.astype(jnp.float32)).max()
        assert err <= 2.0 * base + 1e-4, f"{name}: err={err} base={base}"


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize(
    "lens_q,lens_k,h,hk",
    [
        ([1], [1], 2, 2),                      # minimal problem
        ([0, 77], [0, 77], 2, 2),              # zero-length leading sequence
        ([128, 0, 1], [128, 0, 1], 2, 2),      # tile-exact + empty + 1-token
        ([127, 129], [127, 129], 2, 2),        # tile boundary +-1
        ([1] * 8, [1] * 8, 2, 2),              # many tiny sequences
        ([5, 63, 17], [257, 31, 2], 8, 1),     # cross lengths, extreme GQA
        ([64, 32], [0, 96], 4, 2),             # empty K under live Q
    ],
    ids=["min", "lead0", "mid0", "tile_pm1", "tiny8", "cross_gqa", "emptyk"],
)
def test_varlen_adversarial_shapes(causal, lens_q, lens_k, h, hk):
    """Deterministic adversarial coverage of scheduler-sensitive varlen
    shapes (the reference's CLC fuzz posture, tests/cute/test_clc_fuzz.py:1-8:
    mismatched lengths, non-aligned tiles, GQA ratios, minimal problems).
    Zero-length sequences must produce zero rows, not NaN."""
    q, k, v, qmask, kmask = make_varlen(
        jax.random.PRNGKey(42), lens_q, lens_k, h, hk, 64
    )
    out = pack_run_unpack(q, k, v, qmask, kmask, causal=causal,
                          block_q=128, block_kv=128)
    ref, _ = attention_ref(q, k, v, qmask, kmask, causal=causal)
    pt, _ = attention_ref(q, k, v, qmask, kmask, causal=causal,
                          upcast=False, reorder_ops=True)
    out = jnp.where(qmask[:, :, None, None], out, 0.0)
    assert not bool(jnp.isnan(out).any()), "NaN in observable output"
    check(out, ref, pt)


def test_pad_unpad_roundtrip():
    key = jax.random.PRNGKey(8)
    x = jax.random.normal(key, (3, 17, 4), jnp.float32)
    lens = jnp.array([17, 5, 11])
    mask = jnp.arange(17)[None, :] < lens[:, None]
    packed, idx, cu, mx, seqlens = unpad_input(x, mask)
    assert int(cu[-1]) == int(lens.sum())
    assert int(mx) == 17
    back = pad_input(packed[: int(cu[-1])], idx[: int(cu[-1])], 3, 17)
    assert jnp.allclose(jnp.where(mask[:, :, None], x, 0.0), back)


def test_varlen_dropout():
    """Varlen dropout: deterministic for a fixed seed, differs across seeds,
    fwd/bwd mask parity implied by deterministic grads."""
    lens = [100, 60]
    q, k, v, qmask, kmask = make_varlen(jax.random.PRNGKey(7), lens, lens, 2, 2, 64)
    kw = dict(causal=True, dropout_p=0.2, block_q=128, block_kv=128)
    out_a = pack_run_unpack(q, k, v, qmask, kmask,
                            dropout_seed=jnp.int32(5), **kw)
    out_b = pack_run_unpack(q, k, v, qmask, kmask,
                            dropout_seed=jnp.int32(5), **kw)
    out_c = pack_run_unpack(q, k, v, qmask, kmask,
                            dropout_seed=jnp.int32(6), **kw)
    assert jnp.array_equal(out_a, out_b)
    assert not jnp.array_equal(out_a, out_c)

    g = jax.random.normal(jax.random.PRNGKey(8), q.shape, jnp.float32
                          ).astype(q.dtype)

    def loss(q, k, v):
        out = pack_run_unpack(q, k, v, qmask, kmask,
                              dropout_seed=jnp.int32(5), **kw)
        out = jnp.where(qmask[:, :, None, None], out, 0.0)
        return jnp.sum(out.astype(jnp.float32) * g.astype(jnp.float32))

    g1 = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        assert jnp.array_equal(a, b)
    # Mean-preserving vs no-dropout gradients (loose unbiasedness bound).
    g_nd = jax.grad(lambda q, k, v: jnp.sum(jnp.where(
        qmask[:, :, None, None],
        pack_run_unpack(q, k, v, qmask, kmask, causal=True,
                        block_q=128, block_kv=128), 0.0
    ).astype(jnp.float32) * g.astype(jnp.float32)), argnums=(0, 1, 2))(q, k, v)
    assert abs(float(g1[2].astype(jnp.float32).mean())
               - float(g_nd[2].astype(jnp.float32).mean())) < 0.05


def test_aot_compile_from_specs():
    """AOT compile for fixed specs (FA4 compile_flash_attn_varlen_func_
    from_specs, cute/interface.py:3109): compiled callable matches the
    regular call."""
    import numpy as np

    from flash_attn_tpu import flash_attn_varlen_func
    from flash_attn_tpu.flash_attn_interface import (
        compile_flash_attn_varlen_func_from_specs,
    )

    c = compile_flash_attn_varlen_func_from_specs(
        total_q=97, total_k=130, nseq=2, num_heads=2, head_dim=64,
        causal=True, dtype=jnp.float32, block_q=128, block_kv=128)
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(97, 2, 64), jnp.float32)
    k = jnp.asarray(rng.randn(130, 2, 64), jnp.float32)
    v = jnp.asarray(rng.randn(130, 2, 64), jnp.float32)
    cu_q = jnp.asarray([0, 60, 97], jnp.int32)
    cu_k = jnp.asarray([0, 80, 130], jnp.int32)
    out = c(q, k, v, cu_q, cu_k)
    ref = flash_attn_varlen_func(q, k, v, cu_q, cu_k, causal=True,
                                 block_q=128, block_kv=128)
    assert jnp.abs(out - ref).max() < 1e-6


def test_varlen_traced_cu_seqlens():
    """cu_seqlens as jit ARGUMENTS (tracers): the worklist builder must fall
    back to the rectangular dead-step grid and stay correct, fwd and bwd."""
    import numpy as np

    lens = [100, 156]
    cu = jnp.asarray(np.concatenate([[0], np.cumsum(lens)]), jnp.int32)
    tot = sum(lens)
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (tot, 2, 64), jnp.bfloat16)
    k = jax.random.normal(ks[1], (tot, 2, 64), jnp.bfloat16)
    v = jax.random.normal(ks[2], (tot, 2, 64), jnp.bfloat16)

    @jax.jit
    def f(q, k, v, cu):
        return flash_attn_varlen_func(q, k, v, cu, cu, causal=True,
                                      block_q=128, block_kv=128)

    out = f(q, k, v, cu)
    ref, off = [], 0
    for ln in lens:
        ref.append(attention_ref(q[off:off + ln][None], k[off:off + ln][None],
                                 v[off:off + ln][None], causal=True)[0][0])
        off += ln
    ref = jnp.concatenate(ref, 0)
    err = jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)).max()
    assert err < 2e-2, err

    g = jax.jit(jax.grad(
        lambda q, k, v, cu: jnp.sum(f(q, k, v, cu).astype(jnp.float32)),
        argnums=(0, 1, 2),
    ))(q, k, v, cu)
    for x in g:
        assert not bool(jnp.isnan(x).any())
