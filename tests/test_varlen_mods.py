"""Mod conformance on the VARLEN path (FA4 varlen programmable attention,
reference cute/interface.py:3015 flash_attn_varlen_func score_mod/mask_mod
+ :363-427 aux_tensors/aux_scalars).

Reuses the dual-definition mod library (tests/test_mask_mod_library.py):
each mod runs through flash_attn_varlen_func on a packed batch and is
cross-checked against per-sequence dense oracles. Varlen mods see
PER-SEQUENCE coordinates: b = segment id per query row, q_idx/kv_idx =
in-sequence positions.

Also covers packed-coordinate attn_bias (+ dbias) on the varlen path.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attn_tpu import flash_attn_varlen_func
from flash_attn_tpu.utils.testing import attention_ref

from tests.test_mask_mod_library import MODS, _oracle, S, H, D

# batch_window indexes an aux table with the batch coordinate, which is a
# per-row ARRAY on the varlen path (aux_at needs a scalar) — the one
# documented varlen-mods limitation.
VARLEN_MODS = sorted(set(MODS) - {"batch_window"})

LENS = [S, S - 37, S - 110]


@functools.lru_cache(maxsize=None)
def packed():
    total = sum(LENS)
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    q = jax.random.normal(ks[0], (total, H, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (total, H, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (total, H, D), jnp.bfloat16)
    cu = jnp.asarray(np.concatenate([[0], np.cumsum(LENS)]), jnp.int32)
    return q, k, v, cu


def _scale_oracle(q, k, v, gate, upcast, reorder):
    """Per-head score scale + causal (local-size version of the library's
    "scale" oracle, which hardcodes the SxS grid)."""
    ln = q.shape[1]
    sc = 1.0 / jnp.sqrt(D)
    dt = jnp.float32 if upcast else q.dtype
    qf, kf, vf = (x.astype(dt) for x in (q, k, v))
    if reorder:
        s = jnp.einsum("bthd,bshd->bhts", qf, kf * sc) * gate
    else:
        s = jnp.einsum("bthd,bshd->bhts", qf * sc, kf) * gate
    ri = jnp.arange(ln)[:, None]
    ci = jnp.arange(ln)[None, :]
    s = jnp.where((ci <= ri)[None, None], s.astype(jnp.float32),
                  float("-inf"))
    p = jax.nn.softmax(s, axis=-1).astype(dt)
    return jnp.einsum("bhts,bshd->bthd", p, vf).astype(q.dtype)


def _per_seq_oracle(q, k, v, spec, upcast, reorder):
    """Per-sequence dense oracle over the packed layout."""
    outs = []
    off = 0
    for ln in LENS:
        qs = q[off:off + ln][None]
        ks_ = k[off:off + ln][None]
        vs = v[off:off + ln][None]
        if isinstance(spec, tuple) and spec[0] == "scale":
            o = _scale_oracle(qs, ks_, vs, spec[1], upcast, reorder)
        elif isinstance(spec, tuple):
            o = _oracle(qs, ks_, vs, spec, upcast, reorder)
        else:
            o = attention_ref(
                qs, ks_, vs, attn_bias=spec[:, :, :ln, :ln],
                upcast=upcast, reorder_ops=reorder,
            )[0]
        outs.append(o[0])
        off += ln
    return jnp.concatenate(outs, axis=0)


@pytest.mark.parametrize("name", VARLEN_MODS)
def test_varlen_mod_conformance_fwd(name):
    q, k, v, cu = packed()
    kwargs, spec = MODS[name]()
    out = flash_attn_varlen_func(
        q, k, v, cu, cu, block_q=128, block_kv=128, **kwargs
    )
    ref = _per_seq_oracle(q, k, v, spec, True, False)
    pt = _per_seq_oracle(q, k, v, spec, False, True)
    err = jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)).max()
    base = jnp.abs(pt.astype(jnp.float32) - ref.astype(jnp.float32)).max()
    assert err <= 2 * base + 1e-5, f"{name}: err={err} base={base}"


@pytest.mark.parametrize(
    "name", ["doc_mask", "prefix_lm", "rel_bias_table", "head_gate_score"]
)
def test_varlen_mod_conformance_bwd(name):
    q, k, v, cu = packed()
    kwargs, spec = MODS[name]()

    def lk(q, k, v):
        return jnp.sum(
            flash_attn_varlen_func(
                q, k, v, cu, cu, block_q=128, block_kv=128, **kwargs
            ).astype(jnp.float32)
        )

    def lr(q, k, v):
        return jnp.sum(_per_seq_oracle(q, k, v, spec, True, False)
                       .astype(jnp.float32))

    def lp(q, k, v):
        return jnp.sum(_per_seq_oracle(q, k, v, spec, False, True)
                       .astype(jnp.float32))

    gk = jax.grad(lk, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(lr, argnums=(0, 1, 2))(q, k, v)
    gp = jax.grad(lp, argnums=(0, 1, 2))(q, k, v)
    for nm, a, r, p in zip(("dq", "dk", "dv"), gk, gr, gp):
        err = jnp.abs(a.astype(jnp.float32) - r.astype(jnp.float32)).max()
        base = jnp.abs(p.astype(jnp.float32) - r.astype(jnp.float32)).max()
        assert err <= 2 * base + 1e-4, f"{name} {nm}: err={err} base={base}"


def test_varlen_packed_bias_fwd_bwd():
    """Additive bias in packed coordinates (h, total_q, total_k) + dbias."""
    q, k, v, cu = packed()
    total = q.shape[0]
    bias = 0.5 * jax.random.normal(
        jax.random.PRNGKey(9), (H, total, total), jnp.float32
    )

    def fk(q, k, v, bias):
        return flash_attn_varlen_func(
            q, k, v, cu, cu, causal=True, attn_bias=bias, bias_grad=True,
            block_q=128, block_kv=128,
        )

    def fr(q, k, v, bias):
        outs = []
        off = 0
        for ln in LENS:
            b = bias[None, :, off:off + ln, off:off + ln]
            o = attention_ref(
                q[off:off + ln][None], k[off:off + ln][None],
                v[off:off + ln][None], attn_bias=b, causal=True,
            )[0]
            outs.append(o[0])
            off += ln
        return jnp.concatenate(outs, axis=0)

    out = fk(q, k, v, bias)
    ref = fr(q, k, v, bias)
    assert jnp.abs(
        out.astype(jnp.float32) - ref.astype(jnp.float32)
    ).max() < 3e-2

    gk = jax.grad(lambda *a: jnp.sum(fk(*a).astype(jnp.float32)),
                  argnums=(0, 1, 2, 3))(q, k, v, bias)
    gr = jax.grad(lambda *a: jnp.sum(fr(*a).astype(jnp.float32)),
                  argnums=(0, 1, 2, 3))(q, k, v, bias)
    for nm, a, r in zip(("dq", "dk", "dv", "dbias"), gk, gr):
        err = jnp.abs(a.astype(jnp.float32) - r.astype(jnp.float32)).max()
        assert err < 6e-2, f"{nm}: err={err}"
    # dbias must be zero outside each sequence's visible causal region.
    db = gk[3]
    assert jnp.abs(db[:, :LENS[0], LENS[0]:]).max() == 0.0
