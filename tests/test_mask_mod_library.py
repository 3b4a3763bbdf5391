"""Mask-mod / score-mod conformance library.

Mirrors the reference's flex-attention conformance pattern
(tests/cute/mask_mod_definitions.py:26-483 + tests/cute/test_mask_mod.py):
each mod is defined TWICE — once as a kernel-side mod (traced into the
Pallas kernels, with runtime captures via aux_tensors/aux_scalars) and once
as a dense oracle construction — and cross-checked forward AND backward.
"""

import functools

import jax
import jax.numpy as jnp
import pytest

from flash_attn_tpu import flash_attn_func
from flash_attn_tpu.kernels.common import BlockSizes, aux_at, aux_take
from flash_attn_tpu.utils.testing import attention_ref

B, S, H, D = 2, 256, 4, 64
BS = BlockSizes(block_q=128, block_kv=128)
NEG = float("-inf")


@functools.lru_cache(maxsize=None)
def qkv():
    ks = jax.random.split(jax.random.PRNGKey(7), 3)
    q = jax.random.normal(ks[0], (B, S, H, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, S, H, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, S, H, D), jnp.bfloat16)
    return q, k, v


def _grid():
    ri = jnp.arange(S)[:, None]
    ci = jnp.arange(S)[None, :]
    return ri, ci


# ---------------------------------------------------------------------------
# The mod library. Each entry: name -> (kernel_kwargs_fn, oracle_bias_fn).
# kernel_kwargs_fn() returns kwargs for flash_attn_func (mask_mod/score_mod
# + aux); oracle_bias_fn() returns a dense additive bias (b|1, h|1, S, S)
# fp32 encoding the same semantics (-inf = masked).
# ---------------------------------------------------------------------------

def _mask_bias(keep):  # bool (.., S, S) -> additive -inf bias
    return jnp.where(keep, 0.0, NEG).astype(jnp.float32)


def mod_causal():
    def mask_mod(b, h, q_idx, kv_idx):
        return kv_idx <= q_idx

    ri, ci = _grid()
    return dict(mask_mod=mask_mod), _mask_bias((ci <= ri)[None, None])


def mod_sliding_window():
    W = 64

    def mask_mod(b, h, q_idx, kv_idx):
        return jnp.logical_and(kv_idx <= q_idx, q_idx - kv_idx < W)

    ri, ci = _grid()
    keep = jnp.logical_and(ci <= ri, ri - ci < W)
    return dict(mask_mod=mask_mod), _mask_bias(keep[None, None])


def mod_chunked():
    C = 64

    def mask_mod(b, h, q_idx, kv_idx):
        return jnp.logical_and(
            kv_idx <= q_idx, kv_idx // C == q_idx // C
        )

    ri, ci = _grid()
    keep = jnp.logical_and(ci <= ri, ci // C == ri // C)
    return dict(mask_mod=mask_mod), _mask_bias(keep[None, None])


def mod_doc_mask():
    doc = jnp.asarray([0] * 100 + [1] * 90 + [2] * (S - 190), jnp.int32)

    def mask_mod(b, h, q_idx, kv_idx, aux):
        d = aux.tensors[0]
        return jnp.logical_and(
            kv_idx <= q_idx,
            aux_take(d, q_idx) == aux_take(d, kv_idx),
        )

    ri, ci = _grid()
    keep = jnp.logical_and(ci <= ri, doc[:, None] == doc[None, :])
    return dict(mask_mod=mask_mod, aux_tensors=(doc,)), _mask_bias(
        keep[None, None]
    )


def mod_prefix_lm():
    """Bidirectional over a runtime prefix length, causal after."""
    P = jnp.float32(80.0)

    def mask_mod(b, h, q_idx, kv_idx, aux):
        prefix = aux.scalars[0].astype(jnp.int32)
        return jnp.logical_or(kv_idx < prefix, kv_idx <= q_idx)

    ri, ci = _grid()
    keep = jnp.logical_or(ci < 80, ci <= ri)
    return dict(mask_mod=mask_mod, aux_scalars=(P,)), _mask_bias(
        keep[None, None]
    )


def mod_head_alternating():
    """Even heads causal, odd heads full attention."""

    def mask_mod(b, h, q_idx, kv_idx):
        return jnp.logical_or(h % 2 == 1, kv_idx <= q_idx)

    ri, ci = _grid()
    heads = jnp.arange(H).reshape(1, H, 1, 1)
    keep = jnp.logical_or(heads % 2 == 1, (ci <= ri)[None, None])
    return dict(mask_mod=mask_mod), _mask_bias(keep)


def mod_batch_window():
    """Per-batch runtime sliding-window widths from an aux tensor."""
    widths = jnp.asarray([48, 112], jnp.int32)

    def mask_mod(b, h, q_idx, kv_idx, aux):
        w = aux_at(aux.tensors[0], b)
        return jnp.logical_and(kv_idx <= q_idx, q_idx - kv_idx < w)

    ri, ci = _grid()
    keep = jnp.logical_and(
        (ci <= ri)[None], (ri - ci)[None] < widths[:, None, None]
    )[:, None]
    return dict(mask_mod=mask_mod, aux_tensors=(widths,)), _mask_bias(keep)


def mod_dilated():
    """Strided attention: only positions with matching parity, causal."""

    def mask_mod(b, h, q_idx, kv_idx):
        return jnp.logical_and(kv_idx <= q_idx, (q_idx - kv_idx) % 2 == 0)

    ri, ci = _grid()
    keep = jnp.logical_and(ci <= ri, (ri - ci) % 2 == 0)
    return dict(mask_mod=mask_mod), _mask_bias(keep[None, None])


def mod_rel_bias_table():
    """score_mod reading a runtime relative-position bias table (the FA4
    aux_tensors acceptance case, cute/interface.py:363-427)."""
    table = jax.random.normal(jax.random.PRNGKey(11), (2 * S - 1,),
                              jnp.float32) * 0.5

    def score_mod(scores, b, h, q_idx, kv_idx, aux):
        t = aux.tensors[0]
        return scores + aux_take(t, kv_idx - q_idx + S - 1)

    ri, ci = _grid()
    bias = table[ci - ri + S - 1][None, None]
    caus = _mask_bias((ci <= ri)[None, None])
    return (
        dict(score_mod=score_mod, aux_tensors=(table,), causal=True),
        bias + caus,
    )


def mod_alibi_score():
    """ALiBi expressed as a score_mod with runtime per-head slopes."""
    slopes = jnp.asarray([2.0 ** (-(i + 1)) for i in range(H)], jnp.float32)

    def score_mod(scores, b, h, q_idx, kv_idx, aux):
        return scores - aux_at(aux.tensors[0], h) * jnp.abs(
            (kv_idx - q_idx).astype(jnp.float32)
        )

    ri, ci = _grid()
    bias = -slopes.reshape(1, H, 1, 1) * jnp.abs(
        (ci - ri).astype(jnp.float32)
    )
    caus = _mask_bias((ci <= ri)[None, None])
    return (
        dict(score_mod=score_mod, aux_tensors=(slopes,), causal=True),
        bias + caus,
    )


def mod_head_gate_score():
    """Per-head multiplicative gate + runtime temperature scalar."""
    gate = jax.random.uniform(jax.random.PRNGKey(13), (H,), jnp.float32,
                              0.5, 1.5)

    def score_mod(scores, b, h, q_idx, kv_idx, aux):
        return scores * aux_at(aux.tensors[0], h) * aux.scalars[0]

    return (
        dict(score_mod=score_mod, aux_tensors=(gate,),
             aux_scalars=(jnp.float32(1.25),), causal=True),
        ("scale", gate.reshape(1, H, 1, 1) * 1.25),
    )


def mod_tanh_softcap_score():
    def score_mod(scores, b, h, q_idx, kv_idx):
        return jnp.tanh(scores / 30.0) * 30.0

    return dict(score_mod=score_mod, causal=True), ("softcap", 30.0)


MODS = {
    "causal": mod_causal,
    "sliding_window": mod_sliding_window,
    "chunked": mod_chunked,
    "doc_mask": mod_doc_mask,
    "prefix_lm": mod_prefix_lm,
    "head_alternating": mod_head_alternating,
    "batch_window": mod_batch_window,
    "dilated": mod_dilated,
    "rel_bias_table": mod_rel_bias_table,
    "alibi_score": mod_alibi_score,
    "head_gate_score": mod_head_gate_score,
    "tanh_softcap_score": mod_tanh_softcap_score,
}


def _oracle(q, k, v, spec, upcast, reorder):
    if isinstance(spec, tuple) and spec[0] == "softcap":
        return attention_ref(q, k, v, causal=True, softcap=spec[1],
                             upcast=upcast, reorder_ops=reorder)[0]
    if isinstance(spec, tuple) and spec[0] == "scale":
        # Per-head scale on the scaled scores: fold into a manual oracle.
        sc = 1.0 / jnp.sqrt(D)
        dt = jnp.float32 if upcast else q.dtype
        qf, kf, vf = (x.astype(dt) for x in (q, k, v))
        if reorder:
            s = jnp.einsum("bthd,bshd->bhts", qf, kf * sc) * spec[1]
        else:
            s = jnp.einsum("bthd,bshd->bhts", qf * sc, kf) * spec[1]
        ri, ci = _grid()
        s = jnp.where((ci <= ri)[None, None], s.astype(jnp.float32), NEG)
        p = jax.nn.softmax(s, axis=-1).astype(dt)
        return jnp.einsum("bhts,bshd->bthd", p, vf).astype(q.dtype)
    return attention_ref(q, k, v, attn_bias=spec, upcast=upcast,
                         reorder_ops=reorder)[0]


@pytest.mark.parametrize("name", sorted(MODS))
def test_mod_conformance_fwd(name):
    q, k, v = qkv()
    kwargs, spec = MODS[name]()
    out = flash_attn_func(q, k, v, block_sizes=BS, **kwargs)
    ref = _oracle(q, k, v, spec, True, False)
    pt = _oracle(q, k, v, spec, False, True)
    err = jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)).max()
    base = jnp.abs(pt.astype(jnp.float32) - ref.astype(jnp.float32)).max()
    assert err <= 2 * base + 1e-5, f"{name}: err={err} base={base}"


@pytest.mark.parametrize("name", sorted(MODS))
def test_mod_conformance_bwd(name):
    q, k, v = qkv()
    kwargs, spec = MODS[name]()

    def lk(q, k, v):
        return jnp.sum(
            flash_attn_func(q, k, v, block_sizes=BS, **kwargs)
            .astype(jnp.float32)
        )

    def lr(q, k, v):
        return jnp.sum(_oracle(q, k, v, spec, True, False)
                       .astype(jnp.float32))

    def lp(q, k, v):
        return jnp.sum(_oracle(q, k, v, spec, False, True)
                       .astype(jnp.float32))

    gk = jax.grad(lk, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(lr, argnums=(0, 1, 2))(q, k, v)
    gp = jax.grad(lp, argnums=(0, 1, 2))(q, k, v)
    for nm, a, r, p in zip(("dq", "dk", "dv"), gk, gr, gp):
        err = jnp.abs(a.astype(jnp.float32) - r.astype(jnp.float32)).max()
        base = jnp.abs(p.astype(jnp.float32) - r.astype(jnp.float32)).max()
        assert err <= 2 * base + 1e-4, f"{name} {nm}: err={err} base={base}"
