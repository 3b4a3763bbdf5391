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

# fp32-exact on the CPU interpreter; on real TPUs fp32 matmuls default to
# bf16-pass precision, so compiled runs carry rounding noise.
TOL = 1e-4 if jax.default_backend() == "cpu" else 2e-3


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


# ---------------------------------------------------------------------------
# MLA weight-absorbed attention (FA4 qv, cute/interface.py:3066:
# O = softmax(scale*(Q K^T + Qv V^T)) V) and top-k KV gather
# (cute/topk_gather_kv.py).
# ---------------------------------------------------------------------------

def _qv_oracle(q, k, v, qv, causal, scale):
    qt, kt, vt, qvt = (
        x.transpose(0, 2, 1, 3).astype(jnp.float32) for x in (q, k, v, qv)
    )
    s = (jnp.einsum("bhqd,bhkd->bhqk", qt, kt)
         + jnp.einsum("bhqe,bhke->bhqk", qvt, vt)) * scale
    if causal:
        sq, sk = q.shape[1], k.shape[1]
        rows = jnp.arange(sq)[:, None]
        cols = jnp.arange(sk)[None, :]
        s = jnp.where(cols <= rows + (sk - sq), s, -jnp.inf)
    p = jax.nn.softmax(s, -1)
    return jnp.einsum("bhqk,bhke->bhqe", p, vt).transpose(0, 2, 1, 3)


@pytest.mark.parametrize("causal", [False, True])
def test_qv_absorbed_fwd_bwd(causal):
    b, sq, sk, h, d, dv = 1, 96, 160, 2, 64, 128
    q, k, v = make(jax.random.PRNGKey(3), b, sq, sk, h, h, d, dv,
                   dtype=jnp.float32)
    qv = jax.random.normal(jax.random.PRNGKey(4), (b, sq, h, dv),
                           jnp.float32) * 0.3
    v = v * 0.3
    scale = (d + dv) ** -0.5

    def loss(q, k, v, qv):
        o = flash_attn_func(q, k, v, qv=qv, causal=causal, block_sizes=BS)
        return (o.astype(jnp.float32) ** 2).sum()

    def oloss(q, k, v, qv):
        return (_qv_oracle(q, k, v, qv, causal, scale) ** 2).sum()

    out = flash_attn_func(q, k, v, qv=qv, causal=causal, block_sizes=BS)
    ref = _qv_oracle(q, k, v, qv, causal, scale)
    assert jnp.abs(out - ref).max() < max(1e-3, TOL)

    g = jax.grad(loss, argnums=(0, 1, 2, 3))(q, k, v, qv)
    go = jax.grad(oloss, argnums=(0, 1, 2, 3))(q, k, v, qv)
    for name, a, bb in zip(("dq", "dk", "dv", "dqv"), g, go):
        err = jnp.abs(a - bb).max()
        assert err < max(1e-3, 10 * TOL), (name, err)


def test_qv_absorbed_decode():
    """MLA absorbed decode (hopper/benchmark_mla_decode.py shape family,
    scaled down): MQA over one latent KV head, qv scores."""
    from flash_attn_tpu.kernels.flash_decode import flash_attention_decode

    b, sq, h, d, dv, smax = 2, 1, 4, 64, 128, 300
    kq, kk, kv, kqv = jax.random.split(jax.random.PRNGKey(5), 4)
    q = jax.random.normal(kq, (b, sq, h, d), jnp.float32)
    kc = jax.random.normal(kk, (b, 1, smax, d), jnp.float32)
    vc = jax.random.normal(kv, (b, 1, smax, dv), jnp.float32) * 0.3
    qv = jax.random.normal(kqv, (b, sq, h, dv), jnp.float32) * 0.3
    lens = jnp.asarray([200, 300], jnp.int32)
    out, _ = flash_attention_decode(q, kc, vc, lens, qv=qv)
    scale = (d + dv) ** -0.5
    for bi in range(b):
        L = int(lens[bi])
        s = (jnp.einsum("shd,kd->hsk", q[bi], kc[bi, 0, :L])
             + jnp.einsum("she,ke->hsk", qv[bi], vc[bi, 0, :L])) * scale
        p = jax.nn.softmax(s, -1)
        ref = jnp.einsum("hsk,ke->she", p, vc[bi, 0, :L])
        assert jnp.abs(out[bi] - ref).max() < TOL


def test_topk_gather_kv():
    """gather_kv_indices: per-row top-k attention == dense attention with
    everything outside the set masked; grads flow (pure-XLA path)."""
    b, sq, sk, h, d, dv, t = 1, 8, 64, 2, 32, 48, 16
    q, k, v = make(jax.random.PRNGKey(6), b, sq, sk, h, h, d, dv,
                   dtype=jnp.float32)
    qv = jax.random.normal(jax.random.PRNGKey(7), (b, sq, h, dv),
                           jnp.float32) * 0.3
    v = v * 0.3
    rng = jax.random.PRNGKey(8)
    idx = jnp.stack([
        jnp.stack([
            jax.random.choice(jax.random.fold_in(rng, i * 100 + si), sk,
                              (t,), replace=False)
            for si in range(sq)
        ])
        for i in range(b)
    ]).astype(jnp.int32)
    idx = idx.at[:, 0, -1].set(-1)  # a masked (padding) slot

    out = flash_attn_func(q, k, v, qv=qv, gather_kv_indices=idx)
    # Oracle: dense scores with non-selected keys masked.
    scale = (d + dv) ** -0.5
    qt, kt, vt, qvt = (
        x.transpose(0, 2, 1, 3).astype(jnp.float32) for x in (q, k, v, qv)
    )
    s = (jnp.einsum("bhqd,bhkd->bhqk", qt, kt)
         + jnp.einsum("bhqe,bhke->bhqk", qvt, vt)) * scale
    keep = jnp.zeros((b, sq, sk), bool)
    for bi in range(b):
        for si in range(sq):
            for ti in range(t):
                j = int(idx[bi, si, ti])
                if j >= 0:
                    keep = keep.at[bi, si, j].set(True)
    s = jnp.where(keep[:, None], s, -jnp.inf)
    p = jax.nn.softmax(s, -1)
    ref = jnp.einsum("bhqk,bhke->bhqe", p, vt).transpose(0, 2, 1, 3)
    assert jnp.abs(out - ref).max() < TOL
    # Differentiable without a custom vjp.
    gfn = jax.grad(lambda q: (flash_attn_func(
        q, k, v, qv=qv, gather_kv_indices=idx).astype(jnp.float32) ** 2).sum())
    assert jnp.isfinite(gfn(q)).all()


def test_qv_absorbed_varlen():
    """Varlen qv (FA4 flash_attn_varlen_func qv arg): packed two-sequence
    causal absorbed attention + grads vs per-sequence oracle."""
    from flash_attn_tpu import flash_attn_varlen_func

    q_lens, k_lens = [60, 37], [80, 50]
    tq, tk = sum(q_lens), sum(k_lens)
    h, d, dv = 2, 64, 128
    import numpy as np
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(tq, h, d), jnp.float32)
    k = jnp.asarray(rng.randn(tk, h, d), jnp.float32)
    v = jnp.asarray(rng.randn(tk, h, dv) * 0.3, jnp.float32)
    qv = jnp.asarray(rng.randn(tq, h, dv) * 0.3, jnp.float32)
    cu_q = jnp.asarray(np.concatenate([[0], np.cumsum(q_lens)]), jnp.int32)
    cu_k = jnp.asarray(np.concatenate([[0], np.cumsum(k_lens)]), jnp.int32)
    scale = (d + dv) ** -0.5

    def oracle(q, k, v, qv):
        outs = []
        for i in range(2):
            qs, ks = q[cu_q[i]:cu_q[i + 1]], k[cu_k[i]:cu_k[i + 1]]
            vs, qvs = v[cu_k[i]:cu_k[i + 1]], qv[cu_q[i]:cu_q[i + 1]]
            s = (jnp.einsum("qhd,khd->hqk", qs, ks)
                 + jnp.einsum("qhe,khe->hqk", qvs, vs)) * scale
            sqi, ski = qs.shape[0], ks.shape[0]
            rows = jnp.arange(sqi)[:, None]
            cols = jnp.arange(ski)[None, :]
            s = jnp.where(cols <= rows + (ski - sqi), s, -jnp.inf)
            outs.append(jnp.einsum("hqk,khe->qhe", jax.nn.softmax(s, -1), vs))
        return jnp.concatenate(outs)

    out = flash_attn_varlen_func(q, k, v, cu_q, cu_k, causal=True, qv=qv,
                                 block_q=128, block_kv=128)
    assert jnp.abs(out - oracle(q, k, v, qv)).max() < TOL

    g = jax.grad(lambda *a: (flash_attn_varlen_func(
        *a[:3], cu_q, cu_k, causal=True, qv=a[3], block_q=128, block_kv=128
    ).astype(jnp.float32) ** 2).sum(), argnums=(0, 1, 2, 3))(q, k, v, qv)
    go = jax.grad(lambda *a: (oracle(*a) ** 2).sum(),
                  argnums=(0, 1, 2, 3))(q, k, v, qv)
    for name, a, bb in zip(("dq", "dk", "dv", "dqv"), g, go):
        assert jnp.abs(a - bb).max() < max(1e-3, 10 * TOL), name


def test_topk_gather_kv_varlen():
    """Varlen gather_kv_indices (per-sequence-relative top-k) vs masked
    dense varlen oracle, causal + masked padding slots."""
    from flash_attn_tpu import flash_attn_varlen_func
    import numpy as np

    q_lens, k_lens = [20, 12], [30, 25]
    tq, tk = sum(q_lens), sum(k_lens)
    h, d, dv, t = 2, 32, 48, 8
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(tq, h, d), jnp.float32)
    k = jnp.asarray(rng.randn(tk, h, d), jnp.float32)
    v = jnp.asarray(rng.randn(tk, h, dv) * 0.3, jnp.float32)
    qv = jnp.asarray(rng.randn(tq, h, dv) * 0.3, jnp.float32)
    cu_q = jnp.asarray(np.concatenate([[0], np.cumsum(q_lens)]), jnp.int32)
    cu_k = jnp.asarray(np.concatenate([[0], np.cumsum(k_lens)]), jnp.int32)
    idx = np.full((tq, t), -1, np.int32)
    row = 0
    for i, (ql, kl) in enumerate(zip(q_lens, k_lens)):
        for r in range(ql):
            cand = rng.choice(kl, min(t, kl), replace=False)
            idx[row, : len(cand)] = np.sort(cand)
            row += 1
    idx_j = jnp.asarray(idx)

    out = flash_attn_varlen_func(q, k, v, cu_q, cu_k, causal=True, qv=qv,
                                 gather_kv_indices=idx_j)
    # Oracle: per-sequence dense with non-selected / acausal keys masked.
    scale = (d + dv) ** -0.5
    outs = []
    row = 0
    for i, (ql, kl) in enumerate(zip(q_lens, k_lens)):
        qs = q[cu_q[i]:cu_q[i + 1]]
        ks = k[cu_k[i]:cu_k[i + 1]]
        vs = v[cu_k[i]:cu_k[i + 1]]
        qvs = qv[cu_q[i]:cu_q[i + 1]]
        s = (jnp.einsum("qhd,khd->hqk", qs, ks, precision="highest")
             + jnp.einsum("qhe,khe->hqk", qvs, vs,
                          precision="highest")) * scale
        keep = np.zeros((ql, kl), bool)
        for r in range(ql):
            for j in idx[row + r]:
                if 0 <= j < kl and j <= r + (kl - ql):
                    keep[r, j] = True
        s = jnp.where(jnp.asarray(keep)[None], s, -jnp.inf)
        p = jax.nn.softmax(s, -1)
        p = jnp.where(jnp.asarray(keep.any(-1))[None, :, None], p, 0.0)
        outs.append(jnp.einsum("hqk,khe->qhe", p, vs, precision="highest"))
        row += ql
    ref = jnp.concatenate(outs)
    assert jnp.abs(out - ref).max() < TOL


def test_flash_attn_combine_public():
    """Public flash_attn_combine (FA4 cute/interface.py:3337) merges split
    partials to the unsplit result."""
    from flash_attn_tpu import flash_attn_func
    from flash_attn_tpu.flash_attn_interface import flash_attn_combine

    b, s, h, d = 1, 64, 2, 32
    q, k, v = make(jax.random.PRNGKey(9), b, s, s, h, h, d, d,
                   dtype=jnp.float32)
    half = s // 2
    o1, lse1, _ = flash_attn_func(q, k[:, :half], v[:, :half],
                                  return_attn_probs=True)
    o2, lse2, _ = flash_attn_func(q, k[:, half:], v[:, half:],
                                  return_attn_probs=True)
    # partials: (n, b, s, h, d); lse comes back (b, h, s) -> (n, b, s, h)
    op = jnp.stack([o1.astype(jnp.float32), o2.astype(jnp.float32)])
    lp = jnp.stack([lse1.transpose(0, 2, 1), lse2.transpose(0, 2, 1)])
    o, lse = flash_attn_combine(op, lp)
    ref = flash_attn_func(q, k, v)
    assert jnp.abs(o - ref.astype(jnp.float32)).max() < TOL


def test_mla_module_end_to_end():
    """MLA module (DeepSeek-style latent attention on the absorbed-qv
    kernels): matches the per-head-expanded oracle; chunked prefill +
    one-token decode against the latent cache matches the full forward;
    gradients flow through the absorbed path."""
    from flash_attn_tpu.modules.mha import InferenceParams
    from flash_attn_tpu.modules.mla import MLA

    b, s, e, h = 1, 12, 64, 4
    dn, dr, dc, dv = 16, 8, 32, 16
    mla = MLA(embed_dim=e, num_heads=h, kv_lora_rank=dc,
              qk_nope_head_dim=dn, qk_rope_head_dim=dr, v_head_dim=dv,
              dtype=jnp.float32, layer_idx=0)
    x = jax.random.normal(jax.random.PRNGKey(0), (b, s, e))
    params = mla.init(jax.random.PRNGKey(1), x)
    full = mla.apply(params, x)

    # Oracle: expand the latent to per-head K/V, naive causal attention.
    p = params["params"]
    from flash_attn_tpu.layers.rotary import RotaryEmbedding
    from flash_attn_tpu.ops.rotary import apply_rotary_emb
    q = (x @ p["W_q"]["kernel"]).reshape(b, s, h, dn + dr)
    qn, qr = q[..., :dn], q[..., dn:]
    ckv = x @ p["W_dkv"]["kernel"]
    c, kr = ckv[..., :dc], ckv[..., dc:]
    cos, sin = RotaryEmbedding(dr).cos_sin(s)
    z = jnp.zeros((b,), jnp.int32)
    qr = apply_rotary_emb(qr, cos, sin, seqlen_offsets=z)
    kr = apply_rotary_emb(kr[:, :, None], cos, sin, seqlen_offsets=z)[:, :, 0]
    kn = jnp.einsum("bsc,hnc->bshn", c, p["W_uk"])
    v = jnp.einsum("bsc,hcv->bshv", c, p["W_uv"])
    sco = (jnp.einsum("bqhn,bkhn->bhqk", qn, kn)
           + jnp.einsum("bqhr,bkr->bhqk", qr, kr)) * (dn + dr) ** -0.5
    rows = jnp.arange(s)[:, None]
    cols = jnp.arange(s)[None, :]
    sco = jnp.where(cols <= rows, sco, -jnp.inf)
    o = jnp.einsum("bhqk,bkhv->bqhv", jax.nn.softmax(sco, -1), v)
    ref = o.reshape(b, s, h * dv) @ p["out_proj"]["kernel"]
    assert jnp.abs(full - ref).max() < max(1e-3, 10 * TOL)

    # Prefill + decode parity against the latent cache.
    smax = 16
    ip = InferenceParams(max_seqlen=smax, max_batch_size=b,
                         key_value_memory_dict={0: mla.allocate_cache(b, smax)})
    ip.seqlen_offset = 0
    out_pre = mla.apply(params, x[:, :7], inference_params=ip)
    assert jnp.abs(out_pre - full[:, :7]).max() < max(1e-3, 10 * TOL)
    for t in range(7, s):
        ip.seqlen_offset = t
        ot = mla.apply(params, x[:, t : t + 1], inference_params=ip)
        assert jnp.abs(ot - full[:, t : t + 1]).max() < max(1e-3, 10 * TOL), t

    # Gradients flow (training through the absorbed form).
    g = jax.grad(lambda pp: (mla.apply(pp, x).astype(jnp.float32) ** 2).sum())(
        params)
    flat = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.isfinite(t).all()) for t in flat)
    assert any(float(jnp.abs(t).max()) > 0 for t in flat)


def test_qv_absorbed_decode_small_pages():
    """MLA absorbed decode routes to the multipage DMA-pipeline kernel at
    small page sizes (qv + unequal d_v in the gather pipeline)."""
    import numpy as np

    from flash_attn_tpu.kernels.flash_decode import flash_attention_decode

    b, sq, h, d, dv, page, npg = 2, 1, 4, 64, 128, 64, 10
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(b, sq, h, d), jnp.float32)
    qv = jnp.asarray(rng.randn(b, sq, h, dv) * 0.3, jnp.float32)
    k_pages = jnp.asarray(rng.randn(b * npg, 1, page, d), jnp.float32)
    v_pages = jnp.asarray(rng.randn(b * npg, 1, page, dv) * 0.3, jnp.float32)
    table = jnp.arange(b * npg, dtype=jnp.int32).reshape(b, npg)
    lens = jnp.asarray([500, 640], jnp.int32)
    out, _ = flash_attention_decode(q, k_pages, v_pages, lens, qv=qv,
                                    block_table=table)
    scale = (d + dv) ** -0.5
    for bi in range(b):
        L = int(lens[bi])
        kc = k_pages.reshape(b, npg * page, d)[bi, :L]
        vc = v_pages.reshape(b, npg * page, dv)[bi, :L]
        s = (jnp.einsum("shd,kd->hsk", q[bi], kc)
             + jnp.einsum("she,ke->hsk", qv[bi], vc)) * scale
        ref = jnp.einsum("hsk,ke->she", jax.nn.softmax(s, -1), vc)
        assert jnp.abs(out[bi] - ref).max() < TOL
