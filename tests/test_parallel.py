"""Parallelism tests on the 8-device CPU mesh — the JAX answer to the
reference's torchrun multi-GPU suites (tests/models/test_gpt_parallel.py:22,
tests/modules/test_mha_parallel.py, tests/losses/test_cross_entropy_parallel.py):
sharded forward/backward must match the single-device golden run."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from flash_attn_tpu.kernels.common import BlockSizes
from flash_attn_tpu.models.gpt import GPTConfig, GPTLMHeadModel
from flash_attn_tpu.parallel.context import ring_flash_attention
from flash_attn_tpu.parallel.cross_entropy import vocab_parallel_cross_entropy
from flash_attn_tpu.parallel.mesh import make_mesh
from flash_attn_tpu.parallel.sharding import param_shardings, shard_params
from flash_attn_tpu.losses.cross_entropy import cross_entropy_loss
from flash_attn_tpu.utils.testing import attention_ref

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)

CFG = GPTConfig(
    vocab_size=128, n_positions=0, n_embd=128, n_layer=2, n_head=8, n_head_kv=4,
    rotary_emb_fraction=1.0, rms_norm=True, activation_function="swiglu",
    qkv_proj_bias=False, out_proj_bias=False, mlp_fc1_bias=False,
    mlp_fc2_bias=False, tie_word_embeddings=False,
)


def _loss_fn(model, params, ids, labels):
    logits = model.apply(params, ids)
    return cross_entropy_loss(logits.astype(jnp.float32), labels)


@pytest.mark.parametrize("dp,tp", [(1, 4), (2, 2), (1, 8)])
def test_gpt_tp_matches_single_device(dp, tp):
    """Sharded fwd/bwd vs golden replicated run (test_gpt_parallel.py:22)."""
    model = GPTLMHeadModel(CFG)
    ids = jax.random.randint(jax.random.PRNGKey(0), (4, 32), 0, CFG.vocab_size)
    labels = jax.random.randint(jax.random.PRNGKey(1), (4, 32), 0, CFG.vocab_size)
    params = model.init(jax.random.PRNGKey(2), ids)

    golden_loss, golden_grads = jax.value_and_grad(
        lambda p: _loss_fn(model, p, ids, labels)
    )(params)

    mesh = make_mesh(data=dp, model=tp)
    with jax.set_mesh(mesh) if hasattr(jax, "set_mesh") else mesh:
        sharded = shard_params(params, mesh)
        ids_s = jax.device_put(ids, NamedSharding(mesh, P("data")))
        labels_s = jax.device_put(labels, NamedSharding(mesh, P("data")))
        loss, grads = jax.jit(
            jax.value_and_grad(lambda p: _loss_fn(model, p, ids_s, labels_s))
        )(sharded)

    assert abs(float(loss) - float(golden_loss)) < 2e-3, (loss, golden_loss)
    flat_g = jax.tree_util.tree_leaves(grads)
    flat_gold = jax.tree_util.tree_leaves(golden_grads)
    for a, b in zip(flat_g, flat_gold):
        err = jnp.abs(
            jnp.asarray(a, jnp.float32) - jnp.asarray(b, jnp.float32)
        ).max()
        assert err < 5e-2, err


@pytest.mark.parametrize("causal", [False, True])
def test_ring_attention_matches_dense(causal):
    mesh = make_mesh(context=8)
    b, h, s, d = 1, 2, 512, 64
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, h, s, d), jnp.float32).astype(jnp.bfloat16)
    k = jax.random.normal(kk, (b, h, s, d), jnp.float32).astype(jnp.bfloat16)
    v = jax.random.normal(kv, (b, h, s, d), jnp.float32).astype(jnp.bfloat16)

    out, lse = ring_flash_attention(q, k, v, mesh, causal=causal)

    qb, kb, vb = (x.transpose(0, 2, 1, 3) for x in (q, k, v))
    ref, _ = attention_ref(qb, kb, vb, causal=causal)
    pt, _ = attention_ref(qb, kb, vb, causal=causal, upcast=False,
                          reorder_ops=True)
    out_b = out.transpose(0, 2, 1, 3)
    err = jnp.abs(out_b.astype(jnp.float32) - ref.astype(jnp.float32)).max()
    base = jnp.abs(pt.astype(jnp.float32) - ref.astype(jnp.float32)).max()
    assert err <= 2 * base + 1e-4, (err, base)


def test_ring_attention_zigzag_matches_dense():
    """Zig-zag layout (causal load balance): shard r owns chunks (r, 2N-1-r);
    result after unsharding must equal dense causal attention."""
    from flash_attn_tpu.parallel.context import zigzag_shard, zigzag_unshard

    mesh = make_mesh(context=8)
    b, h, s, d = 1, 2, 512, 64
    key = jax.random.PRNGKey(3)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, h, s, d), jnp.float32).astype(jnp.bfloat16)
    k = jax.random.normal(kk, (b, h, s, d), jnp.float32).astype(jnp.bfloat16)
    v = jax.random.normal(kv, (b, h, s, d), jnp.float32).astype(jnp.bfloat16)

    qz, kz, vz = (zigzag_shard(x, 8) for x in (q, k, v))
    out_z, lse_z = ring_flash_attention(qz, kz, vz, mesh, causal=True,
                                        layout="zigzag")
    out = zigzag_unshard(out_z, 8)

    qb, kb, vb = (x.transpose(0, 2, 1, 3) for x in (q, k, v))
    ref, _ = attention_ref(qb, kb, vb, causal=True)
    pt, _ = attention_ref(qb, kb, vb, causal=True, upcast=False,
                          reorder_ops=True)
    out_b = out.transpose(0, 2, 1, 3)
    err = jnp.abs(out_b.astype(jnp.float32) - ref.astype(jnp.float32)).max()
    base = jnp.abs(pt.astype(jnp.float32) - ref.astype(jnp.float32)).max()
    assert err <= 2 * base + 1e-4, (err, base)
    # lse parity vs the contiguous-layout ring (same math, permuted rows).
    _, lse_c = ring_flash_attention(q, k, v, mesh, causal=True)
    lse_back = zigzag_unshard(lse_z[..., None], 8)[..., 0]
    assert jnp.abs(lse_back - lse_c).max() < 2e-2


def test_ring_attention_zigzag_backward():
    """Zig-zag ring backward: grads equal the dense kernel's grads."""
    from flash_attn_tpu import flash_attn_func
    from flash_attn_tpu.parallel.context import (
        ring_flash_attention_with_grad, zigzag_shard, zigzag_unshard,
    )

    mesh = make_mesh(context=4)
    b, h, s, d = 1, 2, 256, 64
    key = jax.random.PRNGKey(4)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, h, s, d), jnp.float32)
    k = jax.random.normal(kk, (b, h, s, d), jnp.float32)
    v = jax.random.normal(kv, (b, h, s, d), jnp.float32)

    def loss_dense(q, k, v):
        out = flash_attn_func(q, k, v, causal=True, layout="bhsd")
        return (out.astype(jnp.float32) ** 2).sum()

    def loss_zig(q, k, v):
        qz, kz, vz = (zigzag_shard(x, 4) for x in (q, k, v))
        out = ring_flash_attention_with_grad(
            qz, kz, vz, mesh, causal=True, layout="zigzag"
        )
        return (zigzag_unshard(out, 4).astype(jnp.float32) ** 2).sum()

    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    gz = jax.jit(jax.grad(loss_zig, argnums=(0, 1, 2)))(q, k, v)
    for a, bb in zip(gz, gd):
        err = jnp.abs(a - bb).max()
        scale = jnp.abs(bb).max()
        assert err < 2e-2 * scale + 1e-3, (err, scale)


def test_vocab_parallel_cross_entropy():
    mesh = make_mesh(model=8)
    tokens, vocab = 64, 256
    logits = jax.random.normal(jax.random.PRNGKey(0), (tokens, vocab), jnp.float32)
    labels = jax.random.randint(jax.random.PRNGKey(1), (tokens,), 0, vocab)
    labels = labels.at[5].set(-100)
    sharded_logits = jax.device_put(
        logits, NamedSharding(mesh, P(None, "model"))
    )
    loss = vocab_parallel_cross_entropy(
        sharded_logits, labels, mesh, label_smoothing=0.1, lse_square_scale=1e-4
    )
    ref = cross_entropy_loss(logits, labels, label_smoothing=0.1,
                             lse_square_scale=1e-4)
    assert abs(float(loss) - float(ref)) < 1e-5


def test_dryrun_multichip_entrypoint():
    """The driver's multi-chip dry run must compile and execute."""
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_round_robin_cp_matches_reference_contract():
    """The reference's kernel-level CP: KV round-robin sharded across ranks,
    each rank masks with abs_k_idx = local*W + rank (hopper/mask.h:103-105),
    caller LSE-merges partials (the vLLM CP usage). Two simulated ranks must
    reproduce full causal attention after the combine."""
    from flash_attn_tpu.kernels.flash_fwd import flash_attention_fwd
    from flash_attn_tpu.kernels.flash_decode import combine_partials

    b, h, s, d, W = 1, 2, 256, 64, 2
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, h, s, d), jnp.float32).astype(jnp.bfloat16)
    k = jax.random.normal(kk, (b, h, s, d), jnp.float32).astype(jnp.bfloat16)
    v = jax.random.normal(kv, (b, h, s, d), jnp.float32).astype(jnp.bfloat16)

    parts = []
    for rank in range(W):
        k_r = k[:, :, rank::W]  # round-robin shard
        v_r = v[:, :, rank::W]
        o_r, lse_r = flash_attention_fwd(
            q, k_r, v_r, causal=True,
            cp_world_size=W, cp_rank=rank, cp_tot_seqlen_k=s,
        )
        parts.append((o_r.astype(jnp.float32), lse_r))
    o, lse = combine_partials(
        jnp.stack([p[0] for p in parts]), jnp.stack([p[1] for p in parts])
    )
    full, lse_full = flash_attention_fwd(q, k, v, causal=True)
    assert jnp.abs(o - full.astype(jnp.float32)).max() < 2e-2
    assert jnp.abs(lse - lse_full).max() < 1e-3


def test_sequence_parallel_constraint_matches_golden():
    """TP run with explicit sequence-parallel activation constraints must
    still match the single-device golden result (the reference's
    sequence_parallel=True numerics contract)."""
    from flash_attn_tpu.parallel.sharding import sequence_parallel_constraint

    model = GPTLMHeadModel(CFG)
    ids = jax.random.randint(jax.random.PRNGKey(0), (4, 32), 0, CFG.vocab_size)
    params = model.init(jax.random.PRNGKey(2), ids)
    golden = model.apply(params, ids)

    mesh = make_mesh(model=8)
    with mesh:
        sharded = shard_params(params, mesh)

        @jax.jit
        def fwd(p, ids):
            emb = sequence_parallel_constraint(
                model.apply(p, ids), mesh
            )
            return emb

        out = fwd(sharded, ids)
    err = jnp.abs(
        out.astype(jnp.float32) - golden.astype(jnp.float32)
    ).max()
    assert err < 5e-2, err


@pytest.mark.parametrize("causal", [False, True])
def test_ring_attention_backward(causal):
    """Ring-attention gradients (beyond the reference's fwd-only CP) must
    match single-device flash-attention gradients."""
    from flash_attn_tpu.parallel.context import ring_flash_attention_with_grad
    from flash_attn_tpu import flash_attn_func

    mesh = make_mesh(context=4)
    b, h, s, d = 1, 2, 256, 64
    key = jax.random.PRNGKey(0)
    kq, kk, kv, kg = jax.random.split(key, 4)
    q = jax.random.normal(kq, (b, h, s, d), jnp.float32).astype(jnp.bfloat16)
    k = jax.random.normal(kk, (b, h, s, d), jnp.float32).astype(jnp.bfloat16)
    v = jax.random.normal(kv, (b, h, s, d), jnp.float32).astype(jnp.bfloat16)
    g = jax.random.normal(kg, q.shape, jnp.float32).astype(jnp.bfloat16)

    def loss_ring(q, k, v):
        out = ring_flash_attention_with_grad(q, k, v, mesh, causal=causal)
        return jnp.sum(out.astype(jnp.float32) * g.astype(jnp.float32))

    def loss_dense(q, k, v):
        out = flash_attn_func(q, k, v, causal=causal, layout="bhsd")
        return jnp.sum(out.astype(jnp.float32) * g.astype(jnp.float32))

    with mesh:
        gr = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(q, k, v)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for name, a, b_ in zip(("dq", "dk", "dv"), gr, gd):
        err = jnp.abs(
            a.astype(jnp.float32) - b_.astype(jnp.float32)
        ).max()
        assert err < 5e-2, (name, err)


def test_tp_generation_matches_single_device():
    """Greedy generation with TP-sharded parameters must match the
    single-device result (reference tests/models/test_gpt_generation_parallel.py)."""
    model = GPTLMHeadModel(CFG)
    prompt = jax.random.randint(jax.random.PRNGKey(5), (2, 6), 0, CFG.vocab_size)
    params = model.init(jax.random.PRNGKey(6), prompt)
    golden = model.generate(params, prompt, 14)

    mesh = make_mesh(model=4)
    with mesh:
        sharded = shard_params(params, mesh)
        seqs = model.generate(sharded, prompt, 14)
    assert jnp.array_equal(seqs, golden)


def test_mla_tp_generation_matches_single_device():
    """TP-sharded MLA GPT generation (head-sharded W_uk/W_uv, replicated
    latent cache) must equal the single-device run."""
    from flash_attn_tpu.models.gpt import GPTConfig, GPTLMHeadModel
    from flash_attn_tpu.parallel.sharding import shard_params

    cfg = GPTConfig(
        vocab_size=64, n_positions=0, n_embd=64, n_layer=2, n_head=4,
        attn_type="mla", kv_lora_rank=32, qk_nope_head_dim=16,
        qk_rope_head_dim=8, v_head_dim=16, rms_norm=True,
        activation_function="swiglu", qkv_proj_bias=False,
        out_proj_bias=False, mlp_fc1_bias=False, mlp_fc2_bias=False,
        tie_word_embeddings=True, dtype=jnp.float32,
    )
    model = GPTLMHeadModel(cfg)
    prompt = jax.random.randint(jax.random.PRNGKey(5), (2, 6), 0, 64)
    params = model.init(jax.random.PRNGKey(6), prompt)
    golden = model.generate(params, prompt, 14)

    mesh = make_mesh(model=4)
    sharded = shard_params(params, mesh)
    with mesh:
        out = model.generate(sharded, prompt, 14)
    assert jnp.array_equal(out, golden), (out, golden)


def test_ring_attention_qv_mla():
    """Ring CP with MLA absorbed qv scores (fwd, like the reference's
    fwd-only CP): contiguous and zig-zag layouts equal the dense absorbed
    oracle."""
    from flash_attn_tpu.parallel.context import zigzag_shard, zigzag_unshard

    mesh = make_mesh(context=4)
    b, h, s, d, dv = 1, 2, 256, 64, 128
    kq, kk, kv, kqv = jax.random.split(jax.random.PRNGKey(9), 4)
    q = jax.random.normal(kq, (b, h, s, d), jnp.float32)
    k = jax.random.normal(kk, (b, h, s, d), jnp.float32)
    v = jax.random.normal(kv, (b, h, s, dv), jnp.float32) * 0.3
    qv = jax.random.normal(kqv, (b, h, s, dv), jnp.float32) * 0.3
    scale = (d + dv) ** -0.5

    sc = (jnp.einsum("bhqd,bhkd->bhqk", q, k)
          + jnp.einsum("bhqe,bhke->bhqk", qv, v)) * scale
    rows = jnp.arange(s)[:, None]
    cols = jnp.arange(s)[None, :]
    sc = jnp.where(cols <= rows, sc, -jnp.inf)
    ref = jnp.einsum("bhqk,bhke->bhqe", jax.nn.softmax(sc, -1), v)

    out, _ = ring_flash_attention(q, k, v, mesh, qv=qv, causal=True,
                                  softmax_scale=scale)
    assert jnp.abs(out - ref).max() < 1e-3

    qz, kz, vz, qvz = (zigzag_shard(x, 4) for x in (q, k, v, qv))
    outz, _ = ring_flash_attention(qz, kz, vz, mesh, qv=qvz, causal=True,
                                   softmax_scale=scale, layout="zigzag")
    assert jnp.abs(zigzag_unshard(outz, 4) - ref).max() < 1e-3


@pytest.mark.parametrize("causal,gqa,window", [
    (False, False, (-1, -1)),
    (True, False, (-1, -1)),
    (True, True, (-1, -1)),
    (True, False, (128, 0)),  # sliding window — works under Ulysses as-is
])
def test_ulysses_attention_matches_dense(causal, gqa, window):
    """Ulysses all-to-all CP: head-scatter/sequence-gather around one stock
    kernel call must reproduce dense attention for any feature combo."""
    from flash_attn_tpu.parallel.ulysses import ulysses_flash_attention
    from flash_attn_tpu.utils.testing import attention_ref

    mesh = make_mesh(context=8)
    b, h, s, d = 1, 8, 512, 64
    hk = 8 // 2 if gqa else 8
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(5), 3)
    q = jax.random.normal(kq, (b, h, s, d), jnp.float32).astype(jnp.bfloat16)
    k = jax.random.normal(kk, (b, hk, s, d), jnp.float32).astype(jnp.bfloat16)
    v = jax.random.normal(kv, (b, hk, s, d), jnp.float32).astype(jnp.bfloat16)

    out = ulysses_flash_attention(q, k, v, mesh, causal=causal,
                                  window_size=window)

    qb, kb, vb = (x.transpose(0, 2, 1, 3) for x in (q, k, v))
    ref, _ = attention_ref(qb, kb, vb, causal=causal, window_size=window)
    pt, _ = attention_ref(qb, kb, vb, causal=causal, window_size=window,
                          upcast=False, reorder_ops=True)
    out_b = out.transpose(0, 2, 1, 3)
    err = jnp.abs(out_b.astype(jnp.float32) - ref.astype(jnp.float32)).max()
    base = jnp.abs(pt.astype(jnp.float32) - ref.astype(jnp.float32)).max()
    assert err <= 2 * base + 1e-4, (err, base)


def test_ulysses_attention_backward():
    """Grads flow through the transposed all-to-alls + kernel custom_vjp;
    must match the single-device kernel's grads."""
    from flash_attn_tpu.flash_attn_interface import flash_attn_func
    from flash_attn_tpu.parallel.ulysses import ulysses_flash_attention

    mesh = make_mesh(context=8)
    b, h, s, d = 1, 8, 256, 32
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(6), 3)
    q = jax.random.normal(kq, (b, h, s, d), jnp.float32)
    k = jax.random.normal(kk, (b, h, s, d), jnp.float32)
    v = jax.random.normal(kv, (b, h, s, d), jnp.float32)

    def loss_u(q, k, v):
        return ulysses_flash_attention(q, k, v, mesh, causal=True).sum()

    def loss_ref(q, k, v):
        return flash_attn_func(q, k, v, causal=True, layout="bhsd").sum()

    gu = jax.grad(loss_u, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gu, gr):
        assert jnp.abs(a - b_).max() < 1e-3


def test_ulysses_rejects_indivisible_heads():
    from flash_attn_tpu.parallel.ulysses import ulysses_flash_attention

    mesh = make_mesh(context=8)
    q = jnp.zeros((1, 4, 64, 32), jnp.bfloat16)  # h=4 < cp=8
    with pytest.raises(ValueError, match="divisible"):
        ulysses_flash_attention(q, q, q, mesh)


def test_parallel_linears_shard_standalone():
    """ColumnParallelLinear/RowParallelLinear constructed OUTSIDE
    parallel/sharding.py must actually shard (VERDICT r3 #8): kernel specs
    P(None, model) / P(model, None) applied via with_sharding_constraint,
    matching the reference classes that shard by construction
    (flash_attn/ops/fused_dense.py:166,206)."""
    from flash_attn_tpu.ops.fused_dense import (
        ColumnParallelLinear, RowParallelLinear,
    )

    mesh = make_mesh(data=1, model=8)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 64), jnp.float32)

    col = ColumnParallelLinear(features=128, dtype=jnp.float32,
                               param_dtype=jnp.float32)
    with mesh:
        cparams = col.init(jax.random.PRNGKey(1), x)
        y_col = jax.jit(col.apply)(cparams, x)
    # Output of a column-parallel matmul is sharded on the model axis.
    assert y_col.sharding.is_equivalent_to(
        NamedSharding(mesh, P(None, "model")), y_col.ndim
    ), y_col.sharding
    golden = x @ cparams["params"]["kernel"] + cparams["params"]["bias"]
    assert jnp.abs(y_col - golden).max() < 1e-5

    row = RowParallelLinear(features=32, dtype=jnp.float32,
                            param_dtype=jnp.float32)
    xr = jax.random.normal(jax.random.PRNGKey(2), (4, 128), jnp.float32)
    with mesh:
        rparams = row.init(jax.random.PRNGKey(3), xr)
        y_row = jax.jit(row.apply)(rparams, xr)
    golden_r = xr @ rparams["params"]["kernel"] + rparams["params"]["bias"]
    assert jnp.abs(y_row - golden_r).max() < 1e-4

    # Column -> Row composition: the Megatron MLP pattern, numerics must
    # survive the intermediate model-sharded activation.
    with mesh:
        y2 = jax.jit(lambda p1, p2, x: row.apply(
            p2, jax.nn.gelu(col.apply(p1, x))
        ))(cparams, rparams, x)
    ref = jax.nn.gelu(golden) @ rparams["params"]["kernel"] \
        + rparams["params"]["bias"]
    assert jnp.abs(y2 - ref).max() < 1e-4


def test_parallel_linears_require_mesh():
    """No ambient mesh and no mesh= arg -> loud error, never a silent
    plain Dense (VERDICT r3 #8)."""
    from flash_attn_tpu.ops.fused_dense import (
        ColumnParallelLinear, RowParallelLinear,
    )

    x = jnp.ones((2, 16), jnp.float32)
    with pytest.raises(ValueError, match="mesh"):
        ColumnParallelLinear(features=32).init(jax.random.PRNGKey(0), x)
    with pytest.raises(ValueError, match="mesh"):
        RowParallelLinear(features=32).init(jax.random.PRNGKey(0), x)
    # strict=False opts out explicitly (single-device debugging).
    p = ColumnParallelLinear(features=32, strict=False).init(
        jax.random.PRNGKey(0), x
    )
    assert p["params"]["kernel"].shape == (16, 32)
    # explicit mesh= works without a context manager.
    mesh = make_mesh(data=1, model=8)
    colm = ColumnParallelLinear(features=32, mesh=mesh,
                                param_dtype=jnp.float32)
    pm = colm.init(jax.random.PRNGKey(0), x)
    y = colm.apply(pm, x)
    assert y.shape == (2, 32)
    # wrong axis name -> loud error
    bad = ColumnParallelLinear(features=32, mesh=mesh, tp_axis="nope")
    with pytest.raises(ValueError, match="nope"):
        bad.init(jax.random.PRNGKey(0), x)
