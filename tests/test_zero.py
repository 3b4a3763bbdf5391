"""ZeRO-1/2/3 sharding on the 8-device CPU mesh.

Reference: training/src/utils/ddp_zero1.py (DDPStrategyZero1). Checks both
the numerics contract (sharded training matches the single-device golden
run bitwise-closely) and the collective contract (stage >= 2 compiles to a
reduce-scatter of gradients instead of an all-reduce)."""

import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from flash_attn_tpu.models.gpt import GPTConfig, GPTLMHeadModel
from flash_attn_tpu.parallel.mesh import make_mesh
from flash_attn_tpu.parallel.zero import zero_param_specs
from flash_attn_tpu.training.trainer import TrainConfig, Trainer

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)

CFG = GPTConfig(
    vocab_size=128, n_positions=0, n_embd=128, n_layer=2, n_head=8,
    rotary_emb_fraction=1.0, rms_norm=True, qkv_proj_bias=False,
    out_proj_bias=False, tie_word_embeddings=False,
)


def _data(steps, b=8, s=32):
    key = jax.random.PRNGKey(7)
    for i in range(steps):
        ids = jax.random.randint(
            jax.random.fold_in(key, i), (b, s + 1), 0, CFG.vocab_size
        )
        yield ids[:, :-1], ids[:, 1:]


def _run(stage, mesh, steps=3):
    model = GPTLMHeadModel(CFG)
    params = model.init(
        jax.random.PRNGKey(2), jnp.zeros((1, 8), jnp.int32)
    )
    cfg = TrainConfig(lr=1e-3, warmup_steps=0, total_steps=steps,
                      schedule="constant", zero_stage=stage)
    tr = Trainer(model, params, cfg, mesh=mesh)
    cm = mesh if mesh is not None else jax.default_device(jax.devices()[0])
    with cm:
        for ids, labels in _data(steps):
            if mesh is not None:
                ids = jax.device_put(ids, NamedSharding(mesh, P("data")))
                labels = jax.device_put(labels, NamedSharding(mesh, P("data")))
            tr.params, tr.opt_state, loss, _ = tr._train_step(
                tr.params, tr.opt_state, ids, labels, jax.random.PRNGKey(0)
            )
    return tr, float(loss)


def test_zero_param_specs_extend_tp():
    mesh = make_mesh(data=4, model=2)
    params = {
        "h": {"mlp": {"fc1": {"kernel": jnp.zeros((64, 256)),
                              "bias": jnp.zeros((256,))},
                      "fc2": {"kernel": jnp.zeros((256, 64))}}},
        "odd": jnp.zeros((3, 5)),  # nothing divisible by dp=4 -> replicated
    }
    specs = zero_param_specs(params, mesh)
    # fc1 kernel: TP on out-dim; ZeRO adds data on the larger free dim
    # (out local 256/2=128 > in 64), stacking with "model".
    assert specs["h"]["mlp"]["fc1"]["kernel"] == P(None, ("model", "data"))
    assert specs["h"]["mlp"]["fc1"]["bias"] == P(("model", "data"))
    assert specs["h"]["mlp"]["fc2"]["kernel"] == P(("model", "data"), None)
    assert specs["odd"] == P()


@pytest.mark.parametrize("stage", [1, 2, 3])
def test_zero_matches_plain_dp(stage):
    """ZeRO is a memory layout, not a different optimizer: training under
    any stage must follow the plain data-parallel trajectory on the same
    mesh (isolates ZeRO from dp reduction-order noise, which adam's
    first-step m/sqrt(v) sign behavior would amplify)."""
    mesh = make_mesh(data=4)
    golden, loss0 = _run(0, mesh)
    zt, loss = _run(stage, mesh)
    assert abs(loss - loss0) < 2e-3, (stage, loss, loss0)
    for a, b in zip(jax.tree_util.tree_leaves(zt.params),
                    jax.tree_util.tree_leaves(golden.params)):
        err = jnp.abs(jnp.asarray(a, jnp.float32)
                      - jnp.asarray(b, jnp.float32)).max()
        assert err < 5e-3, (stage, err)


def _compiled_for(stage, mesh, model, params, ids):
    cfg = TrainConfig(lr=1e-2, warmup_steps=0, total_steps=1,
                      schedule="constant", zero_stage=stage)
    tr = Trainer(model, params, cfg, mesh=mesh)
    with mesh:
        sharded_ids = jax.device_put(ids, NamedSharding(mesh, P("data")))
        lowered = tr._train_step.lower(
            tr.params, tr.opt_state, sharded_ids, sharded_ids,
            jax.random.PRNGKey(0),
        )
        return lowered.compile()


def _dp_sharded_frac(shardings):
    """Fraction of array leaves whose output sharding splits the data axis
    (i.e. is not fully replicated on an 8-way data mesh)."""
    leaves = [s for s in jax.tree_util.tree_leaves(shardings)
              if hasattr(s, "is_fully_replicated")]
    if not leaves:
        return 0.0
    return sum(not s.is_fully_replicated for s in leaves) / len(leaves)


@pytest.mark.parametrize("stage", [1, 2, 3])
def test_zero_memory_contract(stage):
    """The defining ZeRO contract is memory layout: the compiled train step
    must OUTPUT dp-sharded optimizer state (stage >= 1) and dp-sharded
    parameters (stage 3), where plain DP outputs replicated arrays. This is
    portable across backends (the CPU GSPMD partitioner decomposes
    reduce-scatter into all-reduce + dynamic-slice, so HLO string matching
    is not)."""
    mesh = make_mesh(data=8)
    model = GPTLMHeadModel(CFG)
    params = model.init(jax.random.PRNGKey(2), jnp.zeros((1, 8), jnp.int32))
    ids = jnp.zeros((8, 32), jnp.int32)

    base = _compiled_for(0, mesh, model, params, ids)
    comp = _compiled_for(stage, mesh, model, params, ids)
    # outputs = (params, opt_state, loss, gnorm)
    base_params, base_opt = base.output_shardings[0], base.output_shardings[1]
    z_params, z_opt = comp.output_shardings[0], comp.output_shardings[1]

    assert _dp_sharded_frac(base_opt) == 0.0
    assert _dp_sharded_frac(base_params) == 0.0
    # Most opt-state leaves (adam mu/nu for every non-tiny param) shard.
    assert _dp_sharded_frac(z_opt) > 0.5, stage
    if stage >= 3:
        assert _dp_sharded_frac(z_params) > 0.5
    else:
        assert _dp_sharded_frac(z_params) == 0.0

    # Collective contract, backend-tolerant: stage 2 either emits a true
    # reduce-scatter or the CPU-partitioner decomposition (all-reduce
    # followed by a dynamic-slice of the grad). Either way stage 0 keeps
    # the classic full all-reduce.
    if stage == 2:
        hlo = comp.as_text()
        assert "reduce-scatter" in hlo or "dynamic-slice" in hlo
        assert "all-reduce" in base.as_text()
