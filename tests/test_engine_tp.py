"""Multi-chip (TP-sharded) serving engine tests.

The serving stack must work under tensor parallelism: params sharded over
the mesh's model axis (parallel/sharding.py path rules), the engine's two
compiled programs (prefill/decode) GSPMD-partitioned, and the generated
tokens identical to the single-device engine (greedy). This is the
vLLM-on-FA3 serving posture (vllm_flash_attn/flash_attn_interface.py:84)
exercised on a virtual device mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attn_tpu.models.gpt import GPTConfig, GPTLMHeadModel
from flash_attn_tpu.parallel.mesh import make_mesh
from flash_attn_tpu.parallel.sharding import shard_params
from flash_attn_tpu.runtime.engine import EngineConfig, LLMEngine

CFG = GPTConfig(
    # vocab divisible by the model axis (vocab-parallel embedding)
    vocab_size=96, n_positions=0, n_embd=64, n_layer=2, n_head=4, n_head_kv=2,
    rotary_emb_fraction=1.0, rms_norm=True, activation_function="swiglu",
    qkv_proj_bias=False, out_proj_bias=False, mlp_fc1_bias=False,
    mlp_fc2_bias=False, tie_word_embeddings=True,
)

ENG = dict(max_batch_size=4, page_size=64, num_pages=64, max_pages_per_seq=8,
           prefill_chunk=64, max_seqlen=512)


@pytest.fixture(scope="module")
def model_and_params():
    model = GPTLMHeadModel(CFG)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))
    return model, params


@pytest.fixture(scope="module")
def prompts():
    rng = np.random.RandomState(3)
    return [rng.randint(0, CFG.vocab_size, int(n)).tolist()
            for n in (37, 90, 5, 130)]


def _tokens(outs):
    return list(outs)  # generate() returns token lists in prompt order


def test_engine_tp_matches_single_device(model_and_params, prompts):
    """Greedy TP-sharded serving == single-device serving, token for token
    — prefill (chunked), decode, and batch assembly all run GSPMD-sharded."""
    if jax.device_count() < 2:
        pytest.skip("needs >=2 devices")
    model, params = model_and_params
    ref = _tokens(
        LLMEngine(model, params, EngineConfig(**ENG)).generate(prompts, 12)
    )

    mesh = make_mesh(data=1, model=2)
    with mesh:
        tp_params = shard_params(params, mesh)
        engine = LLMEngine(model, tp_params, EngineConfig(**ENG))
        got = _tokens(engine.generate(prompts, 12))
    assert got == ref


def test_engine_tp_prefix_cache_and_multistep(model_and_params, prompts):
    """Prefix-cache hits and multi-step decode under TP sharding."""
    if jax.device_count() < 2:
        pytest.skip("needs >=2 devices")
    model, params = model_and_params
    shared = prompts[1][:64]  # page-aligned shared prefix
    pset = [shared + p for p in (prompts[0], prompts[2])]
    ref = _tokens(
        LLMEngine(model, params, EngineConfig(**ENG)).generate(pset, 10)
    )
    mesh = make_mesh(data=1, model=2)
    with mesh:
        tp_params = shard_params(params, mesh)
        engine = LLMEngine(
            model, tp_params,
            EngineConfig(enable_prefix_caching=True, decode_depth=2, **ENG),
        )
        got = _tokens(engine.generate(pset[:1], 10))
        got += _tokens(engine.generate(pset[1:], 10))  # prefix hit
        assert engine.prefix_cache.hits >= 1
    assert got == ref


def test_engine_tp_speculative(model_and_params, prompts):
    """Speculative decoding (draft == target) under TP sharding: exact
    greedy parity with all drafts accepted."""
    if jax.device_count() < 2:
        pytest.skip("needs >=2 devices")
    model, params = model_and_params
    ref = _tokens(
        LLMEngine(model, params, EngineConfig(**ENG)).generate(
            prompts[:2], 10
        )
    )
    mesh = make_mesh(data=1, model=2)
    with mesh:
        tp_params = shard_params(params, mesh)
        engine = LLMEngine(
            model, tp_params, EngineConfig(speculative_k=3, **ENG),
            draft_model=model, draft_params=tp_params,
        )
        got = _tokens(engine.generate(prompts[:2], 10))
    assert got == ref


@pytest.mark.parametrize("kv_dtype,scale", [("int8", 0.05), ("fp8", 1.0)])
def test_engine_tp_quantized_kv(model_and_params, prompts, kv_dtype, scale):
    """Quantized-KV serving under TP (VERDICT r3 #3): head-sharded
    quantized pools + per-head descales must reproduce the single-device
    QUANTIZED engine token-for-token (same quant arithmetic on both)."""
    if jax.device_count() < 2:
        pytest.skip("needs >=2 devices")
    model, params = model_and_params
    eng_kw = dict(kv_cache_dtype=kv_dtype, kv_cache_scale=scale, **ENG)
    ref = _tokens(
        LLMEngine(model, params, EngineConfig(**eng_kw)).generate(
            prompts[:3], 10
        )
    )
    mesh = make_mesh(data=1, model=2)
    with mesh:
        tp_params = shard_params(params, mesh)
        engine = LLMEngine(model, tp_params, EngineConfig(**eng_kw))
        got = _tokens(engine.generate(prompts[:3], 10))
    assert got == ref
