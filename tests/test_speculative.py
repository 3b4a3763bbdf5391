"""End-to-end speculative decoding tests (reference: speculative tests in
tests/models/test_gpt.py): greedy speculative output must equal the
target's own greedy decode, for any draft model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attn_tpu.models.gpt import GPTConfig, GPTLMHeadModel
from flash_attn_tpu.runtime.generation import decode_speculative, make_apply_fn


def make_model(key, n_embd=64, n_layer=2):
    cfg = GPTConfig(
        vocab_size=61, n_positions=0, n_embd=n_embd, n_layer=n_layer,
        n_head=4, rotary_emb_fraction=1.0, rms_norm=True,
        activation_function="swiglu", qkv_proj_bias=False,
        out_proj_bias=False, mlp_fc1_bias=False, mlp_fc2_bias=False,
        tie_word_embeddings=True,
    )
    model = GPTLMHeadModel(cfg)
    params = model.init(key, jnp.zeros((1, 8), jnp.int32))
    return model, params


@pytest.mark.parametrize("gamma", [1, 3, 5])
def test_speculative_greedy_matches_target(gamma):
    target, tparams = make_model(jax.random.PRNGKey(0))
    draft, dparams = make_model(jax.random.PRNGKey(1), n_embd=32, n_layer=1)
    prompt = jax.random.randint(jax.random.PRNGKey(2), (1, 9), 0, 61)
    max_new = 12
    max_len = prompt.shape[1] + max_new + gamma + 2

    t_caches = target.allocate_inference_cache(1, max_len).key_value_memory_dict
    d_caches = draft.allocate_inference_cache(1, max_len).key_value_memory_dict
    out = decode_speculative(
        prompt,
        make_apply_fn(target, tparams, max_len, 1), t_caches,
        make_apply_fn(draft, dparams, max_len, 1), d_caches,
        max_new, gamma=gamma,
    )
    ref = target.generate(tparams, prompt, prompt.shape[1] + max_new)
    assert jnp.array_equal(out.sequences, ref), (out.sequences, ref)


def test_speculative_draft_equals_target_accepts_all():
    """With draft == target, every proposal is accepted (gamma+1 tokens per
    verify round); result still equals greedy."""
    target, params = make_model(jax.random.PRNGKey(3))
    prompt = jax.random.randint(jax.random.PRNGKey(4), (1, 5), 0, 61)
    max_new, gamma = 10, 4
    max_len = prompt.shape[1] + max_new + gamma + 2
    tc = target.allocate_inference_cache(1, max_len).key_value_memory_dict
    dc = target.allocate_inference_cache(1, max_len).key_value_memory_dict
    out = decode_speculative(
        prompt,
        make_apply_fn(target, params, max_len, 1), tc,
        make_apply_fn(target, params, max_len, 1), dc,
        max_new, gamma=gamma,
    )
    ref = target.generate(params, prompt, prompt.shape[1] + max_new)
    assert jnp.array_equal(out.sequences, ref)
