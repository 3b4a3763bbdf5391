"""Model-family parity vs HuggingFace implementations (reference pattern:
tests/models/test_gpt.py, test_llama.py, test_gpt_neox.py, test_opt.py —
"parity vs HF implementations of each ported model"). Tiny randomly
initialized HF torch models run on CPU; their configs/weights are converted
through the adapters and logits compared in fp32."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from flash_attn_tpu.models import adapters
from flash_attn_tpu.models.gpt import GPTLMHeadModel

import dataclasses


def compare(hf_model, config, params, vocab, atol=2e-2):
    config = dataclasses.replace(config, dtype=jnp.float32)
    model = GPTLMHeadModel(config)
    ids = np.random.RandomState(0).randint(0, vocab, (2, 24))
    with torch.no_grad():
        hf_logits = hf_model(torch.tensor(ids)).logits.float().numpy()
    logits = model.apply(params, jnp.asarray(ids))
    logits = np.asarray(logits.astype(jnp.float32))[:, :, :vocab]
    err = np.abs(logits - hf_logits).max()
    # Scale-free check: compare against logit magnitude.
    rel = err / max(np.abs(hf_logits).max(), 1.0)
    assert rel < atol, f"max abs err {err}, rel {rel}"


def test_gpt2_parity():
    cfg = transformers.GPT2Config(
        vocab_size=93, n_positions=64, n_embd=48, n_layer=2, n_head=4,
        activation_function="gelu_new", resid_pdrop=0.0, embd_pdrop=0.0,
        attn_pdrop=0.0,
    )
    hf = transformers.GPT2LMHeadModel(cfg).eval()
    config = adapters.gpt2_config_to_gpt_config(cfg)
    params = adapters.remap_state_dict_hf_gpt2(hf.state_dict(), config)
    compare(hf, config, params, cfg.vocab_size)


def test_llama_parity():
    cfg = transformers.LlamaConfig(
        vocab_size=87, hidden_size=64, intermediate_size=112,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        rms_norm_eps=1e-5, tie_word_embeddings=False,
    )
    hf = transformers.LlamaForCausalLM(cfg).eval()
    config = adapters.llama_config_to_gpt_config(cfg)
    params = adapters.remap_state_dict_hf_llama(hf.state_dict(), config)
    compare(hf, config, params, cfg.vocab_size)


def test_mistral_sliding_window_parity():
    cfg = transformers.MistralConfig(
        vocab_size=61, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        sliding_window=8, tie_word_embeddings=False,
    )
    hf = transformers.MistralForCausalLM(cfg).eval()
    config = adapters.llama_config_to_gpt_config(cfg)
    assert config.window_size == (7, -1)
    params = adapters.remap_state_dict_hf_llama(hf.state_dict(), config)
    compare(hf, config, params, cfg.vocab_size)


def test_gpt_neox_parity():
    cfg = transformers.GPTNeoXConfig(
        vocab_size=77, hidden_size=48, intermediate_size=192,
        num_hidden_layers=2, num_attention_heads=4, rotary_pct=0.5,
        use_parallel_residual=True, tie_word_embeddings=False,
        hidden_act="gelu",
    )
    hf = transformers.GPTNeoXForCausalLM(cfg).eval()
    config = adapters.gpt_neox_config_to_gpt_config(cfg)
    params = adapters.remap_state_dict_hf_gpt_neox(hf.state_dict(), config)
    compare(hf, config, params, cfg.vocab_size)


def test_opt_parity():
    cfg = transformers.OPTConfig(
        vocab_size=71, hidden_size=48, ffn_dim=192, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=64,
        activation_function="relu", do_layer_norm_before=True,
        dropout=0.0,
    )
    hf = transformers.OPTForCausalLM(cfg).eval()
    config = adapters.opt_config_to_gpt_config(cfg)
    params = adapters.remap_state_dict_hf_opt(hf.state_dict(), config)
    compare(hf, config, params, cfg.vocab_size)


def test_gptj_parity():
    cfg = transformers.GPTJConfig(
        vocab_size=83, n_positions=64, n_embd=64, n_layer=2, n_head=4,
        rotary_dim=8, activation_function="gelu_new",
        resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
    )
    hf = transformers.GPTJForCausalLM(cfg).eval()
    config = adapters.gptj_config_to_gpt_config(cfg)
    params = adapters.remap_state_dict_hf_gptj(hf.state_dict(), config)
    compare(hf, config, params, cfg.vocab_size)


def test_falcon_parity():
    cfg = transformers.FalconConfig(
        vocab_size=69, hidden_size=48, num_hidden_layers=2,
        num_attention_heads=4, multi_query=True, parallel_attn=True,
        bias=False, new_decoder_architecture=False, alibi=False,
    )
    hf = transformers.FalconForCausalLM(cfg).eval()
    config = adapters.falcon_config_to_gpt_config(cfg)
    params = adapters.remap_state_dict_hf_falcon(hf.state_dict(), config)
    compare(hf, config, params, cfg.vocab_size)


def test_bigcode_parity():
    cfg = transformers.GPTBigCodeConfig(
        vocab_size=65, n_positions=64, n_embd=48, n_layer=2, n_head=4,
        multi_query=True, activation_function="gelu_pytorch_tanh",
        resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
    )
    hf = transformers.GPTBigCodeForCausalLM(cfg).eval()
    config = adapters.bigcode_config_to_gpt_config(cfg)
    params = adapters.remap_state_dict_hf_bigcode(hf.state_dict(), config)
    compare(hf, config, params, cfg.vocab_size)


def test_gemma_parity():
    cfg = transformers.GemmaConfig(
        vocab_size=73, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, rms_norm_eps=1e-6, tie_word_embeddings=True,
    )
    hf = transformers.GemmaForCausalLM(cfg).eval()
    config = adapters.gemma_config_to_gpt_config(cfg)
    params = adapters.remap_state_dict_hf_gemma(
        {k: v.numpy() for k, v in hf.state_dict().items()}, config
    )
    compare(hf, config, params, cfg.vocab_size)


def test_qwen2_parity():
    cfg = transformers.Qwen2Config(
        vocab_size=67, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        rms_norm_eps=1e-6, tie_word_embeddings=False,
    )
    hf = transformers.Qwen2ForCausalLM(cfg).eval()
    config = adapters.qwen2_config_to_gpt_config(cfg)
    params = adapters.remap_state_dict_hf_qwen2(hf.state_dict(), config)
    compare(hf, config, params, cfg.vocab_size)
