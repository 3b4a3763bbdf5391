"""HF model-family adapters: config converters + weight remappers.

Reference: per-model modules under flash_attn/models/ (llama.py:115
`remap_state_dict_hf_llama` / :393 `llama_config_to_gpt2_config`, gpt.py:930
`remap_state_dict_hf_gpt2`, gpt_neox.py, gptj.py, falcon.py, opt.py,
bigcode.py, baichuan.py, btlm.py). One GPTConfig covers every family; these
functions map HF configs onto it and HF checkpoints onto the flax parameter
tree.

Conventions:
  * HF nn.Linear weights are (out, in) -> flax kernels are (in, out): transpose.
  * HF GPT-2 Conv1D weights are already (in, out): no transpose.
  * Fused projections (c_attn / query_key_value) are split into Wq/Wk/Wv;
    NeoX/Falcon interleave heads inside the fused dim and are de-interleaved.
  * Gated-MLP fused fc1 splits into fc1_gate / fc1_up.

State dicts are plain dicts of numpy arrays (call .numpy() on torch tensors
or pass a safetensors dict).
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

from flash_attn_tpu.models.gpt import GPTConfig


def _t(w):
    return np.ascontiguousarray(np.asarray(w).T)


def _np(w):
    return np.asarray(w)


# ---------------------------------------------------------------------------
# Config converters
# ---------------------------------------------------------------------------

def gpt2_config_to_gpt_config(hf) -> GPTConfig:
    return GPTConfig(
        vocab_size=hf.vocab_size,
        n_positions=hf.n_positions,
        n_embd=hf.n_embd,
        n_layer=hf.n_layer,
        n_head=hf.n_head,
        n_inner=getattr(hf, "n_inner", None) or 4 * hf.n_embd,
        activation_function=hf.activation_function
        if hf.activation_function != "gelu_new" else "gelu_approx",
        layer_norm_epsilon=hf.layer_norm_epsilon,
        tie_word_embeddings=True,
    )


def llama_config_to_gpt_config(hf) -> GPTConfig:
    """Maps reference models/llama.py:393 (covers Llama 1/2/3, Mistral via
    sliding window)."""
    window = getattr(hf, "sliding_window", None)
    return GPTConfig(
        vocab_size=hf.vocab_size,
        n_positions=0,
        n_embd=hf.hidden_size,
        n_layer=hf.num_hidden_layers,
        n_head=hf.num_attention_heads,
        n_head_kv=getattr(hf, "num_key_value_heads", None),
        head_dim=getattr(hf, "head_dim", None),
        n_inner=hf.intermediate_size,
        activation_function="swiglu",
        layer_norm_epsilon=hf.rms_norm_eps,
        rms_norm=True,
        rotary_emb_fraction=1.0,
        rotary_emb_base=getattr(hf, "rope_theta", 10000.0),
        window_size=(window - 1, -1) if window else (-1, -1),
        qkv_proj_bias=getattr(hf, "attention_bias", False),
        out_proj_bias=getattr(hf, "attention_bias", False),
        mlp_fc1_bias=getattr(hf, "mlp_bias", False),
        mlp_fc2_bias=getattr(hf, "mlp_bias", False),
        tie_word_embeddings=getattr(hf, "tie_word_embeddings", False),
    )


def gemma_config_to_gpt_config(hf) -> GPTConfig:
    """Gemma 1/2: llama-shaped with gelu-gated MLP, sqrt(d_model) embedding
    scale, (1 + w) RMSNorm (folded into the weights at remap time), and
    head_dim decoupled from hidden_size."""
    return GPTConfig(
        vocab_size=hf.vocab_size,
        n_positions=0,
        n_embd=hf.hidden_size,
        n_layer=hf.num_hidden_layers,
        n_head=hf.num_attention_heads,
        n_head_kv=getattr(hf, "num_key_value_heads", None),
        head_dim=getattr(hf, "head_dim", None),
        n_inner=hf.intermediate_size,
        activation_function="swiglu_gelu",
        layer_norm_epsilon=hf.rms_norm_eps,
        rms_norm=True,
        rotary_emb_fraction=1.0,
        rotary_emb_base=getattr(hf, "rope_theta", 10000.0),
        qkv_proj_bias=getattr(hf, "attention_bias", False),
        out_proj_bias=getattr(hf, "attention_bias", False),
        mlp_fc1_bias=False,
        mlp_fc2_bias=False,
        tie_word_embeddings=True,
        embed_scale=float(hf.hidden_size) ** 0.5,
    )


def remap_state_dict_hf_gemma(sd, config: GPTConfig):
    """Llama-shaped weights; RMSNorm stores w with scale = 1 + w."""
    params = remap_state_dict_hf_llama(sd, config)
    tr = params["params"]["transformer"]

    def bump(norm):
        norm["scale"] = norm["scale"] + 1.0

    bump(tr["ln_f"])
    for i in range(config.n_layer):
        bump(tr[f"layers_{i}"]["norm1"])
        bump(tr[f"layers_{i}"]["norm2"])
    return params


def qwen2_config_to_gpt_config(hf) -> GPTConfig:
    """Qwen 1.5/2/2.5: llama-shaped with q/k/v bias but no out-proj bias."""
    cfg = llama_config_to_gpt_config(hf)
    import dataclasses as _dc

    return _dc.replace(cfg, qkv_proj_bias=True, out_proj_bias=False)


def remap_state_dict_hf_qwen2(sd, config: GPTConfig):
    sd = {k: _np(v) for k, v in sd.items()}
    params = remap_state_dict_hf_llama(sd, config)
    tr = params["params"]["transformer"]
    for i in range(config.n_layer):
        p = f"model.layers.{i}.self_attn."
        mixer = tr[f"layers_{i}"]["mixer"]
        for name, key in (("Wq", "q_proj"), ("Wk", "k_proj"), ("Wv", "v_proj")):
            mixer[name]["bias"] = jnp.asarray(sd[p + key + ".bias"])
    return params


def gpt_neox_config_to_gpt_config(hf) -> GPTConfig:
    return GPTConfig(
        vocab_size=hf.vocab_size,
        n_positions=0,
        n_embd=hf.hidden_size,
        n_layer=hf.num_hidden_layers,
        n_head=hf.num_attention_heads,
        n_inner=hf.intermediate_size,
        activation_function="gelu_approx"
        if hf.hidden_act in ("gelu", "gelu_new") else hf.hidden_act,
        layer_norm_epsilon=hf.layer_norm_eps,
        rotary_emb_fraction=hf.rotary_pct,
        rotary_emb_base=hf.rotary_emb_base
        if hasattr(hf, "rotary_emb_base") else 10000.0,
        parallel_block=hf.use_parallel_residual,
        parallel_block_tied_norm=False,
        tie_word_embeddings=getattr(hf, "tie_word_embeddings", False),
    )


def gptj_config_to_gpt_config(hf) -> GPTConfig:
    return GPTConfig(
        vocab_size=hf.vocab_size,
        n_positions=0,
        n_embd=hf.n_embd,
        n_layer=hf.n_layer,
        n_head=hf.n_head,
        n_inner=getattr(hf, "n_inner", None) or 4 * hf.n_embd,
        activation_function="gelu_approx",
        layer_norm_epsilon=hf.layer_norm_epsilon,
        rotary_emb_fraction=hf.rotary_dim / (hf.n_embd // hf.n_head),
        rotary_emb_interleaved=True,
        parallel_block=True,
        parallel_block_tied_norm=True,
        qkv_proj_bias=False,
        out_proj_bias=False,
        tie_word_embeddings=False,
    )


def falcon_config_to_gpt_config(hf) -> GPTConfig:
    if getattr(hf, "new_decoder_architecture", False):
        n_head_kv = getattr(hf, "num_kv_heads", None) or getattr(
            hf, "n_head_kv", hf.num_attention_heads
        )
    elif getattr(hf, "multi_query", True):
        n_head_kv = 1  # 7B-style MQA (config.num_kv_heads lies here)
    else:
        n_head_kv = hf.num_attention_heads
    return GPTConfig(
        vocab_size=hf.vocab_size,
        n_positions=0,
        n_embd=hf.hidden_size,
        n_layer=hf.num_hidden_layers,
        n_head=hf.num_attention_heads,
        n_head_kv=n_head_kv,
        activation_function="gelu_approx",
        layer_norm_epsilon=hf.layer_norm_epsilon,
        rotary_emb_fraction=1.0,
        parallel_block=getattr(hf, "parallel_attn", True),
        parallel_block_tied_norm=not getattr(
            hf, "new_decoder_architecture", False
        ),
        qkv_proj_bias=getattr(hf, "bias", False),
        out_proj_bias=getattr(hf, "bias", False),
        mlp_fc1_bias=getattr(hf, "bias", False),
        mlp_fc2_bias=getattr(hf, "bias", False),
        tie_word_embeddings=True,
    )


def opt_config_to_gpt_config(hf) -> GPTConfig:
    assert getattr(hf, "do_layer_norm_before", True), "post-norm OPT unsupported"
    return GPTConfig(
        vocab_size=hf.vocab_size,
        n_positions=hf.max_position_embeddings + 2,  # OPT's +2 offset
        n_embd=hf.hidden_size,
        n_layer=hf.num_hidden_layers,
        n_head=hf.num_attention_heads,
        n_inner=hf.ffn_dim,
        activation_function=hf.activation_function,  # relu
        layer_norm_epsilon=1e-5,
        tie_word_embeddings=True,
        position_offset=2,  # OPT's learned-position table offset
    )


def bigcode_config_to_gpt_config(hf) -> GPTConfig:
    """StarCoder/SantaCoder (gpt_bigcode): GPT-2 + MQA."""
    return GPTConfig(
        vocab_size=hf.vocab_size,
        n_positions=hf.n_positions,
        n_embd=hf.n_embd,
        n_layer=hf.n_layer,
        n_head=hf.n_head,
        n_head_kv=1 if getattr(hf, "multi_query", True) else hf.n_head,
        n_inner=getattr(hf, "n_inner", None) or 4 * hf.n_embd,
        activation_function="gelu_approx",
        layer_norm_epsilon=hf.layer_norm_epsilon,
        tie_word_embeddings=True,
    )


def baichuan_config_to_gpt_config(hf) -> GPTConfig:
    """Baichuan-7B (rotary) / 13B (alibi); llama-like otherwise
    (reference models/baichuan.py)."""
    use_alibi = getattr(hf, "use_alibi", hf.hidden_size == 5120)
    return GPTConfig(
        vocab_size=hf.vocab_size,
        n_positions=0,
        n_embd=hf.hidden_size,
        n_layer=hf.num_hidden_layers,
        n_head=hf.num_attention_heads,
        n_inner=hf.intermediate_size,
        activation_function="swiglu",
        layer_norm_epsilon=hf.rms_norm_eps,
        rms_norm=True,
        rotary_emb_fraction=0.0 if use_alibi else 1.0,
        use_alibi=use_alibi,
        qkv_proj_bias=False,
        out_proj_bias=False,
        mlp_fc1_bias=False,
        mlp_fc2_bias=False,
        tie_word_embeddings=False,
    )


def btlm_config_to_gpt_config(hf) -> GPTConfig:
    """BTLM-3B (reference models/btlm.py): alibi + swiglu + no positions."""
    return GPTConfig(
        vocab_size=hf.vocab_size,
        n_positions=0,
        n_embd=hf.hidden_size,
        n_layer=hf.num_hidden_layers,
        n_head=hf.num_attention_heads,
        n_inner=getattr(hf, "n_inner", None) or 4 * hf.hidden_size,
        activation_function="swiglu",
        layer_norm_epsilon=hf.layer_norm_epsilon,
        use_alibi=True,
        tie_word_embeddings=True,
    )


# ---------------------------------------------------------------------------
# Weight remappers -> flax params {'params': {...}}
# ---------------------------------------------------------------------------

def _dense(kernel, bias=None):
    out = {"kernel": jnp.asarray(kernel)}
    if bias is not None:
        out["bias"] = jnp.asarray(bias)
    return out


def _norm(weight, bias=None):
    out = {"scale": jnp.asarray(weight)}
    if bias is not None:
        out["bias"] = jnp.asarray(bias)
    return out


def _pad_vocab(emb, padded):
    if emb.shape[0] < padded:
        emb = np.pad(emb, ((0, padded - emb.shape[0]), (0, 0)))
    return emb


def remap_state_dict_hf_gpt2(sd: Dict[str, Any], config: GPTConfig):
    """Maps reference models/gpt.py:930. GPT-2 Conv1D: weights are (in, out)."""
    sd = {k: _np(v) for k, v in sd.items()}
    pfx = "transformer." if "transformer.wte.weight" in sd else ""
    d = config.n_embd
    params = {"transformer": {
        "embeddings": {
            "word_embeddings": {"embedding": jnp.asarray(_pad_vocab(
                sd[f"{pfx}wte.weight"], config.padded_vocab_size))},
            "position_embeddings": {"embedding": jnp.asarray(
                sd[f"{pfx}wpe.weight"])},
        },
        "ln_f": _norm(sd[f"{pfx}ln_f.weight"], sd[f"{pfx}ln_f.bias"]),
    }}
    for i in range(config.n_layer):
        p = f"{pfx}h.{i}."
        w = sd[p + "attn.c_attn.weight"]  # (in, 3*embd)
        b = sd[p + "attn.c_attn.bias"]
        wq, wk, wv = np.split(w, 3, axis=1)
        bq, bk, bv = np.split(b, 3)
        layer = {
            "norm1": _norm(sd[p + "ln_1.weight"], sd[p + "ln_1.bias"]),
            "norm2": _norm(sd[p + "ln_2.weight"], sd[p + "ln_2.bias"]),
            "mixer": {
                "Wq": _dense(wq, bq),
                "Wk": _dense(wk, bk),
                "Wv": _dense(wv, bv),
                "out_proj": _dense(
                    sd[p + "attn.c_proj.weight"], sd[p + "attn.c_proj.bias"]
                ),
            },
            "mlp": {
                "fc1": _dense(
                    sd[p + "mlp.c_fc.weight"], sd[p + "mlp.c_fc.bias"]
                ),
                "fc2": _dense(
                    sd[p + "mlp.c_proj.weight"], sd[p + "mlp.c_proj.bias"]
                ),
            },
        }
        params["transformer"][f"layers_{i}"] = layer
    return {"params": params}


def remap_state_dict_hf_llama(sd: Dict[str, Any], config: GPTConfig):
    """Maps reference models/llama.py:115 (Llama/Mistral)."""
    sd = {k: _np(v) for k, v in sd.items()}
    pfx = "model."
    params = {"transformer": {
        "embeddings": {
            "word_embeddings": {"embedding": jnp.asarray(_pad_vocab(
                sd[pfx + "embed_tokens.weight"], config.padded_vocab_size))},
        },
        "ln_f": _norm(sd[pfx + "norm.weight"]),
    }}
    for i in range(config.n_layer):
        p = f"{pfx}layers.{i}."
        layer = {
            "norm1": _norm(sd[p + "input_layernorm.weight"]),
            "norm2": _norm(sd[p + "post_attention_layernorm.weight"]),
            "mixer": {
                "Wq": _dense(_t(sd[p + "self_attn.q_proj.weight"])),
                "Wk": _dense(_t(sd[p + "self_attn.k_proj.weight"])),
                "Wv": _dense(_t(sd[p + "self_attn.v_proj.weight"])),
                "out_proj": _dense(_t(sd[p + "self_attn.o_proj.weight"])),
            },
            "mlp": {
                "fc1_gate": _dense(_t(sd[p + "mlp.gate_proj.weight"])),
                "fc1_up": _dense(_t(sd[p + "mlp.up_proj.weight"])),
                "fc2": _dense(_t(sd[p + "mlp.down_proj.weight"])),
            },
        }
        params["transformer"][f"layers_{i}"] = layer
    if not config.tie_word_embeddings:
        params["lm_head"] = _dense(_t(_pad_vocab(
            sd["lm_head.weight"], config.padded_vocab_size)))
    return {"params": params}


def remap_state_dict_hf_gpt_neox(sd: Dict[str, Any], config: GPTConfig):
    """Maps reference models/gpt_neox.py. NeoX fuses qkv with per-head
    interleaving: weight (h*3*d, embd) laid out as [h, 3, d]."""
    sd = {k: _np(v) for k, v in sd.items()}
    pfx = "gpt_neox."
    h = config.n_head
    d = config.n_embd // h
    params = {"transformer": {
        "embeddings": {
            "word_embeddings": {"embedding": jnp.asarray(_pad_vocab(
                sd[pfx + "embed_in.weight"], config.padded_vocab_size))},
        },
        "ln_f": _norm(
            sd[pfx + "final_layer_norm.weight"],
            sd[pfx + "final_layer_norm.bias"],
        ),
    }}
    for i in range(config.n_layer):
        p = f"{pfx}layers.{i}."
        w = sd[p + "attention.query_key_value.weight"]  # (3*h*d, embd)
        b = sd[p + "attention.query_key_value.bias"]
        w = w.reshape(h, 3, d, -1)
        b = b.reshape(h, 3, d)
        wq = w[:, 0].reshape(h * d, -1)
        wk = w[:, 1].reshape(h * d, -1)
        wv = w[:, 2].reshape(h * d, -1)
        layer = {
            "norm1": _norm(sd[p + "input_layernorm.weight"],
                           sd[p + "input_layernorm.bias"]),
            "norm2": _norm(sd[p + "post_attention_layernorm.weight"],
                           sd[p + "post_attention_layernorm.bias"]),
            "mixer": {
                "Wq": _dense(_t(wq), b[:, 0].reshape(-1)),
                "Wk": _dense(_t(wk), b[:, 1].reshape(-1)),
                "Wv": _dense(_t(wv), b[:, 2].reshape(-1)),
                "out_proj": _dense(
                    _t(sd[p + "attention.dense.weight"]),
                    sd[p + "attention.dense.bias"],
                ),
            },
            "mlp": {
                "fc1": _dense(
                    _t(sd[p + "mlp.dense_h_to_4h.weight"]),
                    sd[p + "mlp.dense_h_to_4h.bias"],
                ),
                "fc2": _dense(
                    _t(sd[p + "mlp.dense_4h_to_h.weight"]),
                    sd[p + "mlp.dense_4h_to_h.bias"],
                ),
            },
        }
        params["transformer"][f"layers_{i}"] = layer
    if not config.tie_word_embeddings:
        params["lm_head"] = _dense(_t(_pad_vocab(
            sd["embed_out.weight"], config.padded_vocab_size)))
    return {"params": params}


def remap_state_dict_hf_opt(sd: Dict[str, Any], config: GPTConfig):
    """Maps reference models/opt.py. OPT's learned positions carry a +2
    offset baked into the table; position_ids must add 2 (the model does via
    the adapter's position table retained in full)."""
    sd = {k: _np(v) for k, v in sd.items()}
    pfx = "model.decoder."
    params = {"transformer": {
        "embeddings": {
            "word_embeddings": {"embedding": jnp.asarray(_pad_vocab(
                sd[pfx + "embed_tokens.weight"], config.padded_vocab_size))},
            "position_embeddings": {"embedding": jnp.asarray(
                sd[pfx + "embed_positions.weight"])},
        },
        "ln_f": _norm(
            sd[pfx + "final_layer_norm.weight"],
            sd[pfx + "final_layer_norm.bias"],
        ),
    }}
    for i in range(config.n_layer):
        p = f"{pfx}layers.{i}."
        layer = {
            "norm1": _norm(sd[p + "self_attn_layer_norm.weight"],
                           sd[p + "self_attn_layer_norm.bias"]),
            "norm2": _norm(sd[p + "final_layer_norm.weight"],
                           sd[p + "final_layer_norm.bias"]),
            "mixer": {
                "Wq": _dense(_t(sd[p + "self_attn.q_proj.weight"]),
                             sd[p + "self_attn.q_proj.bias"]),
                "Wk": _dense(_t(sd[p + "self_attn.k_proj.weight"]),
                             sd[p + "self_attn.k_proj.bias"]),
                "Wv": _dense(_t(sd[p + "self_attn.v_proj.weight"]),
                             sd[p + "self_attn.v_proj.bias"]),
                "out_proj": _dense(_t(sd[p + "self_attn.out_proj.weight"]),
                                   sd[p + "self_attn.out_proj.bias"]),
            },
            "mlp": {
                "fc1": _dense(_t(sd[p + "fc1.weight"]), sd[p + "fc1.bias"]),
                "fc2": _dense(_t(sd[p + "fc2.weight"]), sd[p + "fc2.bias"]),
            },
        }
        params["transformer"][f"layers_{i}"] = layer
    return {"params": params}


def remap_state_dict_hf_falcon(sd: Dict[str, Any], config: GPTConfig):
    """Maps reference models/falcon.py. Falcon fuses qkv with kv heads
    appended after all q heads (7B: h q heads + 1 k + 1 v)."""
    sd = {k: _np(v) for k, v in sd.items()}
    pfx = "transformer."
    h = config.n_head
    hk = config.n_head_kv or h
    d = config.n_embd // h
    params = {"transformer": {
        "embeddings": {
            "word_embeddings": {"embedding": jnp.asarray(_pad_vocab(
                sd[pfx + "word_embeddings.weight"],
                config.padded_vocab_size))},
        },
        "ln_f": _norm(sd[pfx + "ln_f.weight"], sd[pfx + "ln_f.bias"]),
    }}
    for i in range(config.n_layer):
        p = f"{pfx}h.{i}."
        w = sd[p + "self_attention.query_key_value.weight"]
        if hk == 1:
            # (h*d + 2*d, embd): q block then k then v.
            wq = w[: h * d]
            wk = w[h * d : (h + 1) * d]
            wv = w[(h + 1) * d :]
        else:
            # new-arch grouping: [hk groups of (g q-heads + k + v)].
            g = h // hk
            w = w.reshape(hk, g + 2, d, -1)
            wq = w[:, :g].reshape(h * d, -1)
            wk = w[:, g].reshape(hk * d, -1)
            wv = w[:, g + 1].reshape(hk * d, -1)
        norm1 = (
            sd.get(p + "ln_attn.weight", sd.get(p + "input_layernorm.weight"))
        )
        norm1_b = (
            sd.get(p + "ln_attn.bias", sd.get(p + "input_layernorm.bias"))
        )
        layer = {
            "norm1": _norm(norm1, norm1_b),
            "mixer": {
                "Wq": _dense(_t(wq)),
                "Wk": _dense(_t(wk)),
                "Wv": _dense(_t(wv)),
                "out_proj": _dense(_t(sd[p + "self_attention.dense.weight"])),
            },
            "mlp": {
                "fc1": _dense(_t(sd[p + "mlp.dense_h_to_4h.weight"])),
                "fc2": _dense(_t(sd[p + "mlp.dense_4h_to_h.weight"])),
            },
        }
        if not config.parallel_block_tied_norm:
            norm2 = sd.get(p + "ln_mlp.weight",
                           sd.get(p + "post_attention_layernorm.weight"))
            norm2_b = sd.get(p + "ln_mlp.bias",
                             sd.get(p + "post_attention_layernorm.bias"))
            layer["norm2"] = _norm(norm2, norm2_b)
        params["transformer"][f"layers_{i}"] = layer
    return {"params": params}


def remap_state_dict_hf_gptj(sd: Dict[str, Any], config: GPTConfig):
    """Maps reference models/gptj.py (separate q/k/v, parallel tied-norm
    block, interleaved rotary)."""
    sd = {k: _np(v) for k, v in sd.items()}
    pfx = "transformer."
    params = {"transformer": {
        "embeddings": {
            "word_embeddings": {"embedding": jnp.asarray(_pad_vocab(
                sd[pfx + "wte.weight"], config.padded_vocab_size))},
        },
        "ln_f": _norm(sd[pfx + "ln_f.weight"], sd[pfx + "ln_f.bias"]),
    }}
    for i in range(config.n_layer):
        p = f"{pfx}h.{i}."
        layer = {
            "norm1": _norm(sd[p + "ln_1.weight"], sd[p + "ln_1.bias"]),
            "mixer": {
                "Wq": _dense(_t(sd[p + "attn.q_proj.weight"])),
                "Wk": _dense(_t(sd[p + "attn.k_proj.weight"])),
                "Wv": _dense(_t(sd[p + "attn.v_proj.weight"])),
                "out_proj": _dense(_t(sd[p + "attn.out_proj.weight"])),
            },
            "mlp": {
                "fc1": _dense(_t(sd[p + "mlp.fc_in.weight"]),
                              sd[p + "mlp.fc_in.bias"]),
                "fc2": _dense(_t(sd[p + "mlp.fc_out.weight"]),
                              sd[p + "mlp.fc_out.bias"]),
            },
        }
        params["transformer"][f"layers_{i}"] = layer
    if not config.tie_word_embeddings:
        params["lm_head"] = _dense(
            _t(_pad_vocab(sd["lm_head.weight"], config.padded_vocab_size)),
            np.pad(sd["lm_head.bias"],
                   (0, config.padded_vocab_size - config.vocab_size))
            if "lm_head.bias" in sd else None,
        )
    return {"params": params}


def remap_state_dict_hf_bigcode(sd: Dict[str, Any], config: GPTConfig):
    """Maps reference models/bigcode.py (StarCoder MQA: c_attn packs
    [q (h*d), k (d), v (d)] on the OUT dim of an nn.Linear)."""
    sd = {k: _np(v) for k, v in sd.items()}
    pfx = "transformer."
    h = config.n_head
    hk = config.n_head_kv or h
    d = config.n_embd // h
    params = {"transformer": {
        "embeddings": {
            "word_embeddings": {"embedding": jnp.asarray(_pad_vocab(
                sd[pfx + "wte.weight"], config.padded_vocab_size))},
            "position_embeddings": {"embedding": jnp.asarray(
                sd[pfx + "wpe.weight"])},
        },
        "ln_f": _norm(sd[pfx + "ln_f.weight"], sd[pfx + "ln_f.bias"]),
    }}
    for i in range(config.n_layer):
        p = f"{pfx}h.{i}."
        w = sd[p + "attn.c_attn.weight"]  # (h*d + 2*hk*d, embd)
        b = sd[p + "attn.c_attn.bias"]
        wq, wk, wv = np.split(w, [h * d, h * d + hk * d], axis=0)
        bq, bk, bv = np.split(b, [h * d, h * d + hk * d])
        layer = {
            "norm1": _norm(sd[p + "ln_1.weight"], sd[p + "ln_1.bias"]),
            "norm2": _norm(sd[p + "ln_2.weight"], sd[p + "ln_2.bias"]),
            "mixer": {
                "Wq": _dense(_t(wq), bq),
                "Wk": _dense(_t(wk), bk),
                "Wv": _dense(_t(wv), bv),
                "out_proj": _dense(_t(sd[p + "attn.c_proj.weight"]),
                                   sd[p + "attn.c_proj.bias"]),
            },
            "mlp": {
                "fc1": _dense(_t(sd[p + "mlp.c_fc.weight"]),
                              sd[p + "mlp.c_fc.bias"]),
                "fc2": _dense(_t(sd[p + "mlp.c_proj.weight"]),
                              sd[p + "mlp.c_proj.bias"]),
            },
        }
        params["transformer"][f"layers_{i}"] = layer
    return {"params": params}


def remap_state_dict_hf_baichuan(sd: Dict[str, Any], config: GPTConfig):
    """Maps reference models/baichuan.py. Baichuan fuses qkv into W_pack
    (3*embd, embd); otherwise llama-shaped."""
    sd = {k: _np(v) for k, v in sd.items()}
    pfx = "model."
    params = {"transformer": {
        "embeddings": {
            "word_embeddings": {"embedding": jnp.asarray(_pad_vocab(
                sd[pfx + "embed_tokens.weight"], config.padded_vocab_size))},
        },
        "ln_f": _norm(sd[pfx + "norm.weight"]),
    }}
    for i in range(config.n_layer):
        p = f"{pfx}layers.{i}."
        w = sd[p + "self_attn.W_pack.weight"]
        wq, wk, wv = np.split(w, 3, axis=0)
        layer = {
            "norm1": _norm(sd[p + "input_layernorm.weight"]),
            "norm2": _norm(sd[p + "post_attention_layernorm.weight"]),
            "mixer": {
                "Wq": _dense(_t(wq)),
                "Wk": _dense(_t(wk)),
                "Wv": _dense(_t(wv)),
                "out_proj": _dense(_t(sd[p + "self_attn.o_proj.weight"])),
            },
            "mlp": {
                "fc1_gate": _dense(_t(sd[p + "mlp.gate_proj.weight"])),
                "fc1_up": _dense(_t(sd[p + "mlp.up_proj.weight"])),
                "fc2": _dense(_t(sd[p + "mlp.down_proj.weight"])),
            },
        }
        params["transformer"][f"layers_{i}"] = layer
    if not config.tie_word_embeddings and "lm_head.weight" in sd:
        params["lm_head"] = _dense(_t(_pad_vocab(
            sd["lm_head.weight"], config.padded_vocab_size)))
    return {"params": params}
