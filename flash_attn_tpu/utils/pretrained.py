"""Load pretrained HF checkpoints from a local directory (reference:
flash_attn/utils/pretrained.py:15 state_dict_from_pretrained + the
per-model remap dispatch in flash_attn/models/).

Zero-egress friendly: reads config.json + *.safetensors / pytorch_model*.bin
already on disk; no hub calls.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Tuple

import numpy as np

_ADAPTERS = {
    "gpt2": ("gpt2_config_to_gpt_config", "remap_state_dict_hf_gpt2"),
    "llama": ("llama_config_to_gpt_config", "remap_state_dict_hf_llama"),
    "mistral": ("llama_config_to_gpt_config", "remap_state_dict_hf_llama"),
    "gpt_neox": ("gpt_neox_config_to_gpt_config", "remap_state_dict_hf_gpt_neox"),
    "gptj": ("gptj_config_to_gpt_config", "remap_state_dict_hf_gptj"),
    "falcon": ("falcon_config_to_gpt_config", "remap_state_dict_hf_falcon"),
    "opt": ("opt_config_to_gpt_config", "remap_state_dict_hf_opt"),
    "gpt_bigcode": ("bigcode_config_to_gpt_config", "remap_state_dict_hf_bigcode"),
    "baichuan": ("baichuan_config_to_gpt_config", "remap_state_dict_hf_baichuan"),
    "gemma": ("gemma_config_to_gpt_config", "remap_state_dict_hf_gemma"),
    "qwen2": ("qwen2_config_to_gpt_config", "remap_state_dict_hf_qwen2"),
}


def state_dict_from_pretrained(model_dir: str) -> Dict[str, np.ndarray]:
    """Read all weights from safetensors or torch .bin shards as numpy."""
    sd: Dict[str, np.ndarray] = {}
    st_files = [f for f in os.listdir(model_dir) if f.endswith(".safetensors")]
    if st_files:
        from safetensors import safe_open

        for f in sorted(st_files):
            with safe_open(os.path.join(model_dir, f), framework="np") as fh:
                for k in fh.keys():
                    sd[k] = fh.get_tensor(k)
        return sd
    bins = [f for f in os.listdir(model_dir)
            if f.startswith("pytorch_model") and f.endswith(".bin")]
    if bins:
        import torch

        for f in sorted(bins):
            part = torch.load(
                os.path.join(model_dir, f), map_location="cpu",
                weights_only=True,
            )
            sd.update({k: v.numpy() for k, v in part.items()})
        return sd
    raise FileNotFoundError(f"no checkpoint files in {model_dir}")


def from_pretrained(model_dir: str) -> Tuple[Any, Any]:
    """(GPTConfig, flax params) from a local HF checkpoint directory,
    dispatching on config.json model_type."""
    from flash_attn_tpu.models import adapters

    with open(os.path.join(model_dir, "config.json")) as f:
        raw = json.load(f)
    model_type = raw.get("model_type")
    if model_type not in _ADAPTERS:
        raise NotImplementedError(f"model_type {model_type!r}")
    import types

    hf = types.SimpleNamespace(**raw)
    cfg_fn, remap_fn = _ADAPTERS[model_type]
    config = getattr(adapters, cfg_fn)(hf)
    params = getattr(adapters, remap_fn)(
        state_dict_from_pretrained(model_dir), config
    )
    return config, params
