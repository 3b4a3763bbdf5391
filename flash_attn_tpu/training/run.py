"""Experiment entry point (reference: training/run.py Hydra main + the
experiment YAMLs under training/configs/experiment/owt/*.yaml).

Usage:
    python -m flash_attn_tpu.training.run --config configs/gpt2s-synth.yaml
    python -m flash_attn_tpu.training.run --config ... --set train.lr=1e-4

YAML maps straight onto the GPTConfig / TrainConfig / data dataclasses — the
Hydra composition tree collapses into one file + dotted overrides because
there is no plugin ecosystem to compose against.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from flash_attn_tpu.models.gpt import GPTConfig, GPTLMHeadModel
from flash_attn_tpu.training.data import (
    LMDataModule,
    TokenDataset,
    synthetic_tokens,
)
from flash_attn_tpu.training.trainer import (
    SpeedMonitor,
    TrainConfig,
    Trainer,
    gpt_flops_per_token,
)


def _apply_overrides(cfg: dict, overrides):
    for ov in overrides or []:
        path, val = ov.split("=", 1)
        node = cfg
        keys = path.split(".")
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = yaml.safe_load(val)
    return cfg


def _dtype(name):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[name]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--set", dest="overrides", action="append", default=[])
    ap.add_argument("--resume", action="store_true",
                    help="auto-resume from the latest checkpoint")
    args = ap.parse_args(argv)

    with open(args.config) as f:
        cfg = yaml.safe_load(f)
    cfg = _apply_overrides(cfg, args.overrides)

    from flash_attn_tpu.training.presets import expand_model_config

    mcfg = expand_model_config(dict(cfg["model"]))
    if "dtype" in mcfg:
        mcfg["dtype"] = _dtype(mcfg["dtype"])
    model_config = GPTConfig(**mcfg)
    train_config = TrainConfig(**cfg.get("train", {}))
    dcfg = cfg.get("data", {})

    model = GPTLMHeadModel(model_config)
    params = model.init(
        jax.random.PRNGKey(train_config.seed), jnp.zeros((1, 8), jnp.int32)
    )

    if dcfg.get("kind", "synthetic") == "synthetic":
        toks = synthetic_tokens(
            model_config.vocab_size, dcfg.get("num_tokens", 1_000_000),
            seed=train_config.seed,
        )
        dataset = TokenDataset(toks, dcfg.get("seqlen", 512))
    else:
        dataset = TokenDataset.from_memmap(
            dcfg["path"], dcfg.get("seqlen", 512),
            dtype=np.dtype(dcfg.get("dtype", "uint16")),
        )
    dm = LMDataModule(dataset, dcfg.get("batch_size", 8),
                      seed=train_config.seed)

    trainer = Trainer(model, params, train_config)
    if args.resume and train_config.checkpoint_dir:
        latest = Trainer.latest_checkpoint(train_config.checkpoint_dir)
        if latest:
            trainer.load_checkpoint(latest, dm)
            print(f"resumed from {latest} at step {trainer.step_idx}")

    peak = 197e12 if jax.default_backend() == "tpu" else 1e12
    monitor = SpeedMonitor(gpt_flops_per_token(model_config), peak)
    hist = trainer.fit(dm, speed_monitor=monitor)
    report = {"final": hist[-1] if hist else {}, **monitor.report()}
    print(json.dumps(report))
    return report


if __name__ == "__main__":
    main()
