"""Experiment logging + training monitors (reference: training/src/callbacks/
wandb_callbacks.py WatchModel/UploadCodeAsArtifact, norm_monitor.py,
loss_scale_monitor.py, causality_monitor.py; torchmetrics Perplexity in
src/metrics/perplexity.py:21).

Zero-dependency, wandb-shaped API: `init()/log()/finish()` writing JSONL (+
optional CSV mirror) so runs are greppable and plot-able without a service.
A real wandb backend can be slotted in by passing `backend="wandb"` when the
package is importable — the call surface is identical.
"""

from __future__ import annotations

import csv
import json
import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


class RunLogger:
    """wandb-style run logger. Writes one JSON object per log() call to
    <dir>/<run_name>/metrics.jsonl and the config to config.json."""

    def __init__(self, log_dir: str, run_name: Optional[str] = None,
                 config: Optional[Dict[str, Any]] = None,
                 backend: str = "jsonl", csv_mirror: bool = False):
        self.run_name = run_name or time.strftime("run-%Y%m%d-%H%M%S")
        self.dir = os.path.join(log_dir, self.run_name)
        os.makedirs(self.dir, exist_ok=True)
        self._f = open(os.path.join(self.dir, "metrics.jsonl"), "a")
        self._csv = None
        self._csv_keys = None
        if csv_mirror:
            self._csv = open(os.path.join(self.dir, "metrics.csv"), "a",
                             newline="")
        self._wandb = None
        if backend == "wandb":  # optional external backend, same surface
            try:
                import wandb  # noqa: F401 — not in the base image

                self._wandb = wandb.init(
                    project=log_dir, name=self.run_name, config=config
                )
            except ImportError:
                pass
        if config is not None:
            with open(os.path.join(self.dir, "config.json"), "w") as f:
                json.dump(config, f, indent=2, default=str)

    def log(self, metrics: Dict[str, Any], step: Optional[int] = None):
        rec = {"_time": time.time()}
        if step is not None:
            rec["step"] = int(step)
        for k, v in metrics.items():
            rec[k] = float(v) if isinstance(
                v, (jnp.ndarray, np.ndarray, np.floating)
            ) and getattr(v, "ndim", 1) == 0 else v
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._csv is not None:
            if self._csv_keys is None:
                self._csv_keys = list(rec)
                w = csv.DictWriter(self._csv, fieldnames=self._csv_keys,
                                   extrasaction="ignore")
                w.writeheader()
            csv.DictWriter(self._csv, fieldnames=self._csv_keys,
                           extrasaction="ignore").writerow(rec)
            self._csv.flush()
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def finish(self):
        self._f.close()
        if self._csv is not None:
            self._csv.close()
        if self._wandb is not None:
            self._wandb.finish()


def param_norms(tree, prefix: str = "param_norm") -> Dict[str, float]:
    """Per-top-level-module L2 norms + a global norm (reference
    norm_monitor.py). Device-side reductions; one small transfer per call."""
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    out: Dict[str, jnp.ndarray] = {}
    total = 0.0
    for path, leaf in flat:
        key = path[0].key if path else "root"
        sq = jnp.sum(jnp.square(leaf.astype(jnp.float32)))
        out[key] = out.get(key, 0.0) + sq
        total = total + sq
    metrics = {f"{prefix}/{k}": float(jnp.sqrt(v)) for k, v in out.items()}
    metrics[f"{prefix}/global"] = float(jnp.sqrt(total))
    return metrics


def perplexity(mean_loss: float) -> float:
    """torchmetrics.Perplexity analog for mean cross-entropy in nats."""
    return float(np.exp(mean_loss))


def check_causality(model, params, input_ids, *, t_split: Optional[int] = None,
                    atol: float = 1e-3, **apply_kw) -> bool:
    """Causality monitor (reference causality_monitor.py run as a callback):
    perturbing tokens after t_split must not change logits at or before it.
    Returns True when causal; meant for periodic integration checks."""
    b, s = input_ids.shape
    t = t_split if t_split is not None else s // 2
    logits = model.apply(params, input_ids, **apply_kw)
    perturbed = input_ids.at[:, t:].set((input_ids[:, t:] + 1) % 2)
    logits2 = model.apply(params, perturbed, **apply_kw)
    delta = jnp.abs(
        logits[:, :t].astype(jnp.float32) - logits2[:, :t].astype(jnp.float32)
    ).max()
    return bool(delta <= atol)
