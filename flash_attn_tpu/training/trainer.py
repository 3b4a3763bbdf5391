"""Training loop: jitted step over a device mesh, metrics, checkpointing,
EMA, auto-resume.

Reference: training/run.py + training/src/train.py (Hydra + Lightning) with
callbacks (speed_monitor.py:12 intra/inter-step timing, flop_count.py:14,
norm_monitor, model_checkpoint auto-resume, ema.py) and ZeRO strategies.
TPU-native shape: one jitted train_step over a (data, model) mesh — GSPMD
does DP gradient reduction and TP collectives; ZeRO-1 is the optimizer
state inheriting parameter shardings (optim.shard_opt_state); checkpoints
via orbax with the datamodule's sampler state saved alongside (the
fault-tolerant-resume contract).
"""

from __future__ import annotations

import dataclasses
import itertools
import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from flash_attn_tpu.losses.cross_entropy import cross_entropy_loss
from flash_attn_tpu.training.optim import make_optimizer


@dataclasses.dataclass
class TrainConfig:
    lr: float = 3e-4
    weight_decay: float = 0.1
    grad_clip: float = 1.0
    warmup_steps: int = 10
    total_steps: int = 100
    schedule: str = "cosine"
    log_every: int = 10
    checkpoint_every: int = 0  # 0 = off
    checkpoint_dir: Optional[str] = None
    ema_decay: float = 0.0  # 0 = off
    seed: int = 0
    log_dir: Optional[str] = None  # JSONL run logging (loggers.RunLogger)
    norm_monitor: bool = False  # log per-module param norms at log_every
    zero_stage: int = 0  # 0=off 1=opt-state 2=+grads 3=+params (parallel.zero)
    # >0: fuse lm_head + cross-entropy, scanning the sequence in chunks of
    # this many tokens so full-vocab logits are never materialized
    # (losses.fused_linear_cross_entropy). Needs a model exposing
    # forward_hidden (models/gpt.py).
    fused_ce_chunk: int = 0
    # Lightning accumulate_grad_batches analog: >1 scans that many
    # microbatches inside ONE jitted step (grads averaged, one optimizer
    # update). fit() groups consecutive datamodule batches accordingly.
    accumulate_steps: int = 1


class SpeedMonitor:
    """Tokens/s + model-FLOPs utilisation (maps speed_monitor.py:12 and the
    hand FLOP formulas in training/src/utils/flops.py)."""

    def __init__(self, flops_per_token: float, peak_flops: float):
        self.flops_per_token = flops_per_token
        self.peak_flops = peak_flops
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()
        self._tokens = 0

    def update(self, tokens: int):
        self._tokens += tokens

    def report(self) -> Dict[str, float]:
        dt = max(time.perf_counter() - self._t0, 1e-9)
        tps = self._tokens / dt
        return {
            "tokens_per_s": tps,
            "mfu": tps * self.flops_per_token / self.peak_flops,
        }


def gpt_flops_per_token(config) -> float:
    """6*N + attention term (training/src/utils/flops.py semantics)."""
    c = config
    d = c.head_dim if c.head_dim is not None else c.n_embd // c.n_head
    n_params = (
        c.padded_vocab_size * c.n_embd
        + c.n_layer * (
            c.n_embd * (c.n_head + 2 * (c.n_head_kv or c.n_head)) * d
            + c.n_head * d * c.n_embd
            + 3 * c.n_embd * (c.n_inner or 4 * c.n_embd)
        )
    )
    return 6.0 * n_params


class EMA:
    """Exponential moving average of params (maps training/src/utils/ema.py)."""

    def __init__(self, params, decay: float):
        self.decay = decay
        # copy=True: an astype no-op view would alias (and die with) donated
        # parameter buffers.
        self.shadow = jax.tree_util.tree_map(
            lambda x: jnp.array(x, jnp.float32, copy=True), params
        )

    def update(self, params):
        d = self.decay
        self.shadow = jax.tree_util.tree_map(
            lambda s, p: d * s + (1.0 - d) * p.astype(jnp.float32),
            self.shadow, params,
        )


class Trainer:
    """Config-driven LM trainer (the run.py experiment entry analog)."""

    def __init__(self, model, params, config: TrainConfig,
                 mesh=None, param_shardings=None):
        self.model = model
        self.config = config
        # Copy: the jitted step donates params/opt_state buffers, which must
        # not invalidate the caller's arrays.
        self.params = jax.tree_util.tree_map(jnp.array, params)
        params = self.params
        self.mesh = mesh
        self.opt, self.sched = make_optimizer(
            params,
            lr=config.lr, weight_decay=config.weight_decay,
            grad_clip=config.grad_clip, warmup_steps=config.warmup_steps,
            total_steps=config.total_steps, schedule=config.schedule,
        )
        self.opt_state = self.opt.init(params)
        self.step_idx = 0
        self.ema = EMA(params, config.ema_decay) if config.ema_decay > 0 else None
        self.history: list = []

        zero_specs = zero_base_specs = None
        if config.zero_stage > 0 and mesh is not None:
            from flash_attn_tpu.parallel.zero import (
                tp_param_specs, zero_param_specs,
            )

            zero_specs = zero_param_specs(params, mesh)
            zero_base_specs = tp_param_specs(params)

        def train_step(params, opt_state, input_ids, labels, dropout_rng):
            if zero_specs is not None and config.zero_stage >= 3:
                from flash_attn_tpu.parallel.zero import apply_zero

                _, _, params = apply_zero(
                    stage=config.zero_stage, mesh=mesh,
                    param_specs=zero_specs, params=params,
                )

            def loss_fn(p, ids, lbl, rng):
                if config.fused_ce_chunk > 0:
                    from flash_attn_tpu.losses.cross_entropy import (
                        fused_linear_cross_entropy,
                    )
                    from flash_attn_tpu.models.gpt import (
                        head_weight_from_params,
                    )

                    hidden = self.model.apply(
                        p, ids, deterministic=False,
                        rngs={"dropout": rng},
                        method=type(self.model).forward_hidden,
                    )
                    return fused_linear_cross_entropy(
                        hidden, head_weight_from_params(p, self.model.config),
                        lbl, chunk=config.fused_ce_chunk,
                    )
                logits = self.model.apply(
                    p, ids, deterministic=False, rngs={"dropout": rng},
                )
                return cross_entropy_loss(logits.astype(jnp.float32), lbl)

            acc = config.accumulate_steps
            if acc > 1:
                # input_ids/labels are (acc, b, s); one grad per microbatch,
                # averaged, ONE optimizer update (Lightning
                # accumulate_grad_batches semantics, fp32 accumulator).
                def micro(carry, xs):
                    gsum, lsum = carry
                    ids, lbl, i = xs
                    l, g = jax.value_and_grad(loss_fn)(
                        params, ids, lbl, jax.random.fold_in(dropout_rng, i)
                    )
                    gsum = jax.tree_util.tree_map(
                        lambda a, b: a + b.astype(jnp.float32), gsum, g
                    )
                    return (gsum, lsum + l), None

                zero_g = jax.tree_util.tree_map(
                    lambda x: jnp.zeros(x.shape, jnp.float32), params
                )
                (gsum, lsum), _ = jax.lax.scan(
                    micro, (zero_g, jnp.float32(0.0)),
                    (input_ids, labels, jnp.arange(acc)),
                )
                grads = jax.tree_util.tree_map(
                    lambda g, p: (g / acc).astype(p.dtype), gsum, params
                )
                loss = lsum / acc
            else:
                loss, grads = jax.value_and_grad(loss_fn)(
                    params, input_ids, labels, dropout_rng
                )
            if zero_specs is not None:
                from flash_attn_tpu.parallel.zero import apply_zero

                grads, opt_state, _ = apply_zero(
                    stage=config.zero_stage, mesh=mesh,
                    param_specs=zero_specs, grads=grads, opt_state=opt_state,
                )
            gnorm = optax.global_norm(grads)
            updates, opt_state = self.opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            if zero_specs is not None:
                from flash_attn_tpu.parallel.zero import (
                    apply_zero, constrain_params,
                )

                _, opt_state, params_out = apply_zero(
                    stage=config.zero_stage, mesh=mesh,
                    param_specs=zero_specs, opt_state=opt_state,
                    params=params if config.zero_stage >= 3 else None,
                )
                if params_out is not None:
                    params = params_out
                else:
                    # Stages 1-2: the update math ran on dp shards; gather
                    # the weights back to their base TP layout so the next
                    # step's forward sees replicated (over dp) params.
                    params = constrain_params(params, zero_base_specs, mesh)
            return params, opt_state, loss, gnorm

        self._train_step = jax.jit(train_step, donate_argnums=(0, 1))

        def eval_step(params, input_ids, labels):
            logits = self.model.apply(params, input_ids)
            return cross_entropy_loss(logits.astype(jnp.float32), labels)

        self._eval_step = jax.jit(eval_step)
        self._rng = jax.random.PRNGKey(config.seed)

    def fit(self, datamodule, steps: Optional[int] = None,
            speed_monitor: Optional[SpeedMonitor] = None):
        steps = steps or self.config.total_steps
        logger = None
        if self.config.log_dir:
            from flash_attn_tpu.training.loggers import RunLogger

            logger = RunLogger(
                self.config.log_dir, config=dataclasses.asdict(self.config)
            )
        first = True
        acc = self.config.accumulate_steps

        def grouped(it):
            if acc <= 1:
                yield from it
                return
            while True:
                mbs = list(itertools.islice(it, acc))
                if len(mbs) < acc:
                    return
                yield (np.stack([m[0] for m in mbs]),
                       np.stack([m[1] for m in mbs]))

        cm = self.mesh if self.mesh is not None else _nullcontext()
        with cm:
            for input_ids, labels in grouped(
                iter(datamodule.batches(steps * acc))
            ):
                self._rng, k = jax.random.split(self._rng)
                self.params, self.opt_state, loss, gnorm = self._train_step(
                    self.params, self.opt_state,
                    jnp.asarray(input_ids), jnp.asarray(labels), k,
                )
                self.step_idx += 1
                if speed_monitor is not None:
                    if first:
                        # Don't let step 0's compile pollute throughput/MFU
                        # (reference speed_monitor skips warmup batches too).
                        jax.block_until_ready(loss)
                        speed_monitor.reset()
                        first = False
                    else:
                        speed_monitor.update(int(np.prod(input_ids.shape)))
                if self.ema is not None:
                    self.ema.update(self.params)
                if self.step_idx % self.config.log_every == 0 or \
                        self.step_idx == steps:
                    rec = {"step": self.step_idx, "loss": float(loss),
                           "grad_norm": float(gnorm)}
                    self.history.append(rec)
                    if logger is not None:
                        metrics = dict(rec)
                        if speed_monitor is not None:
                            metrics.update(speed_monitor.report())
                        if self.config.norm_monitor:
                            from flash_attn_tpu.training.loggers import (
                                param_norms,
                            )

                            metrics.update(param_norms(self.params))
                        metrics.pop("step")
                        logger.log(metrics, step=self.step_idx)
                if (self.config.checkpoint_every
                        and self.step_idx % self.config.checkpoint_every == 0):
                    self.save_checkpoint(datamodule)
        if logger is not None:
            logger.finish()
        return self.history

    def evaluate(self, batches) -> Dict[str, float]:
        losses = [
            float(self._eval_step(self.params, jnp.asarray(x), jnp.asarray(y)))
            for x, y in batches
        ]
        mean = float(np.mean(losses))
        return {"loss": mean, "ppl": float(np.exp(mean))}

    # -- checkpointing (orbax) ----------------------------------------------

    def save_checkpoint(self, datamodule=None, path: Optional[str] = None):
        import orbax.checkpoint as ocp

        path = path or os.path.join(
            self.config.checkpoint_dir, f"step_{self.step_idx}"
        )
        ckpt = {
            "params": self.params,
            "opt_state": self.opt_state,
            "step": self.step_idx,
            "rng": self._rng,
        }
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(os.path.abspath(path), ckpt, force=True)
        if datamodule is not None:
            import json

            with open(os.path.join(path, "datamodule.json"), "w") as f:
                json.dump(datamodule.state_dict(), f)
        return path

    def load_checkpoint(self, path: str, datamodule=None):
        import orbax.checkpoint as ocp

        template = {
            "params": self.params,
            "opt_state": self.opt_state,
            "step": self.step_idx,
            "rng": self._rng,
        }
        with ocp.StandardCheckpointer() as ckptr:
            ckpt = ckptr.restore(os.path.abspath(path), template)
        self.params = ckpt["params"]
        self.opt_state = ckpt["opt_state"]
        self.step_idx = int(ckpt["step"])
        self._rng = ckpt["rng"]
        dm_state = os.path.join(path, "datamodule.json")
        if datamodule is not None and os.path.exists(dm_state):
            import json

            with open(dm_state) as f:
                datamodule.load_state_dict(json.load(f))

    @staticmethod
    def latest_checkpoint(checkpoint_dir: str) -> Optional[str]:
        """Auto-resume helper (maps model_checkpoint callback resume)."""
        if not os.path.isdir(checkpoint_dir):
            return None
        steps = [
            (int(d.split("_")[1]), d)
            for d in os.listdir(checkpoint_dir)
            if d.startswith("step_")
        ]
        if not steps:
            return None
        return os.path.join(checkpoint_dir, max(steps)[1])


class _nullcontext:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False
