"""End-to-end training MFU benchmark at reference-comparable scale.

Reference bar: 225 TFLOP/s/A100 = 72% MFU on the GPT ladder
(README.md:526-530, training/configs/experiment/owt/). This measures the
jitted train step (fwd+bwd+adamw) on the real TPU chip for a preset model
size and reports tokens/s + MFU under two accountings:
  * mfu_6n:   flops/token = 6*N                  (parameter FLOPs only)
  * mfu_palm: flops/token = 6*N + 12*L*h*hd*s    (PaLM App. B, incl. attn)

Steps are chained through the params/opt-state carry inside one jit
(lax.scan), so remote-dispatch dedup can't fake the timing; wall time is
the slope between two chain lengths.

    python benchmarks/benchmark_train_mfu.py --preset gpt2m --batch 8 \
        --seqlen 2048 --remat dots
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

from flash_attn_tpu.losses.cross_entropy import cross_entropy_loss
from flash_attn_tpu.models.gpt import GPTConfig, GPTLMHeadModel
from flash_attn_tpu.training.presets import expand_model_config
from flash_attn_tpu.training.trainer import gpt_flops_per_token


def peak_flops() -> float:
    kind = jax.devices()[0].device_kind.lower()
    if "v5 lite" in kind or "v5e" in kind:
        return 197e12
    if "v5p" in kind or "v5" in kind:
        return 459e12
    if "v6" in kind:
        return 918e12
    if "v4" in kind:
        return 275e12
    return 197e12


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="gpt2m")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seqlen", type=int, default=1024)  # the reference GPT-2 training context (training/configs owt)
    ap.add_argument("--remat", default="dots",
                    choices=["none", "dots", "full"])
    ap.add_argument("--steps-lo", type=int, default=4)
    ap.add_argument("--steps-hi", type=int, default=12)
    ap.add_argument("--fused-ce", type=int, default=0, metavar="CHUNK",
                    help="fuse lm_head+CE, scanning the sequence in chunks "
                    "of this many tokens (0 = plain full-vocab logits)")
    args = ap.parse_args(argv)

    mcfg = expand_model_config({"preset": args.preset})
    npos = mcfg.pop("n_positions", 2048)
    if npos:  # 0 = rotary/alibi model, no learned positions
        npos = max(npos, args.seqlen)
    config = GPTConfig(n_positions=npos, remat=args.remat, **mcfg)
    model = GPTLMHeadModel(config)
    rng = jax.random.PRNGKey(0)
    opt = optax.adamw(3e-4, weight_decay=0.1)

    # Build params + opt state ON DEVICE per timing trial: the chain jit
    # donates its carry (a 355M model is ~4.3GB of f32 params+adam state —
    # a second resident copy OOMs a 16GB chip), and re-init via a jitted
    # seeded init is far cheaper than pushing 4.3GB through the tunnel.
    @jax.jit
    def make_state(seed):
        params = model.init(
            jax.random.PRNGKey(seed), jnp.zeros((1, 8), jnp.int32)
        )
        return params, opt.init(params)

    params, opt_state = make_state(jnp.int32(0))
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"device: {jax.devices()[0].device_kind}  params: {n_params/1e6:.1f}M",
          flush=True)

    b, s = args.batch, args.seqlen
    tokens = jax.random.randint(rng, (b, s + 1), 0, config.vocab_size)
    x, y = tokens[:, :-1], tokens[:, 1:]

    def train_step(carry, seed):
        params, opt_state = carry

        def loss_fn(p):
            # Roll keeps ids in-vocab while making each step's input fresh
            # (defeats remote dispatch dedup).
            ids = jnp.roll(x, seed, axis=1)
            if args.fused_ce > 0:
                from flash_attn_tpu.losses.cross_entropy import (
                    fused_linear_cross_entropy,
                )
                from flash_attn_tpu.models.gpt import head_weight_from_params

                hidden = model.apply(
                    p, ids, method=GPTLMHeadModel.forward_hidden
                )
                return fused_linear_cross_entropy(
                    hidden, head_weight_from_params(p, config), y,
                    chunk=args.fused_ce,
                )
            logits = model.apply(p, ids)
            # cross_entropy_loss upcasts internally; casting here would
            # materialize a second full-vocab fp32 logits buffer (OOM at
            # 355M/b8/s2048).
            return cross_entropy_loss(logits, y)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    def chain(n):
        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def run(params, opt_state, seed0):
            (params, opt_state), losses = jax.lax.scan(
                train_step, (params, opt_state),
                seed0 + jnp.arange(n), length=n,
            )
            # Returning the carry lets XLA alias the donated inputs to the
            # outputs — ONE resident params/opt copy instead of two.
            return jnp.sum(losses), params, opt_state
        return run

    del params, opt_state
    times = {}
    for n in (args.steps_lo, args.steps_hi):
        run = chain(n)
        st = make_state(jnp.int32(0))
        jax.block_until_ready(run(*st, jnp.int32(0)))  # compile
        best = float("inf")
        for t in range(3):
            st = make_state(jnp.int32(t + 1))
            jax.block_until_ready(st)
            t0 = time.perf_counter()
            loss, p_out, o_out = run(*st, jnp.int32(t + 1))
            jax.block_until_ready(loss)
            best = min(best, time.perf_counter() - t0)
            del p_out, o_out
        times[n] = best
    step_s = (times[args.steps_hi] - times[args.steps_lo]) / (
        args.steps_hi - args.steps_lo
    )

    tps = b * s / step_s
    f6n = gpt_flops_per_token(config)
    hd = config.head_dim or config.n_embd // config.n_head
    fpalm = f6n + 12 * config.n_layer * config.n_head * hd * s
    peak = peak_flops()
    rec = {
        "bench": "train_mfu", "preset": args.preset, "params_m":
        round(n_params / 1e6, 1), "batch": b, "seqlen": s,
        "remat": args.remat, "fused_ce": args.fused_ce,
        "step_ms": round(step_s * 1e3, 1),
        "tokens_per_s": round(tps),
        "mfu_6n": round(tps * f6n / peak, 4),
        "mfu_palm": round(tps * fpalm / peak, 4),
    }
    print(json.dumps(rec))
    return rec


if __name__ == "__main__":
    main()
