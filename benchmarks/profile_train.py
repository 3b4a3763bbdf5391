"""Train-step time itemization for PROFILE_TRAIN.md (VERDICT r3 #4).

jax.profiler device traces are unavailable through the remote-chip tunnel,
so the breakdown is measured by ABLATION with the same chained-scan slope
methodology as benchmark_train_mfu.py (each row is a real compiled
program; differences isolate one component):

  step_full    fwd + bwd + adamw            (the benchmark row)
  step_sgd     fwd + bwd + sgd add          (isolates adamw cost)
  fwd_only     loss only                    (fwd vs bwd split)
plus microbenches that bound the two FLOP sinks:
  attn         flash fwd+bwd at the model's attention shape
  matmul       fwd+bwd of one big dense proj at the model's GEMM shape

    python benchmarks/profile_train.py --preset gpt2m --batch 8 --seqlen 1024
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
from flash_attn_tpu.utils.benchmark import benchmark_forward


def slope_time(make_run, make_state, lo=4, hi=12):
    times = {}
    for n in (lo, hi):
        run = make_run(n)
        st = make_state(jnp.int32(0))
        loss, p_out, o_out = run(*st, jnp.int32(0))  # compile
        jax.block_until_ready(loss)
        del st, p_out, o_out  # one resident params/opt copy at a time
        best = float("inf")
        for t in range(3):
            st = make_state(jnp.int32(t + 1))
            jax.block_until_ready(st)
            t0 = time.perf_counter()
            loss, p_out, o_out = run(*st, jnp.int32(t + 1))
            jax.block_until_ready(loss)
            best = min(best, time.perf_counter() - t0)
            del st, p_out, o_out
        times[n] = best
    return (times[hi] - times[lo]) / (hi - lo)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="gpt2m")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seqlen", type=int, default=1024)
    ap.add_argument("--remat", default="dots")
    args = ap.parse_args(argv)

    mcfg = expand_model_config({"preset": args.preset})
    npos = mcfg.pop("n_positions", 2048)
    if npos:
        npos = max(npos, args.seqlen)
    config = GPTConfig(n_positions=npos, remat=args.remat, **mcfg)
    model = GPTLMHeadModel(config)
    opt = optax.adamw(3e-4, weight_decay=0.1)
    b, s = args.batch, args.seqlen

    @jax.jit
    def make_state(seed):
        params = model.init(
            jax.random.PRNGKey(seed), jnp.zeros((1, 8), jnp.int32)
        )
        return params, opt.init(params)

    n_params = int(sum(
        x.size for x in jax.tree_util.tree_leaves(make_state(jnp.int32(0))[0])
    ))
    print(f"device: {jax.devices()[0].device_kind} params {n_params/1e6:.1f}M",
          flush=True)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (b, s + 1), 0,
                                config.vocab_size)
    x, y = tokens[:, :-1], tokens[:, 1:]

    def loss_fn(p, seed):
        ids = jnp.roll(x, seed, axis=1)
        return cross_entropy_loss(model.apply(p, ids), y)

    def chain(body):
        def make(n):
            @functools.partial(jax.jit, donate_argnums=(0, 1))
            def run(params, opt_state, seed0):
                (params, opt_state), losses = jax.lax.scan(
                    body, (params, opt_state), seed0 + jnp.arange(n),
                    length=n,
                )
                return jnp.sum(losses), params, opt_state
            return run
        return make

    def step_full(carry, seed):
        params, opt_state = carry
        loss, grads = jax.value_and_grad(loss_fn)(params, seed)
        updates, opt_state = opt.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), opt_state), loss

    def step_sgd(carry, seed):
        params, opt_state = carry
        loss, grads = jax.value_and_grad(loss_fn)(params, seed)
        params = jax.tree.map(lambda p, g: p - 3e-4 * g, params, grads)
        return (params, opt_state), loss

    def step_fwd(carry, seed):
        params, opt_state = carry
        loss = loss_fn(params, seed)
        # Touch params so the carry stays live (donation aliasing).
        params = jax.tree.map(lambda p: p + 0.0 * loss.astype(p.dtype),
                              params)
        return (params, opt_state), loss

    rows = {}
    for name, body in (("step_full", step_full), ("step_sgd", step_sgd),
                       ("fwd_only", step_fwd)):
        sec = slope_time(chain(body), make_state)
        rows[name] = sec
        print(json.dumps({"row": name, "ms": round(sec * 1e3, 2)}),
              flush=True)

    # Microbench: the model's attention shape, fwd+bwd.
    from flash_attn_tpu.flash_attn_interface import flash_attn_func

    hd = config.head_dim or config.n_embd // config.n_head
    h = config.n_head
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(2), 3)
    qa = jax.random.normal(kq, (b, h, s, hd), jnp.bfloat16)
    ka = jax.random.normal(kk, (b, h, s, hd), jnp.bfloat16)
    va = jax.random.normal(kv, (b, h, s, hd), jnp.bfloat16)

    def attn_fwdbwd(q, k, v):
        return jax.grad(
            lambda q: flash_attn_func(
                q, k, v, causal=True, layout="bhsd"
            ).astype(jnp.float32).sum()
        )(q)

    at = benchmark_forward(attn_fwdbwd, qa, ka, va)
    attn_flops = 3.5 * 4 * b * h * hd * s * s / 2
    layer_attn_ms = at * 1e3
    rows["attn_layer"] = at
    print(json.dumps({
        "row": "attn_fwdbwd_per_layer", "ms": round(layer_attn_ms, 3),
        "tflops": round(attn_flops / at / 1e12, 1),
        "layers": config.n_layer,
        "total_ms": round(layer_attn_ms * config.n_layer, 1),
    }), flush=True)

    # Microbench: one big GEMM fwd+bwd at the MLP shape (the dominant
    # matmul class: (b*s, n_embd) x (n_embd, 4*n_embd)).
    wkey = jax.random.PRNGKey(3)
    xa = jax.random.normal(wkey, (b * s, config.n_embd), jnp.bfloat16)
    wa = jax.random.normal(wkey, (config.n_embd, 4 * config.n_embd),
                           jnp.bfloat16)

    def mm_fwdbwd(x, w):
        # Squared loss keeps the fwd matmul live in the grad (a linear
        # sum's grad is x-independent and gets hoisted out of the chain).
        return jax.grad(
            lambda x: jnp.sum((x @ w).astype(jnp.float32) ** 2)
        )(x)

    mt = benchmark_forward(mm_fwdbwd, xa, wa)
    mm_flops = 2 * 2 * b * s * config.n_embd * 4 * config.n_embd
    print(json.dumps({
        "row": "gemm_fwdbwd", "ms": round(mt * 1e3, 3),
        "tflops": round(mm_flops / mt / 1e12, 1),
    }), flush=True)

    f6n = gpt_flops_per_token(config)
    peak = 197e12
    print(json.dumps({
        "row": "summary",
        "step_full_ms": round(rows["step_full"] * 1e3, 1),
        "adamw_ms": round((rows["step_full"] - rows["step_sgd"]) * 1e3, 1),
        "fwd_ms": round(rows["fwd_only"] * 1e3, 1),
        "bwd_ms": round((rows["step_sgd"] - rows["fwd_only"]) * 1e3, 1),
        "attn_total_ms": round(layer_attn_ms * config.n_layer, 1),
        "mfu_6n": round(b * s * f6n / rows["step_full"] / peak, 4),
    }), flush=True)


if __name__ == "__main__":
    main()
