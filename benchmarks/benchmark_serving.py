"""Serving-engine benchmark: end-to-end tokens/s of the continuous-batching
engine, and the effect of the engine's two dispatch-amortization features —
multi-step decode (decode_depth) and automatic prefix caching.

The reference stops at the kernel layer (vLLM provides serving above it);
this measures the framework's own serving stack (runtime/engine.py +
csrc/scheduler.cpp). Timing is wall-clock over whole engine runs (many
dispatches), which is meaningful even through remote-dispatch runtimes —
unlike single-kernel timing, per-step host work and dispatch latency are
exactly what this benchmark exists to show.

    python benchmarks/benchmark_serving.py [--quick]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def build_model(n_embd=256, n_layer=4, n_head=8, vocab=512):
    from flash_attn_tpu.models.gpt import GPTConfig, GPTLMHeadModel

    cfg = GPTConfig(
        vocab_size=vocab, n_positions=0, n_embd=n_embd, n_layer=n_layer,
        n_head=n_head, n_head_kv=n_head // 4 if n_head >= 4 else n_head,
        rotary_emb_fraction=1.0, rms_norm=True,
        activation_function="swiglu", qkv_proj_bias=False,
        out_proj_bias=False, mlp_fc1_bias=False, mlp_fc2_bias=False,
        tie_word_embeddings=True, dtype=jnp.bfloat16,
    )
    model = GPTLMHeadModel(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))
    return model, params, cfg


def run_engine(model, params, prompts, max_new, *, decode_depth=1,
               prefix_caching=False, speculative_k=0, draft=None,
               repeats=1, kv_cache_dtype=None, kv_cache_scale=1.0):
    from flash_attn_tpu.runtime.engine import EngineConfig, LLMEngine

    engine = LLMEngine(model, params, EngineConfig(
        max_batch_size=8, page_size=64, num_pages=512,
        max_pages_per_seq=32, prefill_chunk=256, max_seqlen=2048,
        decode_depth=decode_depth, enable_prefix_caching=prefix_caching,
        speculative_k=speculative_k,
        kv_cache_dtype=kv_cache_dtype, kv_cache_scale=kv_cache_scale,
    ), draft_model=draft[0] if draft else None,
       draft_params=draft[1] if draft else None)
    # Warm-up wave compiles prefill + decode programs (and, with caching,
    # seeds the prefix registry — deliberately included so wave 2 hits it).
    engine.generate(prompts, max_new)
    t0 = time.perf_counter()
    total = 0
    for r in range(repeats):
        base = max(engine.outputs.keys()) + 1
        for i, p in enumerate(prompts):
            engine.add_request(base + i, p, max_new)
        engine.run_to_completion()
        total += sum(
            len(engine.outputs[base + i].tokens) for i in range(len(prompts))
        )
    dt = time.perf_counter() - t0
    return total / dt, engine


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--max-new", type=int, default=64)
    ap.add_argument("--nprompts", type=int, default=8)
    ap.add_argument("--prompt-len", type=int, default=512)
    ap.add_argument("--shared-frac", type=float, default=0.75,
                    help="fraction of each prompt that is a shared prefix")
    args = ap.parse_args(argv)
    if args.quick:
        args.max_new, args.nprompts, args.prompt_len = 16, 4, 192

    model, params, cfg = build_model()
    rng = np.random.RandomState(0)
    shared = rng.randint(
        0, cfg.vocab_size, int(args.prompt_len * args.shared_frac)
    ).tolist()
    prompts = [
        shared + rng.randint(
            0, cfg.vocab_size, args.prompt_len - len(shared)
        ).tolist()
        for _ in range(args.nprompts)
    ]

    rows = []
    for depth, pc in [(1, False), (4, False), (1, True), (4, True)]:
        tps, engine = run_engine(
            model, params, prompts, args.max_new,
            decode_depth=depth, prefix_caching=pc,
        )
        row = {
            "bench": "serving_engine", "decode_depth": depth,
            "prefix_caching": pc, "tokens_per_s": round(tps, 1),
            "nprompts": args.nprompts, "prompt_len": args.prompt_len,
            "max_new": args.max_new,
            "backend": jax.default_backend(),
        }
        if pc:
            row["prefix_hits"] = engine.prefix_cache.hits
        rows.append(row)
        print(json.dumps(row), flush=True)

    # Quantized-KV serving (EngineConfig.kv_cache_dtype): same waves on
    # 1-byte page pools — 2x KV capacity; tokens/s tracks bf16 when the
    # model is small enough that cache bandwidth isn't the bound.
    for kvd, scale in (("int8", 0.05), ("fp8", 1.0)):
        tps, engine = run_engine(
            model, params, prompts, args.max_new,
            decode_depth=4, kv_cache_dtype=kvd, kv_cache_scale=scale,
        )
        row = {
            "bench": "serving_engine", "decode_depth": 4,
            "kv_cache_dtype": kvd, "tokens_per_s": round(tps, 1),
            "nprompts": args.nprompts, "prompt_len": args.prompt_len,
            "max_new": args.max_new, "backend": jax.default_backend(),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    # Speculative round: a 2-layer draft of the same family. Acceptance on
    # random-weight models is low — on trained pairs it is the headline
    # serving speedup; this row tracks the machinery's overhead floor.
    draft_model, draft_params, _ = build_model(n_layer=2)
    tps, engine = run_engine(
        model, params, prompts, args.max_new,
        speculative_k=4, draft=(draft_model, draft_params),
    )
    row = {
        "bench": "serving_engine", "speculative_k": 4,
        "tokens_per_s": round(tps, 1), "nprompts": args.nprompts,
        "prompt_len": args.prompt_len, "max_new": args.max_new,
        "backend": jax.default_backend(),
    }
    rows.append(row)
    print(json.dumps(row), flush=True)
    base = rows[0]["tokens_per_s"]
    best = max(r["tokens_per_s"] for r in rows)
    print(json.dumps({
        "bench": "serving_engine_summary",
        "speedup_best_vs_plain": round(best / base, 3),
    }))


if __name__ == "__main__":
    main()
