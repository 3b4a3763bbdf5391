"""Paged-KV decode benchmark (reference: hopper/benchmark_mla_decode.py,
benchmarks/benchmark_mla_paged_kv.py): tokens/s of the decode kernel and of
the end-to-end continuous-batching engine."""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

from flash_attn_tpu.kernels.flash_decode import flash_attention_decode
from flash_attn_tpu.utils.benchmark import benchmark_forward


def bench_decode_kernel(b, smax, h, hk, d, page=256, contiguous=True,
                        fused=False):
    key = jax.random.PRNGKey(0)
    kq, kk, kv, kt = jax.random.split(key, 4)
    q = jax.random.normal(kq, (b, 1, h, d), jnp.bfloat16)
    npages = b * (smax // page)
    k_pages = jax.random.normal(kk, (npages, hk, page, d), jnp.bfloat16)
    v_pages = jax.random.normal(kv, (npages, hk, page, d), jnp.bfloat16)
    if contiguous:
        table = jnp.arange(npages, dtype=jnp.int32).reshape(b, -1)
    else:
        table = jax.random.permutation(kt, npages).astype(jnp.int32).reshape(b, -1)
    seqlens = jnp.full((b,), smax, jnp.int32)
    if fused:
        # The serving engine's default layout: K|V page-adjacent in one
        # pool, one gather DMA per page.
        kv_pages = jnp.concatenate([k_pages, v_pages], axis=-1)

        def step(q):
            out, _ = flash_attention_decode(
                q, kv_pages, None, seqlens, block_table=table,
                fused_kv_dim=d, fused_kv_dim_v=d,
            )
            return out
    else:
        def step(q):
            out, _ = flash_attention_decode(
                q, k_pages, v_pages, seqlens, block_table=table
            )
            return out

    # Decode steps are ~10-100us; large iteration counts keep the timing
    # slope above host/tunnel noise.
    sec = benchmark_forward(step, q, iters_lo=32, iters_hi=256)
    # Decode is bandwidth-bound: report KV bytes/s and tokens/s.
    kv_bytes = 2 * npages * hk * page * d * 2
    return {
        "tokens_per_s": b / sec,
        "kv_gb_per_s": kv_bytes / sec / 1e9,
        "us_per_step": sec * 1e6,
    }


def bench_mla_absorbed_decode(b=4, smax=8192, h=16, d=576, dv=512, page=256):
    """MLA weight-absorbed decode (reference hopper/benchmark_mla_decode.py:
    d_qk = 576 = 512 latent + 64 rope, d_v = 512, MQA over ONE latent KV
    head, S = Q K^T + Qv V^T via the qv argument)."""
    key = jax.random.PRNGKey(0)
    kq, kk, kv, kqv = jax.random.split(key, 4)
    q = jax.random.normal(kq, (b, 1, h, d), jnp.bfloat16)
    qv = jax.random.normal(kqv, (b, 1, h, dv), jnp.bfloat16)
    npages = b * (smax // page)
    k_pages = jax.random.normal(kk, (npages, 1, page, d), jnp.bfloat16)
    v_pages = jax.random.normal(kv, (npages, 1, page, dv), jnp.bfloat16)
    table = jnp.arange(npages, dtype=jnp.int32).reshape(b, -1)
    seqlens = jnp.full((b,), smax, jnp.int32)

    def step(q):
        out, _ = flash_attention_decode(
            q, k_pages, v_pages, seqlens, qv=qv, block_table=table
        )
        return out

    sec = benchmark_forward(step, q, iters_lo=32, iters_hi=256)
    kv_bytes = npages * page * (d + dv) * 2
    return {
        "tokens_per_s": b / sec,
        "kv_gb_per_s": kv_bytes / sec / 1e9,
        "us_per_step": sec * 1e6,
    }


def bench_engine(n_requests=16, prompt=512, new_tokens=64):
    """End-to-end continuous-batching tokens/s (engine + C++ scheduler)."""
    import time

    from flash_attn_tpu.models.gpt import GPTConfig, GPTLMHeadModel
    from flash_attn_tpu.runtime.engine import EngineConfig, LLMEngine

    cfg = GPTConfig(vocab_size=32000, n_positions=0, n_embd=1024, n_layer=8,
                    n_head=16, n_head_kv=4, rotary_emb_fraction=1.0,
                    rms_norm=True, activation_function="swiglu",
                    qkv_proj_bias=False, out_proj_bias=False,
                    mlp_fc1_bias=False, mlp_fc2_bias=False,
                    tie_word_embeddings=True)
    model = GPTLMHeadModel(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))
    rng = np.random.RandomState(0)
    prompts = [rng.randint(0, 32000, prompt).tolist()
               for _ in range(n_requests)]
    engine = LLMEngine(model, params, EngineConfig(
        max_batch_size=16, page_size=256, num_pages=256,
        max_pages_per_seq=8, prefill_chunk=512, max_seqlen=2048))
    # Warm both compiled programs on the first request set shape.
    t0 = time.perf_counter()
    engine.generate(prompts, new_tokens)
    dt = time.perf_counter() - t0
    total_new = n_requests * new_tokens
    total_all = n_requests * (prompt + new_tokens)
    return {"decode_tokens_per_s": total_new / dt,
            "total_tokens_per_s": total_all / dt,
            "wall_s": dt}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    sweep = (
        [(8, 4096, 8, 2, 128)]
        if args.quick
        else [
            (1, 4096, 8, 2, 128), (8, 4096, 8, 2, 128),
            (32, 4096, 8, 2, 128), (8, 16384, 8, 2, 128),
            (8, 4096, 8, 1, 576),  # MLA-shaped
        ]
    )
    print(f"device: {jax.devices()[0].device_kind}")
    for b, smax, h, hk, d in sweep:
        r = bench_decode_kernel(b, smax, h, hk, d)
        print(json.dumps({
            "bench": "paged_decode", "b": b, "smax": smax, "h": h,
            "hk": hk, "d": d, **{k: round(v, 2) for k, v in r.items()},
        }))
    # Small-page grid (the vLLM serving regime, reference block sizes 16-32;
    # contiguous tables exercise the coalesced-DMA fast path, permuted
    # tables the per-page fallback).
    pages = [16, 64] if args.quick else [16, 32, 64, 128, 256]
    for page in pages:
        for contig in (True, False):
            for fused in (False, True):
                r = bench_decode_kernel(8, 4096, 8, 2, 128, page=page,
                                        contiguous=contig, fused=fused)
                print(json.dumps({
                    "bench": "paged_decode_small", "page": page,
                    "contig": contig, "fused_kv": fused,
                    **{k: round(v, 2) for k, v in r.items()},
                }))
    r = bench_mla_absorbed_decode()
    print(json.dumps({"bench": "mla_absorbed_decode",
                      **{k: round(v, 2) for k, v in r.items()}}))
    if not args.quick:
        r = bench_engine()
        print(json.dumps({"bench": "engine_continuous_batching",
                          **{k: round(v, 2) for k, v in r.items()}}))


if __name__ == "__main__":
    main()
