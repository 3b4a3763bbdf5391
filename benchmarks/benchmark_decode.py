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


def bench_decode_kernel(b, smax, h, hk, d, page=256):
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, 1, h, d), jnp.bfloat16)
    npages = b * (smax // page)
    k_pages = jax.random.normal(kk, (npages, hk, page, d), jnp.bfloat16)
    v_pages = jax.random.normal(kv, (npages, hk, page, d), jnp.bfloat16)
    table = jnp.arange(npages, dtype=jnp.int32).reshape(b, -1)
    seqlens = jnp.full((b,), smax, jnp.int32)

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


if __name__ == "__main__":
    main()
