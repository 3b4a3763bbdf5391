"""Attention benchmark sweep (reference: benchmarks/benchmark_flash_attention.py,
benchmarks/bench_sm90.py:110-151, benchmarks/configs/*.yaml).

Sweeps dense fwd / bwd / fwd+bwd TFLOP/s over shapes and prints a table +
one JSON line per config. Run on the TPU:
    python benchmarks/benchmark_flash_attention.py [--quick]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from flash_attn_tpu.kernels.flash_fwd import flash_attention_fwd
from flash_attn_tpu.utils.benchmark import (
    attention_tflops,
    benchmark_combined,
    benchmark_forward,
)
from flash_attn_tpu.flash_attn_interface import flash_attn_func


def bench_config(b, s, h, d, causal, modes=("fwd", "fwd_bwd")):
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, h, s, d), jnp.bfloat16)
    k = jax.random.normal(kk, (b, h, s, d), jnp.bfloat16)
    v = jax.random.normal(kv, (b, h, s, d), jnp.bfloat16)
    res = {}
    if "fwd" in modes:
        sec = benchmark_forward(
            lambda q, k, v: flash_attention_fwd(q, k, v, causal=causal)[0],
            q, k, v,
        )
        res["fwd"] = attention_tflops(b, s, s, h, d, causal=causal) / sec
    if "fwd_bwd" in modes:
        sec = benchmark_combined(
            lambda q, k, v: flash_attn_func(
                q, k, v, causal=causal, layout="bhsd"
            ),
            q, k, v, iters_lo=2, iters_hi=6,
        )
        res["fwd_bwd"] = attention_tflops(
            b, s, s, h, d, causal=causal, mode="fwd_bwd"
        ) / sec
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    if args.quick:
        sweep = [(4, 2048, 8, 128)]
    else:
        sweep = [
            (16, 512, 8, 64), (16, 512, 8, 128),
            (8, 2048, 8, 64), (8, 2048, 8, 128),
            (4, 8192, 8, 128), (2, 16384, 8, 128),
        ]
    print(f"device: {jax.devices()[0].device_kind}")
    print(f"{'shape':>24} {'causal':>6} {'fwd TF/s':>10} {'f+b TF/s':>10}")
    for b, s, h, d in sweep:
        for causal in (False, True):
            r = bench_config(b, s, h, d, causal)
            print(
                f"(b={b},s={s},h={h},d={d})".rjust(24)
                + f" {str(causal):>6} {r.get('fwd', 0):>10.1f}"
                + f" {r.get('fwd_bwd', 0):>10.1f}"
            )
            print(json.dumps({
                "bench": "flash_attention", "b": b, "s": s, "h": h, "d": d,
                "causal": causal, **{k: round(v, 2) for k, v in r.items()},
            }))


if __name__ == "__main__":
    main()
