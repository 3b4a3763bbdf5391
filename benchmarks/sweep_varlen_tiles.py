"""Varlen tile sweep: find the best (block_q, block_kv) per packing shape.

    python benchmarks/sweep_varlen_tiles.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from flash_attn_tpu.kernels.flash_varlen import flash_attention_varlen_fwd
from flash_attn_tpu.utils.benchmark import benchmark_forward


def bench(nseq, mean_len, h, d, bq, bkv, causal=True, seed=0):
    rng = np.random.RandomState(seed)
    lens = rng.randint(mean_len // 2, mean_len + mean_len // 2, nseq)
    cu = np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)
    total = int(cu[-1])
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 3)
    q = jax.random.normal(ks[0], (total, h, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (total, h, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (total, h, d), jnp.bfloat16)
    cu = jnp.asarray(cu)

    def f(q, k, v):
        return flash_attention_varlen_fwd(
            q, k, v, cu, cu, causal=causal, block_q=bq, block_kv=bkv,
        )[0]

    sec = benchmark_forward(f, q, k, v)
    flops = sum(4.0 * h * d * (ln * ln) / (2 if causal else 1) for ln in lens)
    return flops / sec / 1e12


def main():
    print(f"device: {jax.devices()[0].device_kind}")
    shapes = [(8, 2048), (16, 1024), (4, 8192)]
    tiles = [(1024, 512), (512, 512), (512, 1024), (256, 512), (512, 256),
             (1024, 256), (2048, 512)]
    for nseq, mean in shapes:
        best = (None, 0.0)
        for bq, bkv in tiles:
            tf = bench(nseq, mean, 8, 128, bq, bkv)
            print(json.dumps({
                "nseq": nseq, "mean": mean, "bq": bq, "bkv": bkv,
                "useful_tflops": round(tf, 1),
            }), flush=True)
            if tf > best[1]:
                best = ((bq, bkv), tf)
        print(json.dumps({"nseq": nseq, "mean": mean, "best": best[0],
                          "best_tflops": round(best[1], 1)}), flush=True)


if __name__ == "__main__":
    main()
