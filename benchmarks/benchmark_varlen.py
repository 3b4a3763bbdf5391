"""Varlen (packed) attention benchmark — the vLLM chunked-prefill shape.

Reference: the varlen paths of benchmarks/benchmark_flash_attention.py and
the FA3 varlen scheduler. Packs batches of uneven sequences and measures
useful TFLOP/s of `flash_attention_varlen_fwd` (FLOPs counted over the true
per-sequence causal areas, not the padded envelope).

    python benchmarks/benchmark_varlen.py [--quick]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from flash_attn_tpu.kernels.flash_varlen import flash_attention_varlen_fwd
from flash_attn_tpu.utils.benchmark import benchmark_forward


def make_packed(nseq, mean_len, h, d, seed=0, align=None):
    rng = np.random.RandomState(seed)
    lens = rng.randint(mean_len // 2, mean_len + mean_len // 2, nseq)
    if align:
        # Round the LAST sequence up so the packed total lands on a tile
        # boundary (what a serving layer's shape bucketing produces) —
        # then the head-major path's pad is a no-op.
        total = int(lens.sum())
        lens[-1] += (-total) % align
    cu = np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)
    total = int(cu[-1])
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 3)
    q = jax.random.normal(ks[0], (total, h, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (total, h, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (total, h, d), jnp.bfloat16)
    return q, k, v, jnp.asarray(cu), lens


def bench_varlen(nseq, mean_len, h, d, causal=True, layout="thd"):
    # Same tile default as the public API
    # (flash_attn_interface._varlen_default_tiles, round-5 sweep).
    bq, bkv = 1024, 1024
    q, k, v, cu, lens = make_packed(
        nseq, mean_len, h, d,
        align=max(bq, bkv) if layout == "hsd" else None,
    )
    if layout == "hsd":
        q, k, v = (x.transpose(1, 0, 2) for x in (q, k, v))

    def f(q, k, v):
        return flash_attention_varlen_fwd(
            q, k, v, cu, cu, causal=causal, block_q=bq, block_kv=bkv,
            layout=layout,
        )[0]

    sec = benchmark_forward(f, q, k, v)
    flops = sum(4.0 * h * d * (ln * ln) / (2 if causal else 1)
                for ln in lens)
    return flops / sec / 1e12


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args(argv)
    print(f"device: {jax.devices()[0].device_kind}")
    sweep = [(8, 2048, 8, 128)] if args.quick else [
        (8, 2048, 8, 128), (16, 1024, 8, 128), (4, 8192, 8, 128),
    ]
    for nseq, mean_len, h, d in sweep:
        for layout in ("thd", "hsd"):
            tf = bench_varlen(nseq, mean_len, h, d, layout=layout)
            print(json.dumps({
                "bench": "varlen_fwd", "nseq": nseq, "mean_len": mean_len,
                "h": h, "d": d, "causal": True, "layout": layout,
                "useful_tflops": round(tf, 1),
            }), flush=True)


if __name__ == "__main__":
    main()
