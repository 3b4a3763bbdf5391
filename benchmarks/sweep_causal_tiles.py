"""Causal forward tile sweep (VERDICT r1 item 2).

The committed default (block_q=1024, block_kv=512) was tuned on the
non-causal rectangle. Causal rows have short, uneven kv trip counts
(2..16 tiles at s=8k/block_kv=512), so the pipeline prologue/epilogue and
the per-row o-accumulator flush are relatively more expensive; a different
tile shape may win. Reports useful-TFLOP/s (causal FLOPs / time).

    python benchmarks/sweep_causal_tiles.py [--s 8192] [--d 128]
"""

import argparse
import itertools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from flash_attn_tpu.kernels.common import BlockSizes
from flash_attn_tpu.kernels.flash_fwd import flash_attention_fwd
from flash_attn_tpu.utils.benchmark import benchmark_forward


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=4)
    ap.add_argument("--h", type=int, default=16)
    ap.add_argument("--s", type=int, default=8192)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--bq", type=int, nargs="*",
                    default=[512, 1024, 2048, 4096])
    ap.add_argument("--bkv", type=int, nargs="*", default=[256, 512, 1024])
    ap.add_argument("--iters", type=int, nargs=2, default=[2, 6],
                    metavar=("LO", "HI"))
    ap.add_argument("--trials", type=int, default=2)
    args = ap.parse_args(argv)

    b, h, s, d = args.b, args.h, args.s, args.d
    flops = 2 * 2 * b * h * d * (s * (s + 1) // 2)  # QK^T + PV, lower tri

    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (b, h, s, d), jnp.bfloat16)
    k = jax.random.normal(kk, (b, h, s, d), jnp.bfloat16)
    v = jax.random.normal(kv, (b, h, s, d), jnp.bfloat16)

    rows = []
    for bq, bkv in itertools.product(args.bq, args.bkv):
        if bq * bkv * 4 > 8 * 1024 * 1024:  # scores tile too big for VMEM
            continue
        bs = BlockSizes(block_q=bq, block_kv=bkv, block_q_dkv=1024,
                        block_kv_dkv=1024, block_q_dq=1024, block_kv_dq=1024)

        def fn(q, k, v, _bs=bs):
            return flash_attention_fwd(
                q, k, v, causal=True, block_sizes=_bs)[0]

        try:
            sec = benchmark_forward(fn, q, k, v, iters_lo=args.iters[0],
                                    iters_hi=args.iters[1],
                                    trials=args.trials)
        except Exception as e:  # noqa: BLE001 — report and keep sweeping
            print(f"bq={bq:5d} bkv={bkv:5d}  FAILED: {type(e).__name__}")
            continue
        tfs = flops / sec / 1e12
        rows.append({"block_q": bq, "block_kv": bkv,
                     "tflops": round(tfs, 1)})
        print(f"bq={bq:5d} bkv={bkv:5d}  {tfs:7.1f} useful TF/s", flush=True)

    rows.sort(key=lambda r: -r["tflops"])
    print(json.dumps({"bench": "causal_tile_sweep", "shape":
                      f"b{b} h{h} s{s} d{d}", "best": rows[0] if rows else None}))


if __name__ == "__main__":
    main()
