"""Sparse-attention benchmark (reference: FA4 block-sparse sweep configs,
benchmarks/configs/*.yaml; MInference vertical-and-slash pattern).

Reports effective TFLOP/s counting ONLY attended positions (the useful-work
convention the sparse literature uses) plus the dense-equivalent speedup.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from flash_attn_tpu import flash_attn_func, sparse_attn_func
from flash_attn_tpu.utils.benchmark import benchmark_forward


def make_metadata(b, h, sq, sk, density, rng, slash_frac=0.7):
    """Vertical-and-slash metadata covering ~`density` of each q-block row.

    slash_frac controls the split: slash (64-wide blocks) skip whole tiles
    and are fast; scattered verticals light up almost every 128-wide tile
    (each costs a full tile of MXU work plus the bitmap mask), so
    vertical-heavy patterns degrade toward dense cost — the per-column-DMA
    variant noted in flash_sparse.py is the planned fix for those."""
    nqb = (sq + 63) // 64
    n64 = sk // 64
    nnz_s = max(1, int(density * n64 * slash_frac))
    nnz_v = max(1, int(density * sk * (1.0 - slash_frac)))
    block_offset = np.zeros((b, h, nqb, nnz_s), np.int32)
    column_index = np.zeros((b, h, nqb, nnz_v), np.int32)
    for bi in range(b):
        for hi in range(h):
            for qb in range(nqb):
                blocks = rng.choice(n64, nnz_s, replace=False) * 64
                block_offset[bi, hi, qb] = np.sort(blocks)
                taken = set()
                for off in blocks:
                    taken.update(range(off, off + 64))
                avail = [c for c in range(sk) if c not in taken]
                column_index[bi, hi, qb] = np.sort(
                    rng.choice(avail, min(nnz_v, len(avail)), replace=False)
                )
    covered = nnz_s * 64 + nnz_v
    return (
        jnp.full((b, h, nqb), nnz_s, jnp.int32), jnp.asarray(block_offset),
        jnp.full((b, h, nqb), nnz_v, jnp.int32), jnp.asarray(column_index),
        covered,
    )


def bench(b, h, sq, sk, d, density, slash_frac=0.7):
    rng = np.random.RandomState(0)
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (b, sq, h, d), jnp.bfloat16)
    k = jax.random.normal(kk, (b, sk, h, d), jnp.bfloat16)
    v = jax.random.normal(kv, (b, sk, h, d), jnp.bfloat16)
    bc, bo, cc, ci, covered = make_metadata(b, h, sq, sk, density, rng,
                                            slash_frac)

    # Pass everything as jit ARGS: closed-over arrays get baked as HLO
    # constants and oversize the remote-compile payload (CLAUDE.md gotcha).
    def sparse_step(q, k, v, bc, bo, cc, ci):
        return sparse_attn_func(q, k, v, bc, bo, cc, ci)

    def dense_step(q, k, v):
        return flash_attn_func(q, k, v)

    sec_s = benchmark_forward(sparse_step, q, k, v, bc, bo, cc, ci,
                              iters_lo=8, iters_hi=32)
    sec_d = benchmark_forward(dense_step, q, k, v, iters_lo=8, iters_hi=32)
    useful_flops = 4 * b * h * sq * covered * d
    return {
        "sparse_tflops_useful": round(useful_flops / sec_s / 1e12, 1),
        "dense_tflops": round(4 * b * h * sq * sk * d / sec_d / 1e12, 1),
        "speedup_vs_dense": round(sec_d / sec_s, 2),
        "density": round(covered / sk, 3),
        "us_sparse": round(sec_s * 1e6, 1),
        "us_dense": round(sec_d * 1e6, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    sweep = (
        [(1, 8, 2048, 2048, 128, 0.12, 0.98),
         (1, 8, 2048, 2048, 128, 0.12, 0.3)]
        if args.quick
        else [
            (4, 8, 4096, 4096, 128, 0.12, 0.98),
            (4, 8, 4096, 4096, 128, 0.12, 0.3),
            (1, 8, 8192, 8192, 128, 0.06, 0.98),
        ]
    )
    print(f"device: {jax.devices()[0].device_kind}")
    for b, h, sq, sk, d, density, sf in sweep:
        r = bench(b, h, sq, sk, d, density, sf)
        print(json.dumps({
            "bench": "sparse_attention", "b": b, "h": h, "sq": sq, "sk": sk,
            "d": d, "slash_frac": sf, **r,
        }))


if __name__ == "__main__":
    main()
