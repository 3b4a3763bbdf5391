"""Block-sparse mask_mod execution benchmark (FA4 block sparsity).

Measures the VERDICT r4 acceptance: a ~10%-density document/prefix mask_mod
at s >= 4k must run >= 4x faster through the block-sparse plan than the
dense-masked path (which evaluates mask_mod on every tile — the reference's
own motivation for compute_block_sparsity).

Usage: python benchmarks/benchmark_blocksparse.py [--quick] [--json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from flash_attn_tpu import compute_block_sparsity, flash_attn_func
from flash_attn_tpu.kernels.common import BlockSizes, aux_take
from flash_attn_tpu.utils.benchmark import benchmark_forward


def doc_mask(s, ndocs):
    """Equal-size causal document mask as a closed-form mod (no aux
    gathers — the structural block-sparsity comparison; aux_take-table
    doc masks sweep the whole table per tile and blow scoped VMEM at
    s >= 8k on BOTH paths — use segment_ids for those)."""
    dlen = s // ndocs

    def mask_mod(b, h, q_idx, kv_idx):
        return jnp.logical_and(kv_idx <= q_idx, q_idx // dlen == kv_idx // dlen)

    density = float(ndocs * (dlen**2) / 2.0 / s / s)
    return mask_mod, (), density


def doc_mask_aux(s, ndocs):
    """Runtime doc-id table via aux_take (the FA4 aux_tensors shape)."""
    bounds = np.linspace(0, s, ndocs + 1).astype(np.int64)
    ids = np.zeros(s, np.int32)
    for i, (a, b) in enumerate(zip(bounds[:-1], bounds[1:])):
        ids[a:b] = i
    doc = jnp.asarray(ids)

    def mask_mod(b, h, q_idx, kv_idx, aux):
        d = aux.tensors[0]
        return jnp.logical_and(
            kv_idx <= q_idx, aux_take(d, q_idx) == aux_take(d, kv_idx)
        )

    lens = np.diff(bounds)
    density = float((lens.astype(np.float64) ** 2).sum() / 2.0 / s / s)
    return mask_mod, (doc,), density


def prefix_mask(s, prefix):
    def mask_mod(b, h, q_idx, kv_idx):
        return jnp.logical_or(kv_idx < prefix, kv_idx <= q_idx)

    density = 0.5 + prefix / s - 0.5 * (prefix / s) ** 2
    return mask_mod, (), density


def run_case(name, mask_mod, aux, density, *, b, h, s, d, tiles, quick):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, s, h, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, s, h, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, s, h, d), jnp.bfloat16)
    it = dict(iters_lo=2, iters_hi=6) if quick else dict(
        iters_lo=4, iters_hi=12)

    # Dense-masked baseline at its best tiles that fit VMEM with a mod
    # (the default (1024, 512) OOMs scoped VMEM once aux_take's gather
    # intermediates are live).
    t_dense = benchmark_forward(
        lambda q_: flash_attn_func(
            q_, k, v, mask_mod=mask_mod, aux_tensors=aux,
            block_sizes=BlockSizes(block_q=512, block_kv=512)), q, **it,
    )
    rows = []
    for tm, tn in tiles:
        bst = compute_block_sparsity(
            mask_mod, batch_size=b, num_heads=h, seqlen_q=s, seqlen_k=s,
            tile_m=tm, tile_n=tn, aux_tensors=aux,
        )
        live = (np.asarray(bst.mask_block_cnt).sum()
                + (np.asarray(bst.full_block_cnt).sum()
                   if bst.full_block_cnt is not None else 0))
        total = b * h * (s // tm) * (s // tn)
        t_sp = benchmark_forward(
            lambda q_: flash_attn_func(
                q_, k, v, mask_mod=mask_mod, aux_tensors=aux,
                block_sparse_tensors=bst), q, **it,
        )
        rows.append(dict(
            bench="blocksparse_mod", case=name, tile=f"{tm}x{tn}",
            density=round(density, 4),
            block_density=round(float(live) / total, 4),
            dense_us=round(t_dense * 1e6, 1),
            sparse_us=round(t_sp * 1e6, 1),
            speedup=round(t_dense / t_sp, 2),
        ))
        print(json.dumps(rows[-1]), flush=True)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--seqlen", type=int, default=8192)
    args = ap.parse_args()

    s = args.seqlen
    b, h, d = 1, 16, 128
    tiles = [(512, 512)] if args.quick else [
        (512, 512), (1024, 512), (1024, 1024),
    ]
    out = []
    mm, aux, rho = doc_mask(s, ndocs=5)
    out += run_case("doc5", mm, aux, rho, b=b, h=h, s=s, d=d,
                    tiles=tiles, quick=args.quick)
    mm, aux, rho = doc_mask(s, ndocs=10)
    out += run_case("doc10", mm, aux, rho, b=b, h=h, s=s, d=d,
                    tiles=tiles, quick=args.quick)
    mm, aux, rho = prefix_mask(s, s // 16)
    out += run_case("prefix", mm, aux, rho, b=b, h=h, s=s, d=d,
                    tiles=tiles, quick=args.quick)
    mm, aux, rho = doc_mask_aux(2048, ndocs=4)
    out += run_case("doc_aux_2k", mm, aux, rho, b=b, h=h, s=2048, d=d,
                    tiles=[(512, 512)], quick=args.quick)
    if args.json:
        print(json.dumps(out))


if __name__ == "__main__":
    main()
