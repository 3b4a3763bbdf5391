"""Sparse-vs-dense crossover sweep: when does sparse_attn_func actually win?

The reference ships vertical-and-slash sparse kernels to be *faster* than
dense (csrc/flash_attn/flash_api_sparse.cpp:166); on TPU the win depends on
context length, density, and the slash/vertical split (scattered verticals
light up almost every 128-wide tile). This sweeps the crossover surface and
writes benchmarks/SPARSE_CROSSOVER.md — the user-facing routing guidance
VERDICT r2 weak-#5 asked for.

    python benchmarks/sweep_sparse_crossover.py [--quick]
"""

import argparse
import datetime
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmark_sparse import bench  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))

# (b, h, s, d, density, slash_frac) — batch sized to keep total work similar.
SWEEP = [
    (8, 8, 2048, 128, 0.12, 0.98),
    (4, 8, 4096, 128, 0.12, 0.98),
    (4, 8, 4096, 128, 0.06, 0.98),
    (1, 8, 8192, 128, 0.12, 0.98),
    (1, 8, 8192, 128, 0.06, 0.98),
    (1, 8, 8192, 128, 0.12, 0.30),
    (1, 8, 16384, 128, 0.06, 0.98),
    (1, 8, 16384, 128, 0.03, 0.98),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    sweep = SWEEP[:2] if args.quick else SWEEP

    rows = []
    for b, h, s, d, density, sf in sweep:
        r = bench(b, h, s, s, d, density, sf)
        rec = {"b": b, "h": h, "s": s, "d": d, "slash_frac": sf, **r}
        print(json.dumps(rec), flush=True)
        rows.append(rec)

    stamp = datetime.datetime.now(datetime.timezone.utc).isoformat(
        timespec="seconds"
    )
    lines = [
        "# Sparse attention: dense crossover table",
        "",
        f"Run: {stamp} (TPU v5e, bf16, d=128; speedup >1 means "
        "`sparse_attn_func` beats the dense kernel at the same shape)",
        "",
        "| s | density | slash_frac | speedup_vs_dense | us_sparse | us_dense |",
        "|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['s']} | {r['density']} | {r['slash_frac']} | "
            f"{r['speedup_vs_dense']} | {r['us_sparse']} | {r['us_dense']} |"
        )
    lines += [
        "",
        "Routing guidance (encoded nowhere automatic — density is only known",
        "to the caller): prefer `sparse_attn_func` when the context is >=8k",
        "AND density <= ~12% AND the pattern is slash-dominated; below 4k or",
        "for scattered-vertical-heavy patterns the dense kernel's larger",
        "tiles win. The DMA-gather kernel (flash_sparse_gather.py) is chosen",
        "automatically when eligible and is what makes the long-context",
        "low-density cells profitable.",
        "",
    ]
    with open(os.path.join(HERE, "SPARSE_CROSSOVER.md"), "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {len(rows)} rows to benchmarks/SPARSE_CROSSOVER.md")


if __name__ == "__main__":
    main()
