"""Measured sparse-vs-dense crossover routing (VERDICT r3 #6).

The reference ships vertical-and-slash sparse attention to be FASTER than
dense (csrc/flash_attn/flash_api_sparse.cpp:166); on TPU the win depends on
context length, density, and the slash/vertical split. Whether to sparsify
at all is the CALLER's call (only they know the accuracy tolerance — sparse
attention computes a different function), so the framework cannot silently
substitute exact dense attention; what it CAN do is encode the measured
speed boundary as a queryable API and warn when a call lands on the losing
side.

Constants below are (re)fitted from benchmarks/sweep_sparse_crossover.py
output (benchmarks/SPARSE_CROSSOVER.md holds the committed table).
"""

from __future__ import annotations

import os

# Fitted from the round-4 sweep (TPU v5e, d=128, bf16; committed table in
# benchmarks/SPARSE_CROSSOVER.md): winning cells were s=4096/density
# 0.048 (1.09x), s=8192/0.056 (1.59x), s=16384/0.028 (1.92x); density
# ~0.1 LOST at every context (0.39-0.6x), as did slash_frac 0.3 and
# s=16384/0.06 (the DMA-gather path loses eligibility as NNZ grows).
# The boundary is set conservatively below the worst winning density.
MIN_CONTEXT = 4096
MAX_DENSITY = 0.05
MIN_SLASH_FRAC = 0.5


def should_use_sparse(
    seqlen_k: int,
    density: float,
    slash_frac: float = 1.0,
) -> bool:
    """True when `sparse_attn_func` is measured FASTER than exact dense
    attention at this operating point (same batch/heads). Callers deciding
    whether to sparsify (e.g. MInference-style serving) should consult
    this; below the boundary exact dense attention is both faster and more
    accurate, so sparsifying is strictly worse."""
    return (
        seqlen_k >= MIN_CONTEXT
        and density <= MAX_DENSITY
        and slash_frac >= MIN_SLASH_FRAC
    )


def warn_if_slow(seqlen_k: int, density_hint: float | None) -> None:
    """fa_logging advisory when a sparse call lands below the crossover
    (enabled by FA_LOG_LEVEL like all dispatch logging)."""
    if density_hint is None:
        return
    if not should_use_sparse(seqlen_k, density_hint):
        from flash_attn_tpu.utils.fa_logging import log_dispatch

        log_dispatch(
            "sparse", route="below-crossover",
            seqlen_k=seqlen_k, density=round(density_hint, 4),
            hint=f"dense is faster below s={MIN_CONTEXT}/"
                 f"density>{MAX_DENSITY} (benchmarks/SPARSE_CROSSOVER.md)",
        )


def _env_true(name: str) -> bool:
    return os.environ.get(name, "0") == "1"
