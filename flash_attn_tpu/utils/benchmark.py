"""Benchmark helpers (reference: flash_attn/utils/benchmark.py:8-258
benchmark_forward/backward/combined/all, pytorch_profiler, benchmark_memory).

TPU-specific methodology: remote runtimes dedupe identical dispatches and
block_until_ready can return before device completion, so K iterations are
chained inside one jit (each feeding its output forward) and wall time is
the slope between two K values — constant overhead cancels.
"""

from __future__ import annotations

import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp


def _chain(fn, primal, args, iters):
    @jax.jit
    def chained(x, *rest):
        def body(carry, _):
            out = fn(carry, *rest)
            if isinstance(out, tuple):
                out = out[0]
            out = out.astype(carry.dtype)
            if out.size == carry.size:
                nxt = out.reshape(carry.shape)
            elif out.size > carry.size:
                nxt = out.reshape(-1)[: carry.size].reshape(carry.shape)
            else:
                # Output smaller than the input (e.g. MLA absorbed decode,
                # d_v < d_qk): tile it to keep the data-dependence chain.
                reps = -(-carry.size // out.size)
                nxt = jnp.tile(out.reshape(-1), reps)[: carry.size].reshape(
                    carry.shape
                )
            return nxt, ()

        final, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.sum(final.astype(jnp.float32))

    return chained


def _time_chained(fn, primal, args, iters, trials=3):
    chained = _chain(fn, primal, args, iters)
    chained(primal, *args).block_until_ready()
    best = float("inf")
    for t in range(trials):
        p2 = primal + jnp.asarray(t + 1, primal.dtype) * jnp.asarray(
            1e-3, primal.dtype
        )
        t0 = time.perf_counter()
        float(chained(p2, *args))
        best = min(best, time.perf_counter() - t0)
    return best


def benchmark_forward(
    fn: Callable,
    primal: jnp.ndarray,
    *args,
    iters_lo: int = 4,
    iters_hi: int = 16,
    trials: int = 3,
) -> float:
    """Seconds per call of fn(primal, *args). fn's first output must have
    primal's shape (it is fed back to defeat dispatch dedup).

    Degenerate slopes (t_hi ~ t_lo — the tunnel's early-return/dedup
    artifact) are NOT silently clamped: the measurement escalates the
    iteration counts once, and if still degenerate returns NaN with a
    warning so garbage numbers can't masquerade as results."""
    for scale in (1, 4):
        lo, hi = iters_lo * scale, iters_hi * scale
        t_lo = _time_chained(fn, primal, args, lo, trials)
        t_hi = _time_chained(fn, primal, args, hi, trials)
        slope = (t_hi - t_lo) / (hi - lo)
        # Real per-iter time should make the long chain measurably longer.
        if t_hi - t_lo > 0.05 * max(t_hi, 1e-9) and slope > 0:
            return slope
    import warnings

    warnings.warn(
        "benchmark_forward: degenerate timing slope (t_hi ~ t_lo) — remote "
        "runtime deduped/early-returned; result is unreliable", stacklevel=2,
    )
    return float("nan")


def benchmark_backward(fn, primal, *args, **kw) -> float:
    """Seconds per backward (vjp) call."""

    def bwd(x, *rest):
        out, vjp = jax.vjp(lambda x_: fn(x_, *rest), x)
        (dx,) = vjp(jnp.ones_like(out))
        return dx

    return benchmark_forward(bwd, primal, *args, **kw)


def benchmark_combined(fn, primal, *args, **kw) -> float:
    """Seconds per forward+backward (gradients wrt ALL array inputs — a
    single-argnum grad would let XLA dead-code-eliminate the other backward
    kernels and over-report)."""

    def fwdbwd(x, *rest):
        def loss(*xs):
            return jnp.sum(fn(*xs).astype(jnp.float32))

        g = jax.grad(loss, argnums=tuple(range(1 + len(rest))))(x, *rest)
        out = g[0]
        for gi in g[1:]:
            out = out + jnp.sum(gi.astype(jnp.float32)).astype(out.dtype)
        return out

    return benchmark_forward(fwdbwd, primal, *args, **kw)


def attention_tflops(
    b: int, s_q: int, s_k: int, h: int, d: int, *, causal: bool,
    mode: str = "fwd",
) -> float:
    """TFLOP count per call with the reference's formula
    (benchmarks/benchmark_flash_attention.py:28-31):
    fwd = 4*b*s_q*s_k*h*d (/2 if causal); bwd = 2.5x; fwd+bwd = 3.5x."""
    f = 4 * b * s_q * s_k * h * d / (2 if causal else 1)
    return f * {"fwd": 1.0, "bwd": 2.5, "fwd_bwd": 3.5}[mode] / 1e12


def benchmark_memory(fn, *args) -> Optional[float]:
    """Peak device memory in GB for one call (maps benchmark_memory :258)."""
    try:
        compiled = jax.jit(fn).lower(*args).compile()
        stats = compiled.memory_analysis()
        total = (
            stats.temp_size_in_bytes
            + stats.argument_size_in_bytes
            + stats.output_size_in_bytes
        )
        return total / 1e9
    except Exception:
        return None


def profile_trace(fn, *args, trace_dir: str = "/tmp/jax-trace"):
    """jax.profiler wrapper (maps pytorch_profiler :202)."""
    fn(*args)  # compile outside the trace
    with jax.profiler.trace(trace_dir):
        out = fn(*args)
        jax.block_until_ready(out)
    return trace_dir
