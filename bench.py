"""Headline benchmark: BF16 flash-attention forward MXU utilization on TPU.

Mirrors the reference methodology (benchmarks/benchmark_flash_attention.py:28-31):
attention TFLOP = 4*b*s^2*h*d (/2 if causal), timed over repeated steady-state
runs. Prints ONE JSON line with the headline metric.

Target (BASELINE.md): >=60% of MXU roofline at d=128, s=8k on TPU v5e.
"""

import json
import time

import jax
import jax.numpy as jnp


# BF16 peak for known TPU generations (TFLOP/s per chip).
_PEAK_TFLOPS = {
    "v4": 275.0,
    "v5 lite": 197.0,  # v5e
    "v5e": 197.0,
    "v5p": 459.0,
    "v6 lite": 918.0,  # v6e (Trillium)
    "v6e": 918.0,
}


def _device_peak() -> float:
    d = jax.devices()[0]
    kind = getattr(d, "device_kind", "").lower()
    for key, peak in _PEAK_TFLOPS.items():
        if key in kind:
            return peak
    return 197.0  # assume v5e


def main():
    from flash_attn_tpu import flash_attn_func

    b, s, h, dim = 4, 8192, 8, 128
    causal = False
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, s, h, dim), jnp.bfloat16)
    k = jax.random.normal(kk, (b, s, h, dim), jnp.bfloat16)
    v = jax.random.normal(kv, (b, s, h, dim), jnp.bfloat16)

    fn = jax.jit(lambda q, k, v: flash_attn_func(q, k, v, causal=causal))
    out = fn(q, k, v)
    jax.block_until_ready(out)

    n_iter = 20
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = fn(q, k, v)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n_iter

    flops = 4 * b * s * s * h * dim / (2 if causal else 1)
    tflops = flops / dt / 1e12
    peak = _device_peak()
    util = tflops / peak
    target = 0.60
    print(
        json.dumps(
            {
                "metric": "flash_fwd_bf16_mxu_utilization_d128_s8k",
                "value": round(util, 4),
                "unit": "fraction_of_mxu_roofline",
                "vs_baseline": round(util / target, 4),
                "tflops": round(tflops, 2),
                "peak_tflops": peak,
                "device": jax.devices()[0].device_kind,
            }
        )
    )


if __name__ == "__main__":
    main()
