"""Quantized attention benchmark: int8/fp8 QKV forward (descale folded into
the softmax scale) and bf16-Q x quantized-KV-cache decode (in-kernel dequant
— the fp8_kv_dequant serving path, cute/interface.py:482-497).

Reference: hopper/benchmark_flash_attention_fp8.py + the FP8 paths of
hopper/flash_api.cpp. Prints one JSON line per config.

    python benchmarks/benchmark_quant.py [--quick]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from flash_attn_tpu.kernels.flash_fwd import flash_attention_fwd
from flash_attn_tpu.kernels.flash_decode import flash_attention_decode
from flash_attn_tpu.runtime.kv_cache import quantize_kv
from flash_attn_tpu.utils.benchmark import (
    attention_tflops,
    benchmark_forward,
)

FP8 = jnp.float8_e4m3fn


def quantize_per_head(x, dtype, qmax):
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=(2, 3), keepdims=True)
    scale = jnp.maximum(amax / qmax, 1e-8)
    q = (x.astype(jnp.float32) / scale)
    if dtype == jnp.int8:
        q = jnp.round(q)
    return q.astype(dtype), scale[:, :, 0, 0]


def bench_quant_fwd(b, s, h, d, dtype, qmax, causal=False):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, h, s, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, h, s, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, h, s, d), jnp.bfloat16)
    q_q, q_s = quantize_per_head(q, dtype, qmax)
    k_q, k_s = quantize_per_head(k, dtype, qmax)
    v_q, v_s = quantize_per_head(v, dtype, qmax)

    def f(qq, kk, vv):
        return flash_attention_fwd(
            qq, kk, vv, q_descale=q_s, k_descale=k_s, v_descale=v_s,
            causal=causal,
        )[0]

    sec = benchmark_forward(f, q_q, k_q, v_q)
    return attention_tflops(b, s, s, h, d, causal=causal) / sec


def bench_quant_kv_decode(b, smax, hk, d, dtype, page=None):
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    qd = jax.random.normal(ks[0], (b, 1, hk, d), jnp.bfloat16)
    kc = jax.random.normal(ks[1], (b, hk, smax, d), jnp.bfloat16)
    vc = jax.random.normal(ks[2], (b, hk, smax, d), jnp.bfloat16)
    k_q, v_q, k_s, v_s = quantize_kv(kc, vc, dtype=dtype, head_axis=1)
    seqlens = jnp.full((b,), smax, jnp.int32)

    def f(qd):
        return flash_attention_decode(
            qd, k_q, v_q, seqlens, k_scale=k_s, v_scale=v_s, causal=True,
        )[0]

    sec = benchmark_forward(f, qd)
    bytes_kv = 2 * b * hk * smax * d * jnp.dtype(dtype).itemsize
    return bytes_kv / sec / 1e9  # GB/s of quantized-cache reads


def bench_quant_paged_decode(b, smax, hk, d, dtype, page=128,
                             permuted=True, fused=False):
    """Quantized PAGED pools through the multipage DMA pipeline — the
    serving route (EngineConfig.kv_cache_dtype; VERDICT r3 #3). Reports
    GB/s of quantized-cache bytes; tokens/s parity with bf16 requires
    matching GELEM/s (2x the GB/s of a bf16 pool at the same tokens)."""
    import numpy as np

    maxp = smax // page
    npages = b * maxp + 1
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    qd = jax.random.normal(ks[0], (b, 1, hk, d), jnp.bfloat16)
    rng = np.random.RandomState(0)
    if permuted:
        tb = rng.permutation(npages - 1)[: b * maxp] + 1
    else:
        tb = np.arange(1, b * maxp + 1)
    table = jnp.asarray(tb.reshape(b, maxp), jnp.int32)
    if dtype is None:  # bf16 baseline
        kp = jax.random.normal(ks[1], (npages, hk, page, d), jnp.bfloat16)
        vp = jax.random.normal(ks[2], (npages, hk, page, d), jnp.bfloat16)
        k_s = v_s = None
    else:
        kp = jax.random.randint(
            ks[1], (npages, hk, page, d), -127, 127, jnp.int8
        ).astype(dtype) if dtype == jnp.int8 else jax.random.normal(
            ks[1], (npages, hk, page, d), jnp.float32).astype(dtype)
        vp = jax.random.randint(
            ks[2], (npages, hk, page, d), -127, 127, jnp.int8
        ).astype(dtype) if dtype == jnp.int8 else jax.random.normal(
            ks[2], (npages, hk, page, d), jnp.float32).astype(dtype)
        k_s = v_s = jnp.full((hk,), 0.05, jnp.float32)
    seqlens = jnp.full((b,), smax, jnp.int32)
    if fused:
        kvp = jnp.concatenate([kp, vp], axis=-1)

        def f(qd):
            return flash_attention_decode(
                qd, kvp, None, seqlens, block_table=table,
                fused_kv_dim=d, fused_kv_dim_v=d,
                k_scale=k_s, v_scale=v_s, causal=True,
            )[0]
    else:
        def f(qd):
            return flash_attention_decode(
                qd, kp, vp, seqlens, block_table=table,
                k_scale=k_s, v_scale=v_s, causal=True,
            )[0]

    # ~100us/call: long chains defeat the tunnel's dedup/early-return
    # artifact (short chains measured NaN/garbage slopes here).
    sec = benchmark_forward(f, qd, iters_lo=32, iters_hi=128)
    itemsize = 2 if dtype is None else jnp.dtype(dtype).itemsize
    bytes_kv = 2 * b * hk * smax * d * itemsize
    return bytes_kv / sec / 1e9, bytes_kv / itemsize / sec / 1e9  # GB/s, Gelem/s


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args(argv)

    print(f"device: {jax.devices()[0].device_kind}")
    fwd_sweep = [(4, 2048, 8, 128)] if args.quick else [
        (4, 2048, 8, 128), (4, 8192, 8, 128),
    ]
    for b, s, h, d in fwd_sweep:
        for dtype, qmax, name in ((jnp.int8, 127.0, "int8"),
                                  (FP8, 448.0, "fp8_e4m3")):
            tf = bench_quant_fwd(b, s, h, d, dtype, qmax)
            print(json.dumps({
                "bench": "quant_fwd", "dtype": name, "b": b, "s": s,
                "h": h, "d": d, "tflops": round(tf, 1),
            }), flush=True)

    dec_sweep = [(8, 4096, 8, 128)] if args.quick else [
        (8, 4096, 8, 128), (8, 8192, 8, 128),
    ]
    for b, smax, hk, d in dec_sweep:
        for dtype, name in ((jnp.int8, "int8"), (FP8, "fp8_e4m3")):
            gbs = bench_quant_kv_decode(b, smax, hk, d, dtype)
            print(json.dumps({
                "bench": "quant_kv_decode", "dtype": name, "b": b,
                "smax": smax, "hk": hk, "d": d,
                "cache_read_gbps": round(gbs, 1),
            }), flush=True)

    # One paged shape: each cell is a fresh kernel compile (~2-4 min via
    # the remote tunnel) and the grid gives this script 1h total.
    paged_sweep = [(8, 4096, 2, 128)]
    for b, smax, hk, d in paged_sweep:
        for dtype, name in ((None, "bf16"), (jnp.int8, "int8"),
                            (FP8, "fp8_e4m3")):
            for fused in ((False,) if args.quick else (False, True)):
                gbs, gels = bench_quant_paged_decode(
                    b, smax, hk, d, dtype, fused=fused
                )
                print(json.dumps({
                    "bench": "quant_paged_decode", "dtype": name, "b": b,
                    "smax": smax, "hk": hk, "d": d, "page": 128,
                    "fused": fused, "permuted": True,
                    "cache_read_gbps": round(gbs, 1),
                    "gelem_per_s": round(gels, 1),
                }), flush=True)


if __name__ == "__main__":
    main()
