"""Varlen forward gap attribution (round 2 continuation).

The causal-gap cost model (benchmarks/PROFILE_CAUSAL.md: t_step=1.80us per
visible 512x1024-ish tile, C=1.45us per q chain, ~0.32us per predicated-off
step) predicts ~90 TF/s useful for the 4x8192 varlen row; the committed
number is 43. This script isolates where the extra per-step time goes by
sweeping controlled configurations on the real chip:

  A. uniform ALIGNED lengths (every seq exactly `mean`, multiples of the
     tiles) — boundary effects zero, spans exact: pure kernel overhead vs
     the dense model.
  B. uniform lengths, non-causal — removes the causal span math.
  C. the committed random-length rows for reference.

    python benchmarks/profile_varlen.py
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


def bench(lens, h, d, causal, block_q=512, block_kv=1024, seed=0):
    lens = np.asarray(lens)
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
            q, k, v, cu, cu, causal=causal,
            block_q=block_q, block_kv=block_kv,
        )[0]

    sec = benchmark_forward(f, q, k, v)
    flops = sum(4.0 * h * d * float(ln) * float(ln) / (2 if causal else 1)
                for ln in lens)
    return sec, flops / sec / 1e12


def model_us(lens, block_q, block_kv, causal):
    """PROFILE_CAUSAL.md cost model, per head."""
    lens = np.asarray(lens)
    t_step, c_chain, t_off = 1.80, 1.45, 0.32
    # scale t_step to tile area (model was 1024x512 = same area as 512x1024)
    area = block_q * block_kv / (1024 * 512)
    nqb_tot = int(np.ceil(lens.sum() / block_q))
    visible = 0
    spans = []
    for ln in lens:
        nq = int(np.ceil(ln / block_q))
        for p in range(nq):
            last_row = min((p + 1) * block_q, ln) - 1
            span = int(last_row // block_kv) + 1 if causal else int(
                np.ceil(ln / block_kv))
            visible += span
            spans.append(span)
    nkb_eff = max(spans)
    off = nqb_tot * nkb_eff - visible
    return visible * t_step * area + nqb_tot * c_chain + off * t_off


def main():
    print(f"device: {jax.devices()[0].device_kind}")
    h, d = 8, 128
    # B rows are PURE-INTERIOR (uniform aligned non-causal): every tile
    # skips masking, so they measure the kernel's intrinsic per-step cost —
    # directly comparable against the dense kernel's 143-151 TF/s.
    rows = [
        ("B_noncausal_512x1024", [8192] * 4, False, 512, 1024),
        ("B_noncausal_1024x512", [8192] * 4, False, 1024, 512),
        ("A_causal_512x1024", [8192] * 4, True, 512, 1024),
        ("A_causal_1024x512", [8192] * 4, True, 1024, 512),
    ]
    for name, lens, causal, bq, bkv in rows:
        sec, tf = bench(lens, h, d, causal, block_q=bq, block_kv=bkv)
        n_steps = model_us(lens, bq, bkv, causal)  # reuse tile counter
        print(json.dumps({
            "row": name, "lens_0": int(lens[0]),
            "time_ms": round(sec * 1e3, 3),
            "useful_tflops": round(tf, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
