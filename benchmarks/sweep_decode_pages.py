"""Small-page decode bandwidth sweep (control + gen-2 comparison)."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from flash_attn_tpu.kernels.flash_decode import flash_attention_decode
from flash_attn_tpu.utils.benchmark import benchmark_forward


def bench_page(b, smax, h, hk, d, page, contiguous=True):
    key = jax.random.PRNGKey(0)
    kq, kk, kv, kt = jax.random.split(key, 4)
    q = jax.random.normal(kq, (b, 1, h, d), jnp.bfloat16)
    npages = b * (smax // page)
    k_pages = jax.random.normal(kk, (npages, hk, page, d), jnp.bfloat16)
    v_pages = jax.random.normal(kv, (npages, hk, page, d), jnp.bfloat16)
    if contiguous:
        table = jnp.arange(npages, dtype=jnp.int32).reshape(b, -1)
    else:
        table = jax.random.permutation(kt, npages).astype(jnp.int32).reshape(b, -1)
    seqlens = jnp.full((b,), smax, jnp.int32)

    def step(q):
        out, _ = flash_attention_decode(
            q, k_pages, v_pages, seqlens, block_table=table
        )
        return out

    sec = benchmark_forward(step, q, iters_lo=32, iters_hi=256)
    kv_bytes = 2 * npages * hk * page * d * 2
    return {"kv_gb_per_s": round(kv_bytes / sec / 1e9, 1),
            "us_per_step": round(sec * 1e6, 1)}


if __name__ == "__main__":
    b, smax, h, hk, d = 8, 4096, 8, 2, 128
    print(f"device: {jax.devices()[0].device_kind}  b={b} smax={smax} h={h} hk={hk} d={d}")
    for page in (16, 32, 64, 128, 256):
        for contig in (True, False):
            r = bench_page(b, smax, h, hk, d, page, contiguous=contig)
            print(json.dumps({"page": page, "contig": contig, **r}), flush=True)
