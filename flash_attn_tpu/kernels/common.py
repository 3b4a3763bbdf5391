"""Shared utilities for the Pallas flash-attention kernel family.

TPU-native design notes
-----------------------
The reference (vllm-project/flash-attention) ships four kernel generations
(FA2 CUDA, FA3 CuTe, FA4 CuTeDSL, Triton) with a C++ host-dispatch layer
(csrc/flash_attn/flash_api.cpp, hopper/flash_api.cpp). On TPU we collapse all
of that into ONE Pallas kernel family with a feature lattice; XLA retraces per
static shape, so the reference's static_switch.h dispatch tree becomes plain
Python configuration resolved at trace time.

Masking semantics mirror the reference oracle
(flash_attn/utils/testing.py:228 `attention_ref`): bottom-right-aligned causal
masks, sliding windows expressed relative to `seqlen_k - seqlen_q`, softcap
applied before masking, and additive bias after masking.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp

# Use a large-but-finite mask value instead of -inf so exp(m - m) never sees
# inf - inf (NaN). Same trick the JAX flash kernels use.
DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)

LOG2E = math.log2(math.e)

NUM_LANES = 128
NUM_SUBLANES = 8


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def next_power_of_2(x: int) -> int:
    if x <= 0:
        return 1
    return 1 << (x - 1).bit_length()


@dataclasses.dataclass(frozen=True)
class BlockSizes:
    """Tile sizes for the flash kernels.

    Chosen per-shape by `choose_block_sizes` — the TPU analog of the
    reference's tile_size.h table (hopper/tile_size.h) and
    heuristics (hopper/heuristics.h).
    """

    block_q: int = 128
    block_kv: int = 512
    # Backward pass tiles (dkv kernel iterates q inside kv; dq kernel the reverse).
    block_q_dkv: int = 128
    block_kv_dkv: int = 128
    block_q_dq: int = 128
    block_kv_dq: int = 128

    def __post_init__(self):
        for f in dataclasses.fields(self):
            v = getattr(self, f.name)
            if v % NUM_LANES != 0:
                raise ValueError(f"{f.name}={v} must be a multiple of {NUM_LANES}")


def choose_block_sizes(
    seqlen_q: int,
    seqlen_k: int,
    head_dim: int,
    *,
    dtype=jnp.bfloat16,
) -> BlockSizes:
    """Pick tile sizes that keep VMEM usage comfortable and the MXU fed.

    Larger block_kv amortizes HBM reads of K/V; larger block_q amortizes the
    per-tile softmax bookkeeping. VMEM per grid cell ~
      block_q*d*2 (Q) + 2*block_kv*d*2 (K,V, double-buffered by pallas)
      + block_q*block_kv*4 (scores) + block_q*(2*128 + d)*4 (m,l,acc scratch).
    """
    # Measured on TPU v5e (d=128, s=8k, bf16): fwd block_q=1024/block_kv=512
    # gives 142-151 TF/s non-causal (72-77% MXU), 118 TF/s causal; bwd tiles
    # 1024x1024 give 151 TF/s fwd+bwd effective (3.5x formula) vs 79 at
    # 256x256 — the backward is recompute-heavy, so bigger tiles amortize.
    block_q = min(round_up(seqlen_q, NUM_LANES), 1024 if head_dim <= 128 else 512)
    block_kv = min(round_up(seqlen_k, NUM_LANES), 512)
    # Keep the scores tile under ~2MB.
    while block_q * block_kv * 4 > 2 * 1024 * 1024 and block_kv > NUM_LANES:
        block_kv //= 2
    bwd_tile = 1024 if head_dim <= 128 else 512
    bwd_q = min(round_up(seqlen_q, NUM_LANES), bwd_tile)
    bwd_kv = min(round_up(seqlen_k, NUM_LANES), bwd_tile)
    return BlockSizes(
        block_q=block_q,
        block_kv=block_kv,
        block_q_dkv=bwd_q,
        block_kv_dkv=bwd_kv,
        block_q_dq=bwd_q,
        block_kv_dq=bwd_kv,
    )


def normalize_window(
    window_size: Tuple[int, int], causal: bool, seqlen_k: int
) -> Tuple[int, int]:
    """Map the reference's (-1 = infinite) window convention onto concrete ints.

    Mirrors csrc/flash_attn/flash_api.cpp:~430 (causal => window_right = 0).
    Returns (left, right) where a negative value means unbounded.
    """
    left, right = window_size
    if causal:
        right = 0
    if left is None:
        left = -1
    if right is None:
        right = -1
    return int(left), int(right)


def is_local(window: Tuple[int, int]) -> bool:
    return window[0] >= 0 or window[1] >= 0


def default_alibi_slopes(nheads: int) -> jnp.ndarray:
    """Geometric ALiBi slopes (maps flash_attn/modules/mha.py:37)."""

    def slopes_power_of_2(n):
        start = 2.0 ** (-(2.0 ** -(math.log2(n) - 3)))
        return [start * (start**i) for i in range(n)]

    if math.log2(nheads).is_integer():
        s = slopes_power_of_2(nheads)
    else:
        closest = 2 ** math.floor(math.log2(nheads))
        s = (
            slopes_power_of_2(closest)
            + slopes_power_of_2(2 * closest)[0::2][: nheads - closest]
        )
    return jnp.asarray(s, dtype=jnp.float32)


def interpret_mode() -> bool:
    """Run Pallas kernels in interpreter mode off-TPU (tests on CPU)."""
    return jax.default_backend() != "tpu"


@functools.lru_cache(maxsize=None)
def _platform() -> str:
    return jax.default_backend()


def pad_to_block(x: jnp.ndarray, axis: int, block: int, value=0.0) -> jnp.ndarray:
    """Pad `axis` of x up to a multiple of `block` with `value`."""
    size = x.shape[axis]
    padded = round_up(size, block)
    if padded == size:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, padded - size)
    return jnp.pad(x, pads, constant_values=value)


def make_causal_window_bounds(
    *,
    seqlen_q: int,
    seqlen_k: int,
    window: Tuple[int, int],
    block_q: int,
    block_kv: int,
    num_kv_blocks: int,
):
    """Per-q-block [min_kv_block, max_kv_block] bounds for block skipping.

    Bottom-right aligned: query row i attends to keys in
    [i + seqlen_k - seqlen_q - left, i + seqlen_k - seqlen_q + right].
    Returns two python callables usable both in index_maps (traced ints) and
    in-kernel. A negative window bound means unbounded on that side.
    """
    offset = seqlen_k - seqlen_q
    left, right = window

    def max_kv_block(qi):
        # Highest kv block index any row in q block qi may touch.
        if right < 0:
            return num_kv_blocks - 1
        last_row = qi * block_q + block_q - 1
        hi = last_row + offset + right
        return jnp.clip(hi // block_kv, 0, num_kv_blocks - 1)

    def min_kv_block(qi):
        if left < 0:
            return 0
        first_row = qi * block_q
        lo = first_row + offset - left
        return jnp.clip(lo // block_kv, 0, num_kv_blocks - 1)

    return min_kv_block, max_kv_block
