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
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

# Use a large-but-finite mask value instead of -inf so exp(m - m) never sees
# inf - inf (NaN). Same trick the JAX flash kernels use.
DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)

LOG2E = math.log2(math.e)

NUM_LANES = 128
NUM_SUBLANES = 8


class AuxData(NamedTuple):
    """Runtime captures for score_mod/mask_mod (FA4 programmable attention:
    flash_attn/cute/utils.py:27 AuxData, cute/interface.py:363-427
    aux_tensors/aux_scalars). `tensors` are delivered whole into VMEM per
    grid cell — keep them small (bias tables, per-head gates, doc-id
    vectors). `scalars` are runtime fp32 scalars read from SMEM."""

    tensors: tuple = ()
    scalars: tuple = ()


# When True, aux_take/aux_at lower as plain XLA gathers instead of the
# Mosaic roll/select machinery. Set by the block-sparsity planner
# (kernels/block_sparsity.py), which evaluates user mods OUTSIDE any Pallas
# kernel — pltpu.roll has no lowering there, while XLA gathers are native.
_MOD_EVAL_XLA = False


class _xla_mod_eval:
    """Context manager: evaluate mods with XLA-native aux gathers."""

    def __enter__(self):
        global _MOD_EVAL_XLA
        self._prev = _MOD_EVAL_XLA
        _MOD_EVAL_XLA = True

    def __exit__(self, *exc):
        global _MOD_EVAL_XLA
        _MOD_EVAL_XLA = self._prev


def pad_aux_table(a: jnp.ndarray) -> jnp.ndarray:
    """Edge-pad a 1-D aux tensor to a lane multiple (host-side).

    Mosaic cannot concatenate/pad lane-unaligned 1-D vectors inside a
    kernel, so the host pads lookup tables once; edge mode keeps
    clamped-index semantics at the tail.
    """
    n = a.shape[0]
    np_ = round_up(max(n, NUM_LANES), NUM_LANES)
    if np_ == n:
        return a
    return jnp.pad(a, (0, np_ - n), mode="edge")


def aux_take(table, idx):
    """Gather `table[idx]` in a form Mosaic can lower inside a kernel.

    `table`: 1-D (n,) array with n a lane multiple (the host edge-pads 1-D
    aux tensors via `pad_aux_table`); `idx`: 2-D (rows, cols) int32 with
    cols a lane multiple; out-of-range indices clamp. Mosaic only lowers
    gathers where the index array has the operand's exact shape
    (take_along_axis with output shape == operand shape), so the table is
    swept in cols-wide aligned windows, each gathered same-shape and
    selected in. Cost: ~ceil(n / cols) VPU gathers — fine for bias tables
    and doc-id vectors; don't use for multi-MB tables. Use inside
    score_mod/mask_mod:
        aux_take(aux.tensors[0], kv_idx - q_idx + offset)
    """
    if _MOD_EVAL_XLA:
        flat = table.reshape(-1)
        return jnp.take(flat, jnp.clip(idx, 0, flat.shape[0] - 1))
    table = table.reshape(1, -1)
    n = table.shape[1]
    rows, cols = idx.shape
    idx = jnp.clip(idx, 0, n - 1)
    out_chunks = []
    # Mosaic's tpu.dynamic_gather only gathers within one 128-lane tile, and
    # BOTH its operands must be in clean (non-offset) layouts — so sweep the
    # index array and the table in 128-lane windows, materializing each via
    # pltpu.roll + offset-0 slice, then stitch column chunks back together.
    # Two Mosaic landmines mapped empirically (v5e, round 5):
    #   * the index chunk must come from a ROLL even when cc == 0 (a full-
    #     width rotation) — a bare slice of a >128-lane array feeding the
    #     gather crashes the relayout pass ("limits[i] <= dim(i)");
    #   * the (1, 128) window is materialized to (rows, 128) with an
    #     explicit sublane broadcast — `+ zeros((rows, 1))` crashes the
    #     same pass for rows > 128.
    for cc in range(0, cols, NUM_LANES):
        if cols > NUM_LANES:
            ic_src = pltpu.roll(idx, cols - cc, axis=1)
            ic = jax.lax.slice(ic_src, (0, 0), (rows, NUM_LANES))
        else:
            ic = idx
        acc = None
        for w0 in range(0, n, NUM_LANES):
            rolled = pltpu.roll(table, n - w0, axis=1) if w0 else table
            win = jnp.broadcast_to(
                jax.lax.slice(rolled, (0, 0), (1, NUM_LANES)),
                (rows, NUM_LANES),
            )
            rel = ic - w0
            in_rng = jnp.logical_and(rel >= 0, rel < NUM_LANES)
            vals = jnp.take_along_axis(
                win, jnp.clip(rel, 0, NUM_LANES - 1), axis=1
            )
            acc = vals if acc is None else jnp.where(in_rng, vals, acc)
        out_chunks.append(acc)
    if len(out_chunks) == 1:
        return out_chunks[0]
    return jnp.concatenate(out_chunks, axis=1)


def aux_at(table, i):
    """Scalar lookup `table[i]` with a traced index, inside a kernel.

    Mosaic can't dynamic-slice a loaded vector value by a traced scalar, so
    this lowers as a one-hot select + reduce on the VPU — cheap for small
    per-head/per-batch tables. Use inside score_mod/mask_mod:
        aux_at(aux.tensors[0], h)
    """
    if _MOD_EVAL_XLA:
        flat = table.reshape(-1)
        return jnp.take(flat, jnp.clip(i, 0, flat.shape[0] - 1))
    table = table.reshape(1, -1)
    lanes = jax.lax.broadcasted_iota(jnp.int32, table.shape, 1)
    return jnp.sum(jnp.where(lanes == i, table, jnp.zeros_like(table)))


def call_mod(mod, *args, aux: Optional[AuxData] = None):
    """Invoke a score_mod/mask_mod, appending AuxData when present.

    Mods that consume runtime captures take a trailing `aux` argument:
        score_mod(scores, b, h, q_idx, kv_idx, aux)
        mask_mod(b, h, q_idx, kv_idx, aux)
    Mods without captures keep the plain 4/5-arg signature."""
    if aux is not None and (aux.tensors or aux.scalars):
        return mod(*args, aux)
    return mod(*args)


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
    #
    # d<=64 is bounded at 50% of bf16 peak by the MXU itself: every pass
    # contracts over the full 128-deep systolic array, and exact per-head
    # attention at d=64 has only 64 useful contraction values in QK^T (and
    # 64 useful output lanes in PV); any two-head packing scheme must place
    # zeros in the other half, which burns the same MACs (measured sweep:
    # (2048,256) -> 70.5 TF/s = 72% of the 98.3 ceiling, matching d=128's
    # pipeline efficiency; the reference's per-hdim kernel_traits tiling has
    # no TPU analog because tensor cores contract at K=16 granularity).
    if head_dim <= 64:
        block_q = min(round_up(seqlen_q, NUM_LANES), 2048)
        block_kv = min(round_up(seqlen_k, NUM_LANES), 256)
    else:
        block_q = min(
            round_up(seqlen_q, NUM_LANES), 1024 if head_dim <= 128 else 512
        )
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
    attention_chunk: int = 0,
):
    """Per-q-block [min_kv_block, max_kv_block] bounds for block skipping.

    Bottom-right aligned: query row i attends to keys in
    [i + seqlen_k - seqlen_q - left, i + seqlen_k - seqlen_q + right].
    `attention_chunk > 0` (Llama-4-style chunked attention,
    flash_attn/utils/testing.py:195 construct_chunk_mask) further restricts
    row i to its own chunk [diag - diag % chunk, +chunk); the chunk bounds
    are intersected with the window bounds.
    Returns two python callables usable both in index_maps (traced ints) and
    in-kernel. A negative window bound means unbounded on that side.
    """
    offset = seqlen_k - seqlen_q
    left, right = window

    def max_kv_block(qi):
        # Highest kv block index any row in q block qi may touch.
        last_row = qi * block_q + block_q - 1
        if right < 0 and attention_chunk <= 0:
            return num_kv_blocks - 1
        hi = seqlen_k - 1
        if right >= 0:
            hi = last_row + offset + right
        if attention_chunk > 0:
            diag = last_row + offset
            chunk_hi = diag - diag % attention_chunk + attention_chunk - 1
            hi = jnp.minimum(hi, chunk_hi) if right >= 0 else chunk_hi
        return jnp.clip(hi // block_kv, 0, num_kv_blocks - 1)

    def min_kv_block(qi):
        first_row = qi * block_q
        if left < 0 and attention_chunk <= 0:
            return 0
        lo = 0
        if left >= 0:
            lo = first_row + offset - left
        if attention_chunk > 0:
            diag = first_row + offset
            chunk_lo = diag - diag % attention_chunk
            lo = jnp.maximum(lo, chunk_lo) if left >= 0 else chunk_lo
        return jnp.clip(lo // block_kv, 0, num_kv_blocks - 1)

    return min_kv_block, max_kv_block


def upcast_e4m3_bits(x):
    """Integer-domain e4m3 -> bf16 dequant (exact incl. subnormals; the
    one non-value bit pattern, NaN 0x7F, decodes to 480 — garbage-in
    garbage-out for a KV cache).

    Why: Mosaic's fp8->f32->bf16 convert chain collapses to ~66 Gelem/s
    inside the multipage DMA-pipeline loop (measured round 4) — far below
    the int8 convert class (~363). A normal e4m3 is
    (-1)^s * 2^(e-7) * (1 + m/8) with bits s.eeee.mmm; the f32 encoding of
    the same value is sign<<31 | (e+120)<<23 | m<<20, i.e. ONE widening
    shift + ONE bias add in int32, then a free bitcast. Subnormals
    (e == 0) are m/8 * 2^-6 = m * 2^-9, built with one int->f32 convert.
    """
    b = jax.lax.bitcast_convert_type(x, jnp.uint8).astype(jnp.int32)
    sign = (b & 0x80) << 24
    expman = b & 0x7F
    f32_bits = sign | ((expman << 20) + (120 << 23))
    sub = expman < 8  # e == 0: +-0 and subnormals
    sub_val = jax.lax.bitcast_convert_type(
        (expman.astype(jnp.float32) * (2.0 ** -9)), jnp.uint32
    ).astype(jnp.int32) | sign
    f32_bits = jnp.where(sub, sub_val, f32_bits)
    return jax.lax.bitcast_convert_type(
        f32_bits.astype(jnp.uint32), jnp.float32
    ).astype(jnp.bfloat16)


def upcast_quant_tile(x):
    """bf16 view of a quantized (int8/fp8) VMEM tile, for the PV operand or
    score matmuls that need >=16-bit inputs.

    fp8 routes through f32: Mosaic's direct fp8->bf16 convert lowering is
    ~2x slower than fp8->f32->bf16 and ~5x slower than the int8 convert
    (measured on v5e: 73 / 158 / 363 Gelem/s). NOTE XLA's own (non-Pallas)
    fp8 convert runs at full HBM speed (~1200 Gelem/s) — compute-bound
    paths should upcast whole tensors BEFORE the kernel instead
    (flash_attention_fwd does).
    """
    if x.dtype.itemsize >= 2:
        return x
    if x.dtype == jnp.int8:
        return x.astype(jnp.bfloat16)
    return x.astype(jnp.float32).astype(jnp.bfloat16)
