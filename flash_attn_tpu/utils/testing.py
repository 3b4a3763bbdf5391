"""Reference (oracle) attention in pure JAX, mirroring the semantics of the
reference test oracle `attention_ref` (flash_attn/utils/testing.py:228).

Used by the test suites to bound kernel error relative to the oracle's own
low-precision rounding error — the reference's relative-tolerance contract
(tests/test_flash_attn.py: `(out - out_ref).abs().max() <= 2 * (out_pt -
out_ref).abs().max()`).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def construct_local_mask(
    seqlen_q: int,
    seqlen_k: int,
    window_size: Tuple[Optional[int], Optional[int]] = (None, None),
    sink_token_length: int = 0,
    query_padding_mask: Optional[jnp.ndarray] = None,
    key_padding_mask: Optional[jnp.ndarray] = None,
    key_leftpad: Optional[jnp.ndarray] = None,
):
    """Boolean mask of entries to DROP (True = masked out).

    Mirrors flash_attn/utils/testing.py:268 `construct_local_mask`:
    bottom-right aligned window relative to per-sequence effective lengths.
    """
    row_idx = jnp.arange(seqlen_q, dtype=jnp.int32)[:, None]  # (sq, 1)
    col_idx = jnp.arange(seqlen_k, dtype=jnp.int32)  # (sk,)
    if key_leftpad is not None:
        key_leftpad = key_leftpad.reshape(-1, 1, 1, 1)
        col_idx = jnp.broadcast_to(
            col_idx, (key_leftpad.shape[0], 1, 1, seqlen_k)
        )
        col_idx = jnp.where(col_idx >= key_leftpad, col_idx - key_leftpad, 2**30)
    sk = (
        seqlen_k
        if key_padding_mask is None
        else key_padding_mask.sum(-1).reshape(-1, 1, 1, 1)
    )
    sq = (
        seqlen_q
        if query_padding_mask is None
        else query_padding_mask.sum(-1).reshape(-1, 1, 1, 1)
    )
    if window_size[0] is None or window_size[0] < 0:
        return col_idx > row_idx + sk - sq + window_size[1]
    else:
        sk_full = (
            jnp.full_like(col_idx, seqlen_k) if key_padding_mask is None else sk
        )
        return jnp.logical_or(
            col_idx > jnp.minimum(row_idx + sk - sq + window_size[1], sk_full),
            jnp.logical_and(
                col_idx < row_idx + sk - sq - window_size[0],
                col_idx >= sink_token_length,
            ),
        )


def construct_chunk_mask(
    seqlen_q: int,
    seqlen_k: int,
    attention_chunk: int,
    query_padding_mask: Optional[jnp.ndarray] = None,
    key_padding_mask: Optional[jnp.ndarray] = None,
    key_leftpad: Optional[jnp.ndarray] = None,
):
    """Boolean mask of entries to DROP for chunked (Llama-4-style) attention.

    Mirrors flash_attn/utils/testing.py:195 `construct_chunk_mask`: query row
    i (bottom-right aligned via sk - sq) may only attend keys inside its own
    `attention_chunk`-sized chunk: [diag - diag % chunk, +chunk).
    """
    row_idx = jnp.arange(seqlen_q, dtype=jnp.int32)[:, None]  # (sq, 1)
    col_idx = jnp.arange(seqlen_k, dtype=jnp.int32)  # (sk,)
    if key_leftpad is not None:
        key_leftpad = key_leftpad.reshape(-1, 1, 1, 1)
        col_idx = jnp.broadcast_to(
            col_idx, (key_leftpad.shape[0], 1, 1, seqlen_k)
        )
        col_idx = jnp.where(col_idx >= key_leftpad, col_idx - key_leftpad, 2**30)
    sk = (
        seqlen_k
        if key_padding_mask is None
        else key_padding_mask.sum(-1).reshape(-1, 1, 1, 1)
    )
    sq = (
        seqlen_q
        if query_padding_mask is None
        else query_padding_mask.sum(-1).reshape(-1, 1, 1, 1)
    )
    # Subtract the remainder rather than div-then-mul so negative diagonals
    # round toward -inf the same way the reference does.
    diag = row_idx + sk - sq
    col_limit_left = diag - diag % attention_chunk
    return jnp.logical_or(
        col_idx < col_limit_left, col_idx >= col_limit_left + attention_chunk
    )


def attention_ref(
    q: jnp.ndarray,  # (b, sq, h, d)
    k: jnp.ndarray,  # (b, sk, h_k, d)
    v: jnp.ndarray,  # (b, sk, h_k, dv)
    query_padding_mask: Optional[jnp.ndarray] = None,  # (b, sq) bool
    key_padding_mask: Optional[jnp.ndarray] = None,  # (b, sk) bool
    key_leftpad: Optional[jnp.ndarray] = None,
    attn_bias: Optional[jnp.ndarray] = None,  # broadcastable (b, h, sq, sk)
    dropout_p: float = 0.0,
    dropout_mask: Optional[jnp.ndarray] = None,  # (b, h, sq, sk) bool keep-mask
    causal: bool = False,
    q_descale: Optional[jnp.ndarray] = None,
    k_descale: Optional[jnp.ndarray] = None,
    v_descale: Optional[jnp.ndarray] = None,
    window_size: Tuple[Optional[int], Optional[int]] = (None, None),
    attention_chunk: int = 0,
    sink_token_length: int = 0,
    learnable_sink: Optional[jnp.ndarray] = None,  # (h,)
    softcap: float = 0.0,
    softmax_scale: Optional[float] = None,
    upcast: bool = True,
    reorder_ops: bool = False,
):
    """Exact attention oracle; returns (output, attention_probs).

    output: (b, sq, h, dv); attention: (b, h, sq, sk) post-dropout probs.
    """
    if causal:
        window_size = (window_size[0], 0)
    dtype_og = q.dtype
    if upcast:
        q, k, v = (
            q.astype(jnp.float32),
            k.astype(jnp.float32),
            v.astype(jnp.float32),
        )
    b, seqlen_q, h, d = q.shape
    _, seqlen_k, h_k, dv = v.shape
    g = h // h_k
    if q_descale is not None:
        qd = jnp.repeat(q_descale, g, axis=-1).reshape(b, 1, h, 1)
        q = (q.astype(jnp.float32) * qd).astype(q.dtype)
    if k_descale is not None:
        k = (k.astype(jnp.float32) * k_descale.reshape(b, 1, h_k, 1)).astype(k.dtype)
    if v_descale is not None:
        v = (v.astype(jnp.float32) * v_descale.reshape(b, 1, h_k, 1)).astype(v.dtype)
    k = jnp.repeat(k, g, axis=2)
    v = jnp.repeat(v, g, axis=2)
    if softmax_scale is None:
        softmax_scale = 1.0 / math.sqrt(d)
    if not reorder_ops:
        scores = jnp.einsum("bthd,bshd->bhts", q * softmax_scale, k)
    else:
        scores = jnp.einsum("bthd,bshd->bhts", q, k * softmax_scale)
    if softcap > 0:
        scores = jnp.tanh(scores / softcap) * softcap
    if key_padding_mask is not None:
        scores = jnp.where(
            key_padding_mask.reshape(b, 1, 1, seqlen_k), scores, -jnp.inf
        )
    local_mask = None
    if (window_size[0] is not None and window_size[0] >= 0) or (
        window_size[1] is not None and window_size[1] >= 0
    ):
        wl = window_size[0] if (window_size[0] is not None and window_size[0] >= 0) else None
        wr = window_size[1] if (window_size[1] is not None and window_size[1] >= 0) else None
        if wr is None:
            wr = seqlen_k
        local_mask = construct_local_mask(
            seqlen_q,
            seqlen_k,
            (wl, wr),
            sink_token_length,
            query_padding_mask,
            key_padding_mask,
            key_leftpad=key_leftpad,
        )
        scores = jnp.where(local_mask, -jnp.inf, scores)
    if attention_chunk > 0:
        chunk_mask = construct_chunk_mask(
            seqlen_q,
            seqlen_k,
            attention_chunk,
            query_padding_mask,
            key_padding_mask,
            key_leftpad=key_leftpad,
        )
        scores = jnp.where(chunk_mask, -jnp.inf, scores)
    if attn_bias is not None:
        scores = scores + attn_bias
    if learnable_sink is None:
        # Rows that are entirely -inf produce NaN through softmax; zero them.
        row_max = jnp.max(scores, axis=-1, keepdims=True)
        all_masked = ~jnp.isfinite(row_max)
        safe = jnp.where(all_masked, 0.0, scores)
        safe = jnp.where(jnp.isfinite(scores), safe, -jnp.inf)
        unnorm = jnp.exp(
            jnp.where(all_masked, -jnp.inf, safe - jnp.where(all_masked, 0.0, row_max))
        )
        denom = jnp.sum(unnorm, axis=-1, keepdims=True)
        attention = jnp.where(denom == 0.0, 0.0, unnorm / jnp.maximum(denom, 1e-37))
    else:
        logits_max = jnp.max(scores, axis=-1, keepdims=True)
        sinkv = learnable_sink.reshape(1, h, 1, 1).astype(jnp.float32)
        both_max = jnp.maximum(sinkv, logits_max)
        unnorm = jnp.exp(scores - both_max)
        unnorm = jnp.where(jnp.isnan(unnorm), 0.0, unnorm)
        normalizer = jnp.sum(unnorm, axis=-1, keepdims=True) + jnp.exp(
            sinkv - both_max
        )
        attention = unnorm / normalizer
    if query_padding_mask is not None:
        attention = jnp.where(
            query_padding_mask.reshape(b, 1, seqlen_q, 1), attention, 0.0
        )
    dropout_scaling = 1.0 / (1 - dropout_p)
    if dropout_mask is not None:
        attention_drop = jnp.where(dropout_mask, attention, 0.0)
    else:
        attention_drop = attention
    output = jnp.einsum("bhts,bshd->bthd", attention_drop, v) * dropout_scaling
    if query_padding_mask is not None:
        output = jnp.where(
            query_padding_mask.reshape(b, seqlen_q, 1, 1), output, 0.0
        )
    return output.astype(dtype_og), attention.astype(dtype_og)


def generate_random_padding_mask(max_seqlen, batch_size, key, mode="random", zero_lengths=False):
    """JAX port of the reference's random padding-mask generator
    (flash_attn/utils/testing.py:11)."""
    if mode == "full":
        lengths = jnp.full((batch_size, 1), max_seqlen, dtype=jnp.int32)
    elif mode == "random":
        lengths = jax.random.randint(
            key,
            (batch_size, 1),
            max(0 if zero_lengths else 1, max_seqlen - 20),
            max_seqlen + 1,
        )
    elif mode == "third":
        lengths = jax.random.randint(
            key, (batch_size, 1), max_seqlen // 3, max_seqlen + 1
        )
    else:
        raise ValueError(mode)
    if zero_lengths:
        idx = jnp.arange(batch_size)
        lengths = jnp.where(((idx % 5 == 0) | (idx == batch_size - 1))[:, None], 0, lengths)
    return jnp.arange(max_seqlen)[None, :] < lengths
