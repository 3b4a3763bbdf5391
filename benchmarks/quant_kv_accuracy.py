"""Quantized-KV-cache ACCURACY contract (VERDICT r4 #7).

The reference tests fp8-KV dequant numerically against vLLM's quant ops
(tests/cute/test_flash_attn_fp8_kv_cache.py:57-100); this measures what the
2x KV capacity actually costs END-TO-END: teacher-forced per-token logprob
drift and perplexity delta of int8 / fp8(e4m3) page pools vs bf16, through
the SAME serving path the engine uses (quantize-on-write in
modules/mha.py._decode_step, in-kernel dequant in the multipage decode
pipeline).

Method: a fixed-seed random-init GPT (rotary, RMSNorm — weights are
untrained, so absolute perplexity is meaningless; the DELTAS between cache
dtypes on identical forced sequences are the measurement), prompt prefill
through the engine's prefill jit, then a teacher-forced decode scan
collecting next-token logprobs at every position. int8 scales are
calibrated from the bf16 pools' actual per-layer amax (the vLLM static
calibration recipe, amax/127); fp8 uses scale 1.0 (e4m3's dynamic range
covers activations directly).

    python benchmarks/quant_kv_accuracy.py [--quick] [--json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from flash_attn_tpu.models.gpt import GPTConfig, GPTLMHeadModel
from flash_attn_tpu.runtime.engine import EngineConfig, LLMEngine


def build(nlayer, nembd, nhead, vocab):
    cfg = GPTConfig(
        vocab_size=vocab, n_positions=0, n_embd=nembd, n_layer=nlayer,
        n_head=nhead, rotary_emb_fraction=1.0, rms_norm=True,
        activation_function="swiglu", qkv_proj_bias=False,
        out_proj_bias=False, mlp_fc1_bias=False, mlp_fc2_bias=False,
        tie_word_embeddings=True, dtype=jnp.bfloat16,
    )
    model = GPTLMHeadModel(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))
    return model, params


def forced_logprobs(eng, tokens, prompt_len):
    """Teacher-forced next-token logprobs through the engine's jits.

    tokens: (mb, T) int32. Prefill appends tokens[:, :prompt_len-1] (the
    engine's position contract), then a decode scan feeds
    tokens[:, prompt_len-1 : T-1] one position at a time, collecting the
    logprob the model assigns to each ACTUAL next token."""
    cfg = eng.config
    mb, T = tokens.shape
    pages_per_seq = cfg.max_pages_per_seq
    tables = np.arange(mb * pages_per_seq, dtype=np.int32).reshape(
        mb, pages_per_seq
    )
    tables_j = jnp.asarray(tables)
    caches = eng.caches
    # Chunked prefill of tokens[:, :prompt_len-1], padded with zeros
    # (append-only; padding lands beyond tracked length, invisible).
    P = prompt_len - 1
    chunk = cfg.prefill_chunk
    for c0 in range(0, P, chunk):
        buf = np.zeros((mb, chunk), np.int32)
        ln = min(chunk, P - c0)
        buf[:, :ln] = np.asarray(tokens[:, c0 : c0 + ln])
        caches = eng._prefill_fn(
            eng.params, caches, jnp.asarray(buf),
            jnp.full((mb,), c0, jnp.int32), tables_j,
        )

    feed = jnp.asarray(tokens[:, P : T - 1])  # (mb, T-P-1) fed tokens
    targets = jnp.asarray(tokens[:, P + 1 : T])  # what the model must score

    @jax.jit
    def scan_decode(params, caches, feed, tables):
        def body(carry, tok_t):
            caches, offs = carry
            logits, caches = eng._apply(
                caches, tok_t[:, None], offs, tables, params=params
            )
            lp = jax.nn.log_softmax(logits[:, -1].astype(jnp.float32))
            return (caches, offs + 1), lp

        (caches, _), lps = jax.lax.scan(
            body, (caches, jnp.full((feed.shape[0],), P, jnp.int32)),
            feed.T,
        )
        return lps  # (steps, mb, vocab)

    lps = scan_decode(eng.params, caches, feed, tables_j)
    # Gather logprob of each actual next token: (steps, mb)
    got = jnp.take_along_axis(
        lps, targets.T[:, :, None], axis=2
    )[:, :, 0]
    # The engine jits donate cache pools; return the LIVE ones (callers
    # may calibrate from them — eng.caches itself is now deleted).
    return np.asarray(got, np.float64), caches  # (steps, mb)


def calibrate_int8(caches):
    """Per-layer dequant scales from the bf16 pools' amax (the pools hold
    real K|V activations after prefill) — vLLM static calibration."""
    scales = {}
    for i, pool in caches.items():
        amax = float(jnp.abs(jnp.asarray(pool, jnp.float32)).max())
        scales[i] = max(amax, 1e-6) / 127.0
    return scales


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    if args.quick:
        nlayer, nembd, nhead, vocab = 4, 512, 8, 2048
        mb, prompt, cont = 2, 192, 64
    else:
        nlayer, nembd, nhead, vocab = 12, 768, 12, 8192
        mb, prompt, cont = 4, 512, 192
    model, params = build(nlayer, nembd, nhead, vocab)
    T = prompt + cont
    tokens = np.asarray(
        jax.random.randint(jax.random.PRNGKey(7), (mb, T), 1, vocab),
        np.int32,
    )

    page = 128
    pages_per_seq = -(-T // page) + 1
    mk = lambda **kw: EngineConfig(
        max_batch_size=mb, page_size=page,
        num_pages=mb * pages_per_seq + 4, max_pages_per_seq=pages_per_seq,
        prefill_chunk=128, max_seqlen=-(-T // page) * page + page,
        top_k=1, **kw,
    )

    eng_bf16 = LLMEngine(model, params, mk())
    lp_ref, caches_bf16 = forced_logprobs(eng_bf16, tokens, prompt)
    # Calibrate int8 from the bf16 pools (they now hold real K|V).
    int8_scales = calibrate_int8(caches_bf16)

    rows = []
    ppl_ref = float(np.exp(-lp_ref.mean()))
    for name, kw in [
        ("int8", dict(kv_cache_dtype="int8", kv_cache_scale=int8_scales)),
        ("fp8_e4m3", dict(kv_cache_dtype="fp8", kv_cache_scale=1.0)),
    ]:
        eng_q = LLMEngine(model, params, mk(**kw))
        lp_q, _ = forced_logprobs(eng_q, tokens, prompt)
        drift = np.abs(lp_q - lp_ref)
        ppl_q = float(np.exp(-lp_q.mean()))
        rows.append(dict(
            bench="quant_kv_accuracy",
            kv_cache_dtype=name,
            mean_abs_logprob_drift=round(float(drift.mean()), 5),
            p99_abs_logprob_drift=round(
                float(np.percentile(drift, 99)), 5),
            max_abs_logprob_drift=round(float(drift.max()), 5),
            ppl_bf16=round(ppl_ref, 4),
            ppl_quant=round(ppl_q, 4),
            ppl_rel_delta=round((ppl_q - ppl_ref) / ppl_ref, 6),
            model=f"{nlayer}L-{nembd}d random-init",
            tokens_scored=int(lp_ref.size),
        ))
        print(json.dumps(rows[-1]), flush=True)
    if args.json:
        print(json.dumps(rows))


if __name__ == "__main__":
    main()
