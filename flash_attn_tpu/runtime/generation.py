"""Text-generation runtime (reference: flash_attn/utils/generation.py —
`decode` :99, sampling :69, `decode_speculative` :269, `GenerationMixin`
:566, CUDA-graph cache :606-766).

TPU-first design:
  * The reference captures CUDA graphs per (batch, seqlen=1) to kill launch
    overhead. The XLA analog is simply a jitted decode step with donated
    cache buffers — one compiled program per shape, replayed every token.
  * The whole generation loop runs device-side under `lax.scan` (static
    max_new_tokens, EOS handled by a finished mask), so there is no
    host-device ping-pong per token.
  * KV caches are explicit pytree state threaded through the scan carry —
    the functional form of InferenceParams.key_value_memory_dict.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from flash_attn_tpu.modules.mha import InferenceParams


def sample_tokens(
    logits: jnp.ndarray,  # (b, vocab)
    key: jax.Array,
    *,
    top_k: int = 1,
    top_p: float = 0.0,
    min_p: float = 0.0,
    temperature: float = 1.0,
):
    """top-k / top-p / min-p / temperature sampling (generation.py:69 `sample`).
    top_k=1 is greedy. Returns (b,) int32."""
    if top_k == 1:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits.astype(jnp.float32)
    if temperature != 1.0:
        logits = logits / temperature
    if top_k > 0:
        kth = jax.lax.top_k(logits, top_k)[0][..., -1:]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if min_p > 0.0:
        probs = jax.nn.softmax(logits, axis=-1)
        pmax = probs.max(axis=-1, keepdims=True)
        logits = jnp.where(probs < min_p * pmax, -jnp.inf, logits)
    if top_p > 0.0 and top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # Keep the smallest set with cumulative prob >= top_p.
        cutoff_idx = jnp.sum(cum < top_p, axis=-1, keepdims=True)
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx, axis=-1)
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)
    return jax.random.categorical(key, logits).astype(jnp.int32)


@dataclasses.dataclass
class GenerationOutput:
    """Maps the reference's transformers-style output (generation.py:99)."""

    sequences: jnp.ndarray  # (b, prompt + new)
    scores: Optional[jnp.ndarray] = None  # (b, new, vocab) if requested
    lengths: Optional[jnp.ndarray] = None  # (b,) generated count incl. eos


def decode(
    input_ids: jnp.ndarray,  # (b, prompt_len)
    apply_fn: Callable,  # (tokens, caches, offsets, num_last_tokens) -> (logits, caches)
    caches: Dict[int, Tuple[jnp.ndarray, jnp.ndarray]],
    max_new_tokens: int,
    *,
    top_k: int = 1,
    top_p: float = 0.0,
    min_p: float = 0.0,
    temperature: float = 1.0,
    eos_token_id: Optional[int] = None,
    rng: Optional[jax.Array] = None,
    return_scores: bool = False,
) -> GenerationOutput:
    """Greedy/sampled autoregressive decode, fully device-side.

    apply_fn is the functional model step (see make_apply_fn / GenerationMixin).
    """
    b, prompt_len = input_ids.shape
    if rng is None:
        rng = jax.random.PRNGKey(0)

    # Prefill.
    offsets = jnp.zeros((b,), jnp.int32)
    logits, caches = apply_fn(input_ids, caches, offsets, 1)
    rng, k0 = jax.random.split(rng)
    first = sample_tokens(
        logits[:, -1], k0, top_k=top_k, top_p=top_p, min_p=min_p,
        temperature=temperature,
    )

    def step(carry, _):
        token, caches, offset, finished, rng = carry
        rng, krng = jax.random.split(rng)
        logits, caches = apply_fn(token[:, None], caches, offset, 1)
        nxt = sample_tokens(
            logits[:, -1], krng, top_k=top_k, top_p=top_p, min_p=min_p,
            temperature=temperature,
        )
        if eos_token_id is not None:
            nxt = jnp.where(finished, eos_token_id, nxt)
            finished = jnp.logical_or(finished, nxt == eos_token_id)
        out_score = logits[:, -1] if return_scores else jnp.zeros((b, 0))
        return (nxt, caches, offset + 1, finished, rng), (token, out_score)

    finished = (
        (first == eos_token_id) if eos_token_id is not None
        else jnp.zeros((b,), bool)
    )
    (last, caches, _, finished, _), (tokens, scores) = jax.lax.scan(
        step,
        (first, caches, offsets + prompt_len, finished, rng),
        None,
        length=max_new_tokens - 1,
    )
    tokens = jnp.concatenate(
        [tokens.transpose(1, 0), last[:, None]], axis=1
    )  # (b, new)
    sequences = jnp.concatenate([input_ids, tokens], axis=1)
    return GenerationOutput(
        sequences=sequences,
        scores=scores.transpose(1, 0, 2) if return_scores else None,
    )


def make_apply_fn(model, params, max_seqlen: int, max_batch: int):
    """Wrap a flax model into the functional (tokens, caches, offsets,
    num_last_tokens) -> (logits, caches) step used by decode()."""

    def apply_fn(tokens, caches, offsets, num_last_tokens):
        ip = InferenceParams(
            max_seqlen=max_seqlen,
            max_batch_size=max_batch,
            seqlen_offset=offsets,
            key_value_memory_dict=dict(caches),
        )
        logits = model.apply(
            params, tokens, inference_params=ip,
            num_last_tokens=num_last_tokens,
        )
        return logits.astype(jnp.float32), ip.key_value_memory_dict

    return apply_fn


class GenerationMixin:
    """Reference GenerationMixin.generate (generation.py:566) adapted to the
    functional runtime. Model classes can subclass or users call generate()
    directly with a flax module + params."""

    def generate(
        self,
        params,
        input_ids,
        max_length: int,
        *,
        top_k: int = 1,
        top_p: float = 0.0,
        min_p: float = 0.0,
        temperature: float = 1.0,
        eos_token_id: Optional[int] = None,
        rng: Optional[jax.Array] = None,
        return_dict_in_generate: bool = False,
        output_scores: bool = False,
        cg: bool = True,  # parity arg: jit replaces CUDA-graph capture
    ):
        del cg
        b, prompt = input_ids.shape
        caches = self.allocate_inference_cache(b, max_length).key_value_memory_dict
        apply_fn = make_apply_fn(self, params, max_length, b)
        out = decode(
            input_ids, apply_fn, caches, max_length - prompt,
            top_k=top_k, top_p=top_p, min_p=min_p, temperature=temperature,
            eos_token_id=eos_token_id, rng=rng, return_scores=output_scores,
        )
        return out if return_dict_in_generate else out.sequences


# ---------------------------------------------------------------------------
# Speculative decoding (generation.py:209 sample_speculative, :269
# decode_speculative).
# ---------------------------------------------------------------------------

def sample_speculative(
    target_probs: jnp.ndarray,  # (b, g+1, vocab)
    draft_probs: jnp.ndarray,   # (b, g, vocab)
    draft_tokens: jnp.ndarray,  # (b, g)
    key: jax.Array,
):
    """Rejection-sampling acceptance (maps generation.py:209). Returns
    (tokens (b, g+1), num_accepted (b,)): tokens[i, :num_accepted] are
    accepted draft tokens; tokens[i, num_accepted] is the bonus/corrected
    sample. Entries beyond that are arbitrary and must be masked by caller."""
    b, g = draft_tokens.shape
    k_acc, k_res = jax.random.split(key)
    u = jax.random.uniform(k_acc, (b, g))
    p_t = jnp.take_along_axis(
        target_probs[:, :g], draft_tokens[..., None], axis=-1
    )[..., 0]
    p_d = jnp.take_along_axis(draft_probs, draft_tokens[..., None], axis=-1)[..., 0]
    accept = u < jnp.minimum(1.0, p_t / jnp.maximum(p_d, 1e-9))
    # Accepted prefix length: first rejection truncates.
    acc_prefix = jnp.cumprod(accept.astype(jnp.int32), axis=-1)
    num_accepted = acc_prefix.sum(-1)  # (b,)
    # Residual distribution at the first rejected position.
    idx = jnp.minimum(num_accepted, g - 1)
    pt_rej = jnp.take_along_axis(
        target_probs, idx[:, None, None].repeat(target_probs.shape[-1], -1), axis=1
    )[:, 0]
    pd_rej = jnp.take_along_axis(
        draft_probs, idx[:, None, None].repeat(draft_probs.shape[-1], -1), axis=1
    )[:, 0]
    residual = jnp.maximum(pt_rej - pd_rej, 0.0)
    residual_sum = residual.sum(-1, keepdims=True)
    residual = jnp.where(residual_sum > 0, residual / jnp.maximum(residual_sum, 1e-9),
                         target_probs[:, 0] * 0 + 1.0 / target_probs.shape[-1])
    corrected = jax.random.categorical(k_res, jnp.log(jnp.maximum(residual, 1e-20)))
    # Bonus token if everything accepted: sample from target_probs[:, g].
    bonus = jax.random.categorical(k_res, jnp.log(
        jnp.maximum(target_probs[:, g], 1e-20)
    ))
    all_accepted = num_accepted == g
    final = jnp.where(all_accepted, bonus, corrected).astype(jnp.int32)
    tokens = jnp.concatenate([draft_tokens, jnp.zeros((b, 1), jnp.int32)], axis=1)
    tokens = jnp.where(
        jnp.arange(g + 1)[None, :] == num_accepted[:, None],
        final[:, None], tokens,
    )
    return tokens, num_accepted


def decode_speculative(
    input_ids: jnp.ndarray,  # (1, prompt) — like the reference, batch 1
    target_apply: Callable,  # make_apply_fn-style step for the target model
    target_caches: Dict,
    draft_apply: Callable,
    draft_caches: Dict,
    max_new_tokens: int,
    *,
    gamma: int = 4,          # reference speculative_lookahead
    top_k: int = 1,
    temperature: float = 1.0,
    eos_token_id: Optional[int] = None,
    rng: Optional[jax.Array] = None,
) -> GenerationOutput:
    """Speculative decoding (reference decode_speculative, generation.py:269
    — which also asserts batch_size == 1): the draft proposes `gamma` tokens
    autoregressively, the target verifies them in ONE chunked forward, and
    rejection sampling (sample_speculative) keeps a prefix + one corrected/
    bonus token. Greedy mode (top_k=1) accepts exact argmax matches, so the
    output equals the target's own greedy decode.

    Cache trick: all gamma+1 proposed tokens are appended to both caches
    every round; rejected suffix KV becomes stale but invisible (offsets
    track the committed length, and later appends overwrite the slots before
    they re-enter the visible range) — no cache rollback needed.

    TPU-first: the whole accept-verify loop runs device-side as a
    `lax.while_loop` (variable tokens-per-round is just a traced counter),
    so there is exactly ONE host sync per generation instead of one per
    verify round — the XLA analog of the reference capturing the round in a
    CUDA graph. Caches must have >= gamma+1 slack beyond
    prompt + max_new_tokens (the last round may overshoot before
    truncation).
    """
    assert input_ids.shape[0] == 1
    if rng is None:
        rng = jax.random.PRNGKey(0)
    _, prompt_len = input_ids.shape
    greedy = top_k == 1
    g = gamma
    temp = 1.0 if greedy else temperature

    # Prefill both models on prompt[:-1]; feed the last prompt token through
    # the first verify round.
    z = jnp.zeros((1,), jnp.int32)
    if prompt_len > 1:
        _, target_caches = target_apply(input_ids[:, :-1], target_caches, z, 1)
        _, draft_caches = draft_apply(input_ids[:, :-1], draft_caches, z, 1)

    buf_len = max_new_tokens + g + 1  # slack: final round may overshoot
    idx = jnp.arange(g + 1)

    def cond_fn(st):
        count, _, _, finished, *_ = st
        return jnp.logical_and(count < max_new_tokens,
                               jnp.logical_not(finished))

    def body_fn(st):
        count, last, offset, finished, rng, tc, dc, buf = st
        off_vec = offset[None]

        # --- draft proposes gamma tokens autoregressively (lax.scan) ---
        def dstep(carry, i):
            cur, dc, rng = carry
            logits, dc = draft_apply(cur, dc, off_vec + i, 1)
            probs = jax.nn.softmax(logits[:, -1] / temp, -1)
            rng, k = jax.random.split(rng)
            tok = (
                jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
                if greedy else
                sample_tokens(logits[:, -1], k, top_k=top_k,
                              temperature=temperature)
            )
            return (tok[:, None], dc, rng), (tok[0], probs[0])

        (_, dc, rng), (draft_tokens, draft_probs) = jax.lax.scan(
            dstep, (last, dc, rng), jnp.arange(g)
        )
        draft_tokens = draft_tokens[None]  # (1, g)
        draft_probs = draft_probs[None]    # (1, g, vocab)

        # --- target verifies the chunk [last, d_1..d_g] in one forward ---
        chunk = jnp.concatenate([last, draft_tokens], axis=1)  # (1, g+1)
        t_logits, tc = target_apply(chunk, tc, off_vec, g + 1)

        if greedy:
            t_argmax = jnp.argmax(t_logits, -1).astype(jnp.int32)  # (1, g+1)
            agree = (draft_tokens == t_argmax[:, :g]).astype(jnp.int32)
            n_acc = jnp.cumprod(agree, -1).sum()
            base = jnp.concatenate(
                [draft_tokens[0], jnp.zeros((1,), jnp.int32)]
            )
            tokens_row = jnp.where(idx == n_acc, t_argmax[0, n_acc], base)
        else:
            target_probs = jax.nn.softmax(t_logits / temp, -1)
            rng, k = jax.random.split(rng)
            tokens, n_acc_arr = sample_speculative(
                target_probs, draft_probs, draft_tokens, k
            )
            tokens_row, n_acc = tokens[0], n_acc_arr[0]

        n = n_acc + 1  # committed this round
        if eos_token_id is not None:
            is_eos = jnp.logical_and(tokens_row == eos_token_id, idx < n)
            eos_pos = jnp.min(jnp.where(is_eos, idx, g + 1))
            finished = jnp.logical_or(finished, eos_pos <= n_acc)
            n = jnp.minimum(n, eos_pos + 1)
        valid = idx < n

        # Scatter this round's tokens into the output buffer (OOB dropped).
        buf = buf.at[jnp.where(valid, count + idx, buf_len)].set(
            tokens_row, mode="drop"
        )
        last = jnp.take(tokens_row, n - 1)[None, None]
        return (count + n, last, offset + n, finished, rng, tc, dc, buf)

    st0 = (
        jnp.zeros((), jnp.int32),
        input_ids[:, -1:],
        jnp.asarray(prompt_len - 1, jnp.int32),
        jnp.zeros((), bool),
        rng,
        target_caches,
        draft_caches,
        jnp.zeros((buf_len,), jnp.int32),
    )
    count, _, _, _, _, _, _, buf = jax.lax.while_loop(cond_fn, body_fn, st0)

    n_final = int(jnp.minimum(count, max_new_tokens))  # the one host sync
    seqs = jnp.concatenate([input_ids, buf[None, :n_final]], axis=1)
    return GenerationOutput(sequences=seqs, lengths=count[None])
