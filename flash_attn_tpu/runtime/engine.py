"""Serving engine: continuous batching over paged KV caches.

This layer does not exist in the reference (vLLM provides it on top of L4,
vllm_flash_attn/flash_attn_interface.py:84-86); the TPU framework must ship
its own (SURVEY.md §7 stage 9 / BASELINE north star). Architecture:

  host                                device (jitted, static shapes)
  ----                                -------------------------------
  C++ scheduler (csrc/scheduler.cpp)  prefill_step: (1, chunk) tokens ->
    admission, page allocation,         paged-append into the cache pools
    chunked prefill ordering,         decode_step: (max_batch, 1) tokens ->
    decode batch assembly               paged attention over block tables,
  engine loop (this file): moves        sample next token
    int32 metadata host<->device,
    streams finished tokens

Two compiled programs total (the CUDA-graph-cache analog,
flash_attn/utils/generation.py:618 — XLA jit replaces capture/replay).

Position accounting: the scheduler is fed `len(prompt) - 1` as the prompt
length — prefill appends prompt[:-1] to the cache, and decode always feeds
the newest known token (prompt[-1] first, then each sample), so the cache
length always equals the scheduler's position counter. Chunked prefill
writes full fixed-size chunks; garbage tail positions stay invisible because
attention masks by true cache lengths, and each later token overwrites its
slot before becoming visible.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from flash_attn_tpu.modules.mha import InferenceParams
from flash_attn_tpu.runtime.kv_cache import (
    allocate_fused_paged_kv_cache,
    allocate_paged_kv_cache,
)
from flash_attn_tpu.runtime.scheduler import make_scheduler
from flash_attn_tpu.runtime.generation import sample_tokens


@dataclasses.dataclass
class EngineConfig:
    max_batch_size: int = 8
    page_size: int = 128
    num_pages: int = 512
    max_pages_per_seq: int = 32
    prefill_chunk: int = 256
    max_seqlen: int = 4096
    top_k: int = 1
    top_p: float = 0.0
    temperature: float = 1.0
    eos_token_id: Optional[int] = None
    prefer_native_scheduler: bool = True
    # Reuse KV pages across requests sharing a page-aligned prompt prefix
    # (vLLM automatic-prefix-caching; see runtime/prefix_cache.py).
    enable_prefix_caching: bool = False
    prefix_cache_pages: Optional[int] = None  # budget; None -> num_pages//4
    # Multi-step decode: run this many decode steps inside ONE jitted
    # dispatch (lax.scan feeding samples forward) — amortizes the
    # host<->device round trip that dominates small-batch decode (the
    # vLLM multi-step-scheduling analog). EOS/max_new truncation is
    # handled host-side; overshoot writes land on the trash page.
    decode_depth: int = 1
    # Sliding-window KV page eviction: pages wholly beneath the model's
    # attention window return to the pool (the block table keeps -1
    # placeholders -> trash page; window masking never reads them). Must
    # be >= the model's visible span (window_left + 1). 0 disables.
    kv_window_tokens: int = 0
    # Speculative decoding inside continuous batching: a draft model
    # proposes this many tokens per round and the target verifies them in
    # ONE forward (greedy acceptance). Requires draft_model/draft_params
    # at engine construction and greedy sampling (top_k=1). 0 disables.
    speculative_k: int = 0
    # Fused K|V page pools: K and V of a page are memory-adjacent so the
    # decode kernel gathers each page in ONE double-size DMA (biggest win
    # on permuted small-page tables). None = auto (on when the model's
    # attention features allow it and head dims are 128-aligned).
    fused_kv_pages: Optional[bool] = None
    # Quantized KV-cache serving (reference fp8_kv_dequant,
    # flash_attn/cute/interface.py:482-497): page pools hold 1-byte
    # elements — int8 or fp8 (e4m3) — halving the KV working set. New K/V
    # quantize on write with per-head descales; decode dequantizes
    # in-kernel on the multipage DMA pipeline. None = model dtype (no
    # quantization). Values: "int8" | "fp8" | "fp8_e4m3".
    # RECOMMENDED: "int8" with per-layer amax/127 kv_cache_scale — it is
    # both more accurate (mean logprob drift 0.025 vs fp8's 0.057
    # nats/token) and faster (96% vs 93% of bf16 tokens/s); use "fp8" when
    # calibration is impractical (scale 1.0 works uncalibrated). Measured
    # contract: benchmarks/QUANT_KV_ACCURACY.md.
    kv_cache_dtype: Optional[str] = None
    # Per-head DEQUANT scale for the quantized pools (x = x_q * scale).
    # vLLM-style static calibration: a scalar applied to every kv head, or
    # a per-layer {layer_idx: scalar} dict. fp8 e4m3's wide dynamic range
    # makes 1.0 a safe default; int8 should be calibrated to ~amax/127.
    kv_cache_scale: float | dict = 1.0
    # Multi-process SPMD serving hook: every device upload (tokens,
    # offsets, block tables, rng keys, and the KV pools at allocation)
    # passes through this callable. Under jax.distributed with a global
    # mesh, set it to a host_local_array_to_global_array wrapper so ONE
    # logical engine runs across processes (every process executes the
    # same deterministic host loop; tests/multihost_worker.py). None =
    # plain jnp.asarray (single-process).
    device_put_fn: Optional[object] = None


@dataclasses.dataclass
class RequestOutput:
    request_id: int
    prompt: List[int]
    tokens: List[int] = dataclasses.field(default_factory=list)
    finished: bool = False


class LLMEngine:
    """Continuous-batching engine for GPTLMHeadModel-compatible flax models."""

    def __init__(self, model, params, config: EngineConfig,
                 rng: Optional[jax.Array] = None,
                 draft_model=None, draft_params=None):
        self.model = model
        self.params = params
        self.config = config
        c = model.config
        # One extra "trash" page absorbs writes from padded chunk tails and
        # padded decode slots (block-table entries of -1 are redirected to it).
        self._trash_page = config.num_pages

        def _quant_dtype():
            name = config.kv_cache_dtype
            if name is None:
                return None
            table = {
                "int8": jnp.int8,
                "fp8": jnp.float8_e4m3fn,
                "fp8_e4m3": jnp.float8_e4m3fn,
            }
            if name not in table:
                raise ValueError(f"kv_cache_dtype {name!r} not in {list(table)}")
            return table[name]

        def _scale_for(layer_idx: int, hk: int):
            s = config.kv_cache_scale
            if isinstance(s, dict):
                s = s[layer_idx]
            return jnp.full((hk,), float(s), jnp.float32)

        def alloc_caches(mc):
            from flash_attn_tpu.runtime.kv_cache import QuantPagedKV

            hk = mc.n_head_kv if mc.n_head_kv is not None else mc.n_head
            d = (mc.head_dim if mc.head_dim is not None
                 else mc.n_embd // mc.n_head)
            qdtype = _quant_dtype()
            dv = getattr(mc, "v_head_dim", None)
            if qdtype is not None:
                # Eligibility is checked HERE, loudly — quantized pools are
                # only readable by the multipage decode kernel, and a
                # feature it excludes would otherwise surface as a bare
                # AssertionError deep in dispatch (ADVICE r4).
                if getattr(mc, "attn_type", "mha") == "mla":
                    raise ValueError(
                        "kv_cache_dtype is not supported with MLA latent "
                        "caches (absorbed qv needs >=16-bit V)"
                    )
                if getattr(mc, "use_alibi", False):
                    raise ValueError(
                        "kv_cache_dtype requires the multipage decode "
                        "kernel, which excludes ALiBi"
                    )
                if dv is not None and dv != d:
                    raise ValueError(
                        "kv_cache_dtype with v_head_dim != head_dim is not "
                        "supported (non-MLA serving assumes square heads)"
                    )
                fused = config.fused_kv_pages
                if fused is None:
                    fused = True  # one half-size DMA per page: best case
                caches = {}
                for i in range(mc.n_layer):
                    ks, vs = _scale_for(i, hk), _scale_for(i, hk)
                    if fused:
                        pool = allocate_fused_paged_kv_cache(
                            config.num_pages + 1, config.page_size, hk, d,
                            dtype=qdtype,
                        )
                        caches[i] = QuantPagedKV(
                            k=pool, v=None, k_scale=ks, v_scale=vs
                        )
                    else:
                        kp, vp = allocate_paged_kv_cache(
                            config.num_pages + 1, config.page_size, hk, d,
                            qdtype,
                        )
                        caches[i] = QuantPagedKV(
                            k=kp, v=vp, k_scale=ks, v_scale=vs
                        )
                return caches
            if getattr(mc, "attn_type", "mha") == "mla":
                # Latent page pools: rope-key + latent, ONE kv head. Fused
                # by default — the rope pages alone are tiny (page=16 ->
                # 2KB DMAs), the worst gather case.
                fused = config.fused_kv_pages
                if fused is None:
                    fused = jnp.dtype(mc.dtype).itemsize >= 2
                if fused:
                    return {
                        i: allocate_fused_paged_kv_cache(
                            config.num_pages + 1, config.page_size, 1,
                            mc.qk_rope_head_dim, mc.kv_lora_rank, mc.dtype,
                        )
                        for i in range(mc.n_layer)
                    }
                return {
                    i: (
                        allocate_paged_kv_cache(
                            config.num_pages + 1, config.page_size, 1,
                            mc.qk_rope_head_dim, mc.dtype,
                        )[0],
                        allocate_paged_kv_cache(
                            config.num_pages + 1, config.page_size, 1,
                            mc.kv_lora_rank, mc.dtype,
                        )[0],
                    )
                    for i in range(mc.n_layer)
                }
            fused = config.fused_kv_pages
            if fused is None:
                # Auto: the fused layout is only understood by the
                # multipage decode kernel, whose feature set excludes
                # ALiBi/sinks/quantized caches.
                fused = (
                    not getattr(mc, "use_alibi", False)
                    and jnp.dtype(mc.dtype).itemsize >= 2
                )
            if fused:
                return {
                    i: allocate_fused_paged_kv_cache(
                        config.num_pages + 1, config.page_size, hk, d,
                        dtype=mc.dtype,
                    )
                    for i in range(mc.n_layer)
                }
            return {
                i: allocate_paged_kv_cache(
                    config.num_pages + 1, config.page_size, hk, d, mc.dtype
                )
                for i in range(mc.n_layer)
            }

        self._put = (
            config.device_put_fn
            if config.device_put_fn is not None else jnp.asarray
        )
        self.caches = alloc_caches(c)
        if config.device_put_fn is not None:
            self.caches = jax.tree.map(self._put, self.caches)
        self.draft_model = draft_model
        self.draft_params = draft_params
        self.draft_caches = None
        if config.speculative_k > 0:
            if draft_model is None or draft_params is None:
                raise ValueError("speculative_k needs draft_model/draft_params")
            if config.top_k != 1:
                raise ValueError(
                    "engine speculative decoding is greedy-only (top_k=1)"
                )
            # Draft KV pages mirror the target's block tables: same page
            # ids, a parallel pool per draft layer.
            self.draft_caches = alloc_caches(draft_model.config)
        self.sched = make_scheduler(
            config.num_pages, config.page_size, config.max_batch_size,
            config.max_pages_per_seq, config.prefill_chunk,
            prefer_native=config.prefer_native_scheduler,
        )
        self.prefix_cache = None
        if config.enable_prefix_caching:
            from flash_attn_tpu.runtime.prefix_cache import PrefixCache

            budget = (config.prefix_cache_pages
                      if config.prefix_cache_pages is not None
                      else max(1, config.num_pages // 4))
            self.prefix_cache = PrefixCache(config.page_size, budget)
        if config.speculative_k > 0 and config.decode_depth > 1:
            raise ValueError("speculative_k and decode_depth are exclusive")
        if config.decode_depth > 1:
            self.sched.set_decode_depth(config.decode_depth)
        if config.speculative_k > 0:
            # Page planning per round: k accepted drafts + the bonus token.
            self.sched.set_decode_depth(config.speculative_k + 1)
        if config.kv_window_tokens > 0:
            self.sched.set_window(config.kv_window_tokens)
        self.outputs: Dict[int, RequestOutput] = {}
        self._prompts: Dict[int, List[int]] = {}
        self._max_new: Dict[int, int] = {}
        self._rng = rng if rng is not None else jax.random.PRNGKey(0)
        # Params ride as explicit jit arguments — closing over them would
        # bake the weights into the HLO as constants (huge compile payloads;
        # the remote-compile endpoint rejects them outright).
        self._prefill_fn = jax.jit(self._prefill_impl, donate_argnums=(1,))
        self._decode_fn = jax.jit(self._decode_impl, donate_argnums=(1,))
        if config.speculative_k > 0:
            self._prefill_spec_fn = jax.jit(
                self._prefill_spec_impl, donate_argnums=(2, 3)
            )
            self._spec_decode_fn = jax.jit(
                self._spec_decode_impl, donate_argnums=(2, 3)
            )

    # -- jitted steps -------------------------------------------------------

    def _apply(self, caches, tokens, offsets, block_tables, *,
               model=None, params=None, num_last_tokens=1):
        model = self.model if model is None else model
        params = self.params if params is None else params
        ip = InferenceParams(
            max_seqlen=self.config.max_seqlen,
            max_batch_size=tokens.shape[0],
            seqlen_offset=offsets,
            key_value_memory_dict=dict(caches),
            block_table=block_tables,
        )
        logits = model.apply(
            params, tokens, inference_params=ip,
            num_last_tokens=num_last_tokens,
        )
        return logits.astype(jnp.float32), ip.key_value_memory_dict

    def _prefill_impl(self, params, caches, tokens, offset, block_table):
        # Appends the chunk into the cache pools; logits are discarded (the
        # last prompt token is fed through decode instead).
        _, caches = self._apply(
            caches, tokens, offset, block_table, params=params
        )
        return caches

    def _prefill_spec_impl(self, params, draft_params, caches,
                           draft_caches, tokens, offset, block_table):
        _, caches = self._apply(
            caches, tokens, offset, block_table, params=params
        )
        _, draft_caches = self._apply(
            draft_caches, tokens, offset, block_table,
            model=self.draft_model, params=draft_params,
        )
        return caches, draft_caches

    def _spec_decode_impl(self, params, draft_params, caches,
                          draft_caches, tokens, offsets, block_tables):
        """One speculative round: the draft scans k greedy tokens, the
        target verifies all k (+ the newest known token) in ONE forward.
        Rejected-suffix cache writes land beyond the kept length and are
        overwritten before exposure (position-accounting invariant)."""
        k = self.config.speculative_k

        def dbody(carry, _):
            dc, toks, offs = carry
            logits, dc = self._apply(
                dc, toks, offs, block_tables,
                model=self.draft_model, params=draft_params,
            )
            nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
            return (dc, nxt[:, None], offs + 1), nxt

        (draft_caches, _, _), dtoks = jax.lax.scan(
            dbody, (draft_caches, tokens, offsets), None, length=k
        )
        dtoks = dtoks.T  # (mb, k)
        seq = jnp.concatenate([tokens, dtoks], axis=1)  # (mb, k+1)
        logits, caches = self._apply(
            caches, seq, offsets, block_tables, num_last_tokens=k + 1,
            params=params,
        )
        gtoks = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (mb, k+1)
        return dtoks, gtoks, caches, draft_caches

    def _decode_impl(self, params, caches, tokens, offsets, block_tables,
                     rng):
        depth = self.config.decode_depth

        def one(caches, toks, offs, key):
            logits, caches = self._apply(
                caches, toks, offs, block_tables, params=params
            )
            nxt = sample_tokens(
                logits[:, -1], key,
                top_k=self.config.top_k, top_p=self.config.top_p,
                temperature=self.config.temperature,
            )
            return nxt, caches

        if depth == 1:
            nxt, caches = one(caches, tokens, offsets, rng)
            return nxt[:, None], caches

        def body(carry, key):
            caches, toks, offs = carry
            nxt, caches = one(caches, toks, offs, key)
            return (caches, nxt[:, None], offs + 1), nxt

        keys = jax.random.split(rng, depth)
        (caches, _, _), toks = jax.lax.scan(
            body, (caches, tokens, offsets), keys
        )
        return toks.T, caches  # (mb, depth)

    # -- public API ---------------------------------------------------------

    def add_request(self, request_id: int, prompt_tokens: List[int],
                    max_new_tokens: int):
        assert len(prompt_tokens) >= 1
        shared: List[int] = []
        if self.prefix_cache is not None:
            # Only the prefill portion (prompt[:-1]) lives in the cache
            # before decode, so match full pages of that.
            shared = self.prefix_cache.lookup(prompt_tokens[:-1])
        rc = self.sched.add_request(
            request_id, len(prompt_tokens) - 1, max_new_tokens,
            shared_pages=shared,
        ) if shared else self.sched.add_request(
            request_id, len(prompt_tokens) - 1, max_new_tokens
        )
        if rc != 0:
            raise ValueError(f"request rejected (code {rc})")
        self._prompts[request_id] = list(prompt_tokens)
        self._max_new[request_id] = max_new_tokens
        self.outputs[request_id] = RequestOutput(
            request_id, list(prompt_tokens)
        )

    def step(self) -> List[RequestOutput]:
        """Run one engine step; returns outputs updated this step."""
        batch = self.sched.next_batch()
        cfg = self.config
        touched: List[RequestOutput] = []
        if batch.kind == 0:
            # Page pressure: unfinished work but no schedulable batch means
            # the pool is starved — drop the prefix registry's pins and
            # retry once before reporting idle.
            if (self.prefix_cache is not None and len(self.prefix_cache) > 0
                    and (self.sched.num_active() > 0 or any(
                        self.sched.request_state(r) in (0, 1)
                        for r in self.outputs))):
                self.prefix_cache.evict(
                    len(self.prefix_cache), self.sched.unpin_pages
                )
                batch = self.sched.next_batch()
            if batch.kind == 0:
                return touched

        if batch.kind == 1:  # batched prefill chunks (fixed (mb, chunk) shape)
            n = len(batch.request_ids)
            mb = cfg.max_batch_size
            tokens = np.zeros((mb, cfg.prefill_chunk), np.int32)
            offsets = np.zeros(mb, np.int32)
            tables = np.full((mb, cfg.max_pages_per_seq), self._trash_page,
                             np.int32)
            for i, rid in enumerate(batch.request_ids):
                pos = int(batch.positions[i])
                ln = int(batch.chunk_lens[i])
                chunk = self._prompts[int(rid)][pos : pos + ln]
                tokens[i, : len(chunk)] = chunk
                offsets[i] = pos
            tables[:n] = np.where(batch.block_tables < 0, self._trash_page,
                                  batch.block_tables)
            if self.config.speculative_k > 0:
                self.caches, self.draft_caches = self._prefill_spec_fn(
                    self.params, self.draft_params,
                    self.caches, self.draft_caches,
                    self._put(jnp.asarray(tokens)),
                    self._put(jnp.asarray(offsets)),
                    self._put(jnp.asarray(tables)),
                )
            else:
                self.caches = self._prefill_fn(
                    self.params,
                    self.caches,
                    self._put(jnp.asarray(tokens)),
                    self._put(jnp.asarray(offsets)),
                    self._put(jnp.asarray(tables)),
                )
            ids = list(map(int, batch.request_ids))
            self.sched.report(ids, [0] * n, [0] * n)
            if self.prefix_cache is not None:
                # Register full prompt pages of requests whose prefill just
                # completed (state RUNNING); raw tables (-1 padded), not the
                # trash-substituted copy.
                for i, rid in enumerate(ids):
                    if self.sched.request_state(rid) == 2:
                        self.prefix_cache.register(
                            self._prompts[rid][:-1],
                            [int(p) for p in batch.block_tables[i]],
                            self.sched.pin_pages,
                        )
                self.prefix_cache.evict_to_budget(self.sched.unpin_pages)
            touched.extend(self.outputs[r] for r in ids)
            return touched

        # decode batch
        n = len(batch.request_ids)
        mb = cfg.max_batch_size
        tokens = np.zeros((mb, 1), np.int32)
        for i, rid in enumerate(batch.request_ids):
            out = self.outputs[int(rid)]
            tokens[i, 0] = (
                out.tokens[-1] if out.tokens else self._prompts[int(rid)][-1]
            )
        offsets = np.zeros(mb, np.int32)
        offsets[:n] = batch.positions
        tables = np.full((mb, cfg.max_pages_per_seq), self._trash_page,
                         np.int32)
        tables[:n] = np.where(batch.block_tables < 0, self._trash_page,
                              batch.block_tables)
        if self.config.speculative_k > 0:
            dt, gt, self.caches, self.draft_caches = self._spec_decode_fn(
                self.params, self.draft_params,
                self.caches, self.draft_caches,
                self._put(jnp.asarray(tokens)),
                self._put(jnp.asarray(offsets)),
                self._put(jnp.asarray(tables)),
            )
            dt, gt = np.asarray(dt), np.asarray(gt)
            K = self.config.speculative_k
            cand = []
            for i in range(n):
                a = 0
                while a < K and int(dt[i, a]) == int(gt[i, a]):
                    a += 1  # greedy acceptance: draft matches target pred
                cand.append([int(t) for t in gt[i, : a + 1]])
        else:
            self._rng, k = jax.random.split(self._rng)
            nxt, self.caches = self._decode_fn(
                self.params,
                self.caches, self._put(jnp.asarray(tokens)),
                self._put(jnp.asarray(offsets)),
                self._put(jnp.asarray(tables)), self._put(k),
            )
            nxt = np.asarray(nxt)  # (mb, decode_depth)
            cand = [[int(t) for t in nxt[i]] for i in range(n)]
        produced, done = [], []
        for i, rid in enumerate(batch.request_ids):
            rid = int(rid)
            out = self.outputs[rid]
            # Keep at most the scheduler-planned count (clamped to the
            # request's remaining budget), stopping at EOS; overshoot
            # tokens beyond that were written to invisible cache slots.
            kept = 0
            fin = False
            for j in range(min(int(batch.chunk_lens[i]), len(cand[i]))):
                tok = cand[i][j]
                out.tokens.append(tok)
                kept += 1
                if ((cfg.eos_token_id is not None
                     and tok == cfg.eos_token_id)
                        or len(out.tokens) >= self._max_new[rid]):
                    fin = True
                    break
            out.finished = fin
            produced.append(kept)
            done.append(1 if fin else 0)
            touched.append(out)
        self.sched.report(list(map(int, batch.request_ids)), produced, done)
        return touched

    def run_to_completion(self, max_steps: int = 100000):
        steps = 0
        while self.sched.num_active() > 0 or any(
            self.sched.request_state(rid) in (0, 1) for rid in self.outputs
        ):
            self.step()
            steps += 1
            if steps > max_steps:
                raise RuntimeError("engine did not converge")
        return self.outputs

    def generate(self, prompts: List[List[int]], max_new_tokens: int):
        """Batch convenience wrapper; returns generated token lists."""
        base = max(self.outputs.keys(), default=-1) + 1
        for i, p in enumerate(prompts):
            self.add_request(base + i, p, max_new_tokens)
        self.run_to_completion()
        return [self.outputs[base + i].tokens for i in range(len(prompts))]
