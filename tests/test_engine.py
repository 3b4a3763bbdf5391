"""Serving engine + scheduler tests: native C++ vs Python scheduler
differential test, and engine-vs-generate parity (continuous batching must
reproduce the plain autoregressive decode exactly under greedy sampling)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attn_tpu.models.gpt import GPTConfig, GPTLMHeadModel
from flash_attn_tpu.runtime.engine import EngineConfig, LLMEngine
from flash_attn_tpu.runtime.scheduler import (
    NativeScheduler,
    PyScheduler,
    _lib,
)

CFG = GPTConfig(
    vocab_size=97, n_positions=0, n_embd=64, n_layer=2, n_head=4, n_head_kv=2,
    rotary_emb_fraction=1.0, rms_norm=True, activation_function="swiglu",
    qkv_proj_bias=False, out_proj_bias=False, mlp_fc1_bias=False,
    mlp_fc2_bias=False, tie_word_embeddings=True,
)


@pytest.fixture(scope="module")
def model_and_params():
    model = GPTLMHeadModel(CFG)
    ids = jnp.zeros((1, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)
    return model, params


def test_native_scheduler_builds():
    assert _lib() is not None, "C++ scheduler failed to build"


def drive(sched, workload, max_steps=500):
    """Run a synthetic workload, recording every scheduling decision."""
    trace = []
    added = 0
    for step in range(max_steps):
        while added < len(workload) and workload[added][0] <= step:
            _, rid, plen, mnew = workload[added]
            sched.add_request(rid, plen, mnew)
            added += 1
        b = sched.next_batch()
        trace.append(
            (b.kind, b.request_ids.tolist(), b.positions.tolist(),
             b.chunk_lens.tolist(), b.block_tables.tolist())
        )
        if b.kind == 0:
            if added == len(workload) and sched.num_active() == 0:
                break
            continue
        ids = b.request_ids.tolist()
        if b.kind == 1:
            sched.report(ids, [0] * len(ids), [0] * len(ids))
        else:
            # finish probabilistically-deterministically: every 7th token
            done = [1 if (rid + len(trace)) % 7 == 0 else 0 for rid in ids]
            sched.report(ids, [1] * len(ids), done)
    trace.append(("free", sched.num_free_pages()))
    return trace


def test_scheduler_differential():
    """C++ and Python schedulers must take identical decisions."""
    rng = np.random.RandomState(0)
    workload = []
    for i in range(12):
        workload.append(
            (int(rng.randint(0, 20)), i, int(rng.randint(1, 600)),
             int(rng.randint(1, 30)))
        )
    workload.sort(key=lambda w: w[0])
    args = dict(num_pages=64, page_size=64, max_batch=4,
                max_pages_per_seq=16, chunk_size=128)
    if _lib() is None:
        pytest.skip("native scheduler unavailable")
    t_native = drive(NativeScheduler(**args), workload)
    t_py = drive(PyScheduler(**args), workload)
    assert t_native == t_py


def test_scheduler_page_accounting():
    s = PyScheduler(num_pages=8, page_size=16, max_batch=2,
                    max_pages_per_seq=4, chunk_size=32)
    s.add_request(0, 40, 5)  # needs 3 pages for prompt
    b = s.next_batch()
    assert b.kind == 1 and b.chunk_lens[0] == 32
    s.report([0], [0], [0])
    b = s.next_batch()
    assert b.kind == 1 and b.chunk_lens[0] == 8
    s.report([0], [0], [0])
    for _ in range(5):
        b = s.next_batch()
        assert b.kind == 2
        s.report([0], [1], [0])
    b = s.next_batch()
    assert b.kind == 0  # max_new reached -> done, pages freed
    assert s.num_free_pages() == 8


def drive_shared(sched):
    """Deterministic shared-page scenario: prefix pin + shared admission +
    refcounted release, recording every decision."""
    trace = []
    assert sched.add_request(0, 300, 4) == 0
    pinned = False
    for phase in range(2):
        for _ in range(16):
            b = sched.next_batch()
            trace.append((b.kind, b.request_ids.tolist(),
                          b.positions.tolist(), b.chunk_lens.tolist(),
                          b.block_tables.tolist()))
            if b.kind == 0:
                break
            if not pinned and b.kind == 1:
                trace.append(("pin", sched.pin_pages([0, 1])))
                pinned = True
            ids = b.request_ids.tolist()
            n = len(ids)
            sched.report(ids, [1] * n if b.kind == 2 else [0] * n, [0] * n)
        if phase == 0:
            trace.append(("free_mid", sched.num_free_pages()))
            # r1 reuses the first two (256-token) pages of r0's prompt.
            assert sched.add_request(1, 300, 4, shared_pages=[0, 1]) == 0
            # invalid shared pages are rejected without side effects
            trace.append(("bad", sched.add_request(2, 100, 4,
                                                   shared_pages=[63])))
    trace.append(("free", sched.num_free_pages()))
    trace.append(("unpin", sched.unpin_pages([0, 1])))
    trace.append(("free2", sched.num_free_pages()))
    return trace


def test_scheduler_shared_pages_differential():
    """Prefix-cache page sharing (refcounts, pin/unpin, shared admission)
    must behave identically in the C++ and Python schedulers."""
    if _lib() is None:
        pytest.skip("native scheduler unavailable")
    args = dict(num_pages=16, page_size=128, max_batch=4,
                max_pages_per_seq=8, chunk_size=256)
    t_native = drive_shared(NativeScheduler(**args))
    t_py = drive_shared(PyScheduler(**args))
    assert t_native == t_py
    # Sharing actually skipped prefill: r1's first prefill chunk starts at
    # position 256 (two shared pages), not 0.
    starts = [t for t in t_py if isinstance(t, tuple) and t[0] == 1
              and t[1] == [1]]
    assert starts and starts[0][2] == [256]


@pytest.mark.parametrize("native", [True, False])
def test_engine_prefix_caching_parity(model_and_params, native):
    """Prefix caching (vLLM automatic-prefix-caching analog): requests
    sharing a page-aligned prompt prefix reuse registered KV pages, skip
    that prefill compute, and still reproduce the uncached engine's greedy
    tokens exactly."""
    if native and _lib() is None:
        pytest.skip("native scheduler unavailable")
    model, params = model_and_params
    rng = np.random.RandomState(3)
    prefix = rng.randint(0, CFG.vocab_size, 40).tolist()  # 2 full 16-pages
    prompts_a = [prefix + rng.randint(0, CFG.vocab_size, 7).tolist()]
    prompts_b = [prefix + rng.randint(0, CFG.vocab_size, 11).tolist(),
                 prefix[:16] + rng.randint(0, CFG.vocab_size, 3).tolist()]
    max_new = 6

    def run(enable):
        engine = LLMEngine(
            model, params,
            EngineConfig(max_batch_size=4, page_size=16, num_pages=64,
                         max_pages_per_seq=16, prefill_chunk=32,
                         max_seqlen=256, prefer_native_scheduler=native,
                         enable_prefix_caching=enable),
        )
        outs = engine.generate(prompts_a, max_new)
        outs += engine.generate(prompts_b, max_new)
        return outs, engine

    base, _ = run(False)
    cached, engine = run(True)
    assert cached == base
    # The second wave actually hit the registry.
    assert engine.prefix_cache.hits >= 1
    assert len(engine.prefix_cache) > 0
    # Registry pins survive finished requests; page accounting stays sane.
    assert engine.sched.num_free_pages() + len(engine.prefix_cache) <= 64


def test_engine_prefix_cache_eviction(model_and_params):
    """A tiny page pool forces page-pressure eviction of registry pins; the
    engine must still complete all requests correctly."""
    model, params = model_and_params
    rng = np.random.RandomState(4)
    prefix = rng.randint(0, CFG.vocab_size, 33).tolist()
    prompts = [prefix + rng.randint(0, CFG.vocab_size, k).tolist()
               for k in (5, 9)]
    max_new = 4
    engine = LLMEngine(
        model, params,
        EngineConfig(max_batch_size=2, page_size=16, num_pages=8,
                     max_pages_per_seq=8, prefill_chunk=32, max_seqlen=128,
                     prefer_native_scheduler=False,
                     enable_prefix_caching=True, prefix_cache_pages=2),
    )
    got = []
    got += engine.generate(prompts[:1], max_new)
    got += engine.generate(prompts[1:], max_new)
    for p, tokens in zip(prompts, got):
        ref = model.generate(
            params, jnp.asarray([p], jnp.int32), len(p) + max_new
        )
        assert tokens == np.asarray(ref)[0, len(p):].tolist()
    assert len(engine.prefix_cache) <= 2


@pytest.mark.parametrize("native", [True, False])
def test_engine_matches_generate(model_and_params, native):
    """Greedy continuous batching == greedy model.generate, even with
    staggered prompt lengths forcing chunked prefill + mixed batches."""
    model, params = model_and_params
    rng = np.random.RandomState(1)
    prompts = [
        rng.randint(0, CFG.vocab_size, n).tolist() for n in (45, 17, 70)
    ]
    max_new = 8
    engine = LLMEngine(
        model, params,
        EngineConfig(max_batch_size=4, page_size=16, num_pages=64,
                     max_pages_per_seq=16, prefill_chunk=32, max_seqlen=256,
                     prefer_native_scheduler=native),
    )
    got = engine.generate(prompts, max_new)

    for p, tokens in zip(prompts, got):
        ref = model.generate(
            params, jnp.asarray([p], jnp.int32), len(p) + max_new
        )
        ref_tokens = np.asarray(ref)[0, len(p):].tolist()
        assert tokens == ref_tokens, (tokens, ref_tokens)


@pytest.mark.parametrize("native", [True, False])
def test_engine_multistep_decode(model_and_params, native):
    """Multi-step decode (k jitted decode steps per host dispatch, the
    vLLM multi-step-scheduling analog): greedy tokens must match the
    single-step engine exactly, including a max_new not divisible by the
    depth (final truncated chunk) and mixed prompt lengths."""
    if native and _lib() is None:
        pytest.skip("native scheduler unavailable")
    model, params = model_and_params
    rng = np.random.RandomState(5)
    prompts = [rng.randint(0, CFG.vocab_size, n).tolist() for n in (21, 44)]
    max_new = 8  # depth 3 -> chunks of 3, 3, 2

    def run(depth):
        engine = LLMEngine(
            model, params,
            EngineConfig(max_batch_size=4, page_size=16, num_pages=64,
                         max_pages_per_seq=16, prefill_chunk=32,
                         max_seqlen=256, prefer_native_scheduler=native,
                         decode_depth=depth),
        )
        return engine.generate(prompts, max_new)

    base = run(1)
    multi = run(3)
    assert multi == base
    assert all(len(t) == max_new for t in multi)


def test_scheduler_window_eviction_differential():
    """Sliding-window page eviction must behave identically in the C++ and
    Python schedulers, returning dead pages to the pool with -1
    placeholders keeping the block table positional."""
    if _lib() is None:
        pytest.skip("native scheduler unavailable")

    def drive_window(s):
        s.set_window(32)  # visible keys; page_size 16 -> keep ~2-3 pages
        trace = []
        assert s.add_request(0, 100, 40) == 0
        for _ in range(60):
            b = s.next_batch()
            trace.append((b.kind, b.request_ids.tolist(),
                          b.positions.tolist(), b.block_tables.tolist(),
                          s.num_free_pages()))
            if b.kind == 0:
                break
            ids = b.request_ids.tolist()
            n = len(ids)
            s.report(ids, [1] * n if b.kind == 2 else [0] * n, [0] * n)
        trace.append(("free", s.num_free_pages()))
        return trace

    args = dict(num_pages=32, page_size=16, max_batch=2,
                max_pages_per_seq=16, chunk_size=64)
    t_native = drive_window(NativeScheduler(**args))
    t_py = drive_window(PyScheduler(**args))
    assert t_native == t_py
    # Eviction actually happened: some decode-batch tables carry -1 in
    # leading (dead) slots while later slots hold live pages.
    decode_tables = [t[3][0] for t in t_py
                     if isinstance(t, tuple) and t[0] == 2]
    assert any(row[0] == -1 and max(row) >= 0 for row in decode_tables)
    assert t_py[-1] == ("free", 32)


def test_engine_window_eviction_parity(model_and_params):
    """With a sliding-window model, evicting out-of-window KV pages must
    not change greedy outputs (the window mask never reads them), while
    freeing pool pages mid-run."""
    import dataclasses as dc

    cfg = dc.replace(CFG, window_size=(15, 0))  # 16 visible keys
    model = GPTLMHeadModel(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))
    rng = np.random.RandomState(6)
    prompts = [rng.randint(0, cfg.vocab_size, 41).tolist()]
    max_new = 24

    def run(window_tokens):
        engine = LLMEngine(
            model, params,
            EngineConfig(max_batch_size=2, page_size=8, num_pages=32,
                         max_pages_per_seq=16, prefill_chunk=16,
                         max_seqlen=128, prefer_native_scheduler=False,
                         kv_window_tokens=window_tokens),
        )
        for i, p in enumerate(prompts):
            engine.add_request(i, p, max_new)
        min_free = engine.sched.num_free_pages()
        while engine.sched.num_active() > 0 or any(
            engine.sched.request_state(r) in (0, 1) for r in engine.outputs
        ):
            engine.step()
            min_free = min(min_free, engine.sched.num_free_pages())
        return [engine.outputs[i].tokens for i in range(len(prompts))], min_free

    base, free_base = run(0)
    evict, free_evict = run(16)
    assert evict == base
    assert free_evict > free_base  # pages actually returned mid-run


@pytest.mark.parametrize("same_draft", [False, True])
def test_engine_speculative_decode(model_and_params, same_draft):
    """Speculative decoding inside continuous batching (draft proposes k,
    target verifies in one forward): greedy outputs must equal the plain
    engine regardless of draft quality. same_draft=True (draft == target)
    must accept every proposal; a weak independent draft exercises
    mid-round rejection and the invisible-slot overwrite invariant."""
    model, params = model_and_params
    if same_draft:
        draft_model, draft_params = model, params
    else:
        draft_model = GPTLMHeadModel(CFG)
        draft_params = draft_model.init(
            jax.random.PRNGKey(7), jnp.zeros((1, 8), jnp.int32)
        )
    rng = np.random.RandomState(8)
    prompts = [rng.randint(0, CFG.vocab_size, n).tolist() for n in (19, 33)]
    max_new = 10  # k=3 -> rounds of up to 4 kept tokens, final truncation

    def run(spec):
        engine = LLMEngine(
            model, params,
            EngineConfig(max_batch_size=4, page_size=16, num_pages=64,
                         max_pages_per_seq=16, prefill_chunk=32,
                         max_seqlen=256, prefer_native_scheduler=False,
                         speculative_k=3 if spec else 0),
            draft_model=draft_model if spec else None,
            draft_params=draft_params if spec else None,
        )
        return engine.generate(prompts, max_new)

    base = run(False)
    spec = run(True)
    assert spec == base
    assert all(len(t) == max_new for t in spec)


def test_engine_mla_model():
    """DeepSeek-style MLA model through the paged continuous-batching
    engine (latent page pools, absorbed-qv decode): tokens equal the
    model's own generate()."""
    import numpy as np

    from flash_attn_tpu.models.gpt import GPTConfig, GPTLMHeadModel
    from flash_attn_tpu.runtime.engine import EngineConfig, LLMEngine

    cfg = GPTConfig(
        vocab_size=61, n_positions=0, n_embd=64, n_layer=2, n_head=4,
        attn_type="mla", kv_lora_rank=32, qk_nope_head_dim=16,
        qk_rope_head_dim=8, v_head_dim=16,
        rms_norm=True, activation_function="swiglu",
        qkv_proj_bias=False, out_proj_bias=False, mlp_fc1_bias=False,
        mlp_fc2_bias=False, tie_word_embeddings=True, dtype=jnp.float32,
    )
    model = GPTLMHeadModel(cfg)
    rng = np.random.RandomState(0)
    prompts = [rng.randint(0, 61, 9).tolist(), rng.randint(0, 61, 5).tolist()]
    params = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 8), jnp.int32))

    engine = LLMEngine(model, params, EngineConfig(
        max_batch_size=4, page_size=16, num_pages=64, max_pages_per_seq=8,
        prefill_chunk=16, max_seqlen=128))
    outs = engine.generate(prompts, 8)
    for i, p in enumerate(prompts):
        ref = model.generate(params, jnp.asarray([p], jnp.int32), len(p) + 8)
        assert outs[i] == [int(t) for t in ref[0, len(p):]], i
