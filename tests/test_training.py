"""Training harness tests (reference: training/tests/ + the reference's
training-stack claims): loss decreases on learnable synthetic data,
fault-tolerant sampler resume is exact, checkpoint resume is bitwise,
param grouping excludes norms/biases from decay, EMA math, schedules."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attn_tpu.models.gpt import GPTConfig, GPTLMHeadModel
from flash_attn_tpu.training.data import (
    FaultTolerantSampler,
    LMDataModule,
    TokenDataset,
    synthetic_tokens,
)
from flash_attn_tpu.training.optim import decay_mask, make_schedule
from flash_attn_tpu.training.trainer import (
    SpeedMonitor,
    TrainConfig,
    Trainer,
    gpt_flops_per_token,
)

CFG = GPTConfig(
    vocab_size=64, n_positions=0, n_embd=64, n_layer=2, n_head=4,
    rotary_emb_fraction=1.0, rms_norm=True, activation_function="swiglu",
    qkv_proj_bias=False, out_proj_bias=False, mlp_fc1_bias=False,
    mlp_fc2_bias=False, tie_word_embeddings=True, dtype=jnp.float32,
)


def make_dm(seqlen=32, batch=4):
    toks = synthetic_tokens(64, 20000, seed=0)
    return LMDataModule(TokenDataset(toks, seqlen), batch)


@pytest.fixture(scope="module")
def model_and_params():
    model = GPTLMHeadModel(CFG)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))
    return model, params


def test_loss_decreases(model_and_params):
    model, params = model_and_params
    tr = Trainer(model, params, TrainConfig(lr=1e-3, total_steps=60,
                                            warmup_steps=5, log_every=5))
    hist = tr.fit(make_dm())
    first, last = hist[0]["loss"], hist[-1]["loss"]
    assert last < first - 0.5, (first, last)
    # grad norms recorded and finite
    assert all(np.isfinite(h["grad_norm"]) for h in hist)


def test_fused_ce_trainer_matches_plain(model_and_params):
    """fused_ce_chunk must follow the plain-logits training trajectory
    (same loss, same params) — it is a memory layout, not a different loss.
    Both tied (CFG) and untied head weights go through
    head_weight_from_params."""
    model, params = model_and_params
    ids = jax.random.randint(jax.random.PRNGKey(3), (2, 33), 0, 64)
    batch = (ids[:, :-1], ids[:, 1:])

    def run(fused_chunk):
        tr = Trainer(model, params,
                     TrainConfig(lr=1e-3, warmup_steps=0, total_steps=2,
                                 schedule="constant",
                                 fused_ce_chunk=fused_chunk))
        losses = []
        for _ in range(2):
            tr.params, tr.opt_state, loss, _ = tr._train_step(
                tr.params, tr.opt_state, *batch, jax.random.PRNGKey(0)
            )
            losses.append(float(loss))
        return losses, tr.params

    l0, p0 = run(0)
    l1, p1 = run(16)  # ragged final chunk: s=32, chunk=16 -> exact split
    l2, p2 = run(24)  # ragged: 32 = 24 + 8(pad)
    assert np.allclose(l0, l1, atol=1e-5), (l0, l1)
    assert np.allclose(l0, l2, atol=1e-5), (l0, l2)
    for a, b in zip(jax.tree_util.tree_leaves(p0),
                    jax.tree_util.tree_leaves(p1)):
        assert float(jnp.abs(a - b).max()) < 1e-5


def test_sampler_resume_exact():
    s1 = FaultTolerantSampler(100, seed=3)
    order = list(iter(s1))
    s2 = FaultTolerantSampler(100, seed=3)
    it = iter(s2)
    first_half = [next(it) for _ in range(40)]
    state = s2.state_dict()
    s3 = FaultTolerantSampler(100, seed=99)
    s3.load_state_dict(state)
    rest = list(iter(s3))
    assert first_half + rest == order


def test_checkpoint_resume_bitwise(model_and_params, tmp_path):
    model, params = model_and_params
    cfg = TrainConfig(lr=1e-3, total_steps=20, warmup_steps=2, log_every=1,
                      checkpoint_dir=str(tmp_path))
    dm = make_dm()
    tr = Trainer(model, params, cfg)
    tr.fit(dm, steps=10)
    path = tr.save_checkpoint(dm)
    loss_continued = tr.fit(dm, steps=5)[-1]["loss"]

    dm2 = make_dm()
    tr2 = Trainer(model, params, cfg)
    tr2.load_checkpoint(path, dm2)
    assert tr2.step_idx == 10
    loss_resumed = tr2.fit(dm2, steps=5)[-1]["loss"]
    assert loss_continued == loss_resumed  # bitwise identical resume
    assert Trainer.latest_checkpoint(str(tmp_path)) == path


def test_decay_mask_excludes_norms(model_and_params):
    _, params = model_and_params
    mask = decay_mask(params)
    flat = jax.tree_util.tree_flatten_with_path(mask)[0]
    for kp, decays in flat:
        path = "/".join(getattr(k, "key", str(k)) for k in kp)
        if "norm" in path or path.endswith("scale") or "embedding" in path:
            assert not decays, path
        if path.endswith("kernel"):
            assert decays, path


def test_schedule_shapes():
    s = make_schedule(lr=1.0, warmup_steps=10, total_steps=110,
                      schedule="cosine", min_lr_ratio=0.1)
    assert float(s(0)) == 0.0
    assert abs(float(s(10)) - 1.0) < 1e-6
    assert float(s(110)) <= 0.11
    lin = make_schedule(lr=2.0, warmup_steps=0, total_steps=100,
                        schedule="linear", min_lr_ratio=0.5)
    assert abs(float(lin(0)) - 2.0) < 1e-6
    assert abs(float(lin(100)) - 1.0) < 1e-6


def test_speed_monitor_and_flops():
    fpt = gpt_flops_per_token(CFG)
    assert fpt > 6 * 64 * 64  # at least embeddings
    mon = SpeedMonitor(fpt, peak_flops=1e12)
    mon.update(1000)
    rep = mon.report()
    assert rep["tokens_per_s"] > 0 and rep["mfu"] > 0


def test_ema(model_and_params):
    model, params = model_and_params
    tr = Trainer(model, params, TrainConfig(lr=1e-3, total_steps=5,
                                            ema_decay=0.9, log_every=1))
    tr.fit(make_dm(), steps=5)
    # EMA shadow differs from live params but stays close.
    diffs = jax.tree_util.tree_map(
        lambda s, p: float(jnp.abs(s - p.astype(jnp.float32)).max()),
        tr.ema.shadow, tr.params,
    )
    vals = jax.tree_util.tree_leaves(diffs)
    assert max(vals) > 0.0
    assert max(vals) < 1.0


def test_run_logger_and_monitors(model_and_params, tmp_path):
    """RunLogger JSONL output + norm monitor + causality check (reference
    wandb_callbacks / norm_monitor / causality_monitor)."""
    import json

    from flash_attn_tpu.training.loggers import (
        RunLogger, check_causality, param_norms, perplexity,
    )

    model, params = model_and_params
    tr = Trainer(model, params, TrainConfig(
        lr=1e-3, total_steps=4, log_every=2, log_dir=str(tmp_path),
        norm_monitor=True,
    ))
    tr.fit(make_dm(), steps=4,
           speed_monitor=SpeedMonitor(gpt_flops_per_token(CFG), 1e12))
    runs = os.listdir(tmp_path)
    assert len(runs) == 1
    lines = open(tmp_path / runs[0] / "metrics.jsonl").read().splitlines()
    recs = [json.loads(ln) for ln in lines]
    assert len(recs) == 2
    assert "loss" in recs[0] and "tokens_per_s" in recs[0]
    assert any(k.startswith("param_norm/") for k in recs[0])
    assert (tmp_path / runs[0] / "config.json").exists()

    # standalone monitors
    norms = param_norms(tr.params)
    assert norms["param_norm/global"] > 0
    assert perplexity(0.0) == 1.0
    prompt = jnp.zeros((1, 16), jnp.int32)
    assert check_causality(model, tr.params, prompt)


def test_grad_accumulation_matches_big_batch(model_and_params):
    """accumulate_steps=2 over two half-batches must equal one step on the
    concatenated batch (mean-of-means == global mean at equal microbatch
    sizes; fp32 accumulator)."""
    model, params = model_and_params
    ids = jax.random.randint(jax.random.PRNGKey(9), (4, 33), 0, 64)
    x, y = ids[:, :-1], ids[:, 1:]

    big = Trainer(model, params, TrainConfig(lr=1e-3, warmup_steps=0,
                                             total_steps=1,
                                             schedule="constant"))
    bp, _, bloss, _ = big._train_step(
        big.params, big.opt_state, x, y, jax.random.PRNGKey(0)
    )

    accum = Trainer(model, params,
                    TrainConfig(lr=1e-3, warmup_steps=0, total_steps=1,
                                schedule="constant", accumulate_steps=2))
    ap, _, aloss, _ = accum._train_step(
        accum.params, accum.opt_state,
        x.reshape(2, 2, 32), y.reshape(2, 2, 32), jax.random.PRNGKey(0),
    )

    assert abs(float(bloss) - float(aloss)) < 1e-5
    for a, b in zip(jax.tree_util.tree_leaves(ap),
                    jax.tree_util.tree_leaves(bp)):
        assert float(jnp.abs(a - b).max()) < 1e-5


def test_grad_accumulation_fit_groups_batches(model_and_params):
    """fit() groups acc consecutive datamodule batches into one update;
    loss still decreases and step count equals total_steps."""
    model, params = model_and_params
    tr = Trainer(model, params,
                 TrainConfig(lr=1e-3, total_steps=20, warmup_steps=2,
                             log_every=5, accumulate_steps=2))
    hist = tr.fit(make_dm())
    assert tr.step_idx == 20
    assert hist[-1]["loss"] < hist[0]["loss"]


def test_hf_datamodule_tokenize_cache(tmp_path):
    """HF-datasets pipeline: tokenize -> eos-joined memmap cache -> exact
    stream round-trip; cache is reused (idempotent) and the datamodule
    yields shifted (input, label) batches."""
    datasets = pytest.importorskip("datasets")
    from flash_attn_tpu.training.data import (
        lm_datamodule_from_hf,
        tokenize_dataset_to_memmap,
    )

    texts = ["hello world", "abc", "", "flash attention on tpu"]
    ds = datasets.Dataset.from_dict({"text": texts})
    tokenize = lambda t: [ord(c) % 96 for c in t]  # toy char tokenizer
    cache = str(tmp_path / "toks.bin")

    tokenize_dataset_to_memmap(ds, tokenize, cache, eos_id=95)
    expect = []
    for t in texts:
        expect.extend(tokenize(t))
        expect.append(95)
    got = np.memmap(cache, dtype=np.uint16, mode="r")
    assert got.tolist() == expect

    # Idempotence: poison the tokenizer — cache must be served, not rebuilt.
    dm = lm_datamodule_from_hf(
        ds, lambda t: 1 / 0, seqlen=8, batch_size=2, cache_path=cache,
        eos_id=95, shuffle=False,
    )
    x, y = next(dm.batches(1))
    assert x.shape == (2, 8) and y.shape == (2, 8)
    np.testing.assert_array_equal(x[0, 1:], y[0, :-1])  # shift-by-one


def test_image_datamodule_resume():
    """ImageClassDataset + ImageDataModule: batch shapes and exact
    mid-epoch resume (fault-tolerant sampler contract)."""
    from flash_attn_tpu.training.data import ImageClassDataset, ImageDataModule

    ds = ImageClassDataset.synthetic(64, image_size=8, channels=3,
                                     num_classes=10, seed=0)
    dm = ImageDataModule(ds, batch_size=4, seed=1)
    b1 = list(dm.batches(3))
    assert b1[0][0].shape == (4, 8, 8, 3) and b1[0][1].shape == (4,)
    state = dm.state_dict()
    rest = list(dm.batches(2))
    dm2 = ImageDataModule(ds, batch_size=4, seed=1)
    dm2.load_state_dict(state)
    rest2 = list(dm2.batches(2))
    for (x1, y1), (x2, y2) in zip(rest, rest2):
        assert np.array_equal(x1, x2) and np.array_equal(y1, y2)


def test_remat_matches_no_remat(model_and_params):
    """remat="dots"/"full" recompute must not change the math: forward
    logits and gradients agree with the plain path to fp tolerance."""
    import dataclasses

    model, params = model_and_params
    x = jnp.asarray(np.arange(32).reshape(1, 32) % 64)
    logits_plain = model.apply(params, x, deterministic=False,
                               rngs={"dropout": jax.random.PRNGKey(1)})
    for mode in ("dots", "full"):
        cfg_r = dataclasses.replace(CFG, remat=mode)
        model_r = GPTLMHeadModel(cfg_r)
        logits_r = model_r.apply(params, x, deterministic=False,
                                 rngs={"dropout": jax.random.PRNGKey(1)})
        np.testing.assert_allclose(
            np.asarray(logits_plain, np.float32),
            np.asarray(logits_r, np.float32), rtol=1e-5, atol=1e-5,
        )

        def loss(m):
            def f(p):
                return jnp.sum(m.apply(p, x).astype(jnp.float32) ** 2) * 1e-4
            return f

        g_plain = jax.grad(loss(model))(params)
        g_r = jax.grad(loss(model_r))(params)
        for a, b in zip(jax.tree_util.tree_leaves(g_plain),
                        jax.tree_util.tree_leaves(g_r)):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                rtol=1e-4, atol=1e-5,
            )


def test_model_presets_expand():
    from flash_attn_tpu.training.presets import (
        MODEL_PRESETS,
        expand_model_config,
    )

    # preset + override composition: explicit keys win.
    cfg = expand_model_config({"preset": "gpt2m", "n_layer": 2})
    assert cfg["n_embd"] == 1024 and cfg["n_layer"] == 2
    # every preset constructs a valid GPTConfig
    for name in MODEL_PRESETS:
        GPTConfig(**expand_model_config({"preset": name}))
    with pytest.raises(KeyError):
        expand_model_config({"preset": "nope"})
