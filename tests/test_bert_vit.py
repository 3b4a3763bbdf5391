"""BERT + ViT model tests (reference: tests/models/test_bert.py,
test_vit.py): HF parity for BERT, shape/determinism + padding-invariance
checks for both."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attn_tpu.models.bert import BertConfig, BertForPreTraining, BertModel
from flash_attn_tpu.models.vit import ViTConfig, VisionTransformer

CFG = BertConfig(
    vocab_size=99, hidden_size=48, num_hidden_layers=2,
    num_attention_heads=4, intermediate_size=96, max_position_embeddings=64,
)


def test_bert_padding_invariance():
    """Outputs at valid positions must not depend on padding contents."""
    model = BertModel(CFG)
    ids = jax.random.randint(jax.random.PRNGKey(0), (2, 16), 0, 99)
    mask = jnp.arange(16)[None, :] < jnp.array([[10], [16]])
    params = model.init(jax.random.PRNGKey(1), ids, mask)
    h1, p1 = model.apply(params, ids, mask)
    ids2 = jnp.where(mask, ids, 7)  # scramble padding tokens
    h2, p2 = model.apply(params, ids2, mask)
    valid = mask[:, :, None]
    assert jnp.abs(jnp.where(valid, h1 - h2, 0.0)).max() < 1e-5
    assert jnp.abs(p1 - p2).max() < 1e-5


def test_bert_hf_parity():
    transformers = pytest.importorskip("transformers")
    import torch

    hf_cfg = transformers.BertConfig(
        vocab_size=99, hidden_size=48, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=96,
        max_position_embeddings=64, hidden_act="gelu",
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    hf = transformers.BertModel(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}

    cfg = dataclasses.replace(CFG, hidden_act="gelu")
    model = BertModel(cfg)

    def dense(w, b=None):
        out = {"kernel": jnp.asarray(np.ascontiguousarray(w.T))}
        if b is not None:
            out["bias"] = jnp.asarray(b)
        return out

    params = {"params": {
        "embeddings": {
            "word_embeddings": {"embedding": jnp.asarray(
                sd["embeddings.word_embeddings.weight"])},
            "position_embeddings": {"embedding": jnp.asarray(
                sd["embeddings.position_embeddings.weight"])},
            "token_type_embeddings": {"embedding": jnp.asarray(
                sd["embeddings.token_type_embeddings.weight"])},
        },
        "emb_ln": {"scale": jnp.asarray(sd["embeddings.LayerNorm.weight"]),
                   "bias": jnp.asarray(sd["embeddings.LayerNorm.bias"])},
        "pooler_dense": dense(sd["pooler.dense.weight"],
                              sd["pooler.dense.bias"]),
    }}
    for i in range(2):
        p = f"encoder.layer.{i}."
        params["params"][f"layers_{i}"] = {
            "mixer": {
                "Wq": dense(sd[p + "attention.self.query.weight"],
                            sd[p + "attention.self.query.bias"]),
                "Wk": dense(sd[p + "attention.self.key.weight"],
                            sd[p + "attention.self.key.bias"]),
                "Wv": dense(sd[p + "attention.self.value.weight"],
                            sd[p + "attention.self.value.bias"]),
                "out_proj": dense(sd[p + "attention.output.dense.weight"],
                                  sd[p + "attention.output.dense.bias"]),
            },
            "norm1": {"scale": jnp.asarray(
                          sd[p + "attention.output.LayerNorm.weight"]),
                      "bias": jnp.asarray(
                          sd[p + "attention.output.LayerNorm.bias"])},
            "mlp": {
                "fc1": dense(sd[p + "intermediate.dense.weight"],
                             sd[p + "intermediate.dense.bias"]),
                "fc2": dense(sd[p + "output.dense.weight"],
                             sd[p + "output.dense.bias"]),
            },
            "norm2": {"scale": jnp.asarray(sd[p + "output.LayerNorm.weight"]),
                      "bias": jnp.asarray(sd[p + "output.LayerNorm.bias"])},
        }

    ids = np.random.RandomState(0).randint(0, 99, (2, 20))
    mask = np.ones((2, 20), np.int32)
    mask[0, 15:] = 0
    with torch.no_grad():
        hf_out = hf(torch.tensor(ids),
                    attention_mask=torch.tensor(mask)).last_hidden_state.numpy()
    ours, _ = model.apply(params, jnp.asarray(ids), jnp.asarray(mask))
    ours = np.asarray(ours)
    valid = mask[:, :, None].astype(bool)
    err = np.abs(np.where(valid, ours - hf_out, 0)).max()
    assert err < 2e-2, err


def test_bert_pretraining_heads():
    model = BertForPreTraining(CFG)
    ids = jax.random.randint(jax.random.PRNGKey(0), (2, 16), 0, 99)
    params = model.init(jax.random.PRNGKey(1), ids)
    mlm, nsp = model.apply(params, ids)
    assert mlm.shape == (2, 16, CFG.padded_vocab_size)
    assert nsp.shape == (2, 2)


def test_bert_last_layer_subset_parity():
    """The subset path (final layer + MLM head on masked rows only,
    reference models/bert.py:427) must reproduce the dense path's logits at
    the masked positions, and the NSP head must see the same pooled CLS."""
    cfg = dataclasses.replace(CFG, last_layer_subset=True)
    model = BertForPreTraining(cfg)
    ids = jax.random.randint(jax.random.PRNGKey(0), (2, 16), 0, 99)
    mask = jnp.arange(16)[None, :] < jnp.array([[12], [16]])
    params = model.init(jax.random.PRNGKey(1), ids)
    # static-width masked positions (padded with 0 like masked_lm_positions)
    pos = jnp.array([[3, 5, 9, 0], [1, 7, 13, 15]], jnp.int32)

    dense_mlm, dense_nsp = model.apply(params, ids, mask)
    sub_mlm, sub_nsp = model.apply(params, ids, mask, masked_positions=pos)

    assert sub_mlm.shape == (2, 4, cfg.padded_vocab_size)
    ref = jnp.take_along_axis(dense_mlm, pos[:, :, None], axis=1)
    assert jnp.abs(sub_mlm - ref).max() < 1e-4
    assert jnp.abs(sub_nsp - dense_nsp).max() < 1e-4


def test_vit_forward():
    cfg = ViTConfig(img_size=32, patch_size=8, embed_dim=48, depth=2,
                    num_heads=4, num_classes=10)
    model = VisionTransformer(cfg)
    imgs = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(1), imgs)
    logits = model.apply(params, imgs)
    assert logits.shape == (2, 10)
    assert jnp.array_equal(logits, model.apply(params, imgs))  # deterministic
    # global_pool=avg variant
    cfg2 = ViTConfig(img_size=32, patch_size=8, embed_dim=48, depth=2,
                     num_heads=4, num_classes=10, global_pool="avg")
    model2 = VisionTransformer(cfg2)
    params2 = model2.init(jax.random.PRNGKey(2), imgs)
    assert model2.apply(params2, imgs).shape == (2, 10)
