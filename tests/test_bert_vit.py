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


def test_vit_timm_state_dict_parity():
    """Import a timm-format torch state dict (vit_state_dict_to_flax) and
    match a from-scratch torch oracle implementing standard pre-LN ViT
    semantics (the reference's reordered dropout-add-norm blocks are
    mathematically identical at inference)."""
    import torch
    import numpy as np
    from flash_attn_tpu.models.vit import vit_state_dict_to_flax

    torch.manual_seed(0)
    E, P, IMG, DEPTH, H, NC = 48, 8, 32, 2, 4, 10
    sd = {}
    sd["patch_embed.proj.weight"] = torch.randn(E, 3, P, P) * 0.05
    sd["patch_embed.proj.bias"] = torch.randn(E) * 0.02
    npatch = (IMG // P) ** 2
    sd["pos_embed"] = torch.randn(1, npatch + 1, E) * 0.02
    sd["cls_token"] = torch.randn(1, 1, E) * 0.02
    for i in range(DEPTH):
        p = f"blocks.{i}."
        sd[p + "attn.qkv.weight"] = torch.randn(3 * E, E) * 0.05
        sd[p + "attn.qkv.bias"] = torch.randn(3 * E) * 0.02
        sd[p + "attn.proj.weight"] = torch.randn(E, E) * 0.05
        sd[p + "attn.proj.bias"] = torch.randn(E) * 0.02
        sd[p + "norm1.weight"] = 1 + torch.randn(E) * 0.02
        sd[p + "norm1.bias"] = torch.randn(E) * 0.02
        sd[p + "norm2.weight"] = 1 + torch.randn(E) * 0.02
        sd[p + "norm2.bias"] = torch.randn(E) * 0.02
        sd[p + "mlp.fc1.weight"] = torch.randn(4 * E, E) * 0.05
        sd[p + "mlp.fc1.bias"] = torch.randn(4 * E) * 0.02
        sd[p + "mlp.fc2.weight"] = torch.randn(E, 4 * E) * 0.05
        sd[p + "mlp.fc2.bias"] = torch.randn(E) * 0.02
    sd["norm.weight"] = 1 + torch.randn(E) * 0.02
    sd["norm.bias"] = torch.randn(E) * 0.02
    sd["head.weight"] = torch.randn(NC, E) * 0.05
    sd["head.bias"] = torch.randn(NC) * 0.02

    imgs = torch.randn(2, 3, IMG, IMG)

    def oracle(x):
        with torch.no_grad():
            x = torch.nn.functional.conv2d(
                x, sd["patch_embed.proj.weight"],
                sd["patch_embed.proj.bias"], stride=P,
            )  # (b, E, 4, 4)
            b = x.shape[0]
            x = x.flatten(2).transpose(1, 2)  # (b, 16, E)
            x = torch.cat([sd["cls_token"].expand(b, -1, -1), x], dim=1)
            x = x + sd["pos_embed"]
            for i in range(DEPTH):
                p = f"blocks.{i}."
                h = torch.nn.functional.layer_norm(
                    x, (E,), sd[p + "norm1.weight"], sd[p + "norm1.bias"],
                    eps=1e-6,
                )
                qkv = h @ sd[p + "attn.qkv.weight"].T + sd[p + "attn.qkv.bias"]
                q, k, v = qkv.chunk(3, dim=-1)

                def heads(t):
                    return t.view(b, -1, H, E // H).transpose(1, 2)

                q, k, v = heads(q), heads(k), heads(v)
                a = torch.softmax(
                    q @ k.transpose(-1, -2) / (E // H) ** 0.5, dim=-1
                )
                o = (a @ v).transpose(1, 2).reshape(b, -1, E)
                x = x + o @ sd[p + "attn.proj.weight"].T + sd[p + "attn.proj.bias"]
                h = torch.nn.functional.layer_norm(
                    x, (E,), sd[p + "norm2.weight"], sd[p + "norm2.bias"],
                    eps=1e-6,
                )
                h = torch.nn.functional.gelu(
                    h @ sd[p + "mlp.fc1.weight"].T + sd[p + "mlp.fc1.bias"],
                    approximate="tanh",
                )
                x = x + h @ sd[p + "mlp.fc2.weight"].T + sd[p + "mlp.fc2.bias"]
            x = torch.nn.functional.layer_norm(
                x, (E,), sd["norm.weight"], sd["norm.bias"], eps=1e-6
            )
            return x[:, 0] @ sd["head.weight"].T + sd["head.bias"]

    ref = oracle(imgs).numpy()

    cfg = ViTConfig(img_size=IMG, patch_size=P, embed_dim=E, depth=DEPTH,
                    num_heads=H, num_classes=NC, dtype=jnp.float32)
    model = VisionTransformer(cfg)
    params = vit_state_dict_to_flax(sd, cfg)
    imgs_j = jnp.asarray(imgs.numpy().transpose(0, 2, 3, 1))  # NCHW->NHWC
    got = np.asarray(model.apply(params, imgs_j))
    assert np.abs(got - ref).max() < 2e-2, np.abs(got - ref).max()


def test_vit_drop_path_and_subset():
    """Stochastic depth + cls-only last layer: the subset path must equal
    the all-tokens path at inference; drop-path must perturb training-mode
    outputs per SAMPLE (whole-branch drops)."""
    cfg = ViTConfig(img_size=32, patch_size=8, embed_dim=48, depth=3,
                    num_heads=4, num_classes=10, drop_path_rate=0.5,
                    dtype=jnp.float32)
    model = VisionTransformer(cfg)
    imgs = jax.random.normal(jax.random.PRNGKey(0), (4, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(1), imgs)
    # deterministic: identical logits, drop_path inert
    a = model.apply(params, imgs)
    assert jnp.array_equal(a, model.apply(params, imgs))
    # all-tokens features agree with the subset fast path on the cls token
    feats = model.apply(
        params, imgs, deterministic=True,
        method=lambda m, x, **kw: m.forward_features(x, all_tokens=True),
    )
    sub = model.apply(
        params, imgs,
        method=lambda m, x: m.forward_features(
            x, all_tokens=False, deterministic=True
        ),
    )
    assert jnp.abs(feats[:, 0:1] - sub).max() < 1e-4
    # train mode: drop-path actually drops branches (outputs differ by seed)
    d1 = model.apply(params, imgs, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(7)})
    d2 = model.apply(params, imgs, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(8)})
    assert not jnp.array_equal(d1, d2)


def test_vit_no_embed_class():
    cfg = ViTConfig(img_size=32, patch_size=8, embed_dim=48, depth=2,
                    num_heads=4, num_classes=10, no_embed_class=True)
    model = VisionTransformer(cfg)
    imgs = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(1), imgs)
    assert model.apply(params, imgs).shape == (2, 10)
    # pos_embed excludes the cls slot
    assert params["params"]["pos_embed"].shape == (1, 16, 48)
