"""Vision Transformer (reference: flash_attn/models/vit.py,
flash_attn/layers/patch_embed.py:17 PatchEmbed).

Parity surface:
  * stochastic depth with the timm linear decay rule, applied with the
    reference's SHIFTED mapping (drop_path1 = dpr[i-1], drop_path2 = dpr[i])
    that falls out of its dropout->add->norm reordering (models/vit.py:196)
  * cls-token-only final layer: with global_pool == "token" the last block
    runs as cross-attention over the full sequence with a 1-token query
    (models/vit.py:283 mixer_subset)
  * no_embed_class (deit-3 / big-vision position embedding: add THEN concat)
  * timm/torch state-dict import (vit_state_dict_to_flax), mapping the
    fused Wqkv of the reference onto separate Wq/Wk/Wv
  * named constructors (vit_base_patch16_224 etc., models/vit.py:357)
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from flash_attn_tpu.modules.block import Block
from flash_attn_tpu.modules.mha import MHA
from flash_attn_tpu.modules.mlp import Mlp


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    img_size: int = 224
    patch_size: int = 16
    in_chans: int = 3
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    num_classes: int = 1000
    qkv_bias: bool = True
    class_token: bool = True
    no_embed_class: bool = False  # deit-3: pos_embed excludes the cls token
    global_pool: str = "token"  # "token" | "avg"
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0  # stochastic depth (timm linear decay)
    norm_eps: float = 1e-6
    dtype: Any = jnp.float32


class PatchEmbed(nn.Module):
    """Conv patchifier (layers/patch_embed.py:17). The reference optionally
    rewrites the conv as an unfold+matmul (fused_bias_fc); on TPU the conv IS
    a matmul on the MXU after XLA's im2col, so nn.Conv is already optimal."""

    patch_size: int
    embed_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # (b, H, W, C)
        p = self.patch_size
        x = nn.Conv(
            self.embed_dim, (p, p), strides=(p, p), padding="VALID",
            dtype=self.dtype, name="proj",
        )(x)
        b, h, w, c = x.shape
        return x.reshape(b, h * w, c)


class VisionTransformer(nn.Module):
    config: ViTConfig

    def setup(self):
        c = self.config
        self.patch_embed = PatchEmbed(
            c.patch_size, c.embed_dim, dtype=c.dtype, name="patch_embed"
        )
        num_patches = (c.img_size // c.patch_size) ** 2
        embed_len = num_patches if c.no_embed_class else num_patches + (
            1 if c.class_token else 0
        )
        self.pos_embed = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (1, embed_len, c.embed_dim),
        )
        if c.class_token:
            self.cls_token = self.param(
                "cls_token", nn.initializers.zeros, (1, 1, c.embed_dim)
            )
        # timm stochastic-depth decay rule, with the reference's shifted
        # per-block mapping (drop_path1=dpr[i-1], drop_path2=dpr[i]).
        dpr = [
            float(x) for x in np.linspace(0.0, c.drop_path_rate, c.depth)
        ]
        self.blocks = [
            Block(
                dim=c.embed_dim,
                mixer=functools.partial(
                    MHA, embed_dim=c.embed_dim, num_heads=c.num_heads,
                    causal=False, qkv_proj_bias=c.qkv_bias,
                    dropout=c.attn_drop_rate, dtype=c.dtype, layer_idx=i,
                    cross_attn=(
                        c.global_pool == "token" and i == c.depth - 1
                    ),
                ),
                mlp=functools.partial(
                    Mlp, in_features=c.embed_dim,
                    hidden_features=int(c.embed_dim * c.mlp_ratio),
                    activation="gelu", dtype=c.dtype,
                ),
                norm_eps=c.norm_eps,
                prenorm=True,
                resid_dropout1=c.drop_rate,
                resid_dropout2=c.drop_rate,
                drop_path1=dpr[i - 1] if i > 0 else 0.0,
                drop_path2=dpr[i],
                residual_in_fp32=True,
                dtype=c.dtype,
                name=f"blocks_{i}",
            )
            for i in range(c.depth)
        ]
        self.final_drop = nn.Dropout(c.drop_rate)
        self.final_drop_path = nn.Dropout(
            dpr[-1] if c.depth else 0.0, broadcast_dims=(1, 2)
        )
        self.norm = nn.LayerNorm(epsilon=c.norm_eps, dtype=jnp.float32,
                                 name="norm")
        self.head = nn.Dense(c.num_classes, dtype=c.dtype, name="head")

    def _pos_embed(self, x):
        c = self.config
        if c.no_embed_class:
            # deit-3 / big-vision: add pos to patches, THEN concat cls.
            x = x + self.pos_embed.astype(x.dtype)
            if c.class_token:
                cls = jnp.broadcast_to(
                    self.cls_token, (x.shape[0], 1, c.embed_dim)
                ).astype(x.dtype)
                x = jnp.concatenate([cls, x], axis=1)
            return x
        if c.class_token:
            cls = jnp.broadcast_to(
                self.cls_token, (x.shape[0], 1, c.embed_dim)
            ).astype(x.dtype)
            x = jnp.concatenate([cls, x], axis=1)
        return x + self.pos_embed.astype(x.dtype)

    def forward_features(self, images, *, all_tokens: bool = True,
                         deterministic: bool = True):
        c = self.config
        x = self.patch_embed(images)
        x = self._pos_embed(x)
        residual = None
        if c.global_pool != "token" or all_tokens:
            for blk in self.blocks:
                x, residual = blk(x, residual, deterministic=deterministic)
        else:
            # cls-token-only final layer: cross-attention with a 1-token
            # query over the full sequence (reference models/vit.py:283).
            for blk in self.blocks[:-1]:
                x, residual = blk(x, residual, deterministic=deterministic)
            x, residual = self.blocks[-1](
                x, residual, deterministic=deterministic,
                mixer_subset=slice(0, 1),
            )
        residual = residual + self.final_drop_path(
            self.final_drop(x, deterministic=deterministic),
            deterministic=deterministic,
        ).astype(jnp.float32)
        return self.norm(residual).astype(c.dtype)

    def __call__(self, images, *, deterministic: bool = True):
        c = self.config
        x = self.forward_features(
            images, all_tokens=False, deterministic=deterministic
        )
        if c.global_pool == "avg":
            feat = x[:, 1 if c.class_token else 0 :].mean(axis=1)
        else:
            feat = x[:, 0]
        return self.head(feat)


def vit_state_dict_to_flax(state_dict, config: ViTConfig):
    """Map a timm/reference ViT torch state dict onto this model's flax
    params (reference models/vit.py:323 load_state_dict: Conv<->Linear
    patch-embed handling + fused Wqkv split for the cross-attn last layer
    — here every layer splits Wqkv into Wq/Wk/Wv)."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    e = config.embed_dim
    p = {}

    pw = sd["patch_embed.proj.weight"]
    if pw.ndim == 2:  # reference Linear form: (out, C*ph*pw) -> conv OIHW
        pw = pw.reshape(e, config.in_chans, config.patch_size,
                        config.patch_size)
    # torch conv OIHW -> flax HWIO
    p["patch_embed"] = {"proj": {
        "kernel": jnp.asarray(pw.transpose(2, 3, 1, 0)),
        "bias": jnp.asarray(sd["patch_embed.proj.bias"]),
    }}
    p["pos_embed"] = jnp.asarray(sd["pos_embed"])
    if config.class_token:
        p["cls_token"] = jnp.asarray(sd["cls_token"])
    p["norm"] = {"scale": jnp.asarray(sd["norm.weight"]),
                 "bias": jnp.asarray(sd["norm.bias"])}
    p["head"] = {"kernel": jnp.asarray(sd["head.weight"].T),
                 "bias": jnp.asarray(sd["head.bias"])}

    for i in range(config.depth):
        pre = f"blocks.{i}."
        qkv_key = (
            pre + "attn.qkv.weight" if pre + "attn.qkv.weight" in sd
            else pre + "mixer.Wqkv.weight"
        )
        wqkv = sd[qkv_key]
        bqkv = sd.get(qkv_key.replace("weight", "bias"))
        wq, wk, wv = wqkv[:e], wqkv[e:2 * e], wqkv[2 * e:]
        proj_key = (
            pre + "attn.proj." if pre + "attn.proj.weight" in sd
            else pre + "mixer.out_proj."
        )
        mixer = {
            "Wq": {"kernel": jnp.asarray(wq.T)},
            "Wk": {"kernel": jnp.asarray(wk.T)},
            "Wv": {"kernel": jnp.asarray(wv.T)},
            "out_proj": {
                "kernel": jnp.asarray(sd[proj_key + "weight"].T),
                "bias": jnp.asarray(sd[proj_key + "bias"]),
            },
        }
        if bqkv is not None:
            mixer["Wq"]["bias"] = jnp.asarray(bqkv[:e])
            mixer["Wk"]["bias"] = jnp.asarray(bqkv[e:2 * e])
            mixer["Wv"]["bias"] = jnp.asarray(bqkv[2 * e:])
        p[f"blocks_{i}"] = {
            "mixer": mixer,
            "norm1": {"scale": jnp.asarray(sd[pre + "norm1.weight"]),
                      "bias": jnp.asarray(sd[pre + "norm1.bias"])},
            "norm2": {"scale": jnp.asarray(sd[pre + "norm2.weight"]),
                      "bias": jnp.asarray(sd[pre + "norm2.bias"])},
            "mlp": {
                "fc1": {"kernel": jnp.asarray(sd[pre + "mlp.fc1.weight"].T),
                        "bias": jnp.asarray(sd[pre + "mlp.fc1.bias"])},
                "fc2": {"kernel": jnp.asarray(sd[pre + "mlp.fc2.weight"].T),
                        "bias": jnp.asarray(sd[pre + "mlp.fc2.bias"])},
            },
        }
    return {"params": p}


def vit_base_patch16_224(**kw):
    """ViT-B/16 (reference models/vit.py:357)."""
    return VisionTransformer(ViTConfig(
        patch_size=16, embed_dim=768, depth=12, num_heads=12, **kw
    ))


def vit_small_patch16_224(**kw):
    return VisionTransformer(ViTConfig(
        patch_size=16, embed_dim=384, depth=12, num_heads=6, **kw
    ))


def vit_large_patch16_224(**kw):
    return VisionTransformer(ViTConfig(
        patch_size=16, embed_dim=1024, depth=24, num_heads=16, **kw
    ))
