"""Vision Transformer (reference: flash_attn/models/vit.py,
flash_attn/layers/patch_embed.py:17 PatchEmbed)."""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
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
    class_token: bool = True
    global_pool: str = "token"  # "token" | "avg"
    drop_rate: float = 0.0
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
        seq = num_patches + (1 if c.class_token else 0)
        self.pos_embed = self.param(
            "pos_embed", nn.initializers.normal(0.02), (1, seq, c.embed_dim)
        )
        if c.class_token:
            self.cls_token = self.param(
                "cls_token", nn.initializers.zeros, (1, 1, c.embed_dim)
            )
        self.blocks = [
            Block(
                dim=c.embed_dim,
                mixer=functools.partial(
                    MHA, embed_dim=c.embed_dim, num_heads=c.num_heads,
                    causal=False, dtype=c.dtype, layer_idx=i,
                ),
                mlp=functools.partial(
                    Mlp, in_features=c.embed_dim,
                    hidden_features=int(c.embed_dim * c.mlp_ratio),
                    activation="gelu", dtype=c.dtype,
                ),
                norm_eps=c.norm_eps,
                prenorm=True,
                residual_in_fp32=True,
                dtype=c.dtype,
                name=f"blocks_{i}",
            )
            for i in range(c.depth)
        ]
        self.norm = nn.LayerNorm(epsilon=c.norm_eps, dtype=jnp.float32,
                                 name="norm")
        self.head = nn.Dense(c.num_classes, dtype=c.dtype, name="head")

    def __call__(self, images, *, deterministic: bool = True):
        c = self.config
        x = self.patch_embed(images)
        if c.class_token:
            cls = jnp.broadcast_to(
                self.cls_token, (x.shape[0], 1, c.embed_dim)
            ).astype(x.dtype)
            x = jnp.concatenate([cls, x], axis=1)
        x = x + self.pos_embed.astype(x.dtype)
        residual = None
        for blk in self.blocks:
            x, residual = blk(x, residual, deterministic=deterministic)
        x = self.norm(residual + x.astype(jnp.float32)).astype(c.dtype)
        if c.global_pool == "avg":
            feat = x[:, 1 if c.class_token else 0 :].mean(axis=1)
        else:
            feat = x[:, 0]
        return self.head(feat)
