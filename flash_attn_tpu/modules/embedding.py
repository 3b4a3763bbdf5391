"""Embedding modules (reference: flash_attn/modules/embedding.py:
GPT2Embeddings:17, VocabParallelEmbedding:114, ColumnParallelEmbedding:146,
ParallelGPT2Embeddings:161).

Vocab/column parallelism is a PartitionSpec on the embedding table
(flash_attn_tpu.parallel.sharding) — GSPMD handles the masked lookup +
allreduce the reference implements manually.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn


class GPT2Embeddings(nn.Module):
    embed_dim: int
    vocab_size: int
    max_position_embeddings: int  # 0 => no learned position embeddings
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, input_ids, position_ids=None):
        emb = nn.Embed(
            self.vocab_size, self.embed_dim, dtype=self.dtype,
            name="word_embeddings",
        )(input_ids)
        if self.max_position_embeddings > 0:
            if position_ids is None:
                position_ids = jnp.arange(input_ids.shape[1])[None, :]
            pos = nn.Embed(
                self.max_position_embeddings, self.embed_dim, dtype=self.dtype,
                name="position_embeddings",
            )(position_ids)
            emb = emb + pos
        return emb


class BertEmbeddings(nn.Module):
    embed_dim: int
    vocab_size: int
    max_position_embeddings: int
    type_vocab_size: int = 2
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, input_ids, position_ids=None, token_type_ids=None):
        emb = nn.Embed(
            self.vocab_size, self.embed_dim, dtype=self.dtype,
            name="word_embeddings",
        )(input_ids)
        if position_ids is None:
            position_ids = jnp.arange(input_ids.shape[1])[None, :]
        emb = emb + nn.Embed(
            self.max_position_embeddings, self.embed_dim, dtype=self.dtype,
            name="position_embeddings",
        )(position_ids)
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        emb = emb + nn.Embed(
            self.type_vocab_size, self.embed_dim, dtype=self.dtype,
            name="token_type_embeddings",
        )(token_type_ids)
        return emb
