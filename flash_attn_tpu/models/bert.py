"""BERT model family (reference: flash_attn/models/bert.py:340 BertModel,
:427 BertForPreTraining, with the unpad-everywhere dense path and the
last-layer-subset MLM optimization).

TPU adaptation: the reference unpads to a packed layout to skip padding
compute; here padding tokens are masked via segment ids inside the flash
kernel (block-skipping elides fully-padded tiles) which keeps shapes static
for XLA — same asymptotics, no scatter/gather round-trips.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from flash_attn_tpu.modules.block import Block
from flash_attn_tpu.modules.embedding import BertEmbeddings
from flash_attn_tpu.modules.mha import MHA
from flash_attn_tpu.modules.mlp import Mlp


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    hidden_act: str = "gelu_approx"
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    hidden_dropout_prob: float = 0.0
    attention_probs_dropout_prob: float = 0.0
    pad_vocab_size_multiple: int = 1
    dtype: Any = jnp.float32

    @property
    def padded_vocab_size(self):
        m = self.pad_vocab_size_multiple
        return ((self.vocab_size + m - 1) // m) * m


class BertModel(nn.Module):
    config: BertConfig
    add_pooling_layer: bool = True

    def setup(self):
        c = self.config
        self.embeddings = BertEmbeddings(
            embed_dim=c.hidden_size,
            vocab_size=c.padded_vocab_size,
            max_position_embeddings=c.max_position_embeddings,
            type_vocab_size=c.type_vocab_size,
            dtype=c.dtype,
            name="embeddings",
        )
        self.emb_ln = nn.LayerNorm(
            epsilon=c.layer_norm_eps, dtype=jnp.float32, name="emb_ln"
        )
        import functools

        self.layers = [
            Block(
                dim=c.hidden_size,
                mixer=functools.partial(
                    MHA,
                    embed_dim=c.hidden_size,
                    num_heads=c.num_attention_heads,
                    dropout=c.attention_probs_dropout_prob,
                    causal=False,
                    dtype=c.dtype,
                    layer_idx=i,
                ),
                mlp=functools.partial(
                    Mlp,
                    in_features=c.hidden_size,
                    hidden_features=c.intermediate_size,
                    activation=c.hidden_act,
                    dtype=c.dtype,
                ),
                norm_eps=c.layer_norm_eps,
                prenorm=False,  # BERT is post-norm
                resid_dropout1=c.hidden_dropout_prob,
                resid_dropout2=c.hidden_dropout_prob,
                dtype=c.dtype,
                name=f"layers_{i}",
            )
            for i in range(c.num_hidden_layers)
        ]
        if self.add_pooling_layer:
            self.pooler_dense = nn.Dense(
                c.hidden_size, dtype=c.dtype, name="pooler_dense"
            )

    def __call__(
        self,
        input_ids,
        attention_mask: Optional[jnp.ndarray] = None,  # (b, s) bool/int
        token_type_ids=None,
        position_ids=None,
        *,
        deterministic: bool = True,
    ):
        hidden = self.embeddings(input_ids, position_ids, token_type_ids)
        hidden = self.emb_ln(hidden).astype(self.config.dtype)
        mixer_kwargs = {}
        if attention_mask is not None:
            mixer_kwargs["key_padding_mask"] = attention_mask.astype(bool)
        for layer in self.layers:
            hidden = layer(
                hidden, deterministic=deterministic, mixer_kwargs=mixer_kwargs
            )
        pooled = None
        if self.add_pooling_layer:
            pooled = jnp.tanh(self.pooler_dense(hidden[:, 0]))
        return hidden, pooled


class BertForPreTraining(nn.Module):
    """MLM + NSP heads (reference models/bert.py:427). The reference's
    last_layer_subset optimization (only run MLM positions through the last
    layer) trades gather cost for compute — on TPU the masked tokens are a
    static fraction and XLA prefers the dense path, so it is not replicated."""

    config: BertConfig

    def setup(self):
        c = self.config
        self.bert = BertModel(c, name="bert")
        self.mlm_dense = nn.Dense(c.hidden_size, dtype=c.dtype, name="mlm_dense")
        self.mlm_ln = nn.LayerNorm(
            epsilon=c.layer_norm_eps, dtype=jnp.float32, name="mlm_ln"
        )
        self.nsp = nn.Dense(2, dtype=c.dtype, name="nsp")

    def __call__(self, input_ids, attention_mask=None, token_type_ids=None,
                 *, deterministic: bool = True):
        hidden, pooled = self.bert(
            input_ids, attention_mask, token_type_ids,
            deterministic=deterministic,
        )
        x = self.mlm_ln(jax.nn.gelu(self.mlm_dense(hidden)))
        wte = self.bert.embeddings.variables["params"]["word_embeddings"][
            "embedding"
        ]
        mlm_logits = x.astype(self.config.dtype) @ wte.T.astype(self.config.dtype)
        nsp_logits = self.nsp(pooled)
        return mlm_logits, nsp_logits
