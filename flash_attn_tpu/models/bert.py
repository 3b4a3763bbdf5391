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
    # Run only the MLM positions (+ CLS) through the final transformer layer
    # and head (reference models/bert.py:427 last_layer_subset). TPU-native
    # form: the caller passes a STATIC-width `masked_positions` (b, m) — the
    # original TPU BERT's max_predictions_per_seq contract — so the gather
    # keeps shapes static; the last layer runs as cross-attention (subset
    # queries over all keys) with the same per-projection weights.
    last_layer_subset: bool = False
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

        last = c.num_hidden_layers - 1
        self.layers = [
            Block(
                dim=c.hidden_size,
                mixer=functools.partial(
                    MHA,
                    embed_dim=c.hidden_size,
                    num_heads=c.num_attention_heads,
                    dropout=c.attention_probs_dropout_prob,
                    causal=False,
                    # Subset MLM: the final layer attends subset queries over
                    # the full sequence (params are identical either way —
                    # Wq/Wk/Wv are separate Dense modules).
                    cross_attn=c.last_layer_subset and i == last,
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
        masked_positions: Optional[jnp.ndarray] = None,  # (b, m) int32
        deterministic: bool = True,
    ):
        """With ``masked_positions`` (static width, the TPU
        max_predictions_per_seq contract) and config.last_layer_subset, the
        final layer runs only on those rows (+ CLS, prepended so the pooler
        works) with keys over the full sequence — the reference's
        last-layer-subset MLM optimization (models/bert.py:427) without
        dynamic shapes. Returns (hidden, pooled) where hidden is (b, m, h)
        aligned with masked_positions on the subset path, (b, s, h) otherwise."""
        c = self.config
        hidden = self.embeddings(input_ids, position_ids, token_type_ids)
        hidden = self.emb_ln(hidden).astype(c.dtype)
        mixer_kwargs = {}
        if attention_mask is not None:
            mixer_kwargs["key_padding_mask"] = attention_mask.astype(bool)
        subset = c.last_layer_subset and masked_positions is not None
        body = self.layers[:-1] if subset else self.layers
        for layer in body:
            hidden = layer(
                hidden, deterministic=deterministic, mixer_kwargs=mixer_kwargs
            )
        if not subset:
            pooled = None
            if self.add_pooling_layer:
                pooled = jnp.tanh(self.pooler_dense(hidden[:, 0]))
            return hidden, pooled

        b = hidden.shape[0]
        pos = jnp.concatenate(
            [jnp.zeros((b, 1), masked_positions.dtype), masked_positions],
            axis=1,
        )
        sub = jnp.take_along_axis(hidden, pos[:, :, None], axis=1)
        sub = self.layers[-1](
            sub, deterministic=deterministic,
            mixer_kwargs={**mixer_kwargs, "x_kv": hidden},
        )
        pooled = None
        if self.add_pooling_layer:
            pooled = jnp.tanh(self.pooler_dense(sub[:, 0]))
        return sub[:, 1:], pooled


class BertForPreTraining(nn.Module):
    """MLM + NSP heads (reference models/bert.py:427). With
    config.last_layer_subset and ``masked_positions``, only the masked rows
    run through the final layer and the vocab-size MLM matmul — the
    dominant saving is the head matmul going from s to m rows."""

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
                 *, masked_positions=None, deterministic: bool = True):
        hidden, pooled = self.bert(
            input_ids, attention_mask, token_type_ids,
            masked_positions=masked_positions,
            deterministic=deterministic,
        )
        x = self.mlm_ln(jax.nn.gelu(self.mlm_dense(hidden)))
        wte = self.bert.embeddings.variables["params"]["word_embeddings"][
            "embedding"
        ]
        mlm_logits = x.astype(self.config.dtype) @ wte.T.astype(self.config.dtype)
        nsp_logits = self.nsp(pooled)
        return mlm_logits, nsp_logits
