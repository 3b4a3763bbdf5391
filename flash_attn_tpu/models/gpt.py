"""Config-driven GPT model family (reference: flash_attn/models/gpt.py:409
GPTModel, :577 GPTLMHeadModel; mixer/mlp factories :62,123).

One config covers GPT-2/NeoX/J, Llama/Mistral, Falcon, OPT, BTLM, Baichuan —
the reference's per-model adapters become `*_config_to_gpt_config` mappers
(see flash_attn_tpu/models/adapters.py). Tensor-parallel execution is a
sharding rule set (flash_attn_tpu/parallel/sharding.py), not a separate
model class.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from flash_attn_tpu.modules.block import Block
from flash_attn_tpu.modules.embedding import GPT2Embeddings
from flash_attn_tpu.modules.mha import MHA, InferenceParams
from flash_attn_tpu.modules.mlp import GatedMlp, Mlp


@dataclasses.dataclass(frozen=True)
class GPTConfig:
    """Superset of HF GPT2Config fields the reference consumes, plus the
    extra fields it grafts on (models/gpt.py:409-470)."""

    vocab_size: int = 50257
    n_positions: int = 2048  # 0 => no learned positions (rotary/alibi models)
    n_embd: int = 768
    n_layer: int = 12
    n_head: int = 12
    n_head_kv: Optional[int] = None
    head_dim: Optional[int] = None
    n_inner: Optional[int] = None
    activation_function: str = "gelu_approx"  # "swiglu"/"silu" => GatedMlp
    embd_pdrop: float = 0.0
    resid_pdrop: float = 0.0
    attn_pdrop: float = 0.0
    layer_norm_epsilon: float = 1e-5
    rms_norm: bool = False
    prenorm: bool = True
    parallel_block: bool = False
    parallel_block_tied_norm: bool = False
    rotary_emb_fraction: float = 0.0
    rotary_emb_base: float = 10000.0
    rotary_emb_interleaved: bool = False
    use_alibi: bool = False
    window_size: Tuple[int, int] = (-1, -1)
    softcap: float = 0.0
    qkv_proj_bias: bool = True
    out_proj_bias: bool = True
    mlp_fc1_bias: bool = True
    mlp_fc2_bias: bool = True
    tie_word_embeddings: bool = True
    residual_in_fp32: bool = True
    pad_vocab_size_multiple: int = 1
    # Added to every position id before the learned-position lookup (OPT
    # bakes a +2 offset into its table, reference models/opt.py).
    position_offset: int = 0
    # Multiplier on the embedding output (Gemma scales by sqrt(n_embd)).
    embed_scale: Optional[float] = None
    # Attention mixer family: "mha" (default) or "mla" (DeepSeek-style
    # latent attention, modules/mla.py on the absorbed-qv kernels).
    attn_type: str = "mha"
    # Rematerialization policy for training ("none" | "dots" | "full"):
    # "dots" saves matmul outputs only (jax.checkpoint
    # dots_with_no_batch_dims_saveable — the usual MFU/memory sweet spot);
    # "full" saves nothing. The TPU answer to activation checkpointing in
    # the reference trainer (Lightning + apex).
    remat: str = "none"
    kv_lora_rank: int = 512
    q_lora_rank: Optional[int] = None
    qk_nope_head_dim: Optional[int] = None  # default: head_dim
    qk_rope_head_dim: int = 64
    v_head_dim: Optional[int] = None        # default: head_dim
    dtype: Any = jnp.bfloat16

    @property
    def padded_vocab_size(self) -> int:
        m = self.pad_vocab_size_multiple
        return ((self.vocab_size + m - 1) // m) * m


def _mixer_factory(config: GPTConfig, layer_idx: int):
    head_dim = (
        config.head_dim
        if config.head_dim is not None
        else config.n_embd // config.n_head
    )
    if config.attn_type == "mla":
        from flash_attn_tpu.modules.mla import MLA

        return functools.partial(
            MLA,
            embed_dim=config.n_embd,
            num_heads=config.n_head,
            kv_lora_rank=config.kv_lora_rank,
            q_lora_rank=config.q_lora_rank,
            qk_nope_head_dim=config.qk_nope_head_dim or head_dim,
            qk_rope_head_dim=config.qk_rope_head_dim,
            v_head_dim=config.v_head_dim or head_dim,
            rotary_emb_base=config.rotary_emb_base,
            causal=True,
            dtype=config.dtype,
            layer_idx=layer_idx,
        )
    rotary_dim = int(config.rotary_emb_fraction * head_dim)
    return functools.partial(
        MHA,
        embed_dim=config.n_embd,
        num_heads=config.n_head,
        num_heads_kv=config.n_head_kv,
        head_dim=config.head_dim,
        qkv_proj_bias=config.qkv_proj_bias,
        out_proj_bias=config.out_proj_bias,
        dropout=config.attn_pdrop,
        causal=True,
        window_size=config.window_size,
        softcap=config.softcap,
        use_alibi=config.use_alibi,
        rotary_emb_dim=rotary_dim,
        rotary_emb_base=config.rotary_emb_base,
        rotary_emb_interleaved=config.rotary_emb_interleaved,
        dtype=config.dtype,
        layer_idx=layer_idx,
    )


def _mlp_factory(config: GPTConfig):
    gated = config.activation_function in ("swiglu", "silu", "glu", "swiglu_gelu")
    if gated:
        return functools.partial(
            GatedMlp,
            in_features=config.n_embd,
            hidden_features=config.n_inner,
            activation=config.activation_function
            if config.activation_function in ("glu", "swiglu_gelu") else "silu",
            bias1=config.mlp_fc1_bias,
            bias2=config.mlp_fc2_bias,
            dtype=config.dtype,
        )
    return functools.partial(
        Mlp,
        in_features=config.n_embd,
        hidden_features=config.n_inner or 4 * config.n_embd,
        activation=config.activation_function,
        bias1=config.mlp_fc1_bias,
        bias2=config.mlp_fc2_bias,
        dtype=config.dtype,
    )


class GPTModel(nn.Module):
    config: GPTConfig

    def setup(self):
        c = self.config
        self.embeddings = GPT2Embeddings(
            embed_dim=c.n_embd,
            vocab_size=c.padded_vocab_size,
            max_position_embeddings=c.n_positions,
            dtype=c.dtype,
            name="embeddings",
        )
        self.layers = [
            Block(
                dim=c.n_embd,
                mixer=_mixer_factory(c, i),
                mlp=_mlp_factory(c),
                norm_eps=c.layer_norm_epsilon,
                prenorm=c.prenorm,
                resid_dropout1=c.embd_pdrop if i == 0 else c.resid_pdrop,
                resid_dropout2=c.resid_pdrop,
                residual_in_fp32=c.residual_in_fp32,
                rms_norm=c.rms_norm,
                parallel_block=c.parallel_block,
                parallel_block_tied_norm=c.parallel_block_tied_norm,
                dtype=c.dtype,
                name=f"layers_{i}",
            )
            for i in range(c.n_layer)
        ]
        norm_cls = nn.RMSNorm if c.rms_norm else nn.LayerNorm
        self.ln_f = norm_cls(
            epsilon=c.layer_norm_epsilon, dtype=jnp.float32, name="ln_f"
        )

    def __call__(
        self,
        input_ids: jnp.ndarray,  # (b, s)
        position_ids: Optional[jnp.ndarray] = None,
        inference_params: Optional[InferenceParams] = None,
        *,
        deterministic: bool = True,
    ):
        c = self.config
        if position_ids is None and c.n_positions > 0:
            if inference_params is not None:
                offset = inference_params.seqlen_offset
            else:
                offset = 0
            base = c.position_offset
            if isinstance(offset, int):
                position_ids = (
                    base + offset + jnp.arange(input_ids.shape[1])[None, :]
                )
            else:
                position_ids = (
                    base
                    + jnp.asarray(offset)[:, None]
                    + jnp.arange(input_ids.shape[1])[None, :]
                )
        hidden = self.embeddings(input_ids, position_ids)
        if c.embed_scale is not None:
            hidden = hidden * jnp.asarray(c.embed_scale, c.dtype)
        # Rematerialize blocks during training: trade recompute FLOPs for
        # activation memory so bigger batches fit (jax.checkpoint / nn.remat
        # replaces the reference's activation-checkpoint callbacks).
        use_remat = c.remat != "none" and inference_params is None
        if use_remat:
            policy = (
                jax.checkpoint_policies.dots_with_no_batch_dims_saveable
                if c.remat == "dots" else None
            )

        if c.prenorm:
            residual = None
            if use_remat:
                def body(mdl, h, r):
                    return mdl(h, r, None, deterministic=deterministic)

                body = nn.remat(body, prevent_cse=False, policy=policy)
            for layer in self.layers:
                if use_remat:
                    hidden, residual = body(layer, hidden, residual)
                else:
                    hidden, residual = layer(
                        hidden, residual, inference_params=inference_params,
                        deterministic=deterministic,
                    )
            residual = residual + hidden.astype(residual.dtype)
            hidden = self.ln_f(residual).astype(c.dtype)
        else:
            if use_remat:
                def body_post(mdl, h):
                    return mdl(h, None, None, deterministic=deterministic)

                body_post = nn.remat(
                    body_post, prevent_cse=False, policy=policy
                )
            for layer in self.layers:
                if use_remat:
                    hidden = body_post(layer, hidden)
                else:
                    hidden = layer(
                        hidden, inference_params=inference_params,
                        deterministic=deterministic,
                    )
        return hidden


class GPTLMHeadModel(nn.Module):
    """LM-head model; .generate comes from the runtime GenerationMixin
    (reference attaches the same mixin, models/gpt.py:577)."""

    config: GPTConfig

    def generate(self, params, input_ids, max_length, **kw):
        from flash_attn_tpu.runtime.generation import GenerationMixin

        return GenerationMixin.generate(
            self, params, input_ids, max_length, **kw
        )

    def setup(self):
        self.transformer = GPTModel(self.config, name="transformer")
        if not self.config.tie_word_embeddings:
            self.lm_head = nn.Dense(
                self.config.padded_vocab_size, use_bias=False,
                dtype=self.config.dtype, name="lm_head",
            )

    def __call__(
        self,
        input_ids,
        position_ids=None,
        inference_params: Optional[InferenceParams] = None,
        num_last_tokens: int = 0,
        *,
        deterministic: bool = True,
    ):
        """Returns logits (b, s or num_last_tokens, padded_vocab)."""
        hidden = self.transformer(
            input_ids, position_ids, inference_params,
            deterministic=deterministic,
        )
        if num_last_tokens > 0:
            hidden = hidden[:, -num_last_tokens:]
        if self.config.tie_word_embeddings:
            wte = self.transformer.embeddings.variables["params"][
                "word_embeddings"
            ]["embedding"]
            logits = hidden @ wte.T.astype(hidden.dtype)
        else:
            logits = self.lm_head(hidden)
        return logits

    def forward_hidden(self, input_ids, position_ids=None, *,
                       deterministic: bool = True):
        """Final hidden states WITHOUT the lm_head projection — pair with
        losses.fused_linear_cross_entropy + head_weight_from_params so the
        full-vocab logits are never materialized during training."""
        return self.transformer(
            input_ids, position_ids, deterministic=deterministic
        )


    def allocate_inference_cache(
        self, batch_size: int, max_seqlen: int, dtype=None
    ) -> InferenceParams:
        """Maps flash_attn/utils/generation.py:589 allocate_inference_cache."""
        from flash_attn_tpu.runtime.kv_cache import allocate_kv_cache

        c = self.config
        hk = c.n_head_kv if c.n_head_kv is not None else c.n_head
        d = c.head_dim if c.head_dim is not None else c.n_embd // c.n_head
        if c.attn_type == "mla":
            # Latent cache: (rope, latent) with ONE kv head — the MLA
            # memory win (kv_lora_rank + qk_rope_head_dim per token).
            dt = dtype or c.dtype
            caches = {
                i: (
                    jnp.zeros(
                        (batch_size, 1, max_seqlen, c.qk_rope_head_dim), dt
                    ),
                    jnp.zeros(
                        (batch_size, 1, max_seqlen, c.kv_lora_rank), dt
                    ),
                )
                for i in range(c.n_layer)
            }
        else:
            caches = {
                i: allocate_kv_cache(
                    batch_size, max_seqlen, hk, d, dtype or c.dtype
                )
                for i in range(c.n_layer)
            }
        return InferenceParams(
            max_seqlen=max_seqlen,
            max_batch_size=batch_size,
            seqlen_offset=0,
            key_value_memory_dict=caches,
        )


def head_weight_from_params(params, config) -> "jnp.ndarray":
    """The (padded_vocab, n_embd) LM-head weight from a params pytree
    (tied: the embedding table; untied: lm_head kernel transposed)."""
    p = params.get("params", params)
    if config.tie_word_embeddings:
        return p["transformer"]["embeddings"]["word_embeddings"]["embedding"]
    return p["lm_head"]["kernel"].T
