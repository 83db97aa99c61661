"""RoBERTa embeddings + encoder layers (HF RobertaModel parity).

The reference's CrossAttentionVitVQAModel dismembers an HF roberta-base into
``.embeddings`` and ``.encoder.layer[i]`` and drives the layers directly on a
concatenated image+text sequence with NO attention mask
(vit_vqa_model.py:41-51, 99-103). Only those two pieces are needed, so only
they are implemented:

  * RobertaEmbeddings: word + learned position (ids offset by padding_idx=1,
    pads pinned at padding_idx) + token-type(0) -> LayerNorm -> dropout.
  * RobertaLayer: post-LN BERT block — self-attn (1/sqrt(d) scaled) ->
    dense+dropout -> LN(x+h); GELU intermediate -> dense+dropout -> LN(x+h).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


@dataclasses.dataclass(frozen=True)
class RobertaConfig:
    vocab_size: int = 50265
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 514
    type_vocab_size: int = 1
    layer_norm_eps: float = 1e-5
    dropout_rate: float = 0.1
    pad_token_id: int = 1

    @classmethod
    def roberta_base(cls) -> "RobertaConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "RobertaConfig":
        return cls(vocab_size=128, hidden_size=32, num_layers=2, num_heads=4,
                   intermediate_size=64, max_position_embeddings=40)


class RobertaEmbeddings(nn.Module):
    config: RobertaConfig = RobertaConfig.roberta_base()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        cfg = self.config
        # create_position_ids_from_input_ids: pads stay at padding_idx,
        # real tokens count up from padding_idx+1.
        mask = (input_ids != cfg.pad_token_id).astype(jnp.int32)
        position_ids = jnp.cumsum(mask, axis=1) * mask + cfg.pad_token_id

        word = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=self.dtype,
                        name="word_embeddings")(input_ids)
        pos = nn.Embed(cfg.max_position_embeddings, cfg.hidden_size,
                       dtype=self.dtype, name="position_embeddings")(position_ids)
        tok = nn.Embed(cfg.type_vocab_size, cfg.hidden_size, dtype=self.dtype,
                       name="token_type_embeddings")(
            jnp.zeros_like(input_ids))
        x = word + tok + pos
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="LayerNorm")(x)
        return nn.Dropout(cfg.dropout_rate)(x, deterministic=deterministic)


class RobertaLayer(nn.Module):
    config: RobertaConfig = RobertaConfig.roberta_base()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        cfg = self.config
        B, S, _ = x.shape
        head_dim = cfg.hidden_size // cfg.num_heads

        def heads(name):
            y = nn.Dense(cfg.hidden_size, dtype=self.dtype, name=name)(x)
            return y.reshape(B, S, cfg.num_heads, head_dim).transpose(0, 2, 1, 3)

        q, k, v = heads("query"), heads("key"), heads("value")
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores / jnp.sqrt(jnp.asarray(head_dim, jnp.float32))
        att = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", att, v,
                         preferred_element_type=jnp.float32).astype(self.dtype)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, S, cfg.hidden_size)

        h = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="attention_output")(ctx)
        h = nn.Dropout(cfg.dropout_rate)(h, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="attention_LayerNorm")(x + h)

        inter = nn.Dense(cfg.intermediate_size, dtype=self.dtype,
                         name="intermediate")(x)
        inter = nn.gelu(inter, approximate=False)
        h = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="output")(inter)
        h = nn.Dropout(cfg.dropout_rate)(h, deterministic=deterministic)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                            name="output_LayerNorm")(x + h)
