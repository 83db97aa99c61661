"""T5 encoder/decoder stack, implemented from scratch for TPU.

The reference consumes HF ``T5ForQuestionAnswering.from_pretrained("t5-base")
.encoder`` for the CNN/FPN models (resnet_vqa_model.py:60-62) and the full
``T5ForConditionalGeneration`` encoder+decoder for the ViT model
(vit_vqa_model.py:147-148). This module reimplements the T5 architecture
natively in flax with static shapes:

  * RMSNorm (no mean subtraction, no bias), eps 1e-6, fp32 accumulation.
  * Attention WITHOUT 1/sqrt(d) scaling (T5 folds the scale into init).
  * Relative position bias: bucketed (32 buckets, max distance 128), embedded
    per head, owned by block 0 and shared by all blocks of a stack.
  * Pre-norm residual blocks, ReLU feed-forward (t5-base), all Dense no-bias.
  * Decoder: causal self-attention (relative bias, unidirectional buckets) +
    cross-attention (no bias) — used with a 1-token encoder memory by the ViT
    VQA model (vit_vqa_model.py:207-212).

Parity is asserted against randomly-initialized HF torch T5 models converted
through utils/torch_convert.convert_t5_* (tests/test_t5_parity.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any

# Large negative for masked logits. HF uses torch.finfo(dtype).min; any value
# that underflows softmax works — parity holds because masked weights are ~0.
_NEG_INF = -1e9


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 768
    d_kv: int = 64
    d_ff: int = 3072
    num_layers: int = 12
    num_decoder_layers: int = 12
    num_heads: int = 12
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    dropout_rate: float = 0.1
    layer_norm_epsilon: float = 1e-6
    # Run q/k/v (self-attn) and k/v (cross-attn) as ONE matmul against the
    # apply-time concatenation of the per-head kernels. Param tree and math
    # are unchanged (checkpoints interchangeable; grads flow through the
    # concat back to the separate kernels); the fusion triples the matmul's
    # N dim, better amortizing MXU weight loads at the encoder's small
    # M = B*16. Measured on the chip before defaulting (bench_t5_encoder.py).
    fused_qkv: bool = False

    @classmethod
    def t5_base(cls) -> "T5Config":
        return cls()

    @classmethod
    def tiny(cls) -> "T5Config":
        """Small geometry for fast unit tests."""
        return cls(vocab_size=256, d_model=32, d_kv=8, d_ff=64,
                   num_layers=2, num_decoder_layers=2, num_heads=4)


class RMSNorm(nn.Module):
    """T5LayerNorm: x * rsqrt(mean(x^2)+eps) * weight, fp32 accumulation."""

    epsilon: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        x32 = x.astype(jnp.float32)
        var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
        y = x32 * jax.lax.rsqrt(var + self.epsilon)
        return (y.astype(self.dtype) * scale.astype(self.dtype))


def relative_position_bucket(
    relative_position: jnp.ndarray,
    bidirectional: bool,
    num_buckets: int,
    max_distance: int,
) -> jnp.ndarray:
    """HF T5Attention._relative_position_bucket semantics."""
    ret = jnp.zeros_like(relative_position)
    n = -relative_position
    if bidirectional:
        num_buckets //= 2
        ret = ret + jnp.where(n < 0, num_buckets, 0)
        n = jnp.abs(n)
    else:
        n = jnp.maximum(n, 0)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-20)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


class T5Attention(nn.Module):
    config: T5Config
    has_relative_attention_bias: bool = False
    bidirectional: bool = True
    dtype: Dtype = jnp.float32

    def setup(self):
        cfg = self.config
        inner = cfg.num_heads * cfg.d_kv
        dense = lambda name: nn.Dense(inner, use_bias=False, dtype=self.dtype,
                                      name=name)
        self.q = dense("q")
        self.k = dense("k")
        self.v = dense("v")
        self.o = nn.Dense(cfg.d_model, use_bias=False, dtype=self.dtype, name="o")
        if self.has_relative_attention_bias:
            self.relative_attention_bias = nn.Embed(
                cfg.relative_attention_num_buckets, cfg.num_heads,
                dtype=jnp.float32, name="relative_attention_bias")

    def compute_bias(self, q_len: int, k_len: int) -> jnp.ndarray:
        """[1, heads, q_len, k_len] relative position bias."""
        ctx = jnp.arange(q_len)[:, None]
        mem = jnp.arange(k_len)[None, :]
        buckets = relative_position_bucket(
            mem - ctx, self.bidirectional,
            self.config.relative_attention_num_buckets,
            self.config.relative_attention_max_distance)
        values = self.relative_attention_bias(buckets)        # [q, k, heads]
        return values.transpose(2, 0, 1)[None]                # [1, h, q, k]

    def __call__(
        self,
        hidden_states: jnp.ndarray,
        key_value_states: Optional[jnp.ndarray] = None,
        position_bias: Optional[jnp.ndarray] = None,
        mask_bias: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        """Returns (output, position_bias). ``mask_bias`` is an additive
        [B, 1, q, k]-broadcastable bias (0 for keep, -1e9 for masked)."""
        cfg = self.config
        B, Sq = hidden_states.shape[:2]
        kv = key_value_states if key_value_states is not None else hidden_states
        Sk = kv.shape[1]

        def heads(proj, x):
            return proj(x).reshape(B, -1, cfg.num_heads, cfg.d_kv).transpose(0, 2, 1, 3)

        def split_heads(y):
            return y.reshape(B, -1, cfg.num_heads, cfg.d_kv).transpose(0, 2, 1, 3)

        inner = cfg.num_heads * cfg.d_kv
        if cfg.fused_qkv and not self.is_initializing():
            # one matmul against concat(Wq,Wk,Wv) (or concat(Wk,Wv) for
            # cross-attention); same math/params as the separate path —
            # self.variables reads the very kernels self.q/.k/.v declared
            kp = self.variables["params"]
            if key_value_states is None:
                w = jnp.concatenate(
                    [kp["q"]["kernel"], kp["k"]["kernel"], kp["v"]["kernel"]],
                    axis=1).astype(self.dtype)
                qkv = hidden_states @ w
                qh = split_heads(qkv[..., :inner])
                kh = split_heads(qkv[..., inner:2 * inner])
                vh = split_heads(qkv[..., 2 * inner:])
            else:
                qh = heads(self.q, hidden_states)
                w = jnp.concatenate(
                    [kp["k"]["kernel"], kp["v"]["kernel"]],
                    axis=1).astype(self.dtype)
                kvp = kv @ w
                kh = split_heads(kvp[..., :inner])
                vh = split_heads(kvp[..., inner:])
        else:
            qh = heads(self.q, hidden_states)
            kh = heads(self.k, kv)
            vh = heads(self.v, kv)

        # No 1/sqrt(d) — T5 semantics.
        scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                            preferred_element_type=jnp.float32)

        if position_bias is None:
            if self.has_relative_attention_bias:
                position_bias = self.compute_bias(Sq, Sk)
            else:
                position_bias = jnp.zeros((1, cfg.num_heads, Sq, Sk), jnp.float32)
            if mask_bias is not None:
                position_bias = position_bias + mask_bias.astype(jnp.float32)

        scores = scores + position_bias
        att = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
        if not deterministic and cfg.dropout_rate > 0.0:
            rng = self.make_rng("dropout")
            keep = jax.random.bernoulli(rng, 1.0 - cfg.dropout_rate, att.shape)
            att = jnp.where(keep, att / (1.0 - cfg.dropout_rate), 0.0)

        out = jnp.einsum("bhqk,bhkd->bhqd", att, vh,
                         preferred_element_type=jnp.float32).astype(self.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(B, Sq, cfg.num_heads * cfg.d_kv)
        return self.o(out), position_bias


class T5DenseReluDense(nn.Module):
    config: T5Config
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        cfg = self.config
        h = nn.Dense(cfg.d_ff, use_bias=False, dtype=self.dtype, name="wi")(x)
        h = nn.relu(h)
        h = nn.Dropout(cfg.dropout_rate)(h, deterministic=deterministic)
        return nn.Dense(cfg.d_model, use_bias=False, dtype=self.dtype, name="wo")(h)


class T5Block(nn.Module):
    config: T5Config
    has_relative_attention_bias: bool = False
    is_decoder: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        position_bias: Optional[jnp.ndarray] = None,
        mask_bias: Optional[jnp.ndarray] = None,
        encoder_hidden_states: Optional[jnp.ndarray] = None,
        encoder_mask_bias: Optional[jnp.ndarray] = None,
        encoder_decoder_position_bias: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        cfg = self.config
        drop = lambda z: nn.Dropout(cfg.dropout_rate)(z, deterministic=deterministic)

        normed = RMSNorm(cfg.layer_norm_epsilon, dtype=self.dtype,
                         name="self_attn_layer_norm")(x)
        att, position_bias = T5Attention(
            cfg, has_relative_attention_bias=self.has_relative_attention_bias,
            bidirectional=not self.is_decoder, dtype=self.dtype,
            name="self_attn",
        )(normed, position_bias=position_bias, mask_bias=mask_bias,
          deterministic=deterministic)
        x = x + drop(att)

        if self.is_decoder and encoder_hidden_states is not None:
            normed = RMSNorm(cfg.layer_norm_epsilon, dtype=self.dtype,
                             name="cross_attn_layer_norm")(x)
            att, encoder_decoder_position_bias = T5Attention(
                cfg, has_relative_attention_bias=False, bidirectional=True,
                dtype=self.dtype, name="cross_attn",
            )(normed, key_value_states=encoder_hidden_states,
              position_bias=encoder_decoder_position_bias,
              mask_bias=encoder_mask_bias, deterministic=deterministic)
            x = x + drop(att)

        normed = RMSNorm(cfg.layer_norm_epsilon, dtype=self.dtype,
                         name="ff_layer_norm")(x)
        x = x + drop(T5DenseReluDense(cfg, dtype=self.dtype, name="ff")(
            normed, deterministic=deterministic))
        return x, position_bias, encoder_decoder_position_bias


def attention_mask_bias(attention_mask: jnp.ndarray) -> jnp.ndarray:
    """[B, S] 1/0 mask -> additive [B, 1, 1, S] bias."""
    return ((1.0 - attention_mask.astype(jnp.float32)) * _NEG_INF)[:, None, None, :]


def causal_mask_bias(attention_mask: jnp.ndarray) -> jnp.ndarray:
    """[B, S] 1/0 mask -> additive causal [B, 1, S, S] bias (HF decoder
    semantics: causal triangle AND padding mask)."""
    B, S = attention_mask.shape
    causal = jnp.tril(jnp.ones((S, S), jnp.bool_))
    keep = causal[None, :, :] & (attention_mask[:, None, :] > 0)
    return jnp.where(keep, 0.0, _NEG_INF)[:, None, :, :].astype(jnp.float32)


class T5Encoder(nn.Module):
    """Encoder stack incl. shared embedding (HF T5EncoderModel parity).

    ``embed_tokens``: pass a parent-owned nn.Embed to TIE the token table
    with a sibling stack (T5ForConditionalGeneration shares ONE ``shared``
    between encoder and decoder — vit_vqa parity); default None owns its
    own table (encoder-only families, HF T5EncoderModel layout)."""

    config: T5Config
    dtype: Dtype = jnp.float32
    embed_tokens: Optional[nn.Module] = None

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        cfg = self.config
        embed = (self.embed_tokens if self.embed_tokens is not None
                 else nn.Embed(cfg.vocab_size, cfg.d_model, dtype=self.dtype,
                               name="shared"))
        x = embed(input_ids)
        x = nn.Dropout(cfg.dropout_rate)(x, deterministic=deterministic)

        mask_bias = (attention_mask_bias(attention_mask)
                     if attention_mask is not None else None)
        position_bias = None
        for i in range(cfg.num_layers):
            x, position_bias, _ = T5Block(
                cfg, has_relative_attention_bias=(i == 0), is_decoder=False,
                dtype=self.dtype, name=f"block_{i}",
            )(x, position_bias=position_bias, mask_bias=mask_bias,
              deterministic=deterministic)

        x = RMSNorm(cfg.layer_norm_epsilon, dtype=self.dtype,
                    name="final_layer_norm")(x)
        return nn.Dropout(cfg.dropout_rate)(x, deterministic=deterministic)


class T5Decoder(nn.Module):
    """Decoder stack incl. shared embedding.

    The ViT VQA model drives this with ``encoder_hidden_states`` of length 1
    (the fused image+question vector, vit_vqa_model.py:207-212).
    ``embed_tokens`` ties the token table with the encoder (see T5Encoder).
    """

    config: T5Config
    dtype: Dtype = jnp.float32
    embed_tokens: Optional[nn.Module] = None

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,
        encoder_hidden_states: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray] = None,
        encoder_attention_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        cfg = self.config
        embed = (self.embed_tokens if self.embed_tokens is not None
                 else nn.Embed(cfg.vocab_size, cfg.d_model, dtype=self.dtype,
                               name="shared"))
        x = embed(input_ids)
        x = nn.Dropout(cfg.dropout_rate)(x, deterministic=deterministic)

        if attention_mask is None:
            attention_mask = jnp.ones(input_ids.shape, jnp.int32)
        mask_bias = causal_mask_bias(attention_mask)
        enc_mask_bias = (attention_mask_bias(encoder_attention_mask)
                         if encoder_attention_mask is not None else None)

        position_bias = None
        encdec_bias = None
        for i in range(cfg.num_decoder_layers):
            x, position_bias, encdec_bias = T5Block(
                cfg, has_relative_attention_bias=(i == 0), is_decoder=True,
                dtype=self.dtype, name=f"block_{i}",
            )(x, position_bias=position_bias, mask_bias=mask_bias,
              encoder_hidden_states=encoder_hidden_states,
              encoder_mask_bias=enc_mask_bias,
              encoder_decoder_position_bias=encdec_bias,
              deterministic=deterministic)

        x = RMSNorm(cfg.layer_norm_epsilon, dtype=self.dtype,
                    name="final_layer_norm")(x)
        return nn.Dropout(cfg.dropout_rate)(x, deterministic=deterministic)
