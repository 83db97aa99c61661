"""Fusion ops: multi-head attention, SGA blocks, pooling, channel projection.

Single-implementation parity with the reference's SGA stack
(/root/reference/model/multi_head_vision_text_attn.py) and AttentionPooler
(resnet_vqa_model.py:14-26 — duplicated 3x there, implemented once here).

Math contract (verified by tests/test_ops_parity.py against the torch
reference module):
  * MHAtt (ref :26-86): per-head scores = q k^T / sqrt(d_head); positions where
    ``mask`` is True are filled with -1e9 before softmax; attention-map dropout;
    merge linear.
  * SGA (ref :128-158): x = LN(x + drop(self_att(x))); x = LN(x + drop(
    cross_att(q=x, kv=y))); x = LN(x + drop(mlp(x))); LayerNorm eps 1e-5
    (torch default), ReLU MLP fc1->dropout->fc2 (ref :89-101).
  * AttentionPooler: softmax(Linear(h->1)) over the sequence axis, weighted sum.

TPU notes: everything is batched matmul on the MXU; the attention inner loop
optionally routes through the fused Pallas kernel in ops/pallas/attention.py
(``use_pallas=True``) — numerically equivalent, validated by tests.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core import constants

Dtype = Any


@dataclasses.dataclass(frozen=True)
class AttentionConfig:
    """SGA geometry (reference TextConfiguration/ImageConfiguration,

    multi_head_vision_text_attn.py:7-24 — the two are identical)."""
    hidden_size: int = constants.HIDDEN_SIZE
    num_heads: int = constants.SGA_NUM_HEADS
    ff_size: int = constants.SGA_FF_SIZE
    dropout_rate: float = constants.SGA_DROPOUT

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    *,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    deterministic: bool = True,
    use_pallas: bool = False,
) -> jnp.ndarray:
    """Scaled dot-product attention over [B, H, Sq, D] / [B, H, Sk, D].

    ``mask`` marks *masked* positions with True (torch masked_fill semantics,
    ref multi_head_vision_text_attn.py:80-81), broadcastable to
    [B, H, Sq, Sk]. Returns [B, H, Sq, D].
    """
    if use_pallas and deterministic and mask is None:
        from .pallas.attention import fused_attention
        out = fused_attention(q, k, v)
        if out is not None:
            return out

    d_k = q.shape[-1]
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) / jnp.sqrt(jnp.asarray(d_k, jnp.float32))
    if mask is not None:
        scores = jnp.where(mask, jnp.asarray(-1e9, scores.dtype), scores)
    att = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    if not deterministic and dropout_rate > 0.0:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, att.shape)
        att = jnp.where(keep, att / (1.0 - dropout_rate), 0.0)
    return jnp.einsum("bhqk,bhkd->bhqd", att, v, preferred_element_type=jnp.float32).astype(q.dtype)


class MultiHeadAttention(nn.Module):
    """MHAtt parity (multi_head_vision_text_attn.py:26-86)."""

    config: AttentionConfig = AttentionConfig()
    dtype: Dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(
        self,
        v: jnp.ndarray,
        k: jnp.ndarray,
        q: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        cfg = self.config
        B, Sq = q.shape[0], q.shape[1]

        def heads(x, name):
            y = nn.Dense(cfg.hidden_size, dtype=self.dtype, name=name)(x)
            return y.reshape(B, -1, cfg.num_heads, cfg.head_dim).transpose(0, 2, 1, 3)

        vh = heads(v, "linear_v")
        kh = heads(k, "linear_k")
        qh = heads(q, "linear_q")

        dropout_rng = None
        if not deterministic and cfg.dropout_rate > 0.0:
            dropout_rng = self.make_rng("dropout")

        atted = dot_product_attention(
            qh, kh, vh, mask,
            dropout_rate=cfg.dropout_rate,
            dropout_rng=dropout_rng,
            deterministic=deterministic,
            use_pallas=self.use_pallas,
        )
        atted = atted.transpose(0, 2, 1, 3).reshape(B, Sq, cfg.hidden_size)
        return nn.Dense(cfg.hidden_size, dtype=self.dtype, name="linear_merge")(atted)


class MLP(nn.Module):
    """fc1 -> ReLU -> dropout -> fc2 (multi_head_vision_text_attn.py:89-101)."""

    mid_size: int
    out_size: int
    dropout_rate: float = constants.SGA_DROPOUT
    use_relu: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        x = nn.Dense(self.mid_size, dtype=self.dtype, name="fc1")(x)
        if self.use_relu:
            x = nn.relu(x)
        x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        return nn.Dense(self.out_size, dtype=self.dtype, name="fc2")(x)


class FFN(nn.Module):
    """FFN wrapper (multi_head_vision_text_attn.py:104-117)."""

    config: AttentionConfig = AttentionConfig()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        return MLP(
            mid_size=self.config.ff_size,
            out_size=self.config.hidden_size,
            dropout_rate=self.config.dropout_rate,
            dtype=self.dtype,
            name="mlp",
        )(x, deterministic=deterministic)


class SGA(nn.Module):
    """Self-Guided Attention block (multi_head_vision_text_attn.py:128-158).

    x: text-side stream [B, Sx, H]; y: guiding stream [B, Sy, H].
    The VQA models call this unmasked (resnet_vqa_model.py:147-149 passes no
    masks); x_mask/y_mask are supported for completeness.
    """

    config: AttentionConfig = AttentionConfig()
    dtype: Dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        y: jnp.ndarray,
        x_mask: Optional[jnp.ndarray] = None,
        y_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        cfg = self.config
        drop = lambda z: nn.Dropout(cfg.dropout_rate)(z, deterministic=deterministic)
        # torch nn.LayerNorm default eps=1e-5 (ref LayerNorm wrapper :120-126)
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=name)

        x = ln("norm1")(x + drop(
            MultiHeadAttention(cfg, dtype=self.dtype, use_pallas=self.use_pallas,
                               name="mhatt1")(x, x, x, x_mask, deterministic)
        ))
        x = ln("norm2")(x + drop(
            MultiHeadAttention(cfg, dtype=self.dtype, use_pallas=self.use_pallas,
                               name="mhatt2")(y, y, x, y_mask, deterministic)
        ))
        x = ln("norm3")(x + drop(
            FFN(cfg, dtype=self.dtype, name="ffn")(x, deterministic)
        ))
        return x


class SGAStack(nn.Module):
    """The models' 3-deep SGA loop (resnet_vqa_model.py:147-149):

    each iteration re-reads the *fresh* text states as x and feeds the previous
    fused output as y; the first y is the flattened vision map."""

    num_blocks: int = constants.SGA_DEFAULT_BLOCKS
    config: AttentionConfig = AttentionConfig()
    dtype: Dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(
        self,
        text_states: jnp.ndarray,
        vision_states: jnp.ndarray,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        y = vision_states
        for i in range(self.num_blocks):
            y = SGA(self.config, dtype=self.dtype, use_pallas=self.use_pallas,
                    name=f"sga_{i}")(text_states, y, deterministic=deterministic)
        return y


class AttentionPooler(nn.Module):
    """Linear(h->1) + softmax over sequence + weighted sum

    (resnet_vqa_model.py:14-26; one implementation for all model families)."""

    hidden_size: int = constants.HIDDEN_SIZE
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: [B, S, H] -> [B, H]
        w = nn.Dense(1, dtype=self.dtype, name="attention")(x)      # [B, S, 1]
        w = jax.nn.softmax(w, axis=1)
        return jnp.einsum("bsh,bso->bh", x, w, preferred_element_type=jnp.float32).astype(x.dtype)


class ChannelProjection(nn.Module):
    """The reference's ConvTranspose2d(k3, s1, p1) channel up/down-scaler

    (resnet_vqa_model.py:64-78, faster_rcnn_vqa_model.py:59-65). With stride 1
    and padding 1 a transposed conv is exactly a standard 3x3 SAME conv with a
    spatially-flipped, in/out-swapped kernel, so it is implemented as a plain
    NHWC conv (MXU-friendly); the torch->jax converter performs the flip.
    """

    out_channels: int = constants.HIDDEN_SIZE
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: [B, H, W, C] -> [B, H, W, out_channels]
        return nn.Conv(
            self.out_channels, (3, 3), strides=(1, 1), padding=1,
            dtype=self.dtype, name="conv",
        )(x)


def log_softmax_nll(
    logits: jnp.ndarray, labels: Optional[jnp.ndarray],
    temperature: float = 1.0
) -> tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """log_softmax + mean NLL, the classification head shared by every model
    (resnet_vqa_model.py:156-162). Returns (log_probs, loss|None).

    ``temperature`` completes the reference's DECLARED-but-dead calibration
    intent ("Implement temperature scaling", resnet_vqa_model.py:44; the
    unused ``temperature_scaler = 1.5`` at :99 and the commented
    ``lm_logits/self.temperature_scaler`` at :155): logits divide by T
    before the softmax — T > 1 flattens the probability mass without
    changing the argmax ranking (serving top-k calibration)."""
    if temperature != 1.0:
        logits = logits / temperature
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    if labels is None:
        return log_probs, None
    nll = -jnp.take_along_axis(log_probs, labels[:, None], axis=-1)[:, 0]
    return log_probs, jnp.mean(nll)
