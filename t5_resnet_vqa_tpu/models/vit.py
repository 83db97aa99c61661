"""ViT-base vision tower (HF ViTModel parity), TPU-native.

The reference uses frozen ``ViTModel.from_pretrained(
"google/vit-base-patch16-224-in21k")`` and consumes ``pooler_output``
(vit_vqa_model.py:183-186) plus, for the heatmap path, the per-layer attention
maps (``output_attentions=True``, :243-245). This implementation mirrors the
HF ViT graph exactly:

  * patch embedding = 16x16/s16 conv over NHWC pixel_values + CLS token +
    learned position embeddings (197 tokens at 224^2)
  * pre-norm encoder blocks, LayerNorm eps 1e-12, erf-GELU MLP,
    scaled (1/sqrt(64)) softmax attention
  * final LayerNorm; pooler = tanh(Dense) over the CLS token

``return_attentions=True`` also returns the stacked per-layer attention maps
[num_layers, B, heads, S, S] for the attention-rollout visualizer
(viz/heatmap.py), replacing the reference's output_attentions tuple.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_dim: int = 3072
    patch_size: int = 16
    image_size: int = 224
    layer_norm_eps: float = 1e-12
    dropout_rate: float = 0.0    # in21k checkpoint ships 0.0
    # fused Pallas attention. In ISOLATION the kernel beats the XLA einsum
    # path at this geometry (313 vs 490 us/attention at B=64, bit-identical;
    # 710 vs 974 us at B=128 — benchmarks/bench_attn_pallas_vs_xla.py), but
    # inside the full 12-layer tower the custom call blocks XLA's
    # cross-op fusion/overlap and the tower REGRESSES (B=64: 23.8 vs 23.4
    # ms; B=128: 58.2 vs 51.5 ms — benchmarks/profile_vit_family.py), so
    # the default stays False on measurement. Flipping it on is safe
    # (numerics identical; jnp fallback off-TPU and whenever attention
    # maps are requested).
    use_pallas: bool = False

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @classmethod
    def vit_base(cls) -> "ViTConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "ViTConfig":
        return cls(hidden_size=32, num_layers=2, num_heads=4, mlp_dim=64,
                   patch_size=8, image_size=32)


class ViTSelfAttention(nn.Module):
    config: ViTConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True,
                 need_attention: bool = False):
        cfg = self.config
        B, S, _ = x.shape
        head_dim = cfg.hidden_size // cfg.num_heads

        def heads(name):
            y = nn.Dense(cfg.hidden_size, dtype=self.dtype, name=name)(x)
            return y.reshape(B, S, cfg.num_heads, head_dim).transpose(0, 2, 1, 3)

        q, k, v = heads("query"), heads("key"), heads("value")
        if cfg.use_pallas and not need_attention:
            # VMEM-resident fused kernel (jnp fallback off-TPU); the scaled
            # softmax(QK^T)V math is identical — see ops/pallas/attention.py
            from ..ops.pallas.attention import fused_attention_grad_safe
            ctx = fused_attention_grad_safe(q, k, v).astype(self.dtype)
            att = None
        else:
            scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                                preferred_element_type=jnp.float32)
            scores = scores / jnp.sqrt(jnp.asarray(head_dim, jnp.float32))
            att = jax.nn.softmax(scores, axis=-1)
            ctx = jnp.einsum(
                "bhqk,bhkd->bhqd", att.astype(self.dtype), v,
                preferred_element_type=jnp.float32).astype(self.dtype)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, S, cfg.hidden_size)
        out = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="out")(ctx)
        return out, att


class ViTLayer(nn.Module):
    config: ViTConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True,
                 need_attention: bool = False):
        cfg = self.config
        ln = lambda name: nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                                       dtype=self.dtype, name=name)
        att, att_map = ViTSelfAttention(cfg, dtype=self.dtype,
                                        name="attention")(
            ln("layernorm_before")(x), deterministic, need_attention)
        x = x + att
        h = ln("layernorm_after")(x)
        h = nn.Dense(cfg.mlp_dim, dtype=self.dtype, name="intermediate")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="output")(h)
        return x + h, att_map


class ViTModel(nn.Module):
    config: ViTConfig = ViTConfig.vit_base()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        pixel_values: jnp.ndarray,      # [B, H, W, 3] NHWC
        deterministic: bool = True,
        return_attentions: bool = False,
    ):
        cfg = self.config
        B = pixel_values.shape[0]

        patches = nn.Conv(
            cfg.hidden_size, (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
            dtype=self.dtype, name="patch_embeddings",
        )(pixel_values)                                  # [B, h, w, D]
        patches = patches.reshape(B, -1, cfg.hidden_size)

        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, cfg.hidden_size))
        pos = self.param("position_embeddings", nn.initializers.zeros,
                         (1, cfg.num_patches + 1, cfg.hidden_size))
        x = jnp.concatenate([jnp.tile(cls.astype(self.dtype), (B, 1, 1)),
                             patches], axis=1)
        x = x + pos.astype(self.dtype)

        att_maps = []
        for i in range(cfg.num_layers):
            x, att = ViTLayer(cfg, dtype=self.dtype, name=f"layer_{i}")(
                x, deterministic, need_attention=return_attentions)
            if return_attentions:
                att_maps.append(att)

        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="layernorm")(x)
        pooled = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="pooler")(
            x[:, 0])
        pooled = jnp.tanh(pooled)

        if return_attentions:
            return x, pooled, jnp.stack(att_maps, axis=0)
        return x, pooled
