"""ResNet-18/34/50 vision backbone, TPU-native (NHWC, frozen BatchNorm).

The reference uses torchvision resnet18/34/50 run *frozen* — forced ``.eval()``
under ``torch.no_grad()``, traversing all modules except avgpool/fc
(resnet_vqa_model.py:115-135) — so BatchNorm is always a constant affine
transform. This implementation bakes that in: ``FrozenBatchNorm`` holds the
folded (scale, bias) pair (see utils/torch_convert.frozen_batchnorm), the
backbone output is wrapped in ``stop_gradient`` by the VQA models, and all
convs run in NHWC (XLA's preferred TPU layout; the data pipeline emits NHWC).

Architecture parity: torchvision ResNet v1.5 — 7x7/s2 stem + 3x3/s2 maxpool,
BasicBlock (18/34) / Bottleneck with stride on the 3x3 (50). Verified against
randomly-initialized HF ``transformers.ResNetModel`` (the same v1.5 graph,
microsoft/resnet-50 lineage) in tests/test_resnet_parity.py.

For a 256x256 input the final stage yields an 8x8 map — the 64 vision tokens
consumed by the SGA stack (resnet_vqa_model.py:142-143).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

# (block type, stage depths, stage base widths, expansion)
_VARIANTS = {
    "resnet18": ("basic", (2, 2, 2, 2), (64, 128, 256, 512), 1),
    "resnet34": ("basic", (3, 4, 6, 3), (64, 128, 256, 512), 1),
    "resnet50": ("bottleneck", (3, 4, 6, 3), (64, 128, 256, 512), 4),
}


def resnet_out_channels(variant: str) -> int:
    _, _, widths, expansion = _VARIANTS[variant]
    return widths[-1] * expansion


class FrozenBatchNorm(nn.Module):
    """Eval-mode BatchNorm folded to y = x*scale + bias (per channel)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return x * scale.astype(self.dtype) + bias.astype(self.dtype)


def _conv(features: int, kernel: int, stride: int, name: str, dtype) -> nn.Conv:
    pad = (kernel - 1) // 2
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   padding=pad, use_bias=False, dtype=dtype, name=name)


class BasicBlock(nn.Module):
    width: int
    stride: int = 1
    has_downsample: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        identity = x
        out = _conv(self.width, 3, self.stride, "conv1", self.dtype)(x)
        out = FrozenBatchNorm(self.width, self.dtype, name="bn1")(out)
        out = nn.relu(out)
        out = _conv(self.width, 3, 1, "conv2", self.dtype)(out)
        out = FrozenBatchNorm(self.width, self.dtype, name="bn2")(out)
        if self.has_downsample:
            identity = _conv(self.width, 1, self.stride, "downsample_conv",
                             self.dtype)(x)
            identity = FrozenBatchNorm(self.width, self.dtype,
                                       name="downsample_bn")(identity)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    """v1.5 bottleneck: 1x1 reduce, 3x3 (carries the stride), 1x1 expand."""

    width: int                      # base width; output is width * 4
    stride: int = 1
    has_downsample: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out_ch = self.width * 4
        identity = x
        out = _conv(self.width, 1, 1, "conv1", self.dtype)(x)
        out = FrozenBatchNorm(self.width, self.dtype, name="bn1")(out)
        out = nn.relu(out)
        out = _conv(self.width, 3, self.stride, "conv2", self.dtype)(out)
        out = FrozenBatchNorm(self.width, self.dtype, name="bn2")(out)
        out = nn.relu(out)
        out = _conv(out_ch, 1, 1, "conv3", self.dtype)(out)
        out = FrozenBatchNorm(out_ch, self.dtype, name="bn3")(out)
        if self.has_downsample:
            identity = _conv(out_ch, 1, self.stride, "downsample_conv",
                             self.dtype)(x)
            identity = FrozenBatchNorm(out_ch, self.dtype,
                                       name="downsample_bn")(identity)
        return nn.relu(out + identity)


class ResNetBackbone(nn.Module):
    """Stem + 4 stages; returns the per-stage feature maps [C2, C3, C4, C5]

    (NHWC). The CNN VQA models take C5; the FPN (faster-rcnn variant)
    consumes all four."""

    variant: str = "resnet50"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        block_type, depths, widths, expansion = _VARIANTS[self.variant]
        block_cls = BasicBlock if block_type == "basic" else Bottleneck

        x = _conv(64, 7, 2, "conv1", self.dtype)(x)
        x = FrozenBatchNorm(64, self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        feats = []
        in_ch = 64
        for stage, (depth, width) in enumerate(zip(depths, widths)):
            stride = 1 if stage == 0 else 2
            out_ch = width * expansion
            for b in range(depth):
                x = block_cls(
                    width=width,
                    stride=stride if b == 0 else 1,
                    has_downsample=(b == 0 and (stride != 1 or in_ch != out_ch)),
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_block{b}",
                )(x)
            in_ch = out_ch
            feats.append(x)
        return feats
