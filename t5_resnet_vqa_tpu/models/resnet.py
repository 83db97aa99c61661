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

import jax
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


class StemConv(nn.Module):
    """The 7x7/s2 stem conv. Owns the standard HWIO [7,7,3,64] ``kernel``
    param (so converters/checkpoints are unchanged) and computes either the
    direct strided conv or the space-to-depth fast path."""

    features: int = 64
    dtype: Dtype = jnp.float32
    use_s2d: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        C = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(batch_axis=(), in_axis=-2,
                                         out_axis=-1),
            (7, 7, C, self.features))
        if self.use_s2d:
            return _space_to_depth_stem(x, kernel, self.dtype)
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            window_strides=(2, 2), padding=[(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=self.dtype)


def _space_to_depth_stem(x: jnp.ndarray, w7: jnp.ndarray,
                         dtype) -> jnp.ndarray:
    """The 7x7/s2 stem conv computed as a space-to-depth 4x4/s1 conv.

    With only 3 input channels the direct stem uses 3/128 of the MXU's
    contraction lanes; packing 2x2 pixel blocks into 12 channels (the MLPerf
    ResNet trick) quadruples lane utilization. Derivation: with left-pad 3,
    y[p] = sum_k x_pad[2p+k] w[k]; writing x_pad in 2-pixel blocks b[q][s]
    gives y[p] = sum_{m,s} b[p+m][s] w[2m+s] — a 4-tap VALID conv over blocks
    with channels (s_h, s_w, c). The stored weight layout stays the standard
    HWIO [7,7,3,64]; the repack below is a few-KB reshape that XLA hoists.
    Numerics are exact (same multiplies/adds), asserted in
    tests/test_resnet_parity.py::test_space_to_depth_stem_exact.
    """
    B, H, W, C = x.shape
    # pad: 3 left (conv padding), right up to even block coverage for
    # outputs p in [0, H/2): need x_pad index up to 2*(H/2-1)+6 = H+4
    x_pad = jnp.pad(x, ((0, 0), (3, 5), (3, 5), (0, 0)))
    Hp, Wp = x_pad.shape[1] // 2, x_pad.shape[2] // 2
    xb = x_pad.reshape(B, Hp, 2, Wp, 2, C).transpose(0, 1, 3, 2, 4, 5)
    xb = xb.reshape(B, Hp, Wp, 4 * C)                  # (s_h, s_w, c) packed

    # repack [7,7,C,O] -> [4,4,4C,O] with a zero 8th tap
    O = w7.shape[-1]
    w8 = jnp.pad(w7, ((0, 1), (0, 1), (0, 0), (0, 0)))
    wb = w8.reshape(4, 2, 4, 2, C, O).transpose(0, 2, 1, 3, 4, 5)
    wb = wb.reshape(4, 4, 4 * C, O)

    y = jax.lax.conv_general_dilated(
        xb.astype(dtype), wb.astype(dtype), window_strides=(1, 1),
        padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=dtype)
    return y[:, : H // 2, : W // 2, :]


def fused_backbone_apply(params, x: jnp.ndarray, *, variant: str = "resnet50",
                         dtype=jnp.bfloat16, stem_s2d: bool = True,
                         fuse_stages: Sequence[int] = (0, 1),
                         interpret=None) -> List[jnp.ndarray]:
    """ResNetBackbone.__call__ at apply level, with the bottleneck blocks of
    ``fuse_stages`` routed through the fused Pallas kernel
    (ops/pallas/bottleneck.py) — one VMEM-resident kernel per block instead
    of six HBM round-trips.

    EXPERIMENT SURFACE, not a production path: on the real chip the fused
    kernel measured 0.86x XLA on layer1 blocks and exactly tied on layer2
    (see the bottleneck.py module docstring for the full sweep), so no
    model routes through this — the production tower keeps XLA's conv
    pipeline, which the round-3 bisection showed is already within ~7% of
    its traffic roofline (benchmarks/resnet_stages.json).

    Same param tree and same returned [C2..C5] as the module; falls back to
    the module path per block whenever the kernel declines (non-TPU
    platform, stride-2 blocks under compilation, basic blocks).
    Forward-only (frozen tower). Numerics differ from the unfused path only
    by bf16 re-rounding of the folded BN scale (tolerance-pinned in
    tests/test_fused_bottleneck.py).
    """
    from ..ops.pallas.bottleneck import fused_bottleneck

    block_type, depths, widths, expansion = _VARIANTS[variant]
    block_cls = BasicBlock if block_type == "basic" else Bottleneck

    h = StemConv(dtype=dtype, use_s2d=stem_s2d).apply(
        {"params": params["conv1"]}, x)
    h = FrozenBatchNorm(64, dtype).apply({"params": params["bn1"]}, h)
    h = nn.relu(h)
    h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

    feats = []
    in_ch = 64
    for stage, (depth, width) in enumerate(zip(depths, widths)):
        stride = 1 if stage == 0 else 2
        out_ch = width * expansion
        for b in range(depth):
            b_stride = stride if b == 0 else 1
            has_ds = b == 0 and (stride != 1 or in_ch != out_ch)
            p = params[f"layer{stage + 1}_block{b}"]
            out = None
            if block_type == "bottleneck" and stage in fuse_stages:
                out = fused_bottleneck(h, p, stride=b_stride,
                                       has_downsample=has_ds,
                                       interpret=interpret)
            if out is None:
                out = block_cls(width=width, stride=b_stride,
                                has_downsample=has_ds, dtype=dtype).apply(
                    {"params": p}, h)
            h = out
        in_ch = out_ch
        feats.append(h)
    return feats


class ResNetBackbone(nn.Module):
    """Stem + 4 stages; returns the per-stage feature maps [C2, C3, C4, C5]

    (NHWC). The CNN VQA models take C5; the FPN (faster-rcnn variant)
    consumes all four. ``stem_s2d`` routes the 7x7/s2 stem through the
    space-to-depth fast path (identical math, ~4x stem speedup on TPU)."""

    variant: str = "resnet50"
    dtype: Dtype = jnp.float32
    stem_s2d: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        block_type, depths, widths, expansion = _VARIANTS[self.variant]
        block_cls = BasicBlock if block_type == "basic" else Bottleneck

        x = StemConv(dtype=self.dtype, use_s2d=self.stem_s2d,
                     name="conv1")(x)
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
