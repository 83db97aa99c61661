"""Feature Pyramid Network over the ResNet50 backbone (faster-rcnn variant).

The reference's "faster-rcnn" vision tower is
``fasterrcnn_resnet50_fpn(pretrained=True).backbone`` — a ResNet50 body with
frozen BatchNorm plus a torchvision FPN with a LastLevelMaxPool extra block —
of which the VQA model consumes only the ``'pool'`` level [B, 256, 4, 4]
(faster_rcnn_vqa_model.py:51-53, 102-106); ``generate_answers`` surfaces all
levels {'0','1','2','3','pool'} for the heatmap CLI (:153-161).

Graph (torchvision FPN semantics):
  inner_i = Conv1x1(C_i)        (lateral, 256ch, with bias)
  top-down: inner_i += nearest_upsample_2x(inner_{i+1})
  P_i = Conv3x3(inner_i)        (output smoothing, with bias)
  pool = max_pool(P5, kernel 1, stride 2)
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class FPN(nn.Module):
    """Top-down FPN; input [C2, C3, C4, C5] NHWC, returns the torchvision

    level dict {'0','1','2','3','pool'}."""

    out_channels: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        n = len(feats)
        inners = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name=f"inner_{i}")(feats[i])
            for i in range(n)
        ]
        # top-down pathway with nearest 2x upsampling
        results = [None] * n
        last = inners[-1]
        results[-1] = last
        for i in range(n - 2, -1, -1):
            B, H, W, C = inners[i].shape
            up = jax.image.resize(last, (B, H, W, C), method="nearest")
            last = inners[i] + up
            results[i] = last
        outs = {
            str(i): nn.Conv(self.out_channels, (3, 3), padding=1,
                            dtype=self.dtype, name=f"layer_{i}")(results[i])
            for i in range(n)
        }
        # LastLevelMaxPool: kernel 1, stride 2 == strided subsample
        outs["pool"] = outs[str(n - 1)][:, ::2, ::2, :]
        return outs
