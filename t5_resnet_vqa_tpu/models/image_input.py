"""On-device image finalization for the uint8 wire format.

The collates can ship resized uint8 images (``emit_uint8`` /
``dataset_kwargs.uint8_wire_images``) so the host->device transfer carries
1 byte/pixel instead of 4; the /255 rescale (ToTensor parity,
resnet_vqa_daquar_dataset.py:134-138) and the ViT processor's mean/std
normalization (vit_vqa_daquar_dataset.py:108) then run as the model's first
device op. fp32 inputs pass through untouched, so the float host path stays
bit-identical to the reference collate.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp


def finalize_image_input(
    x: jnp.ndarray,
    normalize: Optional[Tuple[Sequence[float], Sequence[float]]] = None,
) -> jnp.ndarray:
    """uint8 [B, H, W, 3] -> fp32 in [0,1], optionally (x - mean) / std.

    The math matches the host-side ``data.preprocessing.finalize_image``
    exactly (fp32 division/subtraction in the same order), so uint8-wire and
    fp32-wire feeds produce identical logits.
    """
    if x.dtype == jnp.uint8:
        x = x.astype(jnp.float32) / 255.0
        if normalize is not None:
            mean, std = normalize
            x = (x - jnp.asarray(mean, jnp.float32)) / jnp.asarray(
                std, jnp.float32)
    return x
