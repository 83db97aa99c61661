"""Faster-RCNN(ResNet50-FPN) + T5-encoder + SGA VQA model.

Parity target: /root/reference/model/faster_rcnn_vqa_model.py.
Identical skeleton to ResnetVQAModel, except the vision tower is the frozen
ResNet50+FPN backbone whose ``'pool'`` level [B, 4, 4, 256] feeds the
ConvTranspose(256->768) projection (ref :59-65, 102-108) — 16 vision tokens
instead of 64. ``return_features=True`` returns the full FPN level dict for
the heatmap CLI (ref generate_answers :153-161).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core import constants
from ..ops import (
    AttentionConfig,
    AttentionPooler,
    ChannelProjection,
    SGAStack,
    log_softmax_nll,
)
from .fpn import FPN
from .image_input import finalize_image_input
from .resnet import ResNetBackbone
from .t5 import T5Config, T5Encoder

Dtype = Any


class FasterRcnnVQAModel(nn.Module):
    answer_spaces: int
    # calibration divisor on the classifier logits (reference declared
    # temperature_scaler=1.5 but never applied it — resnet_vqa_model.py:99,155)
    temperature_scaler: float = 1.0
    t5_config: T5Config = T5Config.t5_base()
    num_attention_blocks: int = constants.SGA_DEFAULT_BLOCKS
    sga_config: AttentionConfig = AttentionConfig()
    fpn_channels: int = 256
    fine_tune_vision: bool = False       # frozen backbone (ref :102-106)
    dtype: Dtype = jnp.float32
    use_pallas: bool = False

    def frozen_modules(self):
        """Gradient-isolated top-level modules (see ResnetVQAModel)."""
        return () if self.fine_tune_vision else ("vision_model", "fpn")

    def compute_vision_features(self, params, image_tensors):
        """Out-of-graph frozen tower+FPN forward for the feature cache
        (train/feature_cache.py) — same math as the in-graph path below."""
        x = finalize_image_input(image_tensors)
        feats = ResNetBackbone("resnet50", dtype=self.dtype,
                               parent=None).apply(
            {"params": params["vision_model"]}, x)
        levels = FPN(self.fpn_channels, dtype=self.dtype,
                     parent=None).apply(
            {"params": params["fpn"]}, feats)
        return levels["pool"]

    @nn.compact
    def __call__(
        self,
        question_input_ids: jnp.ndarray,
        question_attention_masks: jnp.ndarray,
        image_tensors: Optional[jnp.ndarray] = None,  # [B, 256, 256, 3] NHWC
        annotation_ids: Optional[jnp.ndarray] = None,
        decoder_question_input_ids: Optional[jnp.ndarray] = None,
        decoder_question_attention_masks: Optional[jnp.ndarray] = None,
        answer_input_ids: Optional[jnp.ndarray] = None,
        answer_attention_masks: Optional[jnp.ndarray] = None,
        pixel_values: Optional[jnp.ndarray] = None,
        question_type_ids: Optional[jnp.ndarray] = None,
        vision_features: Optional[jnp.ndarray] = None,  # cached [B,4,4,256]
        deterministic: bool = True,
        return_features: bool = False,
    ):
        # --- frozen ResNet50 body + FPN (ref :51-53, 102-106) ---
        if vision_features is not None:
            # precomputed 'pool' level (frozen-feature cache); inputs are
            # already gradient-isolated. return_features (the heatmap path)
            # needs the full level dict and never runs cached.
            if return_features:
                raise ValueError(
                    "return_features requires the in-graph tower")
            levels = None
            vision_features = vision_features.astype(self.dtype)
        else:
            image_tensors = finalize_image_input(image_tensors)  # uint8 wire
            feats = ResNetBackbone("resnet50", dtype=self.dtype,
                                   name="vision_model")(image_tensors)
            levels = FPN(self.fpn_channels, dtype=self.dtype,
                         name="fpn")(feats)
            if not self.fine_tune_vision:
                levels = jax.tree.map(jax.lax.stop_gradient, levels)
            vision_features = levels["pool"]          # [B, 4, 4, 256]

        hidden = self.sga_config.hidden_size
        vision_embeddings = ChannelProjection(
            hidden, dtype=self.dtype, name="upscale_layer"
        )(vision_features)

        text_states = T5Encoder(self.t5_config, dtype=self.dtype,
                                name="lang_model")(
            question_input_ids, question_attention_masks,
            deterministic=deterministic)

        B = vision_embeddings.shape[0]
        vision_tokens = vision_embeddings.reshape(B, -1, hidden)  # [B, 16, H]

        fused = SGAStack(
            num_blocks=self.num_attention_blocks, config=self.sga_config,
            dtype=self.dtype, use_pallas=self.use_pallas, name="sga_modules",
        )(text_states, vision_tokens, deterministic=deterministic)

        pooled = AttentionPooler(hidden, dtype=self.dtype,
                                 name="attention_pooler")(fused)
        logits = nn.Dense(self.answer_spaces, dtype=self.dtype,
                          name="classification_layer")(pooled)
        log_probs, loss = log_softmax_nll(logits, annotation_ids,
                                    temperature=self.temperature_scaler)

        if return_features:
            return log_probs, loss, levels
        return log_probs, loss
