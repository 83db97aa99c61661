"""ResNet + T5-encoder + SGA VQA model (CNN family).

Parity target: /root/reference/model/resnet_vqa_model.py (ResnetVQAModel).
Pipeline (ref forward :101-165):
  frozen resnet18/34/50 -> C5 map [B, 8, 8, C]      (stop_gradient == no_grad)
  ConvTranspose(k3,s1,p1) channel projection -> 768 (as SAME conv, ops.layers)
  T5 encoder over question ids [B, 16] -> text states
  3x SGA loop: x = fresh text states, y = prev fused output (first: 64 vision
  tokens), output seq = text length
  AttentionPooler -> classifier -> log_softmax -> NLL vs annotation_ids

TPU-first notes: the whole forward is one jit-compiled XLA program; images are
NHWC; the frozen backbone runs in the same program (no host round trip) under
stop_gradient so autodiff skips it; `return_features=True` additionally
returns the raw C5 map for the CAM heatmap path (ref generate_answers
:167-231 returns the feature dict).
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
from .image_input import finalize_image_input
from .resnet import ResNetBackbone
from .t5 import T5Config, T5Encoder

Dtype = Any


class ResnetVQAModel(nn.Module):
    """CNN-family VQA model (resnet18/34/50 towers)."""

    answer_spaces: int
    # calibration divisor on the classifier logits (reference declared
    # temperature_scaler=1.5 but never applied it — resnet_vqa_model.py:99,155)
    temperature_scaler: float = 1.0
    vision_model_name: str = "resnet50"
    t5_config: T5Config = T5Config.t5_base()
    num_attention_blocks: int = constants.SGA_DEFAULT_BLOCKS
    sga_config: AttentionConfig = AttentionConfig()
    fine_tune_vision: bool = False       # reference forces frozen (:115-135)
    dtype: Dtype = jnp.float32
    use_pallas: bool = False

    def frozen_modules(self):
        """Top-level param modules with no gradient path (stop_gradient).
        The optimizer skips them entirely, matching torch's treatment of
        grad=None params (ref registers them but never updates them)."""
        return () if self.fine_tune_vision else ("vision_model",)

    def compute_vision_features(self, params, image_tensors):
        """Out-of-graph frozen-tower forward for the feature cache
        (train/feature_cache.py): the exact math of the in-graph tower path
        below (uint8 finalize -> backbone -> C5 map). Exact-equality parity
        with the in-graph path is pinned by tests/test_feature_cache.py."""
        x = finalize_image_input(image_tensors)
        feats = ResNetBackbone(self.vision_model_name, dtype=self.dtype,
                               parent=None).apply(
            {"params": params["vision_model"]}, x)
        return feats[-1]

    @nn.compact
    def __call__(
        self,
        question_input_ids: jnp.ndarray,          # [B, 16]
        question_attention_masks: jnp.ndarray,    # [B, 16]
        image_tensors: Optional[jnp.ndarray] = None,  # [B, H, W, 3] NHWC [0,1]
        annotation_ids: Optional[jnp.ndarray] = None,   # [B]
        decoder_question_input_ids: Optional[jnp.ndarray] = None,   # unused (parity)
        decoder_question_attention_masks: Optional[jnp.ndarray] = None,
        answer_input_ids: Optional[jnp.ndarray] = None,
        answer_attention_masks: Optional[jnp.ndarray] = None,
        pixel_values: Optional[jnp.ndarray] = None,
        question_type_ids: Optional[jnp.ndarray] = None,
        vision_features: Optional[jnp.ndarray] = None,  # cached C5 [B,8,8,C]
        deterministic: bool = True,
        return_features: bool = False,
    ):
        # --- frozen vision tower (ref :115-135) ---
        if vision_features is not None:
            # precomputed by compute_vision_features (frozen-feature cache);
            # an input is already gradient-isolated
            image_features = vision_features.astype(self.dtype)
        else:
            image_tensors = finalize_image_input(image_tensors)  # uint8 wire
            feats = ResNetBackbone(self.vision_model_name, dtype=self.dtype,
                                   name="vision_model")(image_tensors)
            image_features = feats[-1]                   # [B, 8, 8, C]
            if not self.fine_tune_vision:
                image_features = jax.lax.stop_gradient(image_features)

        # --- channel projection to 768 (ref upscale/downscale :64-78) ---
        proj_name = ("downscale_layer" if self.vision_model_name == "resnet50"
                     else "upscale_layer")
        hidden = self.sga_config.hidden_size             # 768 in production
        vision_embeddings = ChannelProjection(
            hidden, dtype=self.dtype, name=proj_name
        )(image_features)                                # [B, 8, 8, 768]

        # --- text tower (ref :137-140) ---
        text_states = T5Encoder(self.t5_config, dtype=self.dtype,
                                name="lang_model")(
            question_input_ids, question_attention_masks,
            deterministic=deterministic)                 # [B, 16, 768]

        # --- flatten vision map to tokens (ref :142-143; NHWC reshape gives
        #     the same row-major (h*w) token order as NCHW view+permute) ---
        B = vision_embeddings.shape[0]
        vision_tokens = vision_embeddings.reshape(B, -1, hidden)  # [B, 64, 768]

        # --- SGA fusion loop (ref :147-149) ---
        fused = SGAStack(
            num_blocks=self.num_attention_blocks, config=self.sga_config,
            dtype=self.dtype, use_pallas=self.use_pallas, name="sga_modules",
        )(text_states, vision_tokens, deterministic=deterministic)

        # --- pool + classify (ref :152-162) ---
        pooled = AttentionPooler(hidden, dtype=self.dtype,
                                 name="attention_pooler")(fused)
        logits = nn.Dense(self.answer_spaces, dtype=self.dtype,
                          name="classification_layer")(pooled)
        log_probs, loss = log_softmax_nll(logits, annotation_ids,
                                    temperature=self.temperature_scaler)

        if return_features:
            # ref generate_answers returns {"features": raw C5 map} (:189,:201)
            return log_probs, loss, {"features": image_features}
        return log_probs, loss
