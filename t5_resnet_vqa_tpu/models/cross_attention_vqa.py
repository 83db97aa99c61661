"""Cross-attention ViT x RoBERTa VQA model.

Parity target: /root/reference/model/vit_vqa_model.py:24-125
(CrossAttentionVitVQAModel). Wiring (ref forward :65-125):

  image_emb = ViT embeddings(pixel_values)        [B, 197, 768]  (frozen)
  text_emb  = RoBERTa embeddings(question ids)    [B, L, 768]
  concat    = [image ; text]                      [B, 197+L, 768]
  for i in range(12):
      roberta_hidden = roberta_layer_i(concat)            (no mask)
      image_hidden   = vit_layer_i(image_hidden)          (frozen)
      concat = [roberta_hidden[:, 197:, :] ; image_hidden]   # note: the
      concat = LayerNorm(concat + concat_embeddings)         # stream order
                                                             # flips after
                                                             # layer 1 — a
                                                             # reference quirk
                                                             # replicated
                                                             # deliberately
  AttentionPooler -> classifier -> log_softmax -> NLL

The residual adds the ORIGINAL [image; text] embeddings onto the flipped
[text; image] concat every layer (ref :111-112); this framework reproduces
that behavior bit-for-bit rather than "fixing" it, since trained reference
checkpoints depend on it.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core import constants
from ..ops import AttentionPooler, log_softmax_nll
from .image_input import finalize_image_input
from .roberta import RobertaConfig, RobertaEmbeddings, RobertaLayer
from .vit import ViTConfig, ViTLayer

Dtype = Any


class ViTEmbeddings(nn.Module):
    """Just the ViT embedding stage (patch conv + CLS + position), the piece

    the cross-attention model consumes (ref :48, :78-86)."""

    config: ViTConfig = ViTConfig.vit_base()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        B = pixel_values.shape[0]
        patches = nn.Conv(
            cfg.hidden_size, (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
            dtype=self.dtype, name="patch_embeddings")(pixel_values)
        patches = patches.reshape(B, -1, cfg.hidden_size)
        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, cfg.hidden_size))
        pos = self.param("position_embeddings", nn.initializers.zeros,
                         (1, cfg.num_patches + 1, cfg.hidden_size))
        x = jnp.concatenate([jnp.tile(cls.astype(self.dtype), (B, 1, 1)),
                             patches], axis=1)
        return x + pos.astype(self.dtype)


class CrossAttentionVitVQAModel(nn.Module):
    answer_spaces: int
    # calibration divisor on the classifier logits (reference declared
    # temperature_scaler=1.5 but never applied it — resnet_vqa_model.py:99,155)
    temperature_scaler: float = 1.0
    vit_config: ViTConfig = ViTConfig.vit_base()
    roberta_config: RobertaConfig = RobertaConfig.roberta_base()
    fine_tune_vision: bool = False
    dtype: Dtype = jnp.float32

    def frozen_modules(self):
        """Gradient-isolated top-level modules: the ViT embedding stage and
        every interleaved ViT layer (their inputs AND outputs ride through
        stop_gradient, ref no_grad semantics)."""
        if self.fine_tune_vision:
            return ()
        n = min(self.vit_config.num_layers, self.roberta_config.num_layers)
        return ("vit_embeddings",) + tuple(f"vit_layer_{i}" for i in range(n))

    @nn.compact
    def __call__(
        self,
        question_input_ids: jnp.ndarray,           # [B, L]
        pixel_values: jnp.ndarray,                 # [B, 224, 224, 3] NHWC
        annotation_ids: Optional[jnp.ndarray] = None,
        question_attention_masks: Optional[jnp.ndarray] = None,  # unused (parity)
        decoder_question_input_ids: Optional[jnp.ndarray] = None,
        decoder_question_attention_masks: Optional[jnp.ndarray] = None,
        answer_input_ids: Optional[jnp.ndarray] = None,
        answer_attention_masks: Optional[jnp.ndarray] = None,
        image_tensors: Optional[jnp.ndarray] = None,
        question_type_ids: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        num_layers = min(self.vit_config.num_layers,
                         self.roberta_config.num_layers)   # ref :53
        n_img = self.vit_config.num_patches + 1

        pixel_values = finalize_image_input(        # uint8 wire format
            pixel_values, (constants.VIT_IMAGE_MEAN, constants.VIT_IMAGE_STD))
        image_emb = ViTEmbeddings(self.vit_config, dtype=self.dtype,
                                  name="vit_embeddings")(pixel_values)
        if not self.fine_tune_vision:
            image_emb = jax.lax.stop_gradient(image_emb)

        text_emb = RobertaEmbeddings(self.roberta_config, dtype=self.dtype,
                                     name="roberta_embeddings")(
            question_input_ids, deterministic=deterministic)

        concat_embeddings = jnp.concatenate([image_emb, text_emb], axis=1)
        concat_hidden = concat_embeddings
        image_hidden = image_emb

        shared_ln = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                 name="layer_norm")   # ref single LN (:54)
        for i in range(num_layers):
            roberta_hidden = RobertaLayer(
                self.roberta_config, dtype=self.dtype,
                name=f"roberta_layer_{i}")(concat_hidden,
                                           deterministic=deterministic)
            image_hidden_new, _ = ViTLayer(
                self.vit_config, dtype=self.dtype,
                name=f"vit_layer_{i}")(image_hidden, deterministic)
            image_hidden = (image_hidden_new if self.fine_tune_vision
                            else jax.lax.stop_gradient(image_hidden_new))
            # ref :111-112 — [text_part ; image] + original [image ; text]
            concat_hidden = jnp.concatenate(
                [roberta_hidden[:, n_img:, :], image_hidden], axis=1)
            concat_hidden = shared_ln(concat_hidden + concat_embeddings)

        pooled = AttentionPooler(self.vit_config.hidden_size,
                                 dtype=self.dtype,
                                 name="attention_pooler")(concat_hidden)
        logits = nn.Dense(self.answer_spaces, dtype=self.dtype,
                          name="classification_layer")(pooled)
        return log_softmax_nll(logits, annotation_ids,
                                    temperature=self.temperature_scaler)
