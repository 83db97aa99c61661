"""ViT + T5 encoder-decoder VQA model.

Parity target: /root/reference/model/vit_vqa_model.py (VitVQAModel).
Pipeline (ref forward :168-227):
  frozen ViT-base -> pooler_output [B, 768]
  T5 encoder over question ids -> token-0 ("[Question]") embedding [B, 768]
  concat [B, 1536] -> fusing layer: Linear -> ReLU -> Dropout(0.5) -> [B, 768]
  T5 decoder with the fused vector as a 1-token encoder memory, decoder input
  = "[Question] {q} [Answer]" ids (ref :207-212)
  hidden state at the LAST non-pad decoder position (argmax-where trick,
  ref :215-219) -> classifier -> log_softmax -> NLL

``return_attentions=True`` additionally returns the stacked ViT attention
maps (ref generate_answers surfaces output_attentions, :243-245) for the
attention-rollout heatmaps.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core import constants
from ..ops import log_softmax_nll
from .t5 import T5Config, T5Decoder, T5Encoder
from .vit import ViTConfig, ViTModel

Dtype = Any


class VitVQAModel(nn.Module):
    answer_spaces: int
    t5_config: T5Config = T5Config.t5_base()
    vit_config: ViTConfig = ViTConfig.vit_base()
    fine_tune_vision: bool = False       # reference runs ViT under no_grad
    fusing_dropout: float = 0.5          # ref fusing_layer Dropout (:153)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        question_input_ids: jnp.ndarray,              # [B, Sq]
        question_attention_masks: jnp.ndarray,        # [B, Sq]
        decoder_question_input_ids: jnp.ndarray,      # [B, 20]
        decoder_question_attention_masks: jnp.ndarray,  # [B, 20]
        pixel_values: jnp.ndarray,                    # [B, 224, 224, 3] NHWC
        annotation_ids: Optional[jnp.ndarray] = None,
        image_tensors: Optional[jnp.ndarray] = None,  # unused (parity)
        answer_input_ids: Optional[jnp.ndarray] = None,
        answer_attention_masks: Optional[jnp.ndarray] = None,
        question_type_ids: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        return_attentions: bool = False,
    ):
        hidden = self.t5_config.d_model

        # --- frozen ViT -> pooled CLS (ref :183-186) ---
        vit = ViTModel(self.vit_config, dtype=self.dtype, name="vision_model")
        if return_attentions:
            _, pooled_vision, att_maps = vit(
                pixel_values, deterministic, return_attentions=True)
        else:
            _, pooled_vision = vit(pixel_values, deterministic)
            att_maps = None
        if not self.fine_tune_vision:
            pooled_vision = jax.lax.stop_gradient(pooled_vision)
            if att_maps is not None:
                att_maps = jax.lax.stop_gradient(att_maps)

        # --- T5 encoder -> token-0 embedding (ref :189-195) ---
        enc = T5Encoder(self.t5_config, dtype=self.dtype, name="lang_encoder")(
            question_input_ids, question_attention_masks,
            deterministic=deterministic)
        cls_token = enc[:, 0, :]

        # --- fusing layer (ref :150-154, :198-203) ---
        fused = nn.Dense(hidden, dtype=self.dtype, name="fusing_layer")(
            jnp.concatenate([pooled_vision, cls_token], axis=-1))
        fused = nn.relu(fused)
        fused = nn.Dropout(self.fusing_dropout)(fused,
                                                deterministic=deterministic)

        # --- T5 decoder over the 1-token memory (ref :207-212) ---
        dec = T5Decoder(self.t5_config, dtype=self.dtype, name="lang_decoder")(
            decoder_question_input_ids, fused[:, None, :],
            decoder_question_attention_masks, None,
            deterministic=deterministic)

        # --- last non-pad position (ref :215-219) ---
        S = decoder_question_attention_masks.shape[1]
        idx = jnp.max(
            jnp.where(decoder_question_attention_masks == 1,
                      jnp.arange(S)[None, :], 0), axis=1)
        ans_embedding = jnp.take_along_axis(
            dec, idx[:, None, None], axis=1)[:, 0, :]

        logits = nn.Dense(self.answer_spaces, dtype=self.dtype,
                          name="classification_layer")(ans_embedding)
        log_probs, loss = log_softmax_nll(logits, annotation_ids)

        if return_attentions:
            return log_probs, loss, att_maps
        return log_probs, loss
