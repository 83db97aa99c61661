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

``fuse`` / ``decode_logits`` expose the two halves for the autoregressive
generation path (models/generation.py) — the working replacement for the
reference's dead ``generate_answers_beam`` stub (:294-341, which computes
logits in a loop but never returns; SURVEY §2 C5).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core import constants
from ..ops import log_softmax_nll
from .image_input import finalize_image_input
from .t5 import T5Config, T5Decoder, T5Encoder
from .vit import ViTConfig, ViTModel

Dtype = Any


class VitVQAModel(nn.Module):
    answer_spaces: int
    # calibration divisor on the classifier logits (reference declared
    # temperature_scaler=1.5 but never applied it — resnet_vqa_model.py:99,155)
    temperature_scaler: float = 1.0
    t5_config: T5Config = T5Config.t5_base()
    vit_config: ViTConfig = ViTConfig.vit_base()
    fine_tune_vision: bool = False       # reference runs ViT under no_grad
    fusing_dropout: float = 0.5          # ref fusing_layer Dropout (:153)
    dtype: Dtype = jnp.float32

    def frozen_modules(self):
        """Gradient-isolated top-level modules (see ResnetVQAModel)."""
        return () if self.fine_tune_vision else ("vision_model",)

    def vision_tower_deterministic(self) -> bool:
        """The feature cache's exactness contract: compute_vision_features
        runs the tower with deterministic defaults while the in-graph
        training path runs deterministic=False, so the two agree only when
        the tower applies no stochastic regularization. The in21k ViT
        ships dropout 0.0; if a config ever turns it on, the trainer must
        refuse to cache (train/trainer.py:_setup_feature_cache checks
        this) rather than silently training on dropout-free features."""
        return self.vit_config.dropout_rate == 0.0

    def compute_vision_features(self, params, pixel_values):
        """Out-of-graph frozen-ViT forward for the feature cache
        (train/feature_cache.py): pooled CLS [B, 768], same math as
        ``fuse`` below."""
        pv = finalize_image_input(
            pixel_values, (constants.VIT_IMAGE_MEAN, constants.VIT_IMAGE_STD))
        _, pooled = ViTModel(self.vit_config, dtype=self.dtype,
                             parent=None).apply(
            {"params": params["vision_model"]}, pv)
        return pooled

    def setup(self):
        self.vision_model = ViTModel(self.vit_config, dtype=self.dtype,
                                     name="vision_model")
        # ONE token table tied across encoder and decoder, exactly like the
        # reference's T5ForConditionalGeneration ``shared``
        # (vit_vqa_model.py:141 from_pretrained("t5-base")): gradients from
        # question tokens AND decoder-prompt tokens accumulate in the same
        # table. Round 3 kept two independent copies — identical at import
        # but drifting apart under training, a real dynamics divergence the
        # reverse-migration exporter exposed (a trained two-table model
        # cannot round-trip into the tied reference layout).
        self.shared = nn.Embed(self.t5_config.vocab_size,
                               self.t5_config.d_model, dtype=self.dtype,
                               name="shared")
        self.lang_encoder = T5Encoder(self.t5_config, dtype=self.dtype,
                                      name="lang_encoder",
                                      embed_tokens=self.shared)
        self.lang_decoder = T5Decoder(self.t5_config, dtype=self.dtype,
                                      name="lang_decoder",
                                      embed_tokens=self.shared)
        self.fusing_layer = nn.Dense(self.t5_config.d_model, dtype=self.dtype,
                                     name="fusing_layer")
        self.classification_layer = nn.Dense(self.answer_spaces,
                                             dtype=self.dtype,
                                             name="classification_layer")
        self.fusing_dropout_layer = nn.Dropout(self.fusing_dropout)

    # ------------------------------------------------------------- halves

    def fuse(self, question_input_ids, question_attention_masks,
             pixel_values, deterministic: bool = True,
             return_attentions: bool = False, vision_features=None):
        """Frozen ViT pooled CLS + T5-encoder token-0 -> fused [B, d_model]
        (ref :183-203). Optionally also the ViT attention stack.
        ``vision_features`` short-circuits the tower with a cached pooled
        CLS (compute_vision_features); incompatible with attention maps."""
        if vision_features is not None and not return_attentions:
            pooled_vision = vision_features.astype(self.dtype)
            att_maps = None
        else:
            pixel_values = finalize_image_input(    # uint8 wire format
                pixel_values,
                (constants.VIT_IMAGE_MEAN, constants.VIT_IMAGE_STD))
            if return_attentions:
                _, pooled_vision, att_maps = self.vision_model(
                    pixel_values, deterministic, return_attentions=True)
            else:
                _, pooled_vision = self.vision_model(pixel_values,
                                                     deterministic)
                att_maps = None
            if not self.fine_tune_vision:
                pooled_vision = jax.lax.stop_gradient(pooled_vision)
                if att_maps is not None:
                    att_maps = jax.lax.stop_gradient(att_maps)

        enc = self.lang_encoder(question_input_ids, question_attention_masks,
                                deterministic=deterministic)
        cls_token = enc[:, 0, :]
        fused = self.fusing_layer(
            jnp.concatenate([pooled_vision, cls_token], axis=-1))
        fused = nn.relu(fused)
        fused = self.fusing_dropout_layer(fused, deterministic=deterministic)
        if return_attentions:
            return fused, att_maps
        return fused

    def decode_hidden(self, decoder_input_ids, decoder_attention_mask,
                      fused, deterministic: bool = True):
        """T5 decoder over the 1-token fused memory (ref :207-212)."""
        return self.lang_decoder(decoder_input_ids, fused[:, None, :],
                                 decoder_attention_mask, None,
                                 deterministic=deterministic)

    def decode_vocab_logits(self, decoder_input_ids, decoder_attention_mask,
                            fused, deterministic: bool = True):
        """Vocab logits via the tied T5 LM head (shared embedding transpose,
        scaled by d_model**-0.5 — t5-base ties word embeddings). Used by the
        generation path; the classification path uses ``__call__``."""
        dec = self.decode_hidden(decoder_input_ids, decoder_attention_mask,
                                 fused, deterministic)
        embed = self.shared.embedding          # the tied table (see setup)
        dec = dec * (self.t5_config.d_model ** -0.5)
        return jnp.einsum("bsd,vd->bsv", dec,
                          embed.astype(dec.dtype),
                          preferred_element_type=jnp.float32)

    # -------------------------------------------------------------- forward

    def __call__(
        self,
        question_input_ids: jnp.ndarray,              # [B, Sq]
        question_attention_masks: jnp.ndarray,        # [B, Sq]
        decoder_question_input_ids: jnp.ndarray,      # [B, 20]
        decoder_question_attention_masks: jnp.ndarray,  # [B, 20]
        pixel_values: Optional[jnp.ndarray] = None,   # [B, 224, 224, 3] NHWC
        annotation_ids: Optional[jnp.ndarray] = None,
        image_tensors: Optional[jnp.ndarray] = None,  # unused (parity)
        answer_input_ids: Optional[jnp.ndarray] = None,
        answer_attention_masks: Optional[jnp.ndarray] = None,
        question_type_ids: Optional[jnp.ndarray] = None,
        vision_features: Optional[jnp.ndarray] = None,  # cached CLS [B, 768]
        deterministic: bool = True,
        return_attentions: bool = False,
    ):
        if return_attentions:
            # the rollout path needs the tower's attention maps — cached
            # pooled features cannot provide them (see FasterRcnnVQAModel's
            # analogous return_features guard)
            if vision_features is not None:
                raise ValueError(
                    "return_attentions requires the in-graph ViT tower "
                    "(got cached vision_features)")
            fused, att_maps = self.fuse(
                question_input_ids, question_attention_masks, pixel_values,
                deterministic, return_attentions=True)
        else:
            fused = self.fuse(question_input_ids, question_attention_masks,
                              pixel_values, deterministic,
                              vision_features=vision_features)
            att_maps = None

        dec = self.decode_hidden(decoder_question_input_ids,
                                 decoder_question_attention_masks, fused,
                                 deterministic)

        # --- last non-pad position (ref :215-219) ---
        S = decoder_question_attention_masks.shape[1]
        idx = jnp.max(
            jnp.where(decoder_question_attention_masks == 1,
                      jnp.arange(S)[None, :], 0), axis=1)
        ans_embedding = jnp.take_along_axis(
            dec, idx[:, None, None], axis=1)[:, 0, :]

        logits = self.classification_layer(ans_embedding)
        log_probs, loss = log_softmax_nll(logits, annotation_ids,
                                    temperature=self.temperature_scaler)

        if return_attentions:
            return log_probs, loss, att_maps
        return log_probs, loss
