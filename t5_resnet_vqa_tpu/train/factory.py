"""Model factory: config -> model instance + data-collate family.

Parity with the entry scripts' ``init_model`` dispatch
(train_faster_rcnn_vqa.py:9-49 on ``vision_model_name`` in {faster-rcnn,
resnet18/34/50}; train_vit_vqa.py:8-24 for the ViT pipeline), plus the
cross-attention variant that the reference defines but never wires to an
entry point (SURVEY §2 C6).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ..core.config import ModelConfig
from ..models import (
    CrossAttentionVitVQAModel,
    FasterRcnnVQAModel,
    ResnetVQAModel,
    VitVQAModel,
)
from ..ops import AttentionConfig

_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}

CNN_FAMILY = "cnn"
VIT_FAMILY = "vit"
CROSS_FAMILY = "cross_attention"


def model_family(model_cfg: ModelConfig) -> str:
    name = model_cfg.vision_model_name
    if name in ("resnet18", "resnet34", "resnet50", "faster-rcnn"):
        return CNN_FAMILY
    if model_cfg.language_model_name == "roberta-base":
        return CROSS_FAMILY
    return VIT_FAMILY


def build_model(model_cfg: ModelConfig, num_answers: int):
    """Returns (flax module, family string)."""
    import dataclasses

    from ..models.t5 import T5Config

    dtype = _DTYPES[model_cfg.compute_dtype]
    family = model_family(model_cfg)
    name = model_cfg.vision_model_name
    t5_cfg = dataclasses.replace(T5Config.t5_base(),
                                 fused_qkv=model_cfg.fused_qkv)

    if family == CNN_FAMILY:
        if name == "faster-rcnn":
            model = FasterRcnnVQAModel(
                answer_spaces=num_answers, t5_config=t5_cfg,
                num_attention_blocks=model_cfg.num_attention_blocks,
                fine_tune_vision=model_cfg.fine_tune_vision,
                temperature_scaler=model_cfg.temperature_scaler,
                dtype=dtype, use_pallas=model_cfg.use_pallas)
        else:
            model = ResnetVQAModel(
                answer_spaces=num_answers, vision_model_name=name,
                t5_config=t5_cfg,
                num_attention_blocks=model_cfg.num_attention_blocks,
                fine_tune_vision=model_cfg.fine_tune_vision,
                temperature_scaler=model_cfg.temperature_scaler,
                dtype=dtype, use_pallas=model_cfg.use_pallas)
    elif family == CROSS_FAMILY:
        model = CrossAttentionVitVQAModel(
            answer_spaces=num_answers,
            fine_tune_vision=model_cfg.fine_tune_vision,
            temperature_scaler=model_cfg.temperature_scaler, dtype=dtype)
    else:
        model = VitVQAModel(
            answer_spaces=num_answers, t5_config=t5_cfg,
            fine_tune_vision=model_cfg.fine_tune_vision,
            temperature_scaler=model_cfg.temperature_scaler, dtype=dtype)
    return model, family
