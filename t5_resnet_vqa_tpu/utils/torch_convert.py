"""torch state_dict -> JAX param-pytree converters.

The reference ships pure-PyTorch models whose pretrained weights (torchvision
ResNets, HF T5/ViT/RoBERTa) would normally be converted once and stored. These
converters map a torch ``state_dict`` (tensor name -> tensor) onto the param
trees of the flax modules in this framework. They are also the backbone of the
parity test-suite: a randomly-initialized torch model converted through here
must produce bit-comparable (fp32 tolerance) logits in the JAX implementation.

Conventions:
  * torch nn.Linear weight [out, in]  -> flax Dense kernel [in, out] (transpose)
  * torch Conv2d weight [O, I, kh, kw] -> flax Conv kernel [kh, kw, I, O] (HWIO)
  * torch ConvTranspose2d(k3,s1,p1) weight [I, O, kh, kw] -> equivalent plain
    conv kernel: flip spatial dims, then [kh, kw, I, O]
  * torch LayerNorm weight/bias -> flax LayerNorm scale/bias
  * frozen BatchNorm (running stats) -> folded (scale, bias) pairs
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def _np(t) -> np.ndarray:
    return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)


def _j(prefix: str, name: str) -> str:
    """Join a dotted prefix with a leaf name, tolerating empty prefixes."""
    return f"{prefix}.{name}" if prefix else name


def linear(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    out = {"kernel": _np(sd[_j(prefix, "weight")]).T}
    if _j(prefix, "bias") in sd:
        out["bias"] = _np(sd[_j(prefix, "bias")])
    return out


def layernorm(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    return {
        "scale": _np(sd[_j(prefix, "weight")]),
        "bias": _np(sd[_j(prefix, "bias")]),
    }


def conv2d(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    """torch OIHW -> flax HWIO."""
    out = {"kernel": _np(sd[_j(prefix, "weight")]).transpose(2, 3, 1, 0)}
    if _j(prefix, "bias") in sd:
        out["bias"] = _np(sd[_j(prefix, "bias")])
    return out


def conv_transpose2d_as_conv(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    """torch ConvTranspose2d(k, s=1, p=(k-1)/2) == plain SAME conv with the
    kernel spatially flipped and I/O kept as stored (torch convT stores
    [I, O, kh, kw]). Target layout HWIO = [kh, kw, I, O]."""
    w = _np(sd[_j(prefix, "weight")])           # [I, O, kh, kw]
    w = w[:, :, ::-1, ::-1]                   # spatial flip
    out = {"kernel": np.ascontiguousarray(w.transpose(2, 3, 0, 1))}
    if _j(prefix, "bias") in sd:
        out["bias"] = _np(sd[_j(prefix, "bias")])
    return out


def frozen_batchnorm(sd: Mapping[str, Any], prefix: str, eps: float = 1e-5) -> Dict[str, np.ndarray]:
    """Fold eval-mode BatchNorm into an affine (scale, bias) pair.

    The reference always runs vision backbones in eval mode under no_grad
    (resnet_vqa_model.py:115-135), so BN is a constant affine transform:
    y = gamma*(x-mean)/sqrt(var+eps)+beta = scale*x + bias.
    """
    gamma = _np(sd[_j(prefix, "weight")])
    beta = _np(sd[_j(prefix, "bias")])
    mean = _np(sd[_j(prefix, "running_mean")])
    var = _np(sd[_j(prefix, "running_var")])
    scale = gamma / np.sqrt(var + eps)
    return {"scale": scale, "bias": beta - mean * scale}


def embedding(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    return {"embedding": _np(sd[_j(prefix, "weight")])}


# ---------------------------------------------------------------------------
# SGA fusion stack (multi_head_vision_text_attn.py)
# ---------------------------------------------------------------------------

def convert_mhatt(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    return {
        "linear_v": linear(sd, _j(prefix, "linear_v")),
        "linear_k": linear(sd, _j(prefix, "linear_k")),
        "linear_q": linear(sd, _j(prefix, "linear_q")),
        "linear_merge": linear(sd, _j(prefix, "linear_merge")),
    }


def convert_sga(sd: Mapping[str, Any], prefix: str = "") -> Dict[str, Any]:
    p = f"{prefix}." if prefix else ""
    return {
        "mhatt1": convert_mhatt(sd, f"{p}mhatt1"),
        "mhatt2": convert_mhatt(sd, f"{p}mhatt2"),
        "ffn": {"mlp": {
            "fc1": linear(sd, f"{p}ffn.mlp.fc1"),
            "fc2": linear(sd, f"{p}ffn.mlp.fc2"),
        }},
        # reference wraps torch LayerNorm one level deep: normN.norm
        "norm1": layernorm(sd, f"{p}norm1.norm"),
        "norm2": layernorm(sd, f"{p}norm2.norm"),
        "norm3": layernorm(sd, f"{p}norm3.norm"),
    }


def convert_sga_stack(sd: Mapping[str, Any], num_blocks: int,
                      prefix: str = "sga_modules") -> Dict[str, Any]:
    return {
        f"sga_{i}": convert_sga(sd, f"{prefix}.{i}") for i in range(num_blocks)
    }


def convert_attention_pooler(sd: Mapping[str, Any], prefix: str = "attention_pooler") -> Dict[str, Any]:
    # reference: attention_pooler.attention.0 == the Linear inside Sequential
    return {"attention": linear(sd, f"{prefix}.attention.0")}


# ---------------------------------------------------------------------------
# ResNet backbones -> models.resnet.ResNetBackbone params
# ---------------------------------------------------------------------------

_RESNET_DEPTHS = {
    "resnet18": (2, 2, 2, 2),
    "resnet34": (3, 4, 6, 3),
    "resnet50": (3, 4, 6, 3),
}
_RESNET_BOTTLENECK = {"resnet18": False, "resnet34": False, "resnet50": True}


def convert_resnet_torchvision(sd: Mapping[str, Any], variant: str,
                               prefix: str = "") -> Dict[str, Any]:
    """torchvision resnet naming (conv1/bn1/layer{1-4}.{b}.convN/bnN/
    downsample.{0,1}) -> flax tree. This is the converter to run on real
    pretrained torchvision checkpoints."""
    p = f"{prefix}." if prefix else ""
    bottleneck = _RESNET_BOTTLENECK[variant]
    params: Dict[str, Any] = {
        "conv1": conv2d(sd, f"{p}conv1"),
        "bn1": frozen_batchnorm(sd, f"{p}bn1"),
    }
    n_convs = 3 if bottleneck else 2
    for s, depth in enumerate(_RESNET_DEPTHS[variant], start=1):
        for b in range(depth):
            bp = f"{p}layer{s}.{b}"
            blk: Dict[str, Any] = {}
            for c in range(1, n_convs + 1):
                blk[f"conv{c}"] = conv2d(sd, f"{bp}.conv{c}")
                blk[f"bn{c}"] = frozen_batchnorm(sd, f"{bp}.bn{c}")
            if f"{bp}.downsample.0.weight" in sd:
                blk["downsample_conv"] = conv2d(sd, f"{bp}.downsample.0")
                blk["downsample_bn"] = frozen_batchnorm(sd, f"{bp}.downsample.1")
            params[f"layer{s}_block{b}"] = blk
    return params


def convert_resnet_hf(sd: Mapping[str, Any], variant: str,
                      prefix: str = "") -> Dict[str, Any]:
    """HF transformers.ResNetModel naming (embedder.embedder.convolution,
    encoder.stages.{s}.layers.{b}.layer.{i}.convolution/normalization,
    .shortcut.convolution/normalization) -> flax tree. Used by the parity
    tests (torchvision is absent from this image; HF ResNet is the same
    v1.5 graph)."""
    p = f"{prefix}." if prefix else ""
    bottleneck = _RESNET_BOTTLENECK[variant]
    params: Dict[str, Any] = {
        "conv1": conv2d(sd, f"{p}embedder.embedder.convolution"),
        "bn1": frozen_batchnorm(sd, f"{p}embedder.embedder.normalization"),
    }
    n_convs = 3 if bottleneck else 2
    for s, depth in enumerate(_RESNET_DEPTHS[variant]):
        for b in range(depth):
            bp = f"{p}encoder.stages.{s}.layers.{b}"
            blk: Dict[str, Any] = {}
            for c in range(n_convs):
                blk[f"conv{c + 1}"] = conv2d(sd, f"{bp}.layer.{c}.convolution")
                blk[f"bn{c + 1}"] = frozen_batchnorm(
                    sd, f"{bp}.layer.{c}.normalization")
            if f"{bp}.shortcut.convolution.weight" in sd:
                blk["downsample_conv"] = conv2d(sd, f"{bp}.shortcut.convolution")
                blk["downsample_bn"] = frozen_batchnorm(
                    sd, f"{bp}.shortcut.normalization")
            params[f"layer{s + 1}_block{b}"] = blk
    return params


# ---------------------------------------------------------------------------
# FPN (torchvision FeaturePyramidNetwork naming) -> models.fpn.FPN params
# ---------------------------------------------------------------------------

def convert_fpn(sd: Mapping[str, Any], prefix: str = "fpn",
                num_levels: int = 4) -> Dict[str, Any]:
    """Accepts both torchvision layouts: ``inner_blocks.{i}.weight`` (old)
    and ``inner_blocks.{i}.0.weight`` (Conv2dNormActivation, new)."""
    p = f"{prefix}." if prefix else ""

    def conv_key(block: str, i: int) -> str:
        for cand in (f"{p}{block}.{i}", f"{p}{block}.{i}.0"):
            if f"{cand}.weight" in sd:
                return cand
        raise KeyError(f"no {block}[{i}] conv under prefix {prefix!r}")

    params: Dict[str, Any] = {}
    for i in range(num_levels):
        params[f"inner_{i}"] = conv2d(sd, conv_key("inner_blocks", i))
        params[f"layer_{i}"] = conv2d(sd, conv_key("layer_blocks", i))
    return params


def convert_faster_rcnn_backbone(sd: Mapping[str, Any],
                                 prefix: str = "vision_model") -> Dict[str, Any]:
    """torchvision ``fasterrcnn_resnet50_fpn(...).backbone`` state dict
    (BackboneWithFPN: body.* is a torchvision resnet50 with FrozenBatchNorm2d,
    fpn.* the FPN) -> (resnet_params, fpn_params) for FasterRcnnVQAModel."""
    p = f"{prefix}." if prefix else ""
    body = {k[len(f"{p}body."):]: v for k, v in sd.items()
            if k.startswith(f"{p}body.")}
    # FrozenBatchNorm2d state dicts have no num_batches_tracked and use the
    # same weight/bias/running_* names, so the resnet converter applies.
    resnet_params = convert_resnet_torchvision(body, "resnet50")
    fpn_params = convert_fpn(sd, prefix=f"{p}fpn")
    return resnet_params, fpn_params


# ---------------------------------------------------------------------------
# ViT (HF ViTModel naming) -> models.vit.ViTModel params
# ---------------------------------------------------------------------------

def convert_vit(sd: Mapping[str, Any], num_layers: int,
                prefix: str = "") -> Dict[str, Any]:
    p = f"{prefix}." if prefix else ""
    params: Dict[str, Any] = {
        "cls_token": _np(sd[f"{p}embeddings.cls_token"]),
        "position_embeddings": _np(sd[f"{p}embeddings.position_embeddings"]),
        "patch_embeddings": conv2d(sd, f"{p}embeddings.patch_embeddings.projection"),
        "layernorm": layernorm(sd, f"{p}layernorm"),
        "pooler": linear(sd, f"{p}pooler.dense"),
    }
    for i in range(num_layers):
        lp = f"{p}encoder.layer.{i}"
        params[f"layer_{i}"] = {
            "attention": {
                "query": linear(sd, f"{lp}.attention.attention.query"),
                "key": linear(sd, f"{lp}.attention.attention.key"),
                "value": linear(sd, f"{lp}.attention.attention.value"),
                "out": linear(sd, f"{lp}.attention.output.dense"),
            },
            "layernorm_before": layernorm(sd, f"{lp}.layernorm_before"),
            "layernorm_after": layernorm(sd, f"{lp}.layernorm_after"),
            "intermediate": linear(sd, f"{lp}.intermediate.dense"),
            "output": linear(sd, f"{lp}.output.dense"),
        }
    return params


# ---------------------------------------------------------------------------
# RoBERTa (HF RobertaModel naming) -> models.roberta params
# ---------------------------------------------------------------------------

def convert_roberta_embeddings(sd: Mapping[str, Any],
                               prefix: str = "embeddings") -> Dict[str, Any]:
    return {
        "word_embeddings": embedding(sd, f"{prefix}.word_embeddings"),
        "position_embeddings": embedding(sd, f"{prefix}.position_embeddings"),
        "token_type_embeddings": embedding(sd, f"{prefix}.token_type_embeddings"),
        "LayerNorm": layernorm(sd, f"{prefix}.LayerNorm"),
    }


def convert_roberta_layer(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    return {
        "query": linear(sd, f"{prefix}.attention.self.query"),
        "key": linear(sd, f"{prefix}.attention.self.key"),
        "value": linear(sd, f"{prefix}.attention.self.value"),
        "attention_output": linear(sd, f"{prefix}.attention.output.dense"),
        "attention_LayerNorm": layernorm(sd, f"{prefix}.attention.output.LayerNorm"),
        "intermediate": linear(sd, f"{prefix}.intermediate.dense"),
        "output": linear(sd, f"{prefix}.output.dense"),
        "output_LayerNorm": layernorm(sd, f"{prefix}.output.LayerNorm"),
    }


def convert_vit_embeddings(sd: Mapping[str, Any],
                           prefix: str = "embeddings") -> Dict[str, Any]:
    return {
        "cls_token": _np(sd[f"{prefix}.cls_token"]),
        "position_embeddings": _np(sd[f"{prefix}.position_embeddings"]),
        "patch_embeddings": conv2d(sd, f"{prefix}.patch_embeddings.projection"),
    }


def convert_vit_layer(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    return {
        "attention": {
            "query": linear(sd, f"{prefix}.attention.attention.query"),
            "key": linear(sd, f"{prefix}.attention.attention.key"),
            "value": linear(sd, f"{prefix}.attention.attention.value"),
            "out": linear(sd, f"{prefix}.attention.output.dense"),
        },
        "layernorm_before": layernorm(sd, f"{prefix}.layernorm_before"),
        "layernorm_after": layernorm(sd, f"{prefix}.layernorm_after"),
        "intermediate": linear(sd, f"{prefix}.intermediate.dense"),
        "output": linear(sd, f"{prefix}.output.dense"),
    }


# ---------------------------------------------------------------------------
# Full reference checkpoints (best-model.pt state dicts)
# ---------------------------------------------------------------------------

def convert_resnet_vqa_checkpoint(sd: Mapping[str, Any], variant: str,
                                  num_attention_blocks: int = 3) -> Dict[str, Any]:
    """A reference ResnetVQAModel state_dict (resnet_vqa_model.py:30-99)

    -> models.resnet_vqa.ResnetVQAModel params. Lets a user load a trained
    reference ``best-model.pt`` into this framework directly."""
    proj = "downscale_layer" if variant == "resnet50" else "upscale_layer"
    return {
        "vision_model": convert_resnet_torchvision(sd, variant, "vision_model"),
        proj: {"conv": conv_transpose2d_as_conv(sd, proj)},
        # reference lang_model is T5Stack: lang_model.embed_tokens/block/...
        "lang_model": convert_t5_encoder(
            sd, num_layers=12, prefix="lang_model",
            shared_key="lang_model.embed_tokens.weight"),
        "sga_modules": convert_sga_stack(sd, num_attention_blocks),
        "attention_pooler": convert_attention_pooler(sd),
        "classification_layer": linear(sd, "classification_layer"),
    }


# ---------------------------------------------------------------------------
# T5 (HF t5-base naming: encoder.block.{i}.layer.{0,1,2}...)
# ---------------------------------------------------------------------------

def _convert_t5_attention(sd: Mapping[str, Any], prefix: str,
                          has_rel_bias: bool) -> Dict[str, Any]:
    out = {
        "q": linear(sd, f"{prefix}.q"),
        "k": linear(sd, f"{prefix}.k"),
        "v": linear(sd, f"{prefix}.v"),
        "o": linear(sd, f"{prefix}.o"),
    }
    if has_rel_bias:
        out["relative_attention_bias"] = embedding(
            sd, f"{prefix}.relative_attention_bias")
    return out


def _rmsnorm(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    return {"weight": _np(sd[_j(prefix, "weight")])}


def convert_t5_encoder(sd: Mapping[str, Any], num_layers: int,
                       prefix: str = "encoder",
                       shared_key: str = "shared.weight",
                       include_shared: bool = True) -> Dict[str, Any]:
    """HF T5 encoder state dict -> models.t5.T5Encoder params.
    ``include_shared=False`` for stacks whose token table is tied at the
    parent (VitVQAModel's top-level ``shared``)."""
    params: Dict[str, Any] = {
        "final_layer_norm": _rmsnorm(sd, f"{prefix}.final_layer_norm"),
    }
    if include_shared:
        params["shared"] = {"embedding": _np(sd[shared_key])}
    for i in range(num_layers):
        b = f"{prefix}.block.{i}"
        params[f"block_{i}"] = {
            "self_attn": _convert_t5_attention(
                sd, f"{b}.layer.0.SelfAttention", has_rel_bias=(i == 0)),
            "self_attn_layer_norm": _rmsnorm(sd, f"{b}.layer.0.layer_norm"),
            "ff": {
                "wi": linear(sd, f"{b}.layer.1.DenseReluDense.wi"),
                "wo": linear(sd, f"{b}.layer.1.DenseReluDense.wo"),
            },
            "ff_layer_norm": _rmsnorm(sd, f"{b}.layer.1.layer_norm"),
        }
    return params


def convert_t5_decoder(sd: Mapping[str, Any], num_layers: int,
                       prefix: str = "decoder",
                       shared_key: str = "shared.weight",
                       include_shared: bool = True) -> Dict[str, Any]:
    """HF T5 decoder state dict -> models.t5.T5Decoder params."""
    params: Dict[str, Any] = {
        "final_layer_norm": _rmsnorm(sd, f"{prefix}.final_layer_norm"),
    }
    if include_shared:
        params["shared"] = {"embedding": _np(sd[shared_key])}
    for i in range(num_layers):
        b = f"{prefix}.block.{i}"
        params[f"block_{i}"] = {
            "self_attn": _convert_t5_attention(
                sd, f"{b}.layer.0.SelfAttention", has_rel_bias=(i == 0)),
            "self_attn_layer_norm": _rmsnorm(sd, f"{b}.layer.0.layer_norm"),
            "cross_attn": _convert_t5_attention(
                sd, f"{b}.layer.1.EncDecAttention", has_rel_bias=False),
            "cross_attn_layer_norm": _rmsnorm(sd, f"{b}.layer.1.layer_norm"),
            "ff": {
                "wi": linear(sd, f"{b}.layer.2.DenseReluDense.wi"),
                "wo": linear(sd, f"{b}.layer.2.DenseReluDense.wo"),
            },
            "ff_layer_norm": _rmsnorm(sd, f"{b}.layer.2.layer_norm"),
        }
    return params


def convert_faster_rcnn_vqa_checkpoint(sd: Mapping[str, Any],
                                       num_attention_blocks: int = 3,
                                       num_t5_layers: int = 12
                                       ) -> Dict[str, Any]:
    """A reference FasterRcnnVQAModel state dict
    (faster_rcnn_vqa_model.py:28-86: vision_model = torchvision
    fasterrcnn_resnet50_fpn backbone, upscale_layer ConvT(256->768),
    lang_model T5Stack, sga/pooler/classifier)
    -> models.faster_rcnn_vqa.FasterRcnnVQAModel params."""
    resnet_params, fpn_params = convert_faster_rcnn_backbone(sd,
                                                             "vision_model")
    return {
        "vision_model": resnet_params,
        "fpn": fpn_params,
        "upscale_layer": {"conv": conv_transpose2d_as_conv(sd,
                                                           "upscale_layer")},
        "lang_model": convert_t5_encoder(
            sd, num_layers=num_t5_layers, prefix="lang_model",
            shared_key="lang_model.embed_tokens.weight"),
        "sga_modules": convert_sga_stack(sd, num_attention_blocks),
        "attention_pooler": convert_attention_pooler(sd),
        "classification_layer": linear(sd, "classification_layer"),
    }


def convert_vit_vqa_checkpoint(sd: Mapping[str, Any],
                               num_vit_layers: int = 12,
                               num_t5_layers: int = 12) -> Dict[str, Any]:
    """A reference VitVQAModel state dict (vit_vqa_model.py:129-166:
    vision_model = HF ViTModel, lang_model = full T5ForConditionalGeneration,
    fusing_layer = Sequential(Linear, ReLU, Dropout), classifier)
    -> models.vit_vqa.VitVQAModel params."""
    return {
        "vision_model": convert_vit(sd, num_vit_layers,
                                    prefix="vision_model"),
        # ONE tied table, like the reference's T5ForConditionalGeneration
        "shared": {"embedding": _np(sd["lang_model.shared.weight"])},
        "lang_encoder": convert_t5_encoder(
            sd, num_t5_layers, prefix="lang_model.encoder",
            include_shared=False),
        "lang_decoder": convert_t5_decoder(
            sd, num_t5_layers, prefix="lang_model.decoder",
            include_shared=False),
        "fusing_layer": linear(sd, "fusing_layer.0"),
        "classification_layer": linear(sd, "classification_layer"),
    }


def convert_cross_attention_vqa_checkpoint(sd: Mapping[str, Any],
                                           num_layers: int = 12
                                           ) -> Dict[str, Any]:
    """A reference CrossAttentionVitVQAModel state dict
    (vit_vqa_model.py:24-63: roberta_embeddings / vit_embeddings /
    roberta_encoder_layers.N / vit_encoder_layers.N ModuleLists, shared
    layer_norm, pooler, classifier)
    -> models.cross_attention_vqa.CrossAttentionVitVQAModel params."""
    params: Dict[str, Any] = {
        "roberta_embeddings": convert_roberta_embeddings(
            sd, "roberta_embeddings"),
        "vit_embeddings": convert_vit_embeddings(sd, "vit_embeddings"),
        "layer_norm": layernorm(sd, "layer_norm"),
        "attention_pooler": convert_attention_pooler(sd),
        "classification_layer": linear(sd, "classification_layer"),
    }
    for i in range(num_layers):
        params[f"roberta_layer_{i}"] = convert_roberta_layer(
            sd, f"roberta_encoder_layers.{i}")
        params[f"vit_layer_{i}"] = convert_vit_layer(
            sd, f"vit_encoder_layers.{i}")
    return params
