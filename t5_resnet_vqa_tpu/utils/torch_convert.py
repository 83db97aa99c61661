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
