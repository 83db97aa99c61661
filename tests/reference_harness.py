"""Run the reference's OWN torch model classes offline, at real geometry.

The migration rehearsal (tests/test_migration_rehearsal.py) must produce
``best-model.pt`` checkpoints from ``/root/reference/model/*.py`` itself —
the files a real user of shiv-vignesh/T5-Resnet-VQA would hand this
framework. Two obstacles in this zero-egress image:

  * ``torchvision`` is not installed. The reference imports
    ``resnet18/34/50`` and ``fasterrcnn_resnet50_fpn`` from it
    (resnet_vqa_model.py:5, faster_rcnn_vqa_model.py:5). This module
    installs a minimal stub into ``sys.modules`` implementing the standard
    torchvision ResNet/BackboneWithFPN graphs with torchvision's module
    naming (conv1/bn1/layer{1-4}.{b}.conv*/bn*/downsample.{0,1}, body/fpn
    with inner_blocks/layer_blocks) — random init replacing the pretrained
    download, which is exactly what a state_dict round trip needs.
  * HF ``from_pretrained`` needs the hub. ``reference_models_offline()``
    patches T5/ViT/RoBERTa ``from_pretrained`` to config-construction at
    the REAL default geometry (HF's T5Config/ViTConfig/RobertaConfig
    defaults are t5-base / vit-base / roberta-base).

The stub's forward semantics match the real torchvision graphs (ResNet
v1.5 stride placement, FPN lateral+top-down+smooth+LastLevelMaxPool —
validated against this repo's flax towers by the rehearsal's logit-parity
assertions), so the saved checkpoints are faithful migration inputs.
"""

from __future__ import annotations

import contextlib
import sys
import types
from collections import OrderedDict

import torch
import torch.nn as nn
import torch.nn.functional as F

# --------------------------------------------------------------------------
# Standard torchvision-style ResNet (naming-compatible state dicts)
# --------------------------------------------------------------------------


def _conv3(cin, cout, stride=1):
    return nn.Conv2d(cin, cout, 3, stride=stride, padding=1, bias=False)


def _conv1(cin, cout, stride=1):
    return nn.Conv2d(cin, cout, 1, stride=stride, bias=False)


class _BasicBlock(nn.Module):
    expansion = 1

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = _conv3(inplanes, planes, stride)
        self.bn1 = nn.BatchNorm2d(planes)
        self.relu = nn.ReLU(inplace=True)
        self.conv2 = _conv3(planes, planes)
        self.bn2 = nn.BatchNorm2d(planes)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class _Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = _conv1(inplanes, planes)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = _conv3(planes, planes, stride)   # v1.5: stride on 3x3
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = _conv1(planes, planes * 4)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class _ResNet(nn.Module):
    def __init__(self, block, layers, num_classes=1000):
        super().__init__()
        self.inplanes = 64
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = self._make_layer(block, 64, layers[0])
        self.layer2 = self._make_layer(block, 128, layers[1], 2)
        self.layer3 = self._make_layer(block, 256, layers[2], 2)
        self.layer4 = self._make_layer(block, 512, layers[3], 2)
        self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
        self.fc = nn.Linear(512 * block.expansion, num_classes)

    def _make_layer(self, block, planes, blocks, stride=1):
        downsample = None
        if stride != 1 or self.inplanes != planes * block.expansion:
            downsample = nn.Sequential(
                _conv1(self.inplanes, planes * block.expansion, stride),
                nn.BatchNorm2d(planes * block.expansion))
        mods = [block(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * block.expansion
        for _ in range(1, blocks):
            mods.append(block(self.inplanes, planes))
        return nn.Sequential(*mods)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        return self.fc(torch.flatten(self.avgpool(x), 1))


def _randomize_bn_stats(model: nn.Module, seed: int = 7) -> None:
    """Pretrained towers have non-trivial BN running stats; random init
    leaves them at 0/1, which would let a broken frozen-BN conversion slip
    through. Perturb them like the parity tests do."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.copy_(
                    torch.randn(m.running_mean.shape, generator=g) * 0.1)
                m.running_var.copy_(
                    torch.rand(m.running_var.shape, generator=g) + 0.5)


def _make_resnet(block, layers, seed):
    torch.manual_seed(seed)
    net = _ResNet(block, layers)
    _randomize_bn_stats(net, seed)
    return net


# --------------------------------------------------------------------------
# BackboneWithFPN (the ``fasterrcnn_resnet50_fpn(...).backbone`` surface)
# --------------------------------------------------------------------------


class _ResNetBody(nn.Module):
    """IntermediateLayerGetter equivalent: resnet sans avgpool/fc, returning
    the four stage outputs (torchvision keeps only these modules in
    ``backbone.body.*`` state-dict keys)."""

    def __init__(self, seed):
        super().__init__()
        full = _make_resnet(_Bottleneck, [3, 4, 6, 3], seed)
        self.conv1, self.bn1 = full.conv1, full.bn1
        self.relu, self.maxpool = full.relu, full.maxpool
        self.layer1, self.layer2 = full.layer1, full.layer2
        self.layer3, self.layer4 = full.layer3, full.layer4

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        c2 = self.layer1(x)
        c3 = self.layer2(c2)
        c4 = self.layer3(c3)
        c5 = self.layer4(c4)
        return [c2, c3, c4, c5]


class _FPN(nn.Module):
    def __init__(self, in_channels=(256, 512, 1024, 2048), out_channels=256):
        super().__init__()
        self.inner_blocks = nn.ModuleList(
            [nn.Conv2d(c, out_channels, 1) for c in in_channels])
        self.layer_blocks = nn.ModuleList(
            [nn.Conv2d(out_channels, out_channels, 3, padding=1)
             for _ in in_channels])

    def forward(self, feats):
        last_inner = self.inner_blocks[-1](feats[-1])
        results = [self.layer_blocks[-1](last_inner)]
        for i in range(len(feats) - 2, -1, -1):
            lateral = self.inner_blocks[i](feats[i])
            up = F.interpolate(last_inner, size=lateral.shape[-2:],
                               mode="nearest")
            last_inner = lateral + up
            results.insert(0, self.layer_blocks[i](last_inner))
        pool = F.max_pool2d(results[-1], 1, 2, 0)   # LastLevelMaxPool
        out = OrderedDict((str(i), r) for i, r in enumerate(results))
        out["pool"] = pool
        return out


class _BackboneWithFPN(nn.Module):
    def __init__(self, seed):
        super().__init__()
        self.body = _ResNetBody(seed)
        torch.manual_seed(seed + 1)
        self.fpn = _FPN()

    def forward(self, x):
        return self.fpn(self.body(x))


class _FasterRCNN:
    def __init__(self, seed):
        self.backbone = _BackboneWithFPN(seed)


# --------------------------------------------------------------------------
# sys.modules stub + from_pretrained patches
# --------------------------------------------------------------------------


def install_torchvision_stub(seed: int = 7) -> None:
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    models = types.ModuleType("torchvision.models")
    detection = types.ModuleType("torchvision.models.detection")
    models.resnet18 = lambda pretrained=False, **kw: _make_resnet(
        _BasicBlock, [2, 2, 2, 2], seed)
    models.resnet34 = lambda pretrained=False, **kw: _make_resnet(
        _BasicBlock, [3, 4, 6, 3], seed)
    models.resnet50 = lambda pretrained=False, **kw: _make_resnet(
        _Bottleneck, [3, 4, 6, 3], seed)
    detection.fasterrcnn_resnet50_fpn = (
        lambda pretrained=False, **kw: _FasterRCNN(seed))
    models.detection = detection
    tv.models = models
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = models
    sys.modules["torchvision.models.detection"] = detection


@contextlib.contextmanager
def reference_models_offline(seed: int = 11):
    """Patch HF from_pretrained to real-geometry config construction for
    the duration of the block (defaults ARE t5-base/vit-base/roberta-base)."""
    import transformers

    def _patched(factory):
        def from_pretrained(cls, name, *a, **kw):
            torch.manual_seed(seed)
            return cls(factory())
        return classmethod(from_pretrained)

    def _t5_base():
        # HF T5Config defaults are t5-SMALL; spell out t5-base geometry
        return transformers.T5Config(
            d_model=768, d_kv=64, d_ff=3072, num_layers=12,
            num_decoder_layers=12, num_heads=12)

    targets = [
        (transformers.T5ForQuestionAnswering, _t5_base),
        (transformers.T5ForConditionalGeneration, _t5_base),
        # ViTConfig defaults ARE vit-base; roberta-base differs from the
        # RobertaConfig defaults in position table (514: offset by
        # padding_idx+1) and token-type count
        (transformers.ViTModel, lambda: transformers.ViTConfig()),
        (transformers.RobertaModel, lambda: transformers.RobertaConfig(
            max_position_embeddings=514, type_vocab_size=1)),
    ]
    saved = [(c, c.from_pretrained) for c, _ in targets]
    try:
        for c, factory in targets:
            c.from_pretrained = _patched(factory)
        yield
    finally:
        for c, fp in saved:
            c.from_pretrained = fp


@contextlib.contextmanager
def vit_layer_tuple_compat():
    """transformers >= ~4.5x ViTLayer.forward returns a plain Tensor; the
    reference cross-attention model was written against the older tuple API
    and indexes ``[0]`` (vit_vqa_model.py:99-110). Restore tuple returns for
    the duration so the reference code runs exactly as authored. (Scoped:
    the patch would break ViTModel's own encoder loop in this transformers
    version, so it must only wrap direct reference-model calls.)"""
    from transformers.models.vit import modeling_vit

    orig = modeling_vit.ViTLayer.forward

    def forward(self, *a, **kw):
        out = orig(self, *a, **kw)
        return out if isinstance(out, tuple) else (out,)

    modeling_vit.ViTLayer.forward = forward
    try:
        yield
    finally:
        modeling_vit.ViTLayer.forward = orig


def load_reference_models():
    """Import the reference model modules (read-only oracle)."""
    install_torchvision_stub()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import model.faster_rcnn_vqa_model as frcnn_mod
    import model.resnet_vqa_model as resnet_mod
    import model.vit_vqa_model as vit_mod
    return resnet_mod, frcnn_mod, vit_mod
