"""Fused Pallas bottleneck kernel vs the unfused flax block.

The kernel is a documented negative result on the real chip (it loses to
XLA's conv pipeline end-to-end — ops/pallas/bottleneck.py docstring), but
it stays in-repo as an opt-in experiment surface, so its numerics stay
pinned: interpreter mode on CPU here, the same kernel body that compiles
on TPU.

Tolerance: the kernel folds the FrozenBatchNorm scale into the conv
weights (one extra bf16 re-rounding of the weights) and applies bias in
f32 before the bf16 cast, so agreement with the unfused block is at the
bf16 ulp scale, not bitwise — 2% relative max-abs covers the observed
~0.7% across geometries.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from t5_resnet_vqa_tpu.models.resnet import Bottleneck, fused_backbone_apply
from t5_resnet_vqa_tpu.ops.pallas.bottleneck import fused_bottleneck

TOL = 2e-2


def _rel_err(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return float(np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9))


@pytest.mark.parametrize(
    "H,Cin,width,stride,ds",
    [
        (16, 64, 64, 1, True),     # layer1 block0 shape (stage entry)
        (16, 256, 64, 1, False),   # layer1 blocks 1-2 shape
        (16, 256, 128, 2, True),   # layer2 block0 shape (strided + ds)
    ],
)
def test_fused_block_matches_module(H, Cin, width, stride, ds):
    rng = jax.random.PRNGKey(0)
    blk = Bottleneck(width=width, stride=stride, has_downsample=ds,
                     dtype=jnp.bfloat16)
    x = jax.random.normal(rng, (2, H, H, Cin), jnp.bfloat16)
    params = blk.init(rng, x)["params"]
    ref = blk.apply({"params": params}, x)
    out = fused_bottleneck(x, params, stride=stride, has_downsample=ds,
                           interpret=True)
    assert out is not None
    assert out.shape == ref.shape and out.dtype == ref.dtype
    assert _rel_err(ref, out) < TOL


def test_fused_block_declines_off_tpu():
    # interpret=None + CPU platform -> caller must fall back
    blk = Bottleneck(width=64, stride=1, has_downsample=True,
                     dtype=jnp.bfloat16)
    x = jnp.zeros((1, 8, 8, 64), jnp.bfloat16)
    params = blk.init(jax.random.PRNGKey(0), x)["params"]
    assert fused_bottleneck(x, params, stride=1, has_downsample=True) is None


def test_fused_backbone_apply_basic_block_fallback():
    """resnet18 has BasicBlocks — the fused kernel never applies, and the
    routing must reproduce the module path exactly (same code path)."""
    from t5_resnet_vqa_tpu.models.resnet import ResNetBackbone

    rng = jax.random.PRNGKey(2)
    bb = ResNetBackbone(variant="resnet18", dtype=jnp.bfloat16)
    x = jax.random.normal(rng, (1, 32, 32, 3), jnp.bfloat16)
    params = bb.init(rng, x)["params"]
    ref = bb.apply({"params": params}, x)
    out = fused_backbone_apply(params, x, variant="resnet18",
                               dtype=jnp.bfloat16, interpret=True)
    for r, o in zip(ref, out):
        np.testing.assert_array_equal(np.asarray(r, np.float32),
                                      np.asarray(o, np.float32))


def test_fused_backbone_apply_matches_module():
    """Whole-backbone routing: stage-0 blocks fused (interpreter), the
    rest through the module path; must agree with the plain module apply
    and return the same 4-level feature pyramid."""
    from t5_resnet_vqa_tpu.models.resnet import ResNetBackbone

    rng = jax.random.PRNGKey(1)
    bb = ResNetBackbone(variant="resnet50", dtype=jnp.bfloat16)
    x = jax.random.normal(rng, (1, 32, 32, 3), jnp.bfloat16)
    params = bb.init(rng, x)["params"]
    ref = bb.apply({"params": params}, x)
    out = fused_backbone_apply(params, x, variant="resnet50",
                               dtype=jnp.bfloat16, fuse_stages=(0,),
                               interpret=True)
    assert len(out) == len(ref) == 4
    for r, o in zip(ref, out):
        assert o.shape == r.shape
        assert _rel_err(r, o) < TOL
