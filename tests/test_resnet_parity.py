"""ResNet backbone parity vs randomly-initialized HF torch ResNet.

The reference's vision towers are torchvision resnet18/34/50 run frozen in
eval mode (resnet_vqa_model.py:51-58, 115-135). torchvision is absent from
this image, so parity is checked against ``transformers.ResNetModel`` — the
same ResNet v1.5 graph (microsoft/resnet-50 weights were converted from the
torchvision lineage). BatchNorm running stats are randomized so the frozen-BN
folding is actually exercised.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from t5_resnet_vqa_tpu.models.resnet import ResNetBackbone, resnet_out_channels  # noqa: E402
from t5_resnet_vqa_tpu.utils import torch_convert as tc  # noqa: E402


def _hf_resnet(variant: str):
    depths = {"resnet18": [2, 2, 2, 2], "resnet34": [3, 4, 6, 3],
              "resnet50": [3, 4, 6, 3]}[variant]
    if variant == "resnet50":
        hidden_sizes = [256, 512, 1024, 2048]
        layer_type = "bottleneck"
    else:
        hidden_sizes = [64, 128, 256, 512]
        layer_type = "basic"
    cfg = transformers.ResNetConfig(
        num_channels=3, embedding_size=64, hidden_sizes=hidden_sizes,
        depths=depths, layer_type=layer_type, hidden_act="relu",
        downsample_in_first_stage=False,
    )
    return transformers.ResNetModel(cfg).eval()


def _randomize_bn_stats(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
            m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)


@pytest.mark.parametrize("variant", ["resnet18", "resnet50"])
@pytest.mark.slow
def test_resnet_parity(variant, rng):
    torch.manual_seed(0)
    hf = _hf_resnet(variant)
    with torch.no_grad():
        _randomize_bn_stats(hf)

    x = rng.standard_normal((1, 3, 64, 64), dtype=np.float32)

    with torch.no_grad():
        want = hf(torch.tensor(x)).last_hidden_state.numpy()   # NCHW C5

    backbone = ResNetBackbone(variant=variant)
    params = {"params": jax.tree.map(
        jnp.asarray, tc.convert_resnet_hf(hf.state_dict(), variant))}
    feats = backbone.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    got = np.asarray(feats[-1]).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_space_to_depth_stem_exact(rng):
    """The s2d stem is the same math as the direct 7x7/s2 conv."""
    import jax.numpy as jnp
    from t5_resnet_vqa_tpu.models.resnet import StemConv

    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3), dtype=np.float32))
    direct = StemConv(use_s2d=False)
    fast = StemConv(use_s2d=True)
    params = direct.init(jax.random.PRNGKey(0), x)
    a = direct.apply(params, x)
    b = fast.apply(params, x)
    assert a.shape == b.shape == (2, 32, 32, 64)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)


def test_resnet_output_geometry():
    """256x256 input -> 8x8 C5 map = 64 vision tokens (SURVEY §2 C3)."""
    backbone = ResNetBackbone(variant="resnet18")
    params = backbone.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 256, 256, 3), jnp.float32))
    feats = backbone.apply(params, jnp.zeros((1, 256, 256, 3), jnp.float32))
    assert [f.shape for f in feats] == [
        (1, 64, 64, 64), (1, 32, 32, 128), (1, 16, 16, 256), (1, 8, 8, 512)]
    assert resnet_out_channels("resnet18") == 512
    assert resnet_out_channels("resnet50") == 2048
