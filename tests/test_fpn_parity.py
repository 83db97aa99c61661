"""FPN parity vs a torch golden implementing torchvision FPN semantics.

torchvision itself is absent from this image, so the golden is the FPN math
written out in torch (lateral 1x1 convs, nearest 2x top-down, 3x3 smoothing,
LastLevelMaxPool kernel-1/stride-2) — the documented behavior of
``fasterrcnn_resnet50_fpn().backbone.fpn`` consumed by the reference
(faster_rcnn_vqa_model.py:102-106).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from t5_resnet_vqa_tpu.models.fpn import FPN  # noqa: E402
from t5_resnet_vqa_tpu.utils import torch_convert as tc  # noqa: E402


def _torch_fpn_forward(inners, layers, feats):
    """torchvision FeaturePyramidNetwork.forward + LastLevelMaxPool."""
    n = len(feats)
    last_inner = inners[-1](feats[-1])
    results = [layers[-1](last_inner)]
    for i in range(n - 2, -1, -1):
        inner_lateral = inners[i](feats[i])
        up = torch.nn.functional.interpolate(
            last_inner, size=inner_lateral.shape[-2:], mode="nearest")
        last_inner = inner_lateral + up
        results.insert(0, layers[i](last_inner))
    pool = torch.nn.functional.max_pool2d(results[-1], 1, 2, 0)
    out = {str(i): r for i, r in enumerate(results)}
    out["pool"] = pool
    return out


def test_fpn_parity(rng):
    torch.manual_seed(0)
    in_chs = (16, 32, 64, 128)
    out_ch = 24
    inners = [torch.nn.Conv2d(c, out_ch, 1).eval() for c in in_chs]
    layers = [torch.nn.Conv2d(out_ch, out_ch, 3, padding=1).eval()
              for _ in in_chs]

    B = 2
    sizes = (32, 16, 8, 4)
    feats_nchw = [
        torch.tensor(rng.standard_normal((B, c, s, s), dtype=np.float32))
        for c, s in zip(in_chs, sizes)
    ]
    with torch.no_grad():
        want = _torch_fpn_forward(inners, layers, feats_nchw)

    sd = {}
    for i, m in enumerate(inners):
        for k, v in m.state_dict().items():
            sd[f"fpn.inner_blocks.{i}.{k}"] = v
    for i, m in enumerate(layers):
        for k, v in m.state_dict().items():
            sd[f"fpn.layer_blocks.{i}.{k}"] = v

    fpn = FPN(out_channels=out_ch)
    params = {"params": jax.tree.map(jnp.asarray, tc.convert_fpn(sd))}
    feats_nhwc = [jnp.asarray(f.numpy().transpose(0, 2, 3, 1))
                  for f in feats_nchw]
    got = fpn.apply(params, feats_nhwc)

    assert set(got.keys()) == {"0", "1", "2", "3", "pool"}
    for k in want:
        np.testing.assert_allclose(
            np.asarray(got[k]).transpose(0, 3, 1, 2), want[k].numpy(),
            rtol=1e-4, atol=1e-4, err_msg=f"level {k}")


def test_faster_rcnn_vqa_shapes():
    """256^2 input -> 'pool' level 4x4 -> 16 vision tokens (SURVEY C4)."""
    from t5_resnet_vqa_tpu.models.faster_rcnn_vqa import FasterRcnnVQAModel
    from t5_resnet_vqa_tpu.models.t5 import T5Config
    from t5_resnet_vqa_tpu.ops import AttentionConfig

    hidden = 32
    t5_cfg = T5Config(vocab_size=64, d_model=hidden, d_kv=8, d_ff=64,
                      num_layers=1, num_decoder_layers=1, num_heads=4)
    model = FasterRcnnVQAModel(
        answer_spaces=7, t5_config=t5_cfg,
        sga_config=AttentionConfig(hidden_size=hidden, num_heads=4,
                                   ff_size=hidden),
        num_attention_blocks=1, fpn_channels=16)
    B = 1
    batch = dict(
        question_input_ids=jnp.ones((B, 8), jnp.int32),
        question_attention_masks=jnp.ones((B, 8), jnp.int32),
        image_tensors=jnp.zeros((B, 256, 256, 3), jnp.float32),
        annotation_ids=jnp.zeros((B,), jnp.int32),
    )
    params = model.init(jax.random.PRNGKey(0), **batch)
    log_probs, loss, levels = model.apply(params, **batch,
                                          return_features=True)
    assert log_probs.shape == (B, 7)
    assert levels["pool"].shape == (B, 4, 4, 16)
    assert levels["0"].shape == (B, 64, 64, 16)
    assert float(loss) > 0
