"""Viz: CAM + attention-rollout math and the end-to-end heatmap harness."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from t5_resnet_vqa_tpu.data import (
    DaquarCnnCollate,
    DaquarDataset,
    DataLoader,
    load_answer_spaces,
    make_synthetic_daquar,
)
from t5_resnet_vqa_tpu.viz import (
    attention_rollout,
    compute_cam,
    generate_heatmaps,
    rollout_mask,
)


def test_compute_cam_matches_reference_math(rng):
    """channel-mean + min-max normalize (CNN_vqa_heatmap.py:135-137)."""
    feats_nhwc = rng.standard_normal((4, 4, 16), dtype=np.float32)
    cam = compute_cam(feats_nhwc)
    want = feats_nhwc.mean(axis=-1)
    want = (want - want.min()) / (want.max() - want.min())
    np.testing.assert_allclose(cam, want, rtol=1e-6, atol=1e-6)
    assert cam.min() == 0.0 and cam.max() == 1.0


def test_attention_rollout_matches_reference_math(rng):
    """mean-heads, +I, row-normalize, chained matmul (ViT_vqa_heatmap.py
    :116-130), transcribed in plain numpy as the golden."""
    L, H, S = 3, 2, 5
    att = rng.random((L, H, S, S)).astype(np.float32)
    att = att / att.sum(axis=-1, keepdims=True)

    a = att.mean(axis=1)
    aug = a + np.eye(S, dtype=np.float32)
    aug = aug / aug.sum(axis=-1, keepdims=True)
    joint = [aug[0]]
    for n in range(1, L):
        joint.append(aug[n] @ joint[-1])
    want = joint[-1]

    got = attention_rollout(att)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    # CLS-row mask reshapes to the sqrt grid (ref :136-138)
    att197 = rng.random((2, 3, 17, 17)).astype(np.float32)
    assert rollout_mask(att197).shape == (4, 4)


def test_generate_heatmaps_end_to_end(tmp_path, rng):
    """Tiny ResnetVQAModel + synthetic DAQUAR through the full harness:
    overlays written, perfect/imperfect routing, avg WUPS returned."""
    from t5_resnet_vqa_tpu.models.resnet_vqa import ResnetVQAModel
    from t5_resnet_vqa_tpu.models.t5 import T5Config
    from t5_resnet_vqa_tpu.ops import AttentionConfig

    root = str(tmp_path / "data")
    os.makedirs(root)
    root, _ = make_synthetic_daquar(root, num_train=4, num_test=6,
                                    image_size=64)
    answers = load_answer_spaces(os.path.join(root, "answer_spaces.txt"))
    ds = DaquarDataset(root, "test.csv", "images", "test")
    collate = DaquarCnnCollate(answers, resizing_dimensions=(64, 64),
                               eval_mode=True, seed=0)
    loader = DataLoader(ds, collate, batch_size=4, drop_remainder=False)

    hidden = 32
    model = ResnetVQAModel(
        answer_spaces=len(answers), vision_model_name="resnet18",
        t5_config=T5Config(vocab_size=32128, d_model=hidden, d_kv=8, d_ff=64,
                           num_layers=1, num_decoder_layers=1, num_heads=4),
        sga_config=AttentionConfig(hidden_size=hidden, num_heads=4,
                                   ff_size=hidden),
        num_attention_blocks=1)
    sample = collate([ds[0]])
    device_batch = {k: v for k, v in sample.items()
                    if k not in ("answers", "questions", "image_fns")}
    params = model.init(jax.random.PRNGKey(0), **device_batch)["params"]

    @jax.jit
    def infer(batch):
        log_probs, _, features = model.apply(
            {"params": params}, **batch, deterministic=True,
            return_features=True)
        return {"log_probs": log_probs, "features": features["features"]}

    out_dir = str(tmp_path / "heatmaps")
    avg = generate_heatmaps(infer, loader, answers, out_dir, mode="cam",
                            top_k=3)
    assert 0.0 <= avg <= 1.0

    sample_dirs = []
    for sub in ("perfect_match_predictions", "imperfect_match_predictions"):
        base = os.path.join(out_dir, sub)
        sample_dirs += [os.path.join(base, d) for d in os.listdir(base)]
    assert len(sample_dirs) == 6          # one dir per test sample
    d = sample_dirs[0]
    files = os.listdir(d)
    assert any(f.startswith("heatmap_") for f in files)
    assert any(f.startswith("original_") for f in files)
    rec = json.load(open(os.path.join(d, "predictions.json")))
    assert {"question", "predicted_answer", "target_answer",
            "wups_score", "topk_predictions"} <= set(rec)
