"""Frozen-feature cache: exactness of the cached tower path.

The cache must change NOTHING about the training math — the tower is
gradient-isolated and the collates are deterministic per image
(train/feature_cache.py). Pins:
  * model-level: compute_vision_features == the in-graph tower output, and
    a forward fed cached features matches the image-fed forward;
  * trainer-level: a cached 1-epoch run reproduces the uncached run's
    losses.
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from t5_resnet_vqa_tpu.core import Config
from t5_resnet_vqa_tpu.data import load_answer_spaces, make_synthetic_daquar
from t5_resnet_vqa_tpu.models.faster_rcnn_vqa import FasterRcnnVQAModel
from t5_resnet_vqa_tpu.models.resnet_vqa import ResnetVQAModel
from t5_resnet_vqa_tpu.models.t5 import T5Config
from t5_resnet_vqa_tpu.models.vit import ViTConfig
from t5_resnet_vqa_tpu.models.vit_vqa import VitVQAModel
from t5_resnet_vqa_tpu.ops import AttentionConfig
from t5_resnet_vqa_tpu.train import VQATrainer

TINY_T5 = T5Config(vocab_size=32128, d_model=32, d_kv=8, d_ff=64,
                   num_layers=1, num_decoder_layers=1, num_heads=4)
TINY_SGA = AttentionConfig(hidden_size=32, num_heads=4, ff_size=32)


def _text_batch(rng, B):
    return dict(
        question_input_ids=jnp.asarray(
            rng.integers(2, 32100, size=(B, 16)), jnp.int32),
        question_attention_masks=jnp.ones((B, 16), jnp.int32),
        annotation_ids=jnp.asarray(rng.integers(0, 10, size=(B,)), jnp.int32),
    )


@pytest.mark.parametrize("model_cls,img_key,img_hw", [
    (ResnetVQAModel, "image_tensors", 64),
    (FasterRcnnVQAModel, "image_tensors", 64),
])
def test_cnn_family_cached_forward_matches(model_cls, img_key, img_hw):
    rng = np.random.default_rng(0)
    B = 4
    kwargs = dict(answer_spaces=10, t5_config=TINY_T5, sga_config=TINY_SGA,
                  num_attention_blocks=1)
    if model_cls is ResnetVQAModel:
        kwargs["vision_model_name"] = "resnet18"
    model = model_cls(**kwargs)
    batch = _text_batch(rng, B)
    imgs = jnp.asarray(rng.random((B, img_hw, img_hw, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), **batch, **{img_key: imgs}
                        )["params"]

    feats = model.compute_vision_features(params, imgs)
    lp_img, loss_img = model.apply({"params": params}, **batch,
                                   **{img_key: imgs})
    lp_cache, loss_cache = model.apply({"params": params}, **batch,
                                       vision_features=feats)
    np.testing.assert_allclose(np.asarray(lp_cache), np.asarray(lp_img),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(float(loss_cache), float(loss_img), rtol=1e-5)

    if model_cls is ResnetVQAModel:
        # the cached features ARE the in-graph C5 map (heatmap contract)
        _, _, fdict = model.apply({"params": params}, **batch,
                                  **{img_key: imgs}, return_features=True)
        np.testing.assert_allclose(np.asarray(feats),
                                   np.asarray(fdict["features"]),
                                   rtol=1e-6, atol=1e-6)


def test_vit_family_cached_forward_matches():
    rng = np.random.default_rng(1)
    B = 4
    model = VitVQAModel(answer_spaces=10, t5_config=TINY_T5,
                        vit_config=ViTConfig.tiny())
    batch = _text_batch(rng, B)
    batch.update(
        decoder_question_input_ids=jnp.asarray(
            rng.integers(2, 32100, size=(B, 20)), jnp.int32),
        decoder_question_attention_masks=jnp.ones((B, 20), jnp.int32))
    px = jnp.asarray(rng.random((B, 32, 32, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), **batch, pixel_values=px
                        )["params"]

    feats = model.compute_vision_features(params, px)
    assert feats.shape == (B, 32)
    lp_img, loss_img = model.apply({"params": params}, **batch,
                                   pixel_values=px)
    lp_cache, loss_cache = model.apply({"params": params}, **batch,
                                       vision_features=feats)
    np.testing.assert_allclose(np.asarray(lp_cache), np.asarray(lp_img),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(float(loss_cache), float(loss_img), rtol=1e-5)


def _tiny_trainer(root, out, answers, cache_on):
    cfg = Config()
    cfg.dataset.root_data_dir = root
    cfg.dataset.train_batch_size = 4
    cfg.dataset.test_batch_size = 4
    cfg.dataset.image_size = 64
    cfg.trainer.epochs = 1
    cfg.trainer.output_dir = str(out)
    cfg.trainer.seed = 0
    cfg.trainer.cache_frozen_features = cache_on
    cfg.callbacks.threshold = -1.0
    cfg.validate()
    model = ResnetVQAModel(
        answer_spaces=len(answers), vision_model_name="resnet18",
        t5_config=TINY_T5, sga_config=TINY_SGA, num_attention_blocks=1)
    return VQATrainer(model, cfg, answers)


def test_trainer_cached_run_matches_uncached(tmp_path):
    root = str(tmp_path / "data")
    make_synthetic_daquar(root, num_train=12, num_test=4, image_size=64)
    answers = load_answer_spaces(os.path.join(root, "answer_spaces.txt"))

    losses = {}
    for cache_on in (False, True):
        out = tmp_path / f"run_cache_{cache_on}"
        tr = _tiny_trainer(root, str(out), answers, cache_on)
        assert (tr._feature_cache is not None) == cache_on
        tr.train()
        metrics = [json.loads(l) for l in open(tr.tracker.path)]
        losses[cache_on] = (
            [m["train_avg_loss"] for m in metrics
             if m.get("_event") == "log" and "train_avg_loss" in m],
            [m["valid_avg_loss"] for m in metrics
             if m.get("_event") == "log" and "valid_avg_loss" in m])
    assert losses[True][0] and losses[True][1]
    np.testing.assert_allclose(losses[True][0], losses[False][0], rtol=2e-4)
    np.testing.assert_allclose(losses[True][1], losses[False][1], rtol=2e-4)
