"""uint8 wire format: collates emit resized uint8, models finalize on device.

The TPU-first H2D optimization (dataset_kwargs.uint8_wire_images): 1 byte/px
over host->device instead of 4, with the /255 (+ ViT mean/std normalize)
fused into the model's first device op. These tests pin the contract that
the uint8-wire and fp32-wire paths produce IDENTICAL logits (the device
finalize replays data.preprocessing.finalize_image's fp32 math exactly).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from t5_resnet_vqa_tpu.data import make_synthetic_daquar
from t5_resnet_vqa_tpu.data.collate import DaquarCnnCollate, DaquarVitCollate
from t5_resnet_vqa_tpu.data.daquar import DaquarDataset
from t5_resnet_vqa_tpu.models.image_input import finalize_image_input


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("daquar_u8"))
    root, kw = make_synthetic_daquar(root, num_train=4, num_test=4,
                                     image_size=64, source_hw=(96, 128))
    answers = [a.strip("\n") for a in
               open(os.path.join(root, kw["answer_spaces_file"]))]
    ds = DaquarDataset(root, kw["train_csv_file"], kw["images_dir"], "train")
    samples = [ds[i] for i in range(4)]
    return answers, samples


def test_cnn_collate_uint8_matches_fp32(synth):
    answers, samples = synth
    kw = dict(resizing_dimensions=(64, 64), seed=0)
    # the reference path resizes in uint8 then scales (cv2 preserves dtype,
    # ref :153-171) == python fp32 path here; the uint8 wire must match it
    # bit for bit. The native fp32 path keeps fractional resample precision
    # and sits within 1 uint8 LSB of both (test_native_preproc).
    b_f32 = DaquarCnnCollate(answers, use_native=False, **kw)(samples)
    b_u8 = DaquarCnnCollate(answers, emit_uint8=True, **kw)(samples)
    b_nat = DaquarCnnCollate(answers, use_native=True, **kw)(samples)
    assert b_u8["image_tensors"].dtype == np.uint8
    assert b_f32["image_tensors"].dtype == np.float32
    dev = np.asarray(finalize_image_input(jnp.asarray(b_u8["image_tensors"])))
    np.testing.assert_array_equal(dev, b_f32["image_tensors"])
    np.testing.assert_allclose(dev, b_nat["image_tensors"], atol=2 / 255)


def test_vit_collate_uint8_matches_fp32(synth):
    answers, samples = synth
    from t5_resnet_vqa_tpu.core import constants
    b_f32 = DaquarVitCollate(answers, seed=0, use_native=False)(samples)
    b_u8 = DaquarVitCollate(answers, seed=0, emit_uint8=True)(samples)
    assert b_u8["pixel_values"].dtype == np.uint8
    dev = np.asarray(finalize_image_input(
        jnp.asarray(b_u8["pixel_values"]),
        (constants.VIT_IMAGE_MEAN, constants.VIT_IMAGE_STD)))
    np.testing.assert_allclose(dev, b_f32["pixel_values"], atol=1e-6)


def test_model_logits_identical_across_wire_formats(synth):
    answers, samples = synth
    from t5_resnet_vqa_tpu.models.resnet_vqa import ResnetVQAModel
    from t5_resnet_vqa_tpu.models.t5 import T5Config
    from t5_resnet_vqa_tpu.ops import AttentionConfig

    hidden = 32
    model = ResnetVQAModel(
        answer_spaces=len(answers), vision_model_name="resnet18",
        t5_config=T5Config(vocab_size=32128, d_model=hidden, d_kv=8,
                           d_ff=64, num_layers=1, num_decoder_layers=1,
                           num_heads=4),
        sga_config=AttentionConfig(hidden_size=hidden, num_heads=4,
                                   ff_size=hidden),
        num_attention_blocks=1)

    kw = dict(resizing_dimensions=(64, 64), seed=0)
    b_f32 = DaquarCnnCollate(answers, use_native=False, **kw)(samples)
    b_u8 = DaquarCnnCollate(answers, emit_uint8=True, **kw)(samples)
    feed_f32 = {k: v for k, v in b_f32.items() if k != "annotation_ids"}
    feed_u8 = {k: v for k, v in b_u8.items() if k != "annotation_ids"}
    # same seed -> identical text feeds; only the image dtype differs
    np.testing.assert_array_equal(feed_f32["question_input_ids"],
                                  feed_u8["question_input_ids"])

    params = model.init(jax.random.PRNGKey(0), **feed_f32)["params"]
    lp_f32, _ = model.apply({"params": params}, **feed_f32)
    lp_u8, _ = model.apply({"params": params}, **feed_u8)
    np.testing.assert_array_equal(np.asarray(lp_f32), np.asarray(lp_u8))
