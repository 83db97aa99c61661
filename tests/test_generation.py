"""Generation path: greedy + beam decoding over the ViT+T5 model."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from t5_resnet_vqa_tpu.core import constants
from t5_resnet_vqa_tpu.models.generation import beam_generate, greedy_generate
from t5_resnet_vqa_tpu.models.t5 import T5Config
from t5_resnet_vqa_tpu.models.vit import ViTConfig
from t5_resnet_vqa_tpu.models.vit_vqa import VitVQAModel


@pytest.fixture(scope="module")
def tiny_setup(rng):
    vit_cfg = ViTConfig.tiny()
    t5_cfg = T5Config(vocab_size=64, d_model=vit_cfg.hidden_size, d_kv=8,
                      d_ff=64, num_layers=1, num_decoder_layers=1,
                      num_heads=4)
    model = VitVQAModel(answer_spaces=5, t5_config=t5_cfg, vit_config=vit_cfg)
    B, Sq, Sd = 2, 6, 8
    batch = dict(
        question_input_ids=jnp.asarray(
            rng.integers(2, 64, size=(B, Sq)), jnp.int32),
        question_attention_masks=jnp.ones((B, Sq), jnp.int32),
        decoder_question_input_ids=jnp.asarray(
            rng.integers(2, 64, size=(B, Sd)), jnp.int32),
        decoder_question_attention_masks=jnp.asarray(
            [[1] * 8, [1] * 5 + [0] * 3], jnp.int32),
        pixel_values=jnp.asarray(
            rng.standard_normal(
                (B, vit_cfg.image_size, vit_cfg.image_size, 3)), jnp.float32),
        annotation_ids=jnp.asarray([0, 3], jnp.int32),
    )
    params = model.init(jax.random.PRNGKey(0), **batch)
    return model, params, batch


def test_setup_restructure_keeps_forward_working(tiny_setup):
    model, params, batch = tiny_setup
    log_probs, loss = model.apply(params, **batch)
    assert log_probs.shape == (2, 5)
    assert np.isfinite(float(loss))


def test_greedy_generate_shapes_and_determinism(tiny_setup):
    model, params, batch = tiny_setup
    args = (batch["question_input_ids"], batch["question_attention_masks"],
            batch["decoder_question_input_ids"],
            batch["decoder_question_attention_masks"],
            batch["pixel_values"])
    out1 = greedy_generate(model, params, *args, max_answer_length=4)
    out2 = greedy_generate(model, params, *args, max_answer_length=4)
    assert out1.shape == (2, 4)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    assert int(out1.max()) < 64
    # after EOS everything is pad
    arr = np.asarray(out1)
    for row in arr:
        seen_eos = False
        for tok in row:
            if seen_eos:
                assert tok == constants.PAD_TOKEN_ID
            if tok == constants.EOS_TOKEN_ID:
                seen_eos = True


def test_beam_equals_greedy_at_k1(tiny_setup):
    model, params, batch = tiny_setup
    args = (batch["question_input_ids"], batch["question_attention_masks"],
            batch["decoder_question_input_ids"],
            batch["decoder_question_attention_masks"],
            batch["pixel_values"])
    greedy = np.asarray(greedy_generate(model, params, *args,
                                        max_answer_length=3))
    beam, scores = beam_generate(model, params, *args, max_answer_length=3,
                                 num_beams=1)
    np.testing.assert_array_equal(np.asarray(beam), greedy)
    assert scores.shape == (2,)


def test_beam_scores_not_worse_than_greedy(tiny_setup):
    """Beam-3's (length-normalized) best score must be >= the greedy path's
    score of its own sequence under the same normalization."""
    model, params, batch = tiny_setup
    args = (batch["question_input_ids"], batch["question_attention_masks"],
            batch["decoder_question_input_ids"],
            batch["decoder_question_attention_masks"],
            batch["pixel_values"])
    _, s1 = beam_generate(model, params, *args, max_answer_length=3,
                          num_beams=1)
    _, s3 = beam_generate(model, params, *args, max_answer_length=3,
                          num_beams=3)
    assert (np.asarray(s3) >= np.asarray(s1) - 1e-4).all()
