"""Mesh-sharded serving: VQAInferenceSession(mesh=...) answer parity.

The reference has no serving path at all and no distributed support
(SURVEY §2); mesh serving is new TPU-native capability, so the contract is
pinned against our own single-device session: identical answers, identical
probabilities, for pure-dp (8x1) and dp x tp (4x2) meshes of 8 virtual CPU
devices, on both the classification (ask_batch) and the generative
(generate_batch, ViT enc-dec) surfaces.
"""

import os

import numpy as np
import pytest

import jax

from t5_resnet_vqa_tpu.data import make_synthetic_daquar
from t5_resnet_vqa_tpu.eval import VQAInferenceSession
from t5_resnet_vqa_tpu.models.resnet_vqa import ResnetVQAModel
from t5_resnet_vqa_tpu.models.t5 import T5Config
from t5_resnet_vqa_tpu.models.vit import ViTConfig
from t5_resnet_vqa_tpu.models.vit_vqa import VitVQAModel
from t5_resnet_vqa_tpu.ops import AttentionConfig
from t5_resnet_vqa_tpu.parallel.sharding import make_mesh
from t5_resnet_vqa_tpu.train.factory import CNN_FAMILY

pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices")]


@pytest.fixture(scope="module")
def cnn_setup(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("daquar_mesh_serve"))
    root, kw = make_synthetic_daquar(root, num_train=4, num_test=6,
                                     image_size=64)
    answers = [a.strip("\n") for a in
               open(os.path.join(root, kw["answer_spaces_file"]))]
    hidden = 32
    model = ResnetVQAModel(
        answer_spaces=len(answers), vision_model_name="resnet18",
        t5_config=T5Config(vocab_size=32128, d_model=hidden, d_kv=8,
                           d_ff=64, num_layers=1, num_decoder_layers=1,
                           num_heads=4),
        sga_config=AttentionConfig(hidden_size=hidden, num_heads=4,
                                   ff_size=hidden),
        num_attention_blocks=1)
    rng = np.random.default_rng(0)
    params = model.init(
        jax.random.PRNGKey(0),
        question_input_ids=np.zeros((2, 16), np.int32),
        question_attention_masks=np.ones((2, 16), np.int32),
        image_tensors=rng.random((2, 64, 64, 3)).astype(np.float32),
    )["params"]
    images_dir = os.path.join(root, kw["images_dir"])
    image_paths = [os.path.join(images_dir, f)
                   for f in sorted(os.listdir(images_dir))]
    reqs = [(image_paths[i % len(image_paths)], f"what is item {i}?")
            for i in range(11)]   # 11 through batch 8 -> full chunk + pad
    return model, params, answers, reqs


def _answers(session, reqs):
    out = session.ask_batch(reqs, top_k=3)
    return ([r["top_answers"] for r in out],
            np.array([r["top_probs"] for r in out]))


@pytest.mark.parametrize("dp,tp", [(8, 1), (4, 2)])
def test_mesh_serving_matches_single_device(cnn_setup, dp, tp):
    model, params, answers, reqs = cnn_setup
    base = VQAInferenceSession(model, params, answers, CNN_FAMILY,
                               batch_size=8, image_size=64)
    ref_answers, ref_probs = _answers(base, reqs)

    mesh = make_mesh(dp, tp)
    ms = VQAInferenceSession(model, params, answers, CNN_FAMILY,
                             batch_size=8, image_size=64, mesh=mesh)
    got_answers, got_probs = _answers(ms, reqs)
    assert got_answers == ref_answers
    np.testing.assert_allclose(got_probs, ref_probs, rtol=1e-5, atol=1e-6)


def test_mesh_serving_rejects_indivisible_batch(cnn_setup):
    model, params, answers, _ = cnn_setup
    with pytest.raises(ValueError, match="data axis"):
        VQAInferenceSession(model, params, answers, CNN_FAMILY,
                            batch_size=6, image_size=64,
                            mesh=make_mesh(4, 2))


def test_mesh_serving_generation_vit_family(tmp_path):
    """generate_batch under a dp mesh: token-identical to single-device
    (the lax.scan greedy decode runs under GSPMD with the batch sharded)."""
    root, kw = make_synthetic_daquar(str(tmp_path / "d"), num_train=2,
                                     num_test=2, image_size=64)
    answers = [a.strip("\n") for a in
               open(os.path.join(root, kw["answer_spaces_file"]))]
    model = VitVQAModel(
        answer_spaces=len(answers),
        vit_config=ViTConfig(hidden_size=32, num_layers=1, num_heads=4,
                             mlp_dim=64, patch_size=32, image_size=224),
        t5_config=T5Config(vocab_size=32128, d_model=32, d_kv=8, d_ff=64,
                           num_layers=1, num_decoder_layers=1, num_heads=4))
    rng = np.random.default_rng(0)
    params = model.init(
        jax.random.PRNGKey(0),
        question_input_ids=np.zeros((1, 16), np.int32),
        question_attention_masks=np.ones((1, 16), np.int32),
        decoder_question_input_ids=np.zeros((1, 20), np.int32),
        decoder_question_attention_masks=np.ones((1, 20), np.int32),
        pixel_values=rng.random((1, 224, 224, 3)).astype(np.float32),
    )["params"]
    images_dir = os.path.join(root, kw["images_dir"])
    imgs = [os.path.join(images_dir, f)
            for f in sorted(os.listdir(images_dir))]
    reqs = [(imgs[i % len(imgs)], f"what is here {i}?") for i in range(3)]

    base = VQAInferenceSession(model, params, answers, "vit", batch_size=8)
    ref = base.generate_batch(reqs, max_answer_length=4)

    ms = VQAInferenceSession(model, params, answers, "vit", batch_size=8,
                             mesh=make_mesh(8, 1))
    got = ms.generate_batch(reqs, max_answer_length=4)
    assert [r["token_ids"] for r in got] == [r["token_ids"] for r in ref]

    # beam search under the mesh (ADVICE r4 #3): the decode reshapes to
    # batch*num_beams along the data-sharded batch dim — pin tokens AND
    # scores against the single-device session so that reshape provably
    # survives GSPMD sharding instead of silently mis-permuting beams.
    ref_beam = base.generate_batch(reqs, num_beams=3, max_answer_length=4)
    got_beam = ms.generate_batch(reqs, num_beams=3, max_answer_length=4)
    assert ([r["token_ids"] for r in got_beam]
            == [r["token_ids"] for r in ref_beam])
    np.testing.assert_allclose(
        [r["score"] for r in got_beam], [r["score"] for r in ref_beam],
        rtol=1e-5, atol=1e-6)
