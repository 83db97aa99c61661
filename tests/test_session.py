"""VQAInferenceSession: fixed-batch serving wrapper (pad + decode + top-k).

The reference has no programmatic inference API (inference only happens
inside the heatmap CLIs' loops); the session is new serving surface, so the
tests pin its contract: compiled-batch padding, answer decoding against the
checkpoint answer space, top-k ordering, and the checkpoint-contract error.
"""

import numpy as np
import pytest

import jax

from t5_resnet_vqa_tpu.core import Config
from t5_resnet_vqa_tpu.data import make_synthetic_daquar
from t5_resnet_vqa_tpu.eval import VQAInferenceSession
from t5_resnet_vqa_tpu.models.resnet_vqa import ResnetVQAModel
from t5_resnet_vqa_tpu.models.t5 import T5Config
from t5_resnet_vqa_tpu.ops import AttentionConfig
from t5_resnet_vqa_tpu.train.factory import CNN_FAMILY


@pytest.fixture(scope="module")
def tiny_session(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("daquar_serve"))
    root, kw = make_synthetic_daquar(root, num_train=4, num_test=6,
                                     image_size=64)
    import os
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
    session = VQAInferenceSession(model, params, answers, CNN_FAMILY,
                                  batch_size=4, image_size=64)
    images_dir = os.path.join(root, kw["images_dir"])
    image_paths = [os.path.join(images_dir, f)
                   for f in sorted(os.listdir(images_dir))]
    return session, answers, image_paths


def test_ask_single(tiny_session):
    session, answers, images = tiny_session
    res = session.ask(images[0], "what is on the table?", top_k=3)
    assert res["answer"] in answers
    assert len(res["top_answers"]) == 3
    assert res["top_answers"][0] == res["answer"]
    # probabilities sorted descending and in (0, 1]
    p = res["top_probs"]
    assert all(0.0 < x <= 1.0 for x in p)
    assert p == sorted(p, reverse=True)


def test_ask_batch_pads_and_chunks(tiny_session):
    session, answers, images = tiny_session
    # 6 requests through a compiled batch of 4 -> two chunks (4 + pad-2)
    reqs = [(images[i % len(images)], f"question {i}?") for i in range(6)]
    out = session.ask_batch(reqs, top_k=2)
    assert len(out) == 6
    assert all(r["answer"] in answers for r in out)
    # same request answers identically regardless of chunk position
    single = session.ask(reqs[0][0], reqs[0][1], top_k=2)
    assert single["top_answers"] == out[0]["top_answers"]


def test_from_checkpoint_requires_contract(tmp_path):
    cfg = Config()
    cfg.trainer.output_dir = str(tmp_path / "empty_run")
    with pytest.raises(FileNotFoundError, match="model_ckpt_info.json"):
        VQAInferenceSession.from_checkpoint(cfg)


def test_session_vit_family(tmp_path):
    """The ViT-family branch: pixel_values collate + enc-dec model."""
    import os
    from t5_resnet_vqa_tpu.data import make_synthetic_daquar
    from t5_resnet_vqa_tpu.models.t5 import T5Config
    from t5_resnet_vqa_tpu.models.vit import ViTConfig
    from t5_resnet_vqa_tpu.models.vit_vqa import VitVQAModel

    root, kw = make_synthetic_daquar(str(tmp_path / "d"), num_train=2,
                                     num_test=2, image_size=64)
    answers = [a.strip("\n") for a in
               open(os.path.join(root, kw["answer_spaces_file"]))]
    # tiny widths but 224^2 input geometry: the ViT collate always emits the
    # processor's 224^2 pixel_values
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
    session = VQAInferenceSession(model, params, answers, "vit",
                                  batch_size=2)
    images_dir = os.path.join(root, kw["images_dir"])
    img = os.path.join(images_dir, sorted(os.listdir(images_dir))[0])
    res = session.ask(img, "what is here?", top_k=2)
    assert res["answer"] in answers and len(res["top_answers"]) == 2


def test_session_generation_vit_family(tmp_path):
    """Serving-surface generation (VERDICT r2 #7): greedy + beam answers
    through the session for the ViT enc-dec family, pipelined/chunked like
    ask_batch; non-enc-dec families refuse with a clear error."""
    import os
    from t5_resnet_vqa_tpu.data import make_synthetic_daquar
    from t5_resnet_vqa_tpu.models.t5 import T5Config
    from t5_resnet_vqa_tpu.models.vit import ViTConfig
    from t5_resnet_vqa_tpu.models.vit_vqa import VitVQAModel

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
    session = VQAInferenceSession(model, params, answers, "vit",
                                  batch_size=2)
    images_dir = os.path.join(root, kw["images_dir"])
    imgs = [os.path.join(images_dir, f)
            for f in sorted(os.listdir(images_dir))]

    # greedy: 3 requests -> 2 chunks at batch_size 2 (pad + pipeline path)
    reqs = [(imgs[i % len(imgs)], f"what is here {i}?") for i in range(3)]
    greedy = session.generate_batch(reqs, max_answer_length=4)
    assert len(greedy) == 3
    for rec in greedy:
        assert isinstance(rec["answer_text"], str)
        assert all(isinstance(t, int) for t in rec["token_ids"])
        assert len(rec["token_ids"]) <= 4
        assert "score" not in rec

    # determinism across calls (jit cache reused)
    again = session.generate(reqs[0][0], reqs[0][1], max_answer_length=4)
    assert again["token_ids"] == greedy[0]["token_ids"]

    # beam returns scores; beam@1 == greedy tokens
    beam1 = session.generate_batch(reqs[:2], num_beams=1,
                                   max_answer_length=4)
    assert [b["token_ids"] for b in beam1] == \
        [g["token_ids"] for g in greedy[:2]]
    beam3 = session.generate_batch(reqs[:2], num_beams=3,
                                   max_answer_length=4)
    for rec in beam3:
        assert isinstance(rec["score"], float)



def test_session_generation_refuses_cnn_family(tiny_session):
    session, _, image_paths = tiny_session
    with pytest.raises(ValueError, match="ViT enc-dec"):
        session.generate(image_paths[0], "what?")
