"""Reference-checkpoint import: converters for the remaining three families
produce EXACTLY the flax param trees (paths + shapes), and the import tool
writes a checkpoint this framework's surfaces can restore.

Pattern follows test_converter_trees.py: synthetic torch state dicts with
the reference models' tensor names (vit_vqa_model.py:129-166 /
faster_rcnn_vqa_model.py:28-86 / vit_vqa_model.py:24-63), tiny geometry.
"""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from t5_resnet_vqa_tpu.models.cross_attention_vqa import (  # noqa: E402
    CrossAttentionVitVQAModel)
from t5_resnet_vqa_tpu.models.roberta import RobertaConfig  # noqa: E402
from t5_resnet_vqa_tpu.models.t5 import T5Config  # noqa: E402
from t5_resnet_vqa_tpu.models.vit import ViTConfig  # noqa: E402
from t5_resnet_vqa_tpu.models.vit_vqa import VitVQAModel  # noqa: E402
from t5_resnet_vqa_tpu.utils import torch_convert as tc  # noqa: E402


def t(*shape):
    return torch.randn(*shape) * 0.02


def tree_shapes(params):
    return {
        "/".join(str(getattr(e, "key", e)) for e in path):
            tuple(np.asarray(leaf).shape)
        for path, leaf in jax.tree_util.tree_leaves_with_path(params)
    }


def _t5_stack_sd(sd, prefix, n_layers, d, d_ff, heads, buckets=32):
    for i in range(n_layers):
        b = f"{prefix}.block.{i}"
        for nm in ("q", "k", "v", "o"):
            sd[f"{b}.layer.0.SelfAttention.{nm}.weight"] = t(d, d)
        if i == 0:
            sd[f"{b}.layer.0.SelfAttention.relative_attention_bias.weight"] \
                = t(buckets, heads)
        sd[f"{b}.layer.0.layer_norm.weight"] = t(d)
        sd[f"{b}.layer.1.DenseReluDense.wi.weight"] = t(d_ff, d)
        sd[f"{b}.layer.1.DenseReluDense.wo.weight"] = t(d, d_ff)
        sd[f"{b}.layer.1.layer_norm.weight"] = t(d)
    sd[f"{prefix}.final_layer_norm.weight"] = t(d)


def _t5_decoder_sd(sd, prefix, n_layers, d, d_ff, heads, buckets=32):
    for i in range(n_layers):
        b = f"{prefix}.block.{i}"
        for nm in ("q", "k", "v", "o"):
            sd[f"{b}.layer.0.SelfAttention.{nm}.weight"] = t(d, d)
            sd[f"{b}.layer.1.EncDecAttention.{nm}.weight"] = t(d, d)
        if i == 0:
            sd[f"{b}.layer.0.SelfAttention.relative_attention_bias.weight"] \
                = t(buckets, heads)
        sd[f"{b}.layer.0.layer_norm.weight"] = t(d)
        sd[f"{b}.layer.1.layer_norm.weight"] = t(d)
        sd[f"{b}.layer.2.DenseReluDense.wi.weight"] = t(d_ff, d)
        sd[f"{b}.layer.2.DenseReluDense.wo.weight"] = t(d, d_ff)
        sd[f"{b}.layer.2.layer_norm.weight"] = t(d)
    sd[f"{prefix}.final_layer_norm.weight"] = t(d)


def _hf_vit_layer_sd(sd, lp, d, mlp):
    for nm in ("query", "key", "value"):
        sd[f"{lp}.attention.attention.{nm}.weight"] = t(d, d)
        sd[f"{lp}.attention.attention.{nm}.bias"] = t(d)
    sd[f"{lp}.attention.output.dense.weight"] = t(d, d)
    sd[f"{lp}.attention.output.dense.bias"] = t(d)
    for nm in ("layernorm_before", "layernorm_after"):
        sd[f"{lp}.{nm}.weight"] = t(d)
        sd[f"{lp}.{nm}.bias"] = t(d)
    sd[f"{lp}.intermediate.dense.weight"] = t(mlp, d)
    sd[f"{lp}.intermediate.dense.bias"] = t(mlp)
    sd[f"{lp}.output.dense.weight"] = t(d, mlp)
    sd[f"{lp}.output.dense.bias"] = t(d)


def _vit_embeddings_sd(sd, prefix, d, patch, n_patches):
    sd[f"{prefix}.cls_token"] = t(1, 1, d)
    sd[f"{prefix}.position_embeddings"] = t(1, n_patches + 1, d)
    sd[f"{prefix}.patch_embeddings.projection.weight"] = t(d, 3, patch, patch)
    sd[f"{prefix}.patch_embeddings.projection.bias"] = t(d)


def test_vit_vqa_checkpoint_converter_tree():
    torch.manual_seed(0)
    vit = ViTConfig.tiny()
    t5 = T5Config(vocab_size=128, d_model=32, d_kv=8, d_ff=64,
                  num_layers=2, num_decoder_layers=2, num_heads=4)
    d, answers = 32, 7

    sd = {}
    # HF ViTModel under vision_model.*
    _vit_embeddings_sd(sd, "vision_model.embeddings", d, vit.patch_size,
                       vit.num_patches)
    for i in range(vit.num_layers):
        _hf_vit_layer_sd(sd, f"vision_model.encoder.layer.{i}", d,
                         vit.mlp_dim)
    sd["vision_model.layernorm.weight"] = t(d)
    sd["vision_model.layernorm.bias"] = t(d)
    sd["vision_model.pooler.dense.weight"] = t(d, d)
    sd["vision_model.pooler.dense.bias"] = t(d)
    # full T5ForConditionalGeneration under lang_model.*
    sd["lang_model.shared.weight"] = t(t5.vocab_size, d)
    _t5_stack_sd(sd, "lang_model.encoder", t5.num_layers, d, t5.d_ff,
                 t5.num_heads)
    _t5_decoder_sd(sd, "lang_model.decoder", t5.num_decoder_layers, d,
                   t5.d_ff, t5.num_heads)
    # fusing Sequential + classifier
    sd["fusing_layer.0.weight"] = t(d, 2 * d)
    sd["fusing_layer.0.bias"] = t(d)
    sd["classification_layer.weight"] = t(answers, d)
    sd["classification_layer.bias"] = t(answers)

    converted = tc.convert_vit_vqa_checkpoint(
        sd, num_vit_layers=vit.num_layers, num_t5_layers=t5.num_layers)

    model = VitVQAModel(answer_spaces=answers, vit_config=vit, t5_config=t5)
    init = model.init(
        jax.random.PRNGKey(0),
        question_input_ids=jnp.ones((1, 16), jnp.int32),
        question_attention_masks=jnp.ones((1, 16), jnp.int32),
        decoder_question_input_ids=jnp.ones((1, 20), jnp.int32),
        decoder_question_attention_masks=jnp.ones((1, 20), jnp.int32),
        pixel_values=jnp.zeros((1, vit.image_size, vit.image_size, 3),
                               jnp.float32))["params"]
    assert tree_shapes(converted) == tree_shapes(init)


def test_cross_attention_checkpoint_converter_tree():
    torch.manual_seed(0)
    vit = ViTConfig.tiny()
    rb = RobertaConfig(vocab_size=128, hidden_size=32, num_layers=2,
                       num_heads=4, intermediate_size=64)
    d, answers = 32, 7

    sd = {}
    # roberta_embeddings.* (HF RobertaModel.embeddings names)
    sd["roberta_embeddings.word_embeddings.weight"] = t(rb.vocab_size, d)
    sd["roberta_embeddings.position_embeddings.weight"] = t(514, d)
    sd["roberta_embeddings.token_type_embeddings.weight"] = t(1, d)
    sd["roberta_embeddings.LayerNorm.weight"] = t(d)
    sd["roberta_embeddings.LayerNorm.bias"] = t(d)
    _vit_embeddings_sd(sd, "vit_embeddings", d, vit.patch_size,
                       vit.num_patches)
    for i in range(2):
        lp = f"roberta_encoder_layers.{i}"
        for nm in ("query", "key", "value"):
            sd[f"{lp}.attention.self.{nm}.weight"] = t(d, d)
            sd[f"{lp}.attention.self.{nm}.bias"] = t(d)
        sd[f"{lp}.attention.output.dense.weight"] = t(d, d)
        sd[f"{lp}.attention.output.dense.bias"] = t(d)
        sd[f"{lp}.attention.output.LayerNorm.weight"] = t(d)
        sd[f"{lp}.attention.output.LayerNorm.bias"] = t(d)
        sd[f"{lp}.intermediate.dense.weight"] = t(rb.intermediate_size, d)
        sd[f"{lp}.intermediate.dense.bias"] = t(rb.intermediate_size)
        sd[f"{lp}.output.dense.weight"] = t(d, rb.intermediate_size)
        sd[f"{lp}.output.dense.bias"] = t(d)
        sd[f"{lp}.output.LayerNorm.weight"] = t(d)
        sd[f"{lp}.output.LayerNorm.bias"] = t(d)
        _hf_vit_layer_sd(sd, f"vit_encoder_layers.{i}", d, vit.mlp_dim)
    sd["layer_norm.weight"] = t(d)
    sd["layer_norm.bias"] = t(d)
    sd["attention_pooler.attention.0.weight"] = t(1, d)
    sd["attention_pooler.attention.0.bias"] = t(1)
    sd["classification_layer.weight"] = t(answers, d)
    sd["classification_layer.bias"] = t(answers)

    converted = tc.convert_cross_attention_vqa_checkpoint(sd, num_layers=2)

    model = CrossAttentionVitVQAModel(answer_spaces=answers, vit_config=vit,
                                      roberta_config=rb)
    init = model.init(
        jax.random.PRNGKey(0),
        question_input_ids=jnp.ones((1, 16), jnp.int32),
        pixel_values=jnp.zeros((1, vit.image_size, vit.image_size, 3),
                               jnp.float32))["params"]
    assert tree_shapes(converted) == tree_shapes(init)


def test_import_tool_writes_restorable_checkpoint(tmp_path):
    """End-to-end: reference-shaped resnet18 best-model.pt + ckpt-info json
    -> orbax best-model the CheckpointManager (and thus the heatmap CLI /
    serving session) restores."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    from test_converter_trees import _fake_reference_state_dict

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
    import import_reference_checkpoint as tool

    torch.manual_seed(0)
    sd = _fake_reference_state_dict()
    pt = tmp_path / "best-model.pt"
    torch.save(sd, str(pt))
    info = tmp_path / "model_ckpt_info.json"
    answers = [f"a{i}" for i in range(7)]
    json.dump({"epoch": 3, "best_score": 0.41, "answer_spaces": answers},
              open(info, "w"))
    cfg_path = tmp_path / "cfg.json"
    json.dump({
        "model_kwargs": {"vision_model_name": "resnet18",
                         "num_attention_blocks": 1},
        "trainer_kwargs": {"output_dir": str(tmp_path / "run"),
                           "device": "cpu"},
    }, open(cfg_path, "w"))

    argv = sys.argv
    sys.argv = ["tool", "--config", str(cfg_path),
                "--torch-checkpoint", str(pt), "--ckpt-info", str(info)]
    try:
        tool.main()
    finally:
        sys.argv = argv

    from t5_resnet_vqa_tpu.train.callbacks import CheckpointManager
    ckpt = CheckpointManager(str(tmp_path / "run"))
    restored = ckpt.restore_tree("best-model")
    got = ckpt.read_json("model_ckpt_info.json")
    assert got["answer_spaces"] == answers and got["epoch"] == 3
    # spot-check a converted tensor round-tripped exactly
    np.testing.assert_allclose(
        np.asarray(restored["classification_layer"]["kernel"]),
        sd["classification_layer.weight"].numpy().T)


def _resnet50_body_sd(sd, prefix):
    """torchvision resnet50 (bottleneck) tensor names with FrozenBatchNorm
    stats, as found under the frcnn backbone's ``body.``."""
    def bn(p, c):
        sd[f"{p}.weight"] = t(c)
        sd[f"{p}.bias"] = t(c)
        sd[f"{p}.running_mean"] = t(c)
        sd[f"{p}.running_var"] = torch.rand(c) + 0.5

    sd[f"{prefix}.conv1.weight"] = t(64, 3, 7, 7)
    bn(f"{prefix}.bn1", 64)
    in_ch = 64
    for s, depth in enumerate((3, 4, 6, 3), start=1):
        width = 64 * 2 ** (s - 1)
        out_ch = width * 4
        for b in range(depth):
            bp = f"{prefix}.layer{s}.{b}"
            c_in = in_ch if b == 0 else out_ch
            sd[f"{bp}.conv1.weight"] = t(width, c_in, 1, 1)
            bn(f"{bp}.bn1", width)
            sd[f"{bp}.conv2.weight"] = t(width, width, 3, 3)
            bn(f"{bp}.bn2", width)
            sd[f"{bp}.conv3.weight"] = t(out_ch, width, 1, 1)
            bn(f"{bp}.bn3", out_ch)
            if b == 0:
                sd[f"{bp}.downsample.0.weight"] = t(out_ch, c_in, 1, 1)
                bn(f"{bp}.downsample.1", out_ch)
        in_ch = out_ch


def test_faster_rcnn_vqa_checkpoint_converter_tree():
    torch.manual_seed(0)
    from t5_resnet_vqa_tpu.models.faster_rcnn_vqa import FasterRcnnVQAModel
    from t5_resnet_vqa_tpu.ops import AttentionConfig

    d, answers = 32, 7
    sd = {}
    _resnet50_body_sd(sd, "vision_model.body")
    fpn_in = (256, 512, 1024, 2048)
    for i in range(4):
        sd[f"vision_model.fpn.inner_blocks.{i}.weight"] = t(256, fpn_in[i],
                                                            1, 1)
        sd[f"vision_model.fpn.inner_blocks.{i}.bias"] = t(256)
        sd[f"vision_model.fpn.layer_blocks.{i}.weight"] = t(256, 256, 3, 3)
        sd[f"vision_model.fpn.layer_blocks.{i}.bias"] = t(256)
    sd["upscale_layer.weight"] = t(256, d, 3, 3)
    sd["upscale_layer.bias"] = t(d)
    sd["lang_model.embed_tokens.weight"] = t(128, d)
    _t5_stack_sd(sd, "lang_model", 2, d, 64, 4)
    for att in ("mhatt1", "mhatt2"):
        for nm in ("linear_v", "linear_k", "linear_q", "linear_merge"):
            sd[f"sga_modules.0.{att}.{nm}.weight"] = t(d, d)
            sd[f"sga_modules.0.{att}.{nm}.bias"] = t(d)
    sd["sga_modules.0.ffn.mlp.fc1.weight"] = t(d, d)
    sd["sga_modules.0.ffn.mlp.fc1.bias"] = t(d)
    sd["sga_modules.0.ffn.mlp.fc2.weight"] = t(d, d)
    sd["sga_modules.0.ffn.mlp.fc2.bias"] = t(d)
    for n in (1, 2, 3):
        sd[f"sga_modules.0.norm{n}.norm.weight"] = t(d)
        sd[f"sga_modules.0.norm{n}.norm.bias"] = t(d)
    sd["attention_pooler.attention.0.weight"] = t(1, d)
    sd["attention_pooler.attention.0.bias"] = t(1)
    sd["classification_layer.weight"] = t(answers, d)
    sd["classification_layer.bias"] = t(answers)

    converted = tc.convert_faster_rcnn_vqa_checkpoint(
        sd, num_attention_blocks=1, num_t5_layers=2)

    model = FasterRcnnVQAModel(
        answer_spaces=answers,
        t5_config=T5Config(vocab_size=128, d_model=d, d_kv=8, d_ff=64,
                           num_layers=2, num_decoder_layers=2, num_heads=4),
        sga_config=AttentionConfig(hidden_size=d, num_heads=4, ff_size=d),
        num_attention_blocks=1)
    init = model.init(
        jax.random.PRNGKey(0),
        question_input_ids=jnp.ones((1, 16), jnp.int32),
        question_attention_masks=jnp.ones((1, 16), jnp.int32),
        image_tensors=jnp.zeros((1, 64, 64, 3), jnp.float32))["params"]
    assert tree_shapes(converted) == tree_shapes(init)
