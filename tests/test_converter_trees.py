"""Converter completeness: a reference-shaped torch state dict converted
through convert_resnet_vqa_checkpoint must produce EXACTLY the param tree of
models.ResnetVQAModel — same paths, same shapes. Guards converter/model drift
without needing a real trained checkpoint.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from t5_resnet_vqa_tpu.models.resnet_vqa import ResnetVQAModel  # noqa: E402
from t5_resnet_vqa_tpu.utils import torch_convert as tc  # noqa: E402


def _fake_reference_state_dict(variant="resnet18", answers=7, blocks=1):
    """Tensors with the reference ResnetVQAModel's names/shapes
    (resnet_vqa_model.py:30-99): torchvision resnet naming under
    vision_model.*, T5Stack under lang_model.*, sga_modules.N.*, pooler,
    classifier."""
    sd = {}

    def t(*shape):
        return torch.zeros(*shape) + torch.randn(*shape) * 0.02

    # --- torchvision resnet18 ---
    def bn(prefix, c):
        sd[f"{prefix}.weight"] = t(c)
        sd[f"{prefix}.bias"] = t(c)
        sd[f"{prefix}.running_mean"] = t(c)
        sd[f"{prefix}.running_var"] = torch.rand(c) + 0.5

    sd["vision_model.conv1.weight"] = t(64, 3, 7, 7)
    bn("vision_model.bn1", 64)
    depths = {"resnet18": (2, 2, 2, 2)}[variant]
    in_ch = 64
    for s, depth in enumerate(depths, start=1):
        width = 64 * 2 ** (s - 1)
        for b in range(depth):
            bp = f"vision_model.layer{s}.{b}"
            c_in = in_ch if b == 0 else width
            sd[f"{bp}.conv1.weight"] = t(width, c_in, 3, 3)
            bn(f"{bp}.bn1", width)
            sd[f"{bp}.conv2.weight"] = t(width, width, 3, 3)
            bn(f"{bp}.bn2", width)
            if b == 0 and (s > 1 or c_in != width):
                sd[f"{bp}.downsample.0.weight"] = t(width, c_in, 1, 1)
                bn(f"{bp}.downsample.1", width)
        in_ch = width

    # --- ConvTranspose projection (512 -> 768 for resnet18) ---
    sd["upscale_layer.weight"] = t(512, 768, 3, 3)
    sd["upscale_layer.bias"] = t(768)

    # --- T5 encoder stack (T5Stack naming: embed_tokens/block.N/...) ---
    sd["lang_model.embed_tokens.weight"] = t(32128, 768)
    for i in range(12):
        b = f"lang_model.block.{i}"
        for nm in ("q", "k", "v", "o"):
            sd[f"{b}.layer.0.SelfAttention.{nm}.weight"] = t(768, 768)
        if i == 0:
            sd[f"{b}.layer.0.SelfAttention.relative_attention_bias.weight"] = t(32, 12)
        sd[f"{b}.layer.0.layer_norm.weight"] = t(768)
        sd[f"{b}.layer.1.DenseReluDense.wi.weight"] = t(3072, 768)
        sd[f"{b}.layer.1.DenseReluDense.wo.weight"] = t(768, 3072)
        sd[f"{b}.layer.1.layer_norm.weight"] = t(768)
    sd["lang_model.final_layer_norm.weight"] = t(768)

    # --- SGA + pooler + classifier ---
    for i in range(blocks):
        for att in ("mhatt1", "mhatt2"):
            for nm in ("linear_v", "linear_k", "linear_q", "linear_merge"):
                sd[f"sga_modules.{i}.{att}.{nm}.weight"] = t(768, 768)
                sd[f"sga_modules.{i}.{att}.{nm}.bias"] = t(768)
        sd[f"sga_modules.{i}.ffn.mlp.fc1.weight"] = t(768, 768)
        sd[f"sga_modules.{i}.ffn.mlp.fc1.bias"] = t(768)
        sd[f"sga_modules.{i}.ffn.mlp.fc2.weight"] = t(768, 768)
        sd[f"sga_modules.{i}.ffn.mlp.fc2.bias"] = t(768)
        for n in (1, 2, 3):
            sd[f"sga_modules.{i}.norm{n}.norm.weight"] = t(768)
            sd[f"sga_modules.{i}.norm{n}.norm.bias"] = t(768)
    sd["attention_pooler.attention.0.weight"] = t(1, 768)
    sd["attention_pooler.attention.0.bias"] = t(1)
    sd["classification_layer.weight"] = t(answers, 768)
    sd["classification_layer.bias"] = t(answers)
    return sd


def test_reference_checkpoint_converter_tree_matches_model():
    torch.manual_seed(0)
    sd = _fake_reference_state_dict()
    converted = tc.convert_resnet_vqa_checkpoint(sd, "resnet18",
                                                 num_attention_blocks=1)

    model = ResnetVQAModel(answer_spaces=7, vision_model_name="resnet18",
                           num_attention_blocks=1)
    B = 1
    init = model.init(
        jax.random.PRNGKey(0),
        question_input_ids=jnp.ones((B, 16), jnp.int32),
        question_attention_masks=jnp.ones((B, 16), jnp.int32),
        image_tensors=jnp.zeros((B, 64, 64, 3), jnp.float32),
    )["params"]

    want = {p: l.shape for p, l in
            jax.tree_util.tree_leaves_with_path(init)}
    got = {p: np.asarray(l).shape for p, l in
           jax.tree_util.tree_leaves_with_path(
               jax.tree.map(jnp.asarray, converted))}
    want_keys = {jax.tree_util.keystr(k) for k in want}
    got_keys = {jax.tree_util.keystr(k) for k in got}
    assert want_keys == got_keys, (
        f"missing: {sorted(want_keys - got_keys)[:5]} "
        f"extra: {sorted(got_keys - want_keys)[:5]}")
    for k in want:
        assert tuple(want[k]) == tuple(got[k]), (jax.tree_util.keystr(k),
                                                 want[k], got[k])

    # and the converted params actually run
    lp, _ = model.apply(
        {"params": jax.tree.map(jnp.asarray, converted)},
        question_input_ids=jnp.ones((B, 16), jnp.int32),
        question_attention_masks=jnp.ones((B, 16), jnp.int32),
        image_tensors=jnp.zeros((B, 64, 64, 3), jnp.float32),
    )
    assert lp.shape == (B, 7)


def test_answer_space_builder(tmp_path):
    import pandas as pd

    from t5_resnet_vqa_tpu.data.answer_space import (build_answer_space,
                                                     write_answer_space)
    rows = []
    for _ in range(6):
        rows.append(("img1", "q", "['table']"))
    for _ in range(5):
        rows.append(("img1", "q", "['red chair']"))
    for _ in range(2):
        rows.append(("img1", "q", "['rare_thing']"))
    df = pd.DataFrame(rows, columns=["image_id", "question", "answers_list"])
    p = tmp_path / "train.csv"
    df.to_csv(p, index=False)

    answers = build_answer_space(str(p), min_count=5)
    assert "table" in answers
    assert "red_chair" in answers       # space -> underscore
    assert "rare_thing" not in answers  # below threshold
    assert answers[-1] == "O"           # OOV bucket appended

    out = tmp_path / "answers.txt"
    write_answer_space(answers, str(out))
    from t5_resnet_vqa_tpu.data import load_answer_spaces
    assert [a.strip() for a in load_answer_spaces(str(out))] == answers
