"""Reverse migration: OUR trained checkpoint -> the REFERENCE'S own model.

The mirror of tests/test_migration_rehearsal.py (which imports reference
checkpoints HERE): these tests initialize this framework's models at real
geometry, push their params through tools/export_reference_checkpoint.py,
``load_state_dict`` the result into the reference's own torch classes (via
the offline harness) — ``strict=False`` plus compensating assertions that
there are NO unexpected keys and NO missing *parameters* (the only keys
allowed missing are non-parameter buffers the export legitimately omits,
asserted below) — and assert fp32 logit parity on identical collate
batches, proving a user can train on TPU here and hand ``best-model.pt``
back to a reference deployment, for all four families.
"""

import importlib.util
import json
import os
import sys

import numpy as np
import pytest
import torch
import transformers  # noqa: F401  (must import before the torchvision stub
#                      lands in sys.modules — transformers' import-time
#                      find_spec chokes on the stub's __spec__=None)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from reference_harness import (  # noqa: E402
    load_reference_models, reference_models_offline)

from t5_resnet_vqa_tpu.core import Config  # noqa: E402
from t5_resnet_vqa_tpu.data import (  # noqa: E402
    DaquarCnnCollate, DaquarDataset, DaquarVitCollate, load_answer_spaces,
    make_synthetic_daquar)
from t5_resnet_vqa_tpu.data.pipeline import DataLoader  # noqa: E402
from t5_resnet_vqa_tpu.train.callbacks import CheckpointManager  # noqa: E402
from t5_resnet_vqa_tpu.train.factory import build_model  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
B = 2


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("daquar_reverse"))
    make_synthetic_daquar(root, num_train=4, num_test=4, image_size=64)
    answers = load_answer_spaces(os.path.join(root, "answer_spaces.txt"))
    return root, [a.strip("\n") for a in answers]


def _config(tmp_path, root, family, out_dir):
    model_kwargs = {
        "resnet50": {"vision_model_name": "resnet50",
                     "language_model_name": "t5-base"},
        "faster-rcnn": {"vision_model_name": "faster-rcnn",
                        "language_model_name": "t5-base"},
        "vit": {"vision_model_name": "google/vit-base-patch16-224-in21k",
                "language_model_name": "t5-base"},
        "cross": {"vision_model_name": "google/vit-base-patch16-224-in21k",
                  "language_model_name": "roberta-base"},
    }[family]
    cfg = {
        "model_kwargs": dict(model_kwargs, device="cpu"),
        "dataset_kwargs": {
            "root_data_dir": root, "train_csv_file": "train.csv",
            "test_csv_file": "test.csv", "images_dir": "images",
            "answer_spaces_file": "answer_spaces.txt",
            "train_batch_size": B, "test_batch_size": B,
            "uint8_wire_images": False,      # strict-parity wire
        },
        "trainer_kwargs": {"epochs": 1, "device": "cpu",
                           "output_dir": out_dir},
        "optimizer_kwargs": {"type": "AdamW"},
        "lr_scheduler_kwargs": {},
        "callbacks_kwargs": {"kwargs": {}},
    }
    path = str(tmp_path / f"{family}_rev_config.json")
    with open(path, "w") as f:
        json.dump(cfg, f)
    return path


def _torch_batch(batch, image_key):
    out = {}
    for k, v in batch.items():
        if k in ("answers", "questions", "image_fns") or k.startswith("_"):
            continue
        v = np.asarray(v)
        if k == image_key:
            t = torch.tensor(v).permute(0, 3, 1, 2).float()
        elif v.dtype.kind in "iu":
            t = torch.tensor(v.astype(np.int64))
        else:
            t = torch.tensor(v)
        out[k] = t
    if image_key == "pixel_values":
        out.setdefault("image_tensors", None)
    return out


def _jax_batch(batch):
    return {k: jnp.asarray(np.asarray(v)) for k, v in batch.items()
            if k not in ("answers", "questions", "image_fns")
            and not k.startswith("_")}


def _run_export_tool(config_path, out_dir):
    tool = os.path.join(REPO, "tools", "export_reference_checkpoint.py")
    spec = importlib.util.spec_from_file_location("export_tool", tool)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    argv = sys.argv
    sys.argv = ["export_reference_checkpoint.py", "--config", config_path,
                "--out-dir", out_dir]
    try:
        mod.main()
    finally:
        sys.argv = argv


def _reverse(family, synth, tmp_path, ref_model, collate_cls, image_key,
             logit_tol=2e-3):
    root, answers = synth
    out_dir = str(tmp_path / f"{family}_run")
    config_path = _config(tmp_path, root, family, out_dir)

    # 1. "train" here: real-geometry init + the checkpoint contract on disk
    cfg = Config.from_json(config_path)
    model, _fam = build_model(cfg.model, len(answers))
    test_ds = DaquarDataset(root, "test.csv", "images", "test")
    collate = collate_cls(answers, eval_mode=True, seed=0)
    batch = _jax_batch(collate([test_ds[i] for i in range(B)]))
    params = model.init(jax.random.PRNGKey(3), **batch,
                        deterministic=True)["params"]
    ckpt = CheckpointManager(out_dir)
    ckpt.save_tree("best-model", params)
    ckpt.write_json("model_ckpt_info.json", {
        "epoch": 5, "best_score": 0.41, "answer_spaces": answers})

    # 2. the export tool, exactly as a user runs it
    export_dir = str(tmp_path / f"{family}_export")
    _run_export_tool(config_path, export_dir)

    info = json.load(open(os.path.join(export_dir, "model_ckpt_info.json")))
    assert info["answer_spaces"] == answers

    # 3. the reference's own class loads it STRICTLY
    sd = torch.load(os.path.join(export_dir, "best-model.pt"),
                    map_location="cpu")
    missing, unexpected = ref_model.load_state_dict(sd, strict=False)
    assert not unexpected, f"exported keys unknown to the ref: {unexpected}"
    # buffers like position_ids may be non-persistent depending on the
    # transformers version; parameters must ALL be provided
    param_missing = [m for m in missing
                     if not m.endswith((".position_ids", ".token_type_ids"))]
    assert not param_missing, f"ref keys we failed to export: {param_missing}"
    ref_model.eval()

    # 4. fp32 logit parity on identical collate batches
    loader = DataLoader(test_ds, collate_cls(answers, eval_mode=True, seed=0),
                        B, drop_remainder=False)
    apply = jax.jit(lambda p, b: model.apply({"params": p}, **b,
                                             deterministic=True)[0])
    for batch in loader:
        valid = int(batch.get("_valid", len(batch["annotation_ids"])))
        with torch.no_grad():
            t_logits, _ = ref_model(**_torch_batch(batch, image_key))
        j_logits = np.asarray(apply(params, _jax_batch(batch)))[:valid]
        np.testing.assert_allclose(j_logits,
                                   t_logits.numpy()[:valid],
                                   rtol=logit_tol, atol=logit_tol)
        j_preds = np.argmax(j_logits, axis=-1)
        t_preds = np.argmax(t_logits.numpy()[:valid], axis=-1)
        np.testing.assert_array_equal(j_preds, t_preds)


@pytest.mark.slow
def test_reverse_migration_resnet50(synth, tmp_path):
    resnet_mod, _, _ = load_reference_models()
    with reference_models_offline():
        ref = resnet_mod.ResnetVQAModel(
            vision_model_name="resnet50", language_model_name="t5-base",
            answer_spaces=len(synth[1]))
    _reverse("resnet50", synth, tmp_path, ref, DaquarCnnCollate,
             "image_tensors")


@pytest.mark.slow
def test_reverse_migration_faster_rcnn(synth, tmp_path):
    _, frcnn_mod, _ = load_reference_models()
    with reference_models_offline():
        ref = frcnn_mod.FasterRcnnVQAModel(
            vision_model_name="faster-rcnn", language_model_name="t5-base",
            answer_spaces=len(synth[1]))
    _reverse("faster-rcnn", synth, tmp_path, ref, DaquarCnnCollate,
             "image_tensors")


@pytest.mark.slow
def test_reverse_migration_vit(synth, tmp_path):
    _, _, vit_mod = load_reference_models()
    with reference_models_offline():
        ref = vit_mod.VitVQAModel(
            vision_model_name="google/vit-base-patch16-224-in21k",
            language_model_name="t5-base", answer_spaces=len(synth[1]))
    _reverse("vit", synth, tmp_path, ref, DaquarVitCollate, "pixel_values")


@pytest.mark.slow
def test_reverse_migration_cross_attention(synth, tmp_path):
    from reference_harness import vit_layer_tuple_compat

    _, _, vit_mod = load_reference_models()
    with reference_models_offline():
        ref = vit_mod.CrossAttentionVitVQAModel(answer_spaces=len(synth[1]))
    with vit_layer_tuple_compat():
        _reverse("cross", synth, tmp_path, ref, DaquarVitCollate,
                 "pixel_values")
