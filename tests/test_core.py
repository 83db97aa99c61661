"""Core layer: config round-trips, constants, logging."""

import json
import os

import pytest

from t5_resnet_vqa_tpu.core import Config, Logger, constants


def test_constants_parity():
    assert constants.TOTAL_QUESTION_TYPES == 11
    assert constants.MAX_LEN == 20
    assert constants.QUESTION_MAX_LEN == 16
    assert constants.PAD_TOKEN_ID == 0
    assert constants.EOS_TOKEN_ID == 1
    assert constants.HIDDEN_SIZE == 768
    assert constants.SGA_NUM_HEADS == 8
    assert len(constants.QUESTION_TYPE_TOKENS) == 11
    assert all(" " not in t for t in constants.QUESTION_TYPE_TOKENS)


def test_config_loads_reference_layout(tmp_path):
    """A reference-style vit_daquar_config.json must load unchanged."""
    raw = {
        "model_kwargs": {
            "device": "cuda",
            "vision_model_name": "google/vit-base-patch16-224-in21k",
            "language_model_name": "t5-base",
        },
        "dataset_kwargs": {
            "root_data_dir": "DAQUAR_dataset",
            "train_csv_file": "train_modified_v2.csv",
            "test_csv_file": "test_modified_v2.csv",
            "answer_spaces_file": "answers.txt",
            "images_dir": "images",
            "image_preprocessor_model": "google/vit-base-patch16-224-in21k",
            "language_model_tokenizer": "t5-base",
            "train_batch_size": 4,
            "test_batch_size": 16,
        },
        "trainer_kwargs": {
            "epochs": 60, "monitor_train": True, "monitor_val": True,
            "monitor_test": True, "device": "cuda", "gradient_clipping": 1.0,
            "output_dir": "out", "load_from_checkpoint": True,
            "is_training": True, "use_cache": False, "first_val_epoch": 0,
            "metric_eval_mode": "strict", "metric_average_mode": "macro",
            "mxp_training": False,
            "loss_combination_strategy": "dynamic_weighted",
        },
        "optimizer_kwargs": {
            "_description": "x", "default_lr": 0.00005, "type": "AdamW",
            "kwargs": {"weight_decay": 0.1, "amsgrad": True},
            "lm_encoder_lr": 0.005, "lm_decoder_lr": 0.0001,
            "vision_lr": 0.008, "classifier_lr": 0.00001,
        },
        "lr_scheduler_kwargs": {
            "_description": "x", "increase_batch_size_on_plateau": False,
            "num_warmup_steps": -1, "num_training_steps": -1,
            "max_warmup_steps": 10000,
        },
        "callbacks_kwargs": {
            "_description": "x",
            "kwargs": {"save_final_model": False, "patience": 3,
                       "mode": "max", "threshold": 0.005},
        },
    }
    p = tmp_path / "config.json"
    p.write_text(json.dumps(raw))
    cfg = Config.from_json(str(p))
    assert cfg.model.vision_model_name == "google/vit-base-patch16-224-in21k"
    assert cfg.trainer.epochs == 60
    assert cfg.optimizer.kwargs["amsgrad"] is True
    assert cfg.optimizer.lm_encoder_lr == 0.005
    assert cfg.callbacks.patience == 3
    assert cfg.callbacks.threshold == 0.005
    assert cfg.dataset.train_batch_size == 4


def test_config_warmup_resolution():
    cfg = Config()
    # warmup = min(total/10, max_warmup_steps) when -1 (ref trainer :109-111)
    assert cfg.lr_scheduler.resolve_warmup(1000) == 100
    cfg.lr_scheduler.max_warmup_steps = 50
    assert cfg.lr_scheduler.resolve_warmup(1000) == 50
    cfg.lr_scheduler.num_warmup_steps = 7
    assert cfg.lr_scheduler.resolve_warmup(1000) == 7


def test_config_overrides():
    cfg = Config()
    cfg.apply_override("trainer.epochs=3")
    assert cfg.trainer.epochs == 3
    cfg.apply_override("trainer_kwargs.output_dir=/tmp/x")
    assert cfg.trainer.output_dir == "/tmp/x"
    with pytest.raises(ValueError):
        cfg.apply_override("trainer.nonexistent=1")


def test_config_validation():
    cfg = Config()
    cfg.model.vision_model_name = "bogus"
    with pytest.raises(ValueError):
        cfg.validate()


def test_logger_writes_file_and_format(tmp_path, capsys):
    lg = Logger(str(tmp_path))
    lg.log_message("hello world")
    lg.log_line()
    lg.log_block("block msg")
    assert os.path.exists(lg.log_path)
    content = open(lg.log_path).read()
    assert "hello world" in content
    assert "block msg" in content
    assert "-" * 100 in content


def test_experiment_tracker(tmp_path):
    from t5_resnet_vqa_tpu.core import ExperimentTracker
    tr = ExperimentTracker(str(tmp_path), "proj", config={"a": 1})
    tr.log({"loss": 0.5, "epoch": 0})
    tr.finish()
    lines = [json.loads(l) for l in open(tr.path)]
    events = [l["_event"] for l in lines]
    assert events == ["init", "log", "finish"]
    assert lines[1]["loss"] == 0.5


def test_run_records_are_fsynced(tmp_path, monkeypatch):
    """Durability pin (round 5): the 60-epoch soak lost metrics.jsonl rows
    and a whole training_log file to a host fs incident because flush()
    only reaches the page cache. Tracker records, Logger.sync(), and
    write_json must all fsync (benchmarks/soak_vit_60_epochs.md)."""
    from t5_resnet_vqa_tpu.core import ExperimentTracker
    from t5_resnet_vqa_tpu.train.callbacks import CheckpointManager

    synced = []
    real_fsync = os.fsync
    monkeypatch.setattr(os, "fsync", lambda fd: (synced.append(fd),
                                                 real_fsync(fd))[1])

    tr = ExperimentTracker(str(tmp_path), "proj", config={"a": 1})
    n0 = len(synced)
    tr.log({"loss": 0.5, "epoch": 0})
    assert len(synced) > n0, "tracker.log must fsync its record"
    tr.finish()

    lg = Logger(str(tmp_path))
    lg.log_message("epoch line")
    n0 = len(synced)
    lg.sync()
    assert len(synced) > n0, "Logger.sync must fsync the log file"
    lg.sync()   # idempotent, including on an already-flushed stream

    store = CheckpointManager(str(tmp_path / "ck"))
    n0 = len(synced)
    store.write_json("training_progress.json", {"epochs_completed": 3})
    # file fsync + containing-dir fsync (rename durability)
    assert len(synced) >= n0 + 2
    assert store.read_json("training_progress.json") == {
        "epochs_completed": 3}


def test_select_device_tpu_fails_loudly_without_tpu(monkeypatch):
    """device='tpu' with no TPU visible must raise, not silently run on CPU
    (the backend is already initialized, so a jax_platforms update would be
    a no-op)."""
    import jax
    import pytest as _pytest
    from t5_resnet_vqa_tpu.core import select_device

    class _Fake:
        platform = "cpu"
    monkeypatch.setattr(jax, "devices", lambda *a, **k: [_Fake()])
    with _pytest.raises(RuntimeError, match="no TPU devices"):
        select_device("tpu")


def test_experiment_tracker_drives_wandb_when_available(tmp_path, monkeypatch):
    """trainer_kwargs.use_wandb: the JSONL tracker also mirrors init/log/
    finish to a wandb module when one is importable (reference tracking
    surface, faster_rcnn_vqa_trainer.py:34-43); keys match the JSONL."""
    import json
    import sys
    import types

    from t5_resnet_vqa_tpu.core.logging import ExperimentTracker

    calls = {"init": [], "log": [], "finish": 0}
    fake = types.ModuleType("wandb")
    fake.init = lambda **kw: calls["init"].append(kw)
    fake.log = lambda m: calls["log"].append(dict(m))
    fake.finish = lambda: calls.__setitem__("finish", calls["finish"] + 1)
    monkeypatch.setitem(sys.modules, "wandb", fake)

    tr = ExperimentTracker(str(tmp_path), project="proj-x",
                           config={"a": 1}, use_wandb=True)
    tr.log({"train_avg_loss": 1.5, "epoch": 0})
    tr.finish()

    assert calls["init"][0]["project"] == "proj-x"
    assert calls["init"][0]["config"] == {"a": 1}
    assert calls["log"] == [{"train_avg_loss": 1.5, "epoch": 0}]
    assert calls["finish"] == 1
    rows = [json.loads(l) for l in open(tr.path)]
    logged = [r for r in rows if r.get("_event") == "log"][0]
    assert logged["train_avg_loss"] == 1.5      # same keys as wandb


def test_config_wandb_knobs_default_off():
    from t5_resnet_vqa_tpu.core import Config
    cfg = Config()
    assert cfg.trainer.use_wandb is False
    assert cfg.trainer.wandb_project == "t5-resnet-vqa-tpu"
