"""Trainer integration: 2-epoch run on synthetic DAQUAR — loss decreases,
checkpoint artifacts appear, WUPS callback runs, resume restores state
(SURVEY §4 integration strategy)."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from t5_resnet_vqa_tpu.core import Config
from t5_resnet_vqa_tpu.data import make_synthetic_daquar
from t5_resnet_vqa_tpu.models.resnet_vqa import ResnetVQAModel
from t5_resnet_vqa_tpu.models.t5 import T5Config
from t5_resnet_vqa_tpu.ops import AttentionConfig
from t5_resnet_vqa_tpu.train import VQATrainer, build_optimizer, label_params
from t5_resnet_vqa_tpu.train.optimizer import linear_schedule_with_warmup


def _tiny_model(num_answers):
    hidden = 32
    return ResnetVQAModel(
        answer_spaces=num_answers, vision_model_name="resnet18",
        t5_config=T5Config(vocab_size=32128, d_model=hidden, d_kv=8,
                           d_ff=64, num_layers=1, num_decoder_layers=1,
                           num_heads=4),
        sga_config=AttentionConfig(hidden_size=hidden, num_heads=4,
                                   ff_size=hidden),
        num_attention_blocks=1)


def _tiny_config(root, out_dir, epochs=2):
    cfg = Config()
    cfg.dataset.root_data_dir = root
    cfg.dataset.train_batch_size = 4
    cfg.dataset.test_batch_size = 4
    cfg.dataset.image_size = 64
    cfg.trainer.epochs = epochs
    cfg.trainer.output_dir = str(out_dir)
    cfg.trainer.seed = 0
    cfg.optimizer.kwargs = {"weight_decay": 0.0, "amsgrad": True}
    # lr tuned so 2 epochs visibly reduce loss on 16 samples
    cfg.optimizer.lm_encoder_lr = 1e-3
    cfg.optimizer.classifier_lr = 5e-3
    cfg.optimizer.fusion_lr = 1e-3
    # synthetic labels are random + WUPS runs in exact-match fallback mode,
    # so scores hover at 0.0; threshold=-1 makes "no regression" count as
    # improvement so the best-model checkpoint path is exercised.
    cfg.callbacks.threshold = -1.0
    return cfg.validate()


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("daquar_train"))
    return make_synthetic_daquar(root, num_train=16, num_test=8,
                                 image_size=64)


def test_schedule_matches_hf_semantics():
    sched = linear_schedule_with_warmup(1.0, num_warmup_steps=10,
                                        num_training_steps=100)
    assert float(sched(0)) == 0.0
    assert np.isclose(float(sched(5)), 0.5)
    assert np.isclose(float(sched(10)), 1.0)
    assert np.isclose(float(sched(55)), 0.5)
    assert float(sched(100)) == 0.0


def test_param_group_labels():
    params = {
        "vision_model": {"conv1": {"kernel": np.zeros((3, 3))}},
        "lang_model": {"block_0": {"ff": {"wi": {"kernel": np.zeros((2, 2))}}}},
        "sga_modules": {"sga_0": {"norm1": {"scale": np.zeros(3)}}},
        "classification_layer": {"kernel": np.zeros((2, 2))},
        "other_thing": {"kernel": np.zeros((2, 2))},
    }
    labels = label_params(params)
    assert labels["vision_model"]["conv1"]["kernel"] == "vision"
    assert labels["lang_model"]["block_0"]["ff"]["wi"]["kernel"] == "lm_encoder"
    assert labels["sga_modules"]["sga_0"]["norm1"]["scale"] == "fusion"
    assert labels["classification_layer"]["kernel"] == "classifier"
    assert labels["other_thing"]["kernel"] == "default"


def test_trainer_end_to_end(synth, tmp_path):
    root, _ = synth
    out = tmp_path / "run1"
    cfg = _tiny_config(root, out)
    from t5_resnet_vqa_tpu.data import load_answer_spaces
    answers = load_answer_spaces(os.path.join(root, "answer_spaces.txt"))
    model = _tiny_model(len(answers))

    trainer = VQATrainer(model, cfg, answers)
    # capture initial loss on one batch
    trainer.train()

    # metrics stream exists with train/valid entries per epoch
    metrics = [json.loads(l) for l in open(trainer.tracker.path)]
    train_losses = [m["train_avg_loss"] for m in metrics
                    if m.get("_event") == "log" and "train_avg_loss" in m]
    valid_wups = [m["valid_avg_wups"] for m in metrics
                  if m.get("_event") == "log" and "valid_avg_wups" in m]
    assert len(train_losses) == 2
    assert len(valid_wups) == 2
    # loss decreases over the tiny run
    assert train_losses[-1] < train_losses[0]

    # checkpoint artifact contract (ref callbacks.py)
    ckpt_dir = os.path.join(str(out), "model_checkpoints")
    assert os.path.isdir(os.path.join(ckpt_dir, "best-model"))
    assert os.path.isdir(os.path.join(ckpt_dir, "checkpoint-model"))
    assert os.path.isdir(os.path.join(ckpt_dir, "state_dict_checkpoint"))
    info = json.load(open(os.path.join(ckpt_dir, "model_ckpt_info.json")))
    assert info["answer_spaces"] == [a.strip("\n") for a in answers]
    assert "epoch" in info and "best_score" in info
    metrics_json = json.load(open(os.path.join(ckpt_dir, "model-metrics.json")))
    assert metrics_json["best-score"] == max(valid_wups)

    # per-epoch predictions JSON (ref :468-472)
    preds = json.load(open(os.path.join(
        str(out), "validation_predictions",
        "1_validation_predictions.json")))
    assert {"question_text", "prediction", "target",
            "wups_score"} <= set(preds[0])

    # training log file with the reference's log shapes
    log_files = [f for f in os.listdir(str(out))
                 if f.startswith("training_log_")]
    assert log_files
    content = open(os.path.join(str(out), log_files[0])).read()
    assert "Start Training: Max Epoch 2" in content
    assert "Average WUPS Score" in content


def test_trainer_resume_restores_state(synth, tmp_path):
    root, _ = synth
    out = tmp_path / "run2"
    from t5_resnet_vqa_tpu.data import load_answer_spaces
    answers = load_answer_spaces(os.path.join(root, "answer_spaces.txt"))

    cfg = _tiny_config(root, out, epochs=1)
    model = _tiny_model(len(answers))
    t1 = VQATrainer(model, cfg, answers)
    t1.train()
    best = t1.callbacks.best_score

    cfg2 = _tiny_config(root, out, epochs=1)
    cfg2.trainer.load_from_checkpoint = True
    t2 = VQATrainer(_tiny_model(len(answers)), cfg2, answers)
    # resumed best_score from model-metrics.json (ref callbacks :89-92)
    assert t2.callbacks.best_score == best
    # params restored from best-model: logits must match exactly
    batch = t1._sample_batch()
    lp1, _ = t1.model.apply({"params": t1.params}, **batch)
    lp2, _ = t2.model.apply({"params": t2.params}, **batch)
    np.testing.assert_allclose(np.asarray(lp1), np.asarray(lp2),
                               rtol=1e-6, atol=1e-6)


def test_early_stopping_honored(synth, tmp_path):
    """Patience is enforced (divergence from the reference's inert version)."""
    root, _ = synth
    from t5_resnet_vqa_tpu.data import load_answer_spaces
    answers = load_answer_spaces(os.path.join(root, "answer_spaces.txt"))
    cfg = _tiny_config(root, tmp_path / "run3", epochs=10)
    cfg.callbacks.patience = 2
    cfg.callbacks.threshold = 10.0   # nothing can improve by 10 WUPS
    cfg.optimizer.lm_encoder_lr = 0.0
    cfg.optimizer.classifier_lr = 0.0
    cfg.optimizer.fusion_lr = 0.0
    model = _tiny_model(len(answers))
    trainer = VQATrainer(model, cfg, answers)
    trainer.train()
    assert trainer.callbacks.should_stop
    assert trainer.cur_epoch + 1 < 10   # stopped early


def test_steps_per_dispatch_matches_sequential(synth, tmp_path):
    """K scan steps in one dispatch == K sequential single-step dispatches
    (same batches, same per-step dropout rngs)."""
    root, _ = synth
    from t5_resnet_vqa_tpu.data import load_answer_spaces
    answers = load_answer_spaces(os.path.join(root, "answer_spaces.txt"))
    cfg = _tiny_config(root, tmp_path / "spd", epochs=1)
    cfg.trainer.steps_per_dispatch = 2
    trainer = VQATrainer(_tiny_model(len(answers)), cfg, answers)
    assert trainer._steps_per_dispatch == 2

    batches = []
    for raw in trainer.train_dataloader:
        batches.append(trainer._put_batch(
            {k: v for k, v in raw.items() if k != "_valid"}))
        if len(batches) == 2:
            break
    rngs = jax.random.split(jax.random.PRNGKey(7), 2)

    copy = lambda t: jax.tree.map(jnp.copy, t)
    p, s = copy(trainer.params), copy(trainer.opt_state)
    p, s, l1, pr1 = trainer._train_step(p, s, batches[0], rngs[0])
    p, s, l2, pr2 = trainer._train_step(p, s, batches[1], rngs[1])

    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)
    pm, sm, losses, preds = trainer._train_step_multi(
        copy(trainer.params), copy(trainer.opt_state), stacked, rngs)

    np.testing.assert_allclose(np.asarray(losses),
                               np.asarray(jnp.stack([l1, l2])), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(preds).reshape(-1),
                                  np.asarray(jnp.concatenate([pr1, pr2])))
    for a, b in zip(jax.tree.leaves(p), jax.tree.leaves(pm)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_trainer_runs_with_steps_per_dispatch(synth, tmp_path):
    """Full epoch loop with K>1 (incl. a leftover chunk) trains end-to-end."""
    root, _ = synth
    from t5_resnet_vqa_tpu.data import load_answer_spaces
    answers = load_answer_spaces(os.path.join(root, "answer_spaces.txt"))
    cfg = _tiny_config(root, tmp_path / "spd_run", epochs=1)
    cfg.trainer.steps_per_dispatch = 3      # 4 batches -> one scan(3) + 1
    # >= 10 batches to leave the tiny-run logging path: shrink batch size
    cfg.dataset.train_batch_size = 1
    trainer = VQATrainer(_tiny_model(len(answers)), cfg, answers)
    trainer.train()
    assert trainer.global_step == len(trainer.train_dataloader)
    metrics = [json.loads(l) for l in open(trainer.tracker.path)]
    losses = [m["train_avg_loss"] for m in metrics
              if m.get("_event") == "log" and "train_avg_loss" in m]
    assert losses and np.isfinite(losses[0])


def test_checkpoint_every_steps(synth, tmp_path, monkeypatch):
    """checkpoint_every_steps writes the recovery pair mid-epoch, not just
    at epoch end (capability add over the reference's epoch-end cadence)."""
    root, _ = synth
    from t5_resnet_vqa_tpu.data import load_answer_spaces
    answers = load_answer_spaces(os.path.join(root, "answer_spaces.txt"))
    cfg = _tiny_config(root, tmp_path / "ck_steps", epochs=1)
    cfg.trainer.checkpoint_every_steps = 2
    cfg.trainer.monitor_test = False
    trainer = VQATrainer(_tiny_model(len(answers)), cfg, answers)

    calls = []
    orig = trainer.callbacks.save_epoch_checkpoint
    monkeypatch.setattr(
        trainer.callbacks, "save_epoch_checkpoint",
        lambda *a, **kw: (calls.append(trainer.global_step), orig(*a, **kw)))
    trainer.train()
    # 4 train batches, every 2 steps -> saves at steps 2 and 4, before the
    # end-of-train save
    assert calls[:2] == [2, 4]
    ckpt_dir = os.path.join(str(tmp_path / "ck_steps"), "model_checkpoints")
    assert os.path.isdir(os.path.join(ckpt_dir, "checkpoint-model"))
    assert os.path.isdir(os.path.join(ckpt_dir, "state_dict_checkpoint"))


def test_crash_recovery_resume_pairs_params_with_opt_state(synth, tmp_path):
    """With checkpoint_every_steps on, resume restores the periodic
    checkpoint-model params + the optimizer state AND step/epoch metadata
    saved with them (review fix: best-model params must not be paired with a
    mid-epoch optimizer state)."""
    root, _ = synth
    from t5_resnet_vqa_tpu.data import load_answer_spaces
    answers = load_answer_spaces(os.path.join(root, "answer_spaces.txt"))
    cfg = _tiny_config(root, tmp_path / "crash", epochs=1)
    cfg.trainer.checkpoint_every_steps = 2
    cfg.trainer.monitor_test = False     # never writes best-model
    t1 = VQATrainer(_tiny_model(len(answers)), cfg, answers)
    t1.train()
    final_params = jax.tree.map(np.asarray, t1.params)

    cfg2 = _tiny_config(root, tmp_path / "crash", epochs=1)
    cfg2.trainer.checkpoint_every_steps = 2
    cfg2.trainer.load_from_checkpoint = True
    t2 = VQATrainer(_tiny_model(len(answers)), cfg2, answers)
    # params came from checkpoint-model (best-model never existed)
    for a, b in zip(jax.tree.leaves(final_params), jax.tree.leaves(t2.params)):
        np.testing.assert_array_equal(a, np.asarray(b))
    # step/epoch metadata restored alongside the optimizer state; the
    # epoch-end save records epoch+1 (the next epoch to run), so resuming a
    # completed 1-epoch run starts past it instead of re-training epoch 0
    assert t2.global_step == t1.global_step == 4
    assert t2.start_epoch == 1
    # and the loop-never-runs path must not crash (cur_epoch defined)
    t2.train()


def test_resume_refuses_tokenizer_scheme_mismatch(synth, tmp_path):
    """Advisor r3: a params tree trained under one tokenizer id layout must
    not silently resume under another (hash-v1 -> hash-v2-pinned shifted
    every answer-space word id). The scheme is recorded in
    model_ckpt_info.json and a mismatch at resume raises."""
    root, _ = synth
    from t5_resnet_vqa_tpu.data import load_answer_spaces
    answers = load_answer_spaces(os.path.join(root, "answer_spaces.txt"))
    cfg = _tiny_config(root, tmp_path / "scheme", epochs=1)
    t1 = VQATrainer(_tiny_model(len(answers)), cfg, answers)
    t1.train()

    info_path = os.path.join(str(tmp_path / "scheme"), "model_checkpoints",
                             "model_ckpt_info.json")
    info = json.load(open(info_path))
    assert info["tokenizer_scheme"] == "hash-v2-pinned"

    # tamper: pretend the checkpoint came from a real-vocabulary tokenizer
    info["tokenizer_scheme"] = "tokenizer-file"
    json.dump(info, open(info_path, "w"))
    cfg2 = _tiny_config(root, tmp_path / "scheme", epochs=1)
    cfg2.trainer.load_from_checkpoint = True
    with pytest.raises(ValueError, match="Tokenizer scheme mismatch"):
        VQATrainer(_tiny_model(len(answers)), cfg2, answers)

    # matching scheme resumes normally
    info["tokenizer_scheme"] = "hash-v2-pinned"
    json.dump(info, open(info_path, "w"))
    VQATrainer(_tiny_model(len(answers)), cfg2, answers)


def test_checkpoint_lag_bound_enforced(synth, tmp_path, monkeypatch):
    """max_checkpoint_lag_epochs bounds how far the DURABLE crash-recovery
    pair may trail training (VERDICT r4 weak #2: on a degraded link the
    background save queue coalesced and a crash silently replayed 3 epochs).
    The writer is gated shut so NO save can land until the trainer itself
    drains the queue — deterministic proof that the bound, not timing luck,
    is what catches the durable point up."""
    import threading
    from t5_resnet_vqa_tpu.train.callbacks import CheckpointManager

    root, _ = synth
    from t5_resnet_vqa_tpu.data import load_answer_spaces
    answers = load_answer_spaces(os.path.join(root, "answer_spaces.txt"))
    cfg = _tiny_config(root, tmp_path / "lag", epochs=3)
    cfg.trainer.monitor_test = False        # no best-model saves in the way
    cfg.trainer.max_checkpoint_lag_epochs = 1
    trainer = VQATrainer(_tiny_model(len(answers)), cfg, answers)

    gate = threading.Event()
    orig_save = CheckpointManager._save_pair_sync
    orig_flush = CheckpointManager.flush

    def gated_save(self, *a, **kw):
        assert gate.wait(120), "gate never opened — flush was never called"
        return orig_save(self, *a, **kw)

    def flush_opens_gate(self):
        gate.set()                      # only a real drain lands saves
        return orig_flush(self)

    monkeypatch.setattr(CheckpointManager, "_save_pair_sync", gated_save)
    monkeypatch.setattr(CheckpointManager, "flush", flush_opens_gate)

    observed = []
    orig_enforce = trainer._enforce_checkpoint_lag_bound

    def spying_enforce(epoch_done):
        orig_enforce(epoch_done)
        observed.append((epoch_done, trainer._durable_epoch))

    monkeypatch.setattr(trainer, "_enforce_checkpoint_lag_bound",
                        spying_enforce)
    trainer.train()

    # after every epoch-end enforcement the durable point is within bound
    assert observed == [(1, 0), (2, 2), (3, 2)] or all(
        e - d <= 1 for e, d in observed), observed
    # epoch 2 exceeded the bound (writer gated) -> the trainer blocked and
    # drained; the event is reported to the user
    logs = "".join(open(os.path.join(str(tmp_path / "lag"), f)).read()
                   for f in os.listdir(str(tmp_path / "lag"))
                   if f.startswith("training_log_"))
    assert "Checkpoint lag reached 2 epoch(s) > max_checkpoint_lag_epochs=1" \
        in logs
    # the end-of-train flush landed everything: pair is restorable
    ckpt_dir = os.path.join(str(tmp_path / "lag"), "model_checkpoints")
    assert os.path.isdir(os.path.join(ckpt_dir, "checkpoint-model"))
    assert os.path.isdir(os.path.join(ckpt_dir, "state_dict_checkpoint"))


def test_checkpoint_lag_bound_disabled_and_sync(synth, tmp_path):
    """bound=-1 never blocks (old behavior); bound=0 makes every epoch
    checkpoint synchronous-durable before the next epoch starts."""
    root, _ = synth
    from t5_resnet_vqa_tpu.data import load_answer_spaces
    answers = load_answer_spaces(os.path.join(root, "answer_spaces.txt"))

    cfg = _tiny_config(root, tmp_path / "lag_off", epochs=1)
    cfg.trainer.max_checkpoint_lag_epochs = -1
    t = VQATrainer(_tiny_model(len(answers)), cfg, answers)
    flushed = []
    t.callbacks.ckpt.flush = lambda: flushed.append(True)
    t._enforce_checkpoint_lag_bound(50)     # huge lag, bound disabled
    assert not flushed and t._durable_epoch == 0

    cfg0 = _tiny_config(root, tmp_path / "lag_sync", epochs=2)
    cfg0.trainer.monitor_test = False
    cfg0.trainer.max_checkpoint_lag_epochs = 0
    t0 = VQATrainer(_tiny_model(len(answers)), cfg0, answers)
    seen = []
    orig = t0._enforce_checkpoint_lag_bound
    t0._enforce_checkpoint_lag_bound = lambda e: (
        orig(e), seen.append((e, t0._durable_epoch)))
    t0.train()
    assert seen == [(1, 1), (2, 2)]         # durable == completed, always

    with pytest.raises(ValueError, match="max_checkpoint_lag_epochs"):
        cfg_bad = _tiny_config(root, tmp_path / "lag_bad", epochs=1)
        cfg_bad.trainer.max_checkpoint_lag_epochs = -2
        cfg_bad.validate()


def test_resume_staleness_is_reported(synth, tmp_path):
    """On resume the trainer compares the durable checkpoint's epoch with
    training_progress.json (written synchronously every epoch end) and tells
    the user exactly how many epochs will be re-run — the round-4 ViT soak
    replayed 3 epochs after a crash with no indication anywhere."""
    root, _ = synth
    from t5_resnet_vqa_tpu.data import load_answer_spaces
    answers = load_answer_spaces(os.path.join(root, "answer_spaces.txt"))
    out = tmp_path / "stale"
    cfg = _tiny_config(root, out, epochs=2)
    t1 = VQATrainer(_tiny_model(len(answers)), cfg, answers)
    t1.train()
    prog = json.load(open(os.path.join(
        str(out), "model_checkpoints", "training_progress.json")))
    assert prog["epochs_completed"] == 2

    # simulate the soak failure: the run got to epoch 5 but the durable
    # pair (epoch 2) lagged behind when the process died
    json.dump({"epochs_completed": 5, "global_step": 99},
              open(os.path.join(str(out), "model_checkpoints",
                                "training_progress.json"), "w"))
    cfg2 = _tiny_config(root, out, epochs=2)
    cfg2.trainer.load_from_checkpoint = True
    VQATrainer(_tiny_model(len(answers)), cfg2, answers)
    logs = "".join(open(os.path.join(str(out), f)).read()
                   for f in os.listdir(str(out))
                   if f.startswith("training_log_"))
    assert ("resuming at epoch 2 but the previous run completed epoch 4"
            in logs)
    assert "3 epoch(s) of work will be re-run" in logs

    # fresh resume point -> the fresh message, not the warning
    json.dump({"epochs_completed": 2, "global_step": 8},
              open(os.path.join(str(out), "model_checkpoints",
                                "training_progress.json"), "w"))
    VQATrainer(_tiny_model(len(answers)), cfg2, answers)
    logs = "".join(open(os.path.join(str(out), f)).read()
                   for f in os.listdir(str(out))
                   if f.startswith("training_log_"))
    assert "Resume point is fresh: epoch 2" in logs


def test_compute_rouge_hook(synth, tmp_path):
    """trainer_kwargs.compute_rouge wires eval/rouge into valid_one_epoch
    (the reference implements the hook but never calls it, ref :489-513)."""
    root, _ = synth
    from t5_resnet_vqa_tpu.data import load_answer_spaces
    answers = load_answer_spaces(os.path.join(root, "answer_spaces.txt"))
    cfg = _tiny_config(root, tmp_path / "rouge", epochs=1)
    cfg.trainer.compute_rouge = True
    trainer = VQATrainer(_tiny_model(len(answers)), cfg, answers)
    trainer.train()
    rows = [json.loads(l)
            for l in open(tmp_path / "rouge" / "metrics.jsonl")]
    rouge_rows = [r for r in rows if "valid_rouge1_f" in r]
    assert rouge_rows, "rouge metrics missing from tracker"
    for k in ("valid_rouge1_f", "valid_rouge2_f", "valid_rougeL_f"):
        assert 0.0 <= rouge_rows[-1][k] <= 1.0


def test_best_model_metadata_lands_after_background_save(tmp_path):
    """ADVICE r2 (medium): model_ckpt_info.json / model-metrics.json must be
    written AFTER the background best-model save completes — a crash during
    the (potentially minutes-long) fetch/write must not leave metadata and
    a resumable best_score pointing at a checkpoint that never landed."""
    import threading
    import time

    from t5_resnet_vqa_tpu.core.logging import Logger
    from t5_resnet_vqa_tpu.train.callbacks import EarlyStopping

    out = str(tmp_path / "meta_order")
    es = EarlyStopping(Logger(out), out)

    gate = threading.Event()
    real_save = es.ckpt._ckpt.save

    def slow_save(path, tree, force=True):
        gate.wait(timeout=10)           # hold the orbax write open
        return real_save(path, tree, force=force)

    es.ckpt._ckpt.save = slow_save
    params = {"w": np.zeros((2, 2), np.float32)}
    es(params, score=0.5, epoch=1, answer_spaces=["a", "b"])

    ckpt_dir = es.ckpt.output_dir
    # save is in flight (blocked) -> no metadata yet
    time.sleep(0.1)
    assert not os.path.exists(os.path.join(ckpt_dir, "model_ckpt_info.json"))
    assert not os.path.exists(os.path.join(ckpt_dir, "model-metrics.json"))

    gate.set()
    es.ckpt.flush()
    info = json.load(open(os.path.join(ckpt_dir, "model_ckpt_info.json")))
    assert info["best_score"] == 0.5
    metrics = json.load(open(os.path.join(ckpt_dir, "model-metrics.json")))
    assert metrics["best-score"] == 0.5
    assert os.path.isdir(os.path.join(ckpt_dir, "best-model"))


def test_stochastic_vision_tower_refuses_feature_cache():
    """Cache exactness guard (ADVICE r2): a ViT tower with live dropout must
    report non-deterministic so _setup_feature_cache refuses to cache."""
    import dataclasses

    from t5_resnet_vqa_tpu.models.vit import ViTConfig
    from t5_resnet_vqa_tpu.models.vit_vqa import VitVQAModel

    clean = VitVQAModel(answer_spaces=4)
    assert clean.vision_tower_deterministic()
    wet = VitVQAModel(answer_spaces=4, vit_config=dataclasses.replace(
        ViTConfig.vit_base(), dropout_rate=0.1))
    assert not wet.vision_tower_deterministic()


def test_adaptive_question_len_exact(synth, tmp_path):
    """dataset_kwargs.adaptive_question_len trims trailing all-pad columns
    from the ViT family's static shapes; with dropout off (so mask shapes
    can't change the random stream) the per-epoch train/valid losses must
    be IDENTICAL to the fixed-16/20 run — token-0 reads masked keys and
    the decoder read is causal, so the trim is exact math. The CNN family
    must NOT trim (its SGA consumes pad rows unmasked — reference
    semantics)."""
    import numpy as np

    from t5_resnet_vqa_tpu.models.t5 import T5Config
    from t5_resnet_vqa_tpu.models.vit import ViTConfig
    from t5_resnet_vqa_tpu.models.vit_vqa import VitVQAModel

    root, _ = synth
    from t5_resnet_vqa_tpu.data import load_answer_spaces
    answers = load_answer_spaces(os.path.join(root, "answer_spaces.txt"))

    def dry_model():
        return VitVQAModel(
            answer_spaces=len(answers),
            vit_config=ViTConfig(hidden_size=32, num_layers=1, num_heads=4,
                                 mlp_dim=64, patch_size=32, image_size=224),
            t5_config=T5Config(vocab_size=32128, d_model=32, d_kv=8,
                               d_ff=64, num_layers=1, num_decoder_layers=1,
                               num_heads=4, dropout_rate=0.0),
            fusing_dropout=0.0)

    def collate_of(trainer):
        loader = trainer.train_dataloader
        return (getattr(loader, "collate_fn", None)
                or loader.loader.collate_fn)

    losses = {}
    qlens = {}
    for adaptive in (False, True):
        cfg = _tiny_config(root, tmp_path / f"adapt_{adaptive}", epochs=1)
        cfg.model.vision_model_name = "google/vit-base-patch16-224-in21k"
        cfg.dataset.adaptive_question_len = adaptive
        trainer = VQATrainer(dry_model(), cfg, answers)
        qlens[adaptive] = (collate_of(trainer).question_max_len,
                           collate_of(trainer).decoder_max_len)
        trainer.train()
        rows = [json.loads(l) for l in open(trainer.tracker.path)]
        losses[adaptive] = [
            (r["train_avg_loss"], r.get("valid_avg_loss"))
            for r in rows if r.get("_event") == "log" and "train_avg_loss" in r]

    # synthetic questions are short: the adaptive run really did shrink
    assert qlens[False] == (16, 20)
    assert qlens[True][0] < 16 and qlens[True][1] < 20
    for (t_fix, v_fix), (t_ad, v_ad) in zip(losses[False], losses[True]):
        np.testing.assert_allclose(t_ad, t_fix, rtol=0, atol=1e-6)
        if v_fix is not None:
            np.testing.assert_allclose(v_ad, v_fix, rtol=0, atol=1e-6)

    # CNN family: trimming is NOT exact there, so it must not happen
    cfg = _tiny_config(root, tmp_path / "adapt_cnn", epochs=1)
    cfg.dataset.adaptive_question_len = True
    t_cnn = VQATrainer(_tiny_model(len(answers)), cfg, answers)
    assert collate_of(t_cnn).question_max_len == 16


def test_background_save_supersede_and_bound(tmp_path):
    """Long runs must not accumulate device snapshots: queued-but-unstarted
    background saves of the same name are superseded by newer ones, the
    in-flight count is bounded, and flush() lands only live saves."""
    import threading

    from t5_resnet_vqa_tpu.train.callbacks import CheckpointManager

    cm = CheckpointManager(str(tmp_path))
    gate = threading.Event()
    real_save = cm._ckpt.save
    saved_values = []

    def slow_save(path, tree, force=True):
        gate.wait(timeout=10)
        saved_values.append(float(np.asarray(tree["w"]).ravel()[0]))
        return real_save(path, tree, force=force)

    cm._ckpt.save = slow_save
    for i in range(5):   # 5 rapid saves of the same checkpoint name
        cm.save_tree("checkpoint-model",
                     {"w": np.full((2,), float(i), np.float32)},
                     background=True)
    assert len(cm._pending) <= cm.MAX_PENDING
    assert cm.superseded_saves >= 2          # middle saves were coalesced
    gate.set()
    cm.flush()
    # the newest tree landed last
    assert saved_values[-1] == 4.0
    assert cm.exists("checkpoint-model")


def _tree_val(cm, name):
    t = cm.restore_tree(name, {"w": np.zeros((2,), np.float32)})
    return float(np.asarray(t["w"]).ravel()[0])


def test_crash_mid_save_preserves_previous_checkpoint(tmp_path):
    """A kill during the Orbax write must NOT lose the previous rolling
    checkpoint. Found in the 60-epoch soak: a SIGKILL at epoch 43 mid
    checkpoint-model save left only an .orbax-checkpoint-tmp dir — the
    old delete-then-rewrite scheme had already removed epoch 42's
    checkpoint, silently degrading resume to the epoch-1 best-model."""
    from t5_resnet_vqa_tpu.train.callbacks import CheckpointManager

    cm = CheckpointManager(str(tmp_path))
    cm.save_tree("checkpoint-model", {"w": np.full((2,), 1.0, np.float32)})

    real_save = cm._ckpt.save

    def dying_save(path, tree, force=True):
        raise RuntimeError("simulated kill during orbax write")

    cm._ckpt.save = dying_save
    with pytest.raises(RuntimeError):
        cm.save_tree("checkpoint-model",
                     {"w": np.full((2,), 2.0, np.float32)})

    # the previous checkpoint is still there, complete
    assert cm.exists("checkpoint-model")
    assert _tree_val(cm, "checkpoint-model") == 1.0

    # and a later healthy save supersedes it cleanly
    cm._ckpt.save = real_save
    cm.save_tree("checkpoint-model", {"w": np.full((2,), 3.0, np.float32)})
    assert _tree_val(cm, "checkpoint-model") == 3.0
    leftovers = [p for p in os.listdir(cm.output_dir)
                 if p.startswith("checkpoint-model") and
                 p != "checkpoint-model"]
    assert leftovers == []


def test_recover_adopts_complete_next_after_crash(tmp_path):
    """Crash AFTER the .next write completed but BEFORE the swap: a fresh
    process must adopt the newer .next checkpoint (single-name path —
    best-model is not part of the atomic pair)."""
    import orbax.checkpoint as ocp

    from t5_resnet_vqa_tpu.train.callbacks import CheckpointManager

    cm = CheckpointManager(str(tmp_path))
    cm.save_tree("best-model", {"w": np.full((2,), 1.0, np.float32)})
    # manufacture the crash state: complete .next beside the old final
    side = ocp.StandardCheckpointer()
    side.save(cm._path("best-model") + ".next",
              {"w": np.full((2,), 2.0, np.float32)})
    side.wait_until_finished()

    fresh = CheckpointManager(str(tmp_path))
    assert fresh.exists("best-model")
    assert _tree_val(fresh, "best-model") == 2.0
    assert not os.path.isdir(fresh._path("best-model") + ".next")


def _save_pair_vals(cm, pval, sval):
    cm.save_pair({"w": np.full((2,), pval, np.float32)},
                 {"epoch": np.asarray(int(sval)),
                  "w": np.full((2,), sval, np.float32)})


def _pair_vals(cm):
    p = cm.restore_tree("checkpoint-model",
                        {"w": np.zeros((2,), np.float32)})
    s = cm.restore_tree("state_dict_checkpoint",
                        {"epoch": np.asarray(0),
                         "w": np.zeros((2,), np.float32)})
    return (float(np.asarray(p["w"]).ravel()[0]),
            float(np.asarray(s["w"]).ravel()[0]))


def test_pair_recovery_discards_lone_params_next(tmp_path):
    """Kill between the params .next write and the state .next write: the
    new pair never fully landed. Adopting the lone params .next would pair
    epoch-N params with the epoch-N-1 optimizer state (advisor r3 medium) —
    recovery must discard it and keep the previous consistent pair."""
    import orbax.checkpoint as ocp

    from t5_resnet_vqa_tpu.train.callbacks import CheckpointManager

    cm = CheckpointManager(str(tmp_path))
    _save_pair_vals(cm, 1.0, 1.0)
    side = ocp.StandardCheckpointer()
    side.save(cm._path("checkpoint-model") + ".next",
              {"w": np.full((2,), 2.0, np.float32)})
    side.wait_until_finished()

    fresh = CheckpointManager(str(tmp_path))
    assert fresh.exists("checkpoint-model")
    assert _pair_vals(fresh) == (1.0, 1.0)           # consistent OLD pair
    assert not os.path.isdir(fresh._path("checkpoint-model") + ".next")


def test_pair_recovery_adopts_both_complete_nexts(tmp_path):
    """Kill after BOTH .next writes but before the swaps: the new pair is
    fully on disk — recovery adopts both members together."""
    import orbax.checkpoint as ocp

    from t5_resnet_vqa_tpu.train.callbacks import CheckpointManager

    cm = CheckpointManager(str(tmp_path))
    _save_pair_vals(cm, 1.0, 1.0)
    side = ocp.StandardCheckpointer()
    side.save(cm._path("checkpoint-model") + ".next",
              {"w": np.full((2,), 2.0, np.float32)})
    side.save(cm._path("state_dict_checkpoint") + ".next",
              {"epoch": np.asarray(2), "w": np.full((2,), 2.0, np.float32)})
    side.wait_until_finished()

    fresh = CheckpointManager(str(tmp_path))
    assert _pair_vals(fresh) == (2.0, 2.0)           # consistent NEW pair


def test_pair_recovery_finishes_interrupted_swap(tmp_path):
    """Kill between the params swap and the state swap: the params final is
    already new and the state .next is complete — recovery must finish the
    swap so the published pair is (new, new), never (new, old)."""
    import orbax.checkpoint as ocp

    from t5_resnet_vqa_tpu.train.callbacks import CheckpointManager

    cm = CheckpointManager(str(tmp_path))
    _save_pair_vals(cm, 1.0, 1.0)
    cm.save_tree("checkpoint-model", {"w": np.full((2,), 2.0, np.float32)})
    side = ocp.StandardCheckpointer()
    side.save(cm._path("state_dict_checkpoint") + ".next",
              {"epoch": np.asarray(2), "w": np.full((2,), 2.0, np.float32)})
    side.wait_until_finished()

    fresh = CheckpointManager(str(tmp_path))
    assert _pair_vals(fresh) == (2.0, 2.0)


def test_cross_process_guard_serializes_concurrent_managers(tmp_path):
    """Advisor r3 (low): a second process (serving/eval/import) pointed at a
    live training output_dir could race the trainer's rename swap — both
    renaming .next into place (loser raises OSError) or a restore reading
    ``final`` while a swap renames it away. Two CheckpointManager instances
    churn the same dir concurrently; the flock guard must serialize them
    (flock semantics are identical across processes — separate fds here
    exercise the same conflict path). Every restore must see a complete,
    whole-valued tree and no rename may collide."""
    import threading

    from t5_resnet_vqa_tpu.train.callbacks import CheckpointManager

    a = CheckpointManager(str(tmp_path))
    b = CheckpointManager(str(tmp_path))
    a.save_tree("best-model", {"w": np.full((2,), 0.0, np.float32)})

    errs = []

    def writer():
        try:
            for i in range(1, 15):
                a.save_tree("best-model",
                            {"w": np.full((2,), float(i), np.float32)})
        except Exception as e:                       # pragma: no cover
            errs.append(e)

    def reader():
        try:
            for _ in range(60):
                assert b.exists("best-model")
                v = _tree_val(b, "best-model")
                assert v == int(v) and 0.0 <= v <= 14.0
        except Exception as e:                       # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=writer), threading.Thread(target=reader)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errs == []
    assert _tree_val(a, "best-model") == 14.0


def test_pair_recovery_skips_live_writer(tmp_path):
    """A recovery sweep from ANOTHER process (serving/eval/import on a live
    output_dir) must not mistake a pair writer's in-flight lone params
    .next for crash debris: while ``pair.lock`` is flocked (as the writer
    holds it for the whole write+swap), pair recovery leaves everything
    untouched; once released (writer died), the lone .next is discarded."""
    import fcntl

    import orbax.checkpoint as ocp

    from t5_resnet_vqa_tpu.train.callbacks import CheckpointManager

    cm = CheckpointManager(str(tmp_path))
    _save_pair_vals(cm, 1.0, 1.0)
    side = ocp.StandardCheckpointer()
    side.save(cm._path("checkpoint-model") + ".next",
              {"w": np.full((2,), 2.0, np.float32)})
    side.wait_until_finished()

    # simulate the live writer: hold the pair lock on a separate fd
    # (flock conflicts across fds exactly as across processes)
    writer_fd = os.open(cm._pair_lock_path(), os.O_CREAT | os.O_RDWR, 0o644)
    fcntl.flock(writer_fd, fcntl.LOCK_EX)
    try:
        reader = CheckpointManager(str(tmp_path))
        assert reader.exists("checkpoint-model")       # recovery ran...
        assert os.path.isdir(cm._path("checkpoint-model") + ".next"), \
            "recovery discarded a live writer's in-flight .next"
        assert _pair_vals(reader) == (1.0, 1.0)        # ...and kept the pair
    finally:
        fcntl.flock(writer_fd, fcntl.LOCK_UN)
        os.close(writer_fd)

    # writer gone (killed): the half-written pair is now crash debris
    fresh = CheckpointManager(str(tmp_path))
    assert fresh.exists("checkpoint-model")
    assert not os.path.isdir(fresh._path("checkpoint-model") + ".next")
    assert _pair_vals(fresh) == (1.0, 1.0)


def test_pair_save_dying_mid_state_write_preserves_old_pair(tmp_path):
    """A save_pair whose STATE write dies (after the params .next landed)
    must leave the previous pair fully intact — end-to-end version of the
    lone-.next discard rule."""
    from t5_resnet_vqa_tpu.train.callbacks import CheckpointManager

    cm = CheckpointManager(str(tmp_path))
    _save_pair_vals(cm, 1.0, 1.0)

    real_save = cm._ckpt.save
    calls = {"n": 0}

    def dying_second_save(path, tree, force=True):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("simulated kill during state orbax write")
        return real_save(path, tree, force=force)

    cm._ckpt.save = dying_second_save
    with pytest.raises(RuntimeError):
        _save_pair_vals(cm, 2.0, 2.0)
    cm._ckpt.save = real_save

    fresh = CheckpointManager(str(tmp_path))
    assert _pair_vals(fresh) == (1.0, 1.0)
    # and a later healthy pair save supersedes cleanly, no debris
    _save_pair_vals(fresh, 3.0, 3.0)
    assert _pair_vals(fresh) == (3.0, 3.0)
    debris = [p for p in os.listdir(fresh.output_dir)
              if p.endswith((".next", ".old"))]
    assert debris == []


def test_recover_restores_old_when_swap_interrupted(tmp_path):
    """Crash between renaming final->.old and .next->final (the .next was
    then adopted or lost): .old must be restored as the checkpoint."""
    from t5_resnet_vqa_tpu.train.callbacks import CheckpointManager

    cm = CheckpointManager(str(tmp_path))
    cm.save_tree("checkpoint-model", {"w": np.full((2,), 1.0, np.float32)})
    os.rename(cm._path("checkpoint-model"),
              cm._path("checkpoint-model") + ".old")

    fresh = CheckpointManager(str(tmp_path))
    assert fresh.exists("checkpoint-model")
    assert _tree_val(fresh, "checkpoint-model") == 1.0
    assert not os.path.isdir(fresh._path("checkpoint-model") + ".old")


def test_snapshot_byte_budget_drains_before_new_snapshot(tmp_path):
    """Pending background saves are bounded by pinned snapshot BYTES, not
    just count. Found by the round-4 ViT 60-epoch soak: that family's
    params+optimizer pair snapshot is ~3.9 GB, so MAX_PENDING=2 pairs plus
    a best-model snapshot next to live state exhausted the chip's HBM
    (RESOURCE_EXHAUSTED at epoch ~8, reproduced) while the CNN family's
    ~1.9 GB pairs had survived 60 epochs. Submission must drain the oldest
    in-flight save BEFORE taking a snapshot that would exceed the budget."""
    import threading
    import time as _time

    from t5_resnet_vqa_tpu.train.callbacks import CheckpointManager

    cm = CheckpointManager(str(tmp_path), snapshot_budget_bytes=1024)
    gate = threading.Event()
    real_save = cm._ckpt.save

    def slow_save(path, tree, force=True):
        gate.wait(timeout=30)
        return real_save(path, tree, force=force)

    cm._ckpt.save = slow_save
    big = {"w": np.zeros(600, np.float32)}          # 2.4 KB > budget alone
    # first submission always proceeds (a lone snapshot may exceed the
    # budget — otherwise large models could never checkpoint at all)
    cm.save_tree("best-model", big, background=True)
    assert len(cm._pending) == 1

    done = threading.Event()

    def second():
        cm.save_tree("final-model", big, background=True)
        done.set()

    th = threading.Thread(target=second, daemon=True)
    th.start()
    _time.sleep(0.5)
    # 2.4 KB pinned + 2.4 KB incoming > 1 KB budget -> the second submit is
    # draining the in-flight save, NOT stacking a second snapshot
    assert not done.is_set()
    gate.set()
    assert done.wait(timeout=30)
    cm.flush()
    assert cm.exists("best-model") and cm.exists("final-model")


def test_snapshot_budget_allows_concurrent_small_saves(tmp_path):
    """Within the byte budget the queue keeps its round-3 behavior: two
    different-name saves stay pending concurrently (no new blocking)."""
    import threading

    from t5_resnet_vqa_tpu.train.callbacks import CheckpointManager

    cm = CheckpointManager(str(tmp_path))     # default 4 GiB budget
    gate = threading.Event()
    real_save = cm._ckpt.save

    def slow_save(path, tree, force=True):
        gate.wait(timeout=30)
        return real_save(path, tree, force=force)

    cm._ckpt.save = slow_save
    small = {"w": np.zeros(4, np.float32)}
    cm.save_tree("best-model", small, background=True)
    cm.save_tree("final-model", small, background=True)   # returns at once
    assert len(cm._pending) == 2
    gate.set()
    cm.flush()
    assert cm.exists("best-model") and cm.exists("final-model")


def test_pair_snapshot_bytes_accounting(tmp_path):
    """save_pair's pinned-bytes estimate covers BOTH trees of the pair."""
    import threading

    from t5_resnet_vqa_tpu.train.callbacks import CheckpointManager

    cm = CheckpointManager(str(tmp_path))
    gate = threading.Event()
    real_save = cm._ckpt.save

    def slow_save(path, tree, force=True):
        gate.wait(timeout=30)
        return real_save(path, tree, force=force)

    cm._ckpt.save = slow_save
    params = {"w": np.zeros(100, np.float32)}             # 400 B
    state = {"epoch": np.asarray(1), "w": np.zeros(50, np.float32)}
    cm.save_pair(params, state, background=True)
    nbytes = cm._pending[0][2]
    assert nbytes == 400 + np.asarray(1).nbytes + 200
    gate.set()
    cm.flush()
