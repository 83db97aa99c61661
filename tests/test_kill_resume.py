"""Hard-crash endurance: SIGKILL a live training process, resume, repeat.

The reference's only crash story is the KeyboardInterrupt handler
(faster_rcnn_vqa_trainer.py:305-310) — a graceful path. Real failures are
SIGKILL/OOM/power: no handler runs, background checkpoint threads die
mid-write. This test kills a real training subprocess twice at arbitrary
points (with per-step checkpointing maximizing the odds of dying mid-save)
and asserts the paired checkpoint-model + state_dict_checkpoint recovery
restores params AND optimizer state each time. The crash-state unit tests
(test_trainer.py::test_crash_mid_save_*) pin each .next/.old window
deterministically; this covers the integrated surface end-to-end.
"""

import os
import signal
import subprocess
import sys
import time

import pytest

_CHILD = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")   # never touch the TPU from tests

root, out_dir, epochs, resume = sys.argv[1:5]

from t5_resnet_vqa_tpu.core import Config
from t5_resnet_vqa_tpu.data import load_answer_spaces
from t5_resnet_vqa_tpu.models.resnet_vqa import ResnetVQAModel
from t5_resnet_vqa_tpu.models.t5 import T5Config
from t5_resnet_vqa_tpu.ops import AttentionConfig
from t5_resnet_vqa_tpu.train import VQATrainer

cfg = Config()
cfg.dataset.root_data_dir = root
cfg.dataset.train_batch_size = 4
cfg.dataset.test_batch_size = 4
cfg.dataset.image_size = 64
cfg.trainer.epochs = int(epochs)
cfg.trainer.output_dir = out_dir
cfg.trainer.seed = 0
cfg.trainer.checkpoint_every_steps = 1       # save constantly
cfg.trainer.load_from_checkpoint = resume == "1"
cfg.callbacks.threshold = -1.0
cfg = cfg.validate()

answers = load_answer_spaces(root + "/answer_spaces.txt")
model = ResnetVQAModel(
    answer_spaces=len(answers), vision_model_name="resnet18",
    t5_config=T5Config(vocab_size=32128, d_model=32, d_kv=8, d_ff=64,
                       num_layers=1, num_decoder_layers=1, num_heads=4),
    sga_config=AttentionConfig(hidden_size=32, num_heads=4, ff_size=32),
    num_attention_blocks=1)
VQATrainer(model, cfg, answers).train()
print("TRAIN_COMPLETED", flush=True)
"""


def _launch(root, out_dir, epochs, resume):
    return subprocess.Popen(
        [sys.executable, "-u", "-c", _CHILD, root, out_dir, str(epochs),
         "1" if resume else "0"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)


def _run_until(proc, marker, timeout=420):
    """Stream child stdout until ``marker`` appears (returns the transcript
    so far) or the child exits (returns None on missing marker)."""
    lines = []
    t0 = time.time()
    for line in proc.stdout:
        lines.append(line)
        if marker in line:
            return "".join(lines)
        if time.time() - t0 > timeout:
            proc.kill()
            raise RuntimeError(
                f"timeout waiting for {marker!r}:\n" + "".join(lines[-30:]))
    return None if proc.wait() != 0 else "".join(lines)


@pytest.mark.slow
def test_sigkill_mid_training_resumes_twice(tmp_path):
    from t5_resnet_vqa_tpu.data import make_synthetic_daquar

    root = str(tmp_path / "daquar")
    make_synthetic_daquar(root, num_train=8, num_test=4, image_size=64)
    out = str(tmp_path / "out")

    # crash #1: kill AFTER the first epoch checkpoint cycle started
    proc = _launch(root, out, epochs=50, resume=False)
    _run_until(proc, "Epoch #1:")
    time.sleep(1.0)                 # land inside the background save window
    proc.send_signal(signal.SIGKILL)
    proc.wait()

    # resume #1 must find the paired crash-recovery checkpoint, then gets
    # killed again at a different point (mid-epoch, right after a step log)
    proc = _launch(root, out, epochs=50, resume=True)
    transcript = _run_until(proc, "Loaded params from checkpoint-model")
    assert transcript is not None
    transcript = _run_until(proc, "Loaded Optimizer from Checkpoint")
    assert transcript is not None
    _run_until(proc, "Epoch #")     # progressed past the restore
    proc.send_signal(signal.SIGKILL)
    proc.wait()

    # resume #2 runs to completion
    proc = _launch(root, out, epochs=6, resume=True)
    transcript = _run_until(proc, "TRAIN_COMPLETED")
    assert transcript is not None and proc.wait() == 0
    assert "Loaded params from checkpoint-model" in transcript
    assert "Loaded Optimizer from Checkpoint" in transcript

    # no half-swapped checkpoint debris survives the run
    ckpt_dir = os.path.join(out, "model_checkpoints")
    debris = [p for p in os.listdir(ckpt_dir)
              if p.endswith((".next", ".old"))]
    assert debris == []
