"""60-epoch convergence soak at DAQUAR scale with mid-run SIGINT + resume.

The reference trains 60 epochs (README.md:59-64) with early stopping,
best-model selection and resume; this runner demonstrates the training
contract at that real duration on the actual chip (VERDICT r2 next #3):

  phase 1: flagship (ResNet50 + T5-base, bf16, B=128, feature cache,
           monitor_test, patience wired) launched via the PUBLIC CLI
           `train_faster_rcnn_vqa.py` on DAQUAR-shaped synthetic data
           (1449 images 640x480, 6795 train / 5673 test QA pairs);
  phase 2: SIGINT mid-run (after a target epoch) -> final-model save path;
  phase 3: relaunch with load_from_checkpoint=true -> epoch-counter +
           optimizer + best-score resume, runs to epoch 60;
  report:  loss/WUPS curves, checkpoint cycle counts, wall time
           -> benchmarks/soak_60_epochs.md + soak_60_epochs.json.

Usage: python benchmarks/soak_60_epochs.py [--epochs 60] [--sigint-epoch 15]
                                            [--family cnn|vit]

``--family vit`` runs the same protocol through `train_vit_vqa.py`
(ViT-base + T5-base enc-dec, B=64 — the family's measured serving/training
sweet spot — adaptive token lengths + ViT feature cache on), reporting to
soak_vit_60_epochs.{json,md} (VERDICT r3 next #6: the endurance evidence
covered only the CNN family).
"""

import argparse
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ROOT = "/tmp/soak_daquar"
# per-family paths set in main() (the two soaks must not clobber each other)
OUT = "/tmp/soak_out"
CFG = "/tmp/soak_config.json"
FAMILY = "cnn"
ENTRY = "train_faster_rcnn_vqa.py"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_dataset(tiny=False):
    from t5_resnet_vqa_tpu.data.synthetic import make_synthetic_daquar
    if os.path.exists(os.path.join(ROOT, "train.csv")):
        log("dataset exists, reusing")
        return
    t0 = time.time()
    if tiny:   # --tiny smoke: plumbing-only, runs on CPU in minutes
        make_synthetic_daquar(ROOT, num_train=32, num_test=16,
                              num_images=8, image_size=64, seed=0)
    else:
        make_synthetic_daquar(ROOT, num_train=6795, num_test=5673,
                              num_images=1449, image_size=256,
                              source_hw=(480, 640), seed=0)
    log(f"dataset built in {time.time() - t0:.0f}s")


def write_config(epochs, device="tpu", tiny=False):
    if FAMILY == "vit":
        model_kwargs = {
            "vision_model_name": "google/vit-base-patch16-224-in21k",
            "language_model_name": "t5-base",
            "compute_dtype": "bfloat16"}
        train_b = test_b = 64      # ViT-family sweet spot (vit_forward.md)
        if tiny:
            model_kwargs.update(
                vision_model_name="google/vit-base-patch16-224-in21k")
    else:
        model_kwargs = {"vision_model_name": "resnet50",
                        "language_model_name": "t5-base",
                        "compute_dtype": "bfloat16"}
        train_b = test_b = 128
    if tiny:
        train_b = test_b = 8
    cfg = {
        "model_kwargs": model_kwargs,
        "dataset_kwargs": {
            "root_data_dir": ROOT, "train_csv_file": "train.csv",
            "test_csv_file": "test.csv", "images_dir": "images",
            "answer_spaces_file": "answer_spaces.txt",
            "train_batch_size": train_b, "test_batch_size": test_b,
            "image_size": 64 if tiny else 256,
        },
        "trainer_kwargs": {"epochs": epochs, "device": device,
                           "output_dir": OUT, "gradient_clipping": 1.0,
                           "load_from_checkpoint": False,
                           "monitor_train": True, "monitor_val": True,
                           "monitor_test": True, "is_training": True,
                           "use_cache": True, "first_val_epoch": 0,
                           "metric_eval_mode": "strict",
                           "metric_average_mode": "macro",
                           "mxp_training": True,
                           "loss_combination_strategy": "d"},
        "optimizer_kwargs": {"type": "AdamW",
                             "kwargs": {"weight_decay": 0.1,
                                        "amsgrad": True},
                             "default_lr": 5e-5, "lm_encoder_lr": 5e-5,
                             "lm_decoder_lr": 1e-4, "vision_lr": 8e-5,
                             "classifier_lr": 1e-4},
        "lr_scheduler_kwargs": {"num_warmup_steps": -1,
                                "num_training_steps": -1,
                                "max_warmup_steps": 10000},
        # patience WIRED and counting; threshold 0.0 means only real WUPS
        # improvements reset it — on plateaued synthetic labels bad epochs
        # accumulate visibly; patience=epochs keeps the endurance run alive
        # to the LR-schedule tail (patience-fires-and-stops is pinned by
        # tests/test_trainer.py::test_early_stopping_honored)
        "callbacks_kwargs": {"kwargs": {"save_final_model": True,
                                        "patience": epochs, "mode": "max",
                                        "threshold": 0.0}},
    }
    with open(CFG, "w") as f:
        json.dump(cfg, f, indent=1)


def run_phase(tag, sigint_epoch=None, resume=False, timeout=7200):
    args = [sys.executable, os.path.join(REPO, ENTRY), "--config", CFG]
    if resume:
        args += ["--set", "trainer_kwargs.load_from_checkpoint=true"]
    log(f"[{tag}] launching: {' '.join(args[1:])}")
    t0 = time.time()
    proc = subprocess.Popen(args, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True, cwd=REPO)
    lines = []
    interrupted = False
    for line in proc.stdout:
        lines.append(line)
        if ("Epoch #" in line or "Saving" in line or "Loaded" in line
                or "cache" in line or "Adaptive" in line):
            log(f"[{tag}] {line.rstrip()[:150]}")
        if (sigint_epoch is not None and not interrupted
                and f"Epoch #{sigint_epoch}:" in line
                and "Validation" in line):
            log(f"[{tag}] sending SIGINT at epoch {sigint_epoch}")
            proc.send_signal(signal.SIGINT)
            interrupted = True
        if time.time() - t0 > timeout:
            # kill and fall through with a non-zero rc: phase 2's retry
            # loop resumes from the durable checkpoint instead of losing
            # the whole run to a RuntimeError with no report
            log(f"[{tag}] timed out after {timeout}s — killing trainer")
            proc.kill()
            break
    rc = proc.wait()
    wall = time.time() - t0
    log(f"[{tag}] exit rc={rc} wall={wall:.0f}s")
    return "".join(lines), wall, rc


TINY = False


def write_report(args, out1, wall1, rc1, out2, wall2, rc2, final_saved):
    rows = [json.loads(l) for l in open(os.path.join(OUT, "metrics.jsonl"))]
    logs = [r for r in rows if r.get("_event") == "log"]
    train = [(r.get("epoch"), r["train_avg_loss"]) for r in logs
             if "train_avg_loss" in r]
    valid = [(r.get("epoch"), r.get("valid_avg_loss"),
              r.get("valid_avg_wups")) for r in logs
             if "valid_avg_wups" in r]
    # resume boundaries: a later log entry whose epoch does not advance
    # past its predecessor marks a relaunch replaying from the durable
    # checkpoint (VERDICT r4 #8: curves must disambiguate replayed epochs)
    resume_at = [i for i in range(1, len(train))
                 if train[i][0] <= train[i - 1][0]]
    replayed = sum(train[i - 1][0] - train[i][0] + 1 for i in resume_at)
    report = {
        "epochs_requested": args.epochs,
        "sigint_epoch": args.sigint_epoch,
        "phase1_wall_s": round(wall1, 1),
        "phase2_wall_s": round(wall2, 1),
        "phase1_rc": rc1, "phase2_rc": rc2,
        "final_model_saved_on_sigint": final_saved,
        "resume_logged": ("Loaded Optimizer from Checkpoint" in out2),
        "train_epochs_logged": len(train),
        "valid_epochs_logged": len(valid),
        "first_train_loss": train[0][1] if train else None,
        "last_train_loss": train[-1][1] if train else None,
        "min_train_loss": min(t[1] for t in train) if train else None,
        "best_valid_wups": max(v[2] for v in valid) if valid else None,
        "last_valid_wups": valid[-1][2] if valid else None,
        "best_model_saves": out1.count("Saving new best-model")
        + out2.count("Saving new best-model"),
        "epoch_checkpoint_saves": out1.count("Saving Epoch Checkpoint")
        + out2.count("Saving Epoch Checkpoint"),
        "bad_epochs_logged": out1.count("Bad Epoch")
        + out2.count("Bad Epoch"),
        # indices INTO train_curve where a relaunch restarted from the
        # durable checkpoint + how many epoch entries are replays, so the
        # curve's duplicate epochs read as resume evidence, not noise
        "resume_boundaries": resume_at,
        "replayed_epoch_entries": replayed,
        "checkpoint_lag_drains": out1.count("Checkpoint lag reached")
        + out2.count("Checkpoint lag reached"),
        "staleness_warnings": out1.count("epoch(s) of work will be re-run")
        + out2.count("epoch(s) of work will be re-run"),
        "train_curve": train,
        "valid_curve": valid,
    }
    name = ("soak_vit_60_epochs.json" if FAMILY == "vit"
            else "soak_60_epochs.json")
    if TINY:   # smoke runs must not masquerade as real soak artifacts
        name = name.replace(".json", "_tiny_smoke.json")
    with open(os.path.join(REPO, "benchmarks", name), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: v for k, v in report.items()
                      if not k.endswith("curve")}, indent=1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--sigint-epoch", type=int, default=15)
    ap.add_argument("--family", choices=("cnn", "vit"), default="cnn")
    ap.add_argument("--device", default="tpu")
    ap.add_argument("--tiny", action="store_true",
                    help="plumbing smoke: tiny dataset/model geometry "
                         "(pair with --device cpu --epochs 3)")
    ap.add_argument("--phase-timeout", type=int, default=7200,
                    help="per-phase wall clock bound in seconds (phase 2 "
                         "covers epochs sigint..60 — raise on a slow link)")
    ap.add_argument("--max-resume-retries", type=int, default=4,
                    help="relaunch-with-resume attempts after an abnormal "
                         "(non-SIGINT) trainer exit, e.g. a tunnel drop")
    ap.add_argument("--report-only", action="store_true",
                    help="regenerate the report from an existing run's "
                         "training logs + metrics.jsonl (e.g. after the "
                         "runner was interrupted but the trainer finished)")
    args = ap.parse_args()

    global FAMILY, ENTRY, OUT, CFG, ROOT, TINY
    TINY = args.tiny
    FAMILY = args.family
    if FAMILY == "vit":
        ENTRY = "train_vit_vqa.py"
        OUT = "/tmp/soak_vit_out"
        CFG = "/tmp/soak_vit_config.json"
    if args.tiny:   # never pollute the full-scale dataset/output dirs
        ROOT = "/tmp/soak_tiny_daquar"
        OUT = OUT + "_tiny"
        CFG = CFG.replace(".json", "_tiny.json")

    if args.report_only:
        # reconstruct the phase outputs from the persisted training logs
        logs = sorted(os.path.join(OUT, f) for f in os.listdir(OUT)
                      if f.startswith("training_log_"))
        texts = [open(f).read() for f in logs]
        out1 = texts[0] if texts else ""
        out2 = "".join(texts[1:])
        final_saved = os.path.isdir(
            os.path.join(OUT, "model_checkpoints", "final-model"))
        write_report(args, out1, -1, -1, out2, -1, -1, final_saved)
        return

    build_dataset(tiny=args.tiny)
    write_config(args.epochs, device=args.device, tiny=args.tiny)
    import shutil
    shutil.rmtree(OUT, ignore_errors=True)

    out1, wall1, rc1 = run_phase("phase1", sigint_epoch=args.sigint_epoch,
                                 timeout=args.phase_timeout)
    final_saved = os.path.isdir(
        os.path.join(OUT, "model_checkpoints", "final-model"))
    log(f"phase1: final-model saved: {final_saved}")

    # Abnormal phase-1 exits (tunnel drop, OOM-kill — anything that is not
    # the protocol's own SIGINT, which exits 0 via the final-model path)
    # are retried THROUGH the resume path: that both keeps the endurance
    # run alive on a flaky link and exercises the crash-recovery contract
    # the soak exists to demonstrate. Bounded so a hard-down tunnel still
    # terminates the runner with an honest non-zero rc in the report.
    out2, wall2, rc2 = run_phase("phase2-resume", resume=True,
                                 timeout=args.phase_timeout)
    retries = 0
    while rc2 != 0 and retries < args.max_resume_retries:
        retries += 1
        log(f"phase2 died rc={rc2}; resume retry "
            f"{retries}/{args.max_resume_retries} in 60s")
        time.sleep(60)
        o, w, rc2 = run_phase(f"phase2-retry{retries}", resume=True,
                              timeout=args.phase_timeout)
        out2 += o
        wall2 += w
    write_report(args, out1, wall1, rc1, out2, wall2, rc2, final_saved)


if __name__ == "__main__":
    main()
