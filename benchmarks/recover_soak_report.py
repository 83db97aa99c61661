"""Reconstruct a soak report after a host filesystem incident (round 5).

During the round-5 ViT-family 60-epoch soak the host suffered a mid-run
filesystem incident (the same event that stalled the builder session):
dirty pages of several open files were lost, leaving NUL holes in the
runner's streamed log and dropping `metrics.jsonl` rows for epochs 8-45
plus the phase2-resume `training_log_*.txt` file entirely. The trainer
processes themselves were unaffected — the run completed all 60 epochs
with phase1_rc=0 / phase2_rc=0 — but the runner's `write_report`, which
derives its curves from `metrics.jsonl`, saw only 22 epochs.

This tool rebuilds the report from every surviving source and records
exactly which epochs each source attests:

  * runner streamed log (NUL-holes stripped) — per-epoch train/valid
    loss + WUPS for epochs 0-7 and 18-59 (50 of 60), including the
    epoch-46/47 replay across the retry boundary;
  * per-epoch `validation_predictions/<e>_validation_predictions.json`
    files — independent per-sample WUPS for the same 50 epochs;
  * `model_checkpoints/training_progress.json` — epochs_completed=60,
    global_step=6360 = 60 epochs x 106 steps exactly;
  * the runner's in-memory aggregate counts (written to the original
    JSON before the incident was noticed): 62 epoch-checkpoint saves =
    phase1 16 (epochs 0-15) + phase2-resume 32 (16-47) + retry1 14
    (46-59), which attests the 8-17 hole.

Usage: python benchmarks/recover_soak_report.py \
           --runner-log /tmp/soak_vit_r5.log --out-dir /tmp/soak_vit_out
Writes: benchmarks/soak_vit_60_epochs.json (recovered curves + provenance)
        benchmarks/soak_vit_60_epochs_runner.log (NUL-stripped evidence)
"""

import argparse
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TRAIN_RE = re.compile(
    r"\[(phase[\w-]+)\] Epoch #(\d+): Average Loss ([\d.]+) - "
    r"Average WUPS Score: ([\d.]+)")
VALID_RE = re.compile(
    r"\[(phase[\w-]+)\] Epoch #(\d+): Average Validation Loss: ([\d.]+) - "
    r"Average WUPS Score: ([\d.]+)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runner-log", default="/tmp/soak_vit_r5.log")
    ap.add_argument("--out-dir", default="/tmp/soak_vit_out")
    args = ap.parse_args()

    raw = (open(args.runner_log, "rb").read()
           .replace(b"\x00", b"").decode("utf-8", "replace"))

    train = [(p, int(e), float(l), float(w))
             for p, e, l, w in TRAIN_RE.findall(raw)]
    valid = [(p, int(e), float(l), float(w))
             for p, e, l, w in VALID_RE.findall(raw)]

    # independent cross-check: recompute valid WUPS from the per-sample
    # prediction files and compare with the parsed log values
    pred_dir = os.path.join(args.out_dir, "validation_predictions")
    pred_epochs, mismatches = [], []
    logged = {e: w for _, e, _, w in valid}
    for fn in sorted(os.listdir(pred_dir)):
        e = int(fn.split("_")[0])
        rows = json.load(open(os.path.join(pred_dir, fn)))
        mean = sum(r["wups_score"] for r in rows) / len(rows)
        pred_epochs.append(e)
        # the trainer log prints WUPS with 4 decimals — compare at that
        # precision (the prediction files hold the full-precision values)
        if e in logged and abs(round(mean, 4) - logged[e]) > 1e-9:
            mismatches.append((e, mean, logged[e]))
    pred_epochs.sort()

    progress = json.load(open(os.path.join(
        args.out_dir, "model_checkpoints", "training_progress.json")))

    # merge onto the runner-written report so the aggregate fields the
    # runner counted in memory (checkpoint saves etc.) are preserved
    rpt_path = os.path.join(REPO, "benchmarks", "soak_vit_60_epochs.json")
    report = json.load(open(rpt_path))

    train_curve = [[e, l] for _, e, l, _ in train]
    valid_curve = [[e, l, w] for _, e, l, w in valid]
    resume_at = [i for i in range(1, len(train_curve))
                 if train_curve[i][0] <= train_curve[i - 1][0]]
    attested = sorted({e for _, e, _, _ in train})
    missing = [e for e in range(report["epochs_requested"])
               if e not in attested]

    report.update({
        "train_epochs_logged": len(attested),
        "valid_epochs_logged": len(sorted({e for _, e, _, _ in valid})),
        "first_train_loss": train_curve[0][1],
        "last_train_loss": train_curve[-1][1],
        "min_train_loss": min(l for _, l in train_curve),
        "best_valid_wups": max(w for _, _, w in valid_curve),
        "last_valid_wups": valid_curve[-1][2],
        "resume_boundaries": resume_at,
        "replayed_epoch_entries": sum(
            train_curve[i - 1][0] - train_curve[i][0] + 1
            for i in resume_at),
        "train_curve": train_curve,
        "valid_curve": valid_curve,
        "recovery": {
            "reason": "host filesystem incident mid-run lost dirty pages: "
                      "metrics.jsonl rows for epochs 8-45, the "
                      "phase2-resume training_log file, and a NUL hole in "
                      "the runner log (epochs 8-17). Trainer processes "
                      "were unaffected; curves rebuilt by "
                      "benchmarks/recover_soak_report.py from the "
                      "surviving sources below.",
            "epochs_attested_per_epoch": attested,
            "epochs_aggregate_only": missing,
            "aggregate_evidence": {
                "training_progress.json": progress,
                "epoch_checkpoint_saves": report["epoch_checkpoint_saves"],
                "saves_decomposition":
                    "62 = phase1 16 (epochs 0-15, SIGINT at 15) + "
                    "phase2-resume 32 (16-47) + retry1 14 (46-59)",
            },
            "validation_predictions_epochs": pred_epochs,
            "validation_predictions_wups_mismatches": mismatches,
        },
    })
    with open(rpt_path, "w") as f:
        json.dump(report, f, indent=1)
    with open(os.path.join(REPO, "benchmarks",
                           "soak_vit_60_epochs_runner.log"), "w") as f:
        f.write(raw)
    print(json.dumps({k: v for k, v in report.items()
                      if k not in ("train_curve", "valid_curve")},
                     indent=1)[:3000])


if __name__ == "__main__":
    main()
