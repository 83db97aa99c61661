"""File + stdout logger and experiment tracking.

Parity with the reference Logger (/root/reference/trainer/logger.py:17-60):
timestamped ``training_log_<ts>.txt`` in the output dir, mirrored to stdout,
with the same log_message/log_line/log_new_line/log_block surface.

``ExperimentTracker`` replaces the reference's wandb calls
(faster_rcnn_vqa_trainer.py:34-43, 383-389, 474-480) with a local JSONL
metrics stream (and delegates to wandb when it is importable and enabled).
"""

from __future__ import annotations

import json
import logging as _logging
import os
import sys
import time
from typing import Any, Dict, Optional


class Logger:
    """stdlib-logging based file+stdout logger (reference logger.py parity)."""

    def __init__(self, output_dir: str, name: str = "t5_resnet_vqa_tpu"):
        os.makedirs(output_dir, exist_ok=True)
        ts = time.strftime("%Y-%m-%d_%H-%M-%S")
        self.log_path = os.path.join(output_dir, f"training_log_{ts}.txt")

        self._logger = _logging.getLogger(f"{name}.{ts}.{id(self)}")
        self._logger.setLevel(_logging.INFO)
        self._logger.propagate = False

        fh = _logging.FileHandler(self.log_path)
        fh.setFormatter(_logging.Formatter("%(asctime)s %(message)s"))
        sh = _logging.StreamHandler(sys.stdout)
        sh.setFormatter(_logging.Formatter("%(message)s"))
        self._logger.addHandler(fh)
        self._logger.addHandler(sh)
        self._file_handler = fh

    def sync(self) -> None:
        """Flush AND fsync the log file to stable storage.

        stdlib FileHandler flushes per record (OS page cache), which is not
        durable: the round-5 60-epoch soak lost the pages of a whole phase's
        training log to a host filesystem incident while the fsync'd
        checkpoint files survived. The trainer calls this once per epoch so
        a run's log record is at most one epoch behind its checkpoints.
        """
        stream = self._file_handler.stream
        try:
            stream.flush()
            os.fsync(stream.fileno())
        except (OSError, ValueError):   # closed stream — nothing to sync
            pass

    def log_message(self, message: str) -> None:
        self._logger.info(message)

    def log_line(self, width: int = 100) -> None:
        self._logger.info("-" * width)

    def log_new_line(self) -> None:
        self._logger.info("")

    def log_block(self, message: str) -> None:
        self.log_line()
        self._logger.info(message)
        self.log_line()


class ExperimentTracker:
    """wandb-shaped tracker writing metrics to ``<output_dir>/metrics.jsonl``.

    API subset used by the reference trainers: init(config) / log(dict) /
    finish(). If the real wandb package is importable and ``use_wandb`` is
    True it is also driven; otherwise everything stays local (this image has
    no wandb and no egress).
    """

    def __init__(self, output_dir: str, project: str,
                 config: Optional[Dict[str, Any]] = None,
                 use_wandb: bool = False):
        os.makedirs(output_dir, exist_ok=True)
        self.project = project
        self.path = os.path.join(output_dir, "metrics.jsonl")
        self._fh = open(self.path, "a")
        self._step = 0
        self._wandb = None
        if use_wandb:
            try:
                import wandb  # type: ignore
                self._wandb = wandb
                wandb.init(project=project, config=config or {})
            except Exception:
                self._wandb = None
        if config is not None:
            self._emit({"_event": "init", "project": project, "config": config})

    def _emit(self, record: Dict[str, Any]) -> None:
        record = dict(record)
        record.setdefault("_time", time.time())
        self._fh.write(json.dumps(record, default=str) + "\n")
        # flush + fsync: metrics records are written a few times per epoch
        # (epoch train/valid summaries), so full durability is ~free — and
        # the round-5 soak proved flush-only loses rows to a host fs
        # incident (epochs 8-45 of metrics.jsonl vanished; the fsync'd
        # checkpoints survived). benchmarks/recover_soak_report.py is the
        # forensic tool that incident required; this line is the fix.
        self._fh.flush()
        os.fsync(self._fh.fileno())

    def log(self, metrics: Dict[str, Any]) -> None:
        self._step += 1
        self._emit({"_event": "log", "_step": self._step, **metrics})
        if self._wandb is not None:
            self._wandb.log(metrics)

    def finish(self) -> None:
        self._emit({"_event": "finish"})
        self._fh.close()
        if self._wandb is not None:
            self._wandb.finish()
