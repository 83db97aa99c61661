"""Callbacks: checkpointing + early stopping.

Parity with /root/reference/trainer/callbacks.py, with Orbax replacing
torch.save but the artifact contract preserved under
``<output_dir>/model_checkpoints/``:

  best-model/              params on metric improvement        (ref :39)
  model_ckpt_info.json     {epoch, best_score, answer_spaces}  (ref :41-46)
  checkpoint-model/        rolling epoch params                (ref :112-116)
  state_dict_checkpoint/   {epoch, opt_state}                  (ref :118-125)
  final-model/             params on exit                      (ref :53-56)
  model-metrics.json       {best-score} resume source          (ref :89-92)

One deliberate divergence (SURVEY §7): the reference configures
patience/threshold but never calls EarlyStopping.__call__ — its trainers
compare ``avg_wups > best_score`` inline, so patience is inert (ref
faster_rcnn_vqa_trainer.py:458-461). Here ``EarlyStopping.__call__`` is
actually wired into the trainer; ``should_stop`` goes True after ``patience``
bad epochs instead of killing the process.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import threading
from typing import Any, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp

from ..core.logging import Logger


def _to_numpy_tree(tree: Any) -> Any:
    return jax.tree.map(lambda x: np.asarray(x), tree)


# ONE dispatch per snapshot (a per-leaf jnp.copy would cost one tunnel
# round trip per leaf — ~200 for the param tree). The copy reads the
# buffers before any later (donating) train step overwrites them, so a
# background save never races buffer donation.
@jax.jit
def _device_snapshot(tree: Any) -> Any:
    return jax.tree.map(jnp.copy, tree)


class CheckpointManager:
    """Orbax-backed artifact store with the reference's file layout.

    ``save_tree(..., background=True)`` snapshots the tree ON DEVICE (one
    cheap HBM copy, safe against buffer donation by subsequent steps) and
    moves the expensive part — the device->host fetch (~2.3 GB for
    params+optimizer on the flagship; minutes through a degraded tunnel)
    plus the Orbax write — to a single worker thread, so training
    continues while the checkpoint lands. ``flush()`` joins all pending
    saves; the trainer flushes at train() end, before exit saves, and
    callers that need read-after-write (tools, tests) use the default
    synchronous path."""

    # max in-flight background saves. Each pending save holds a device
    # snapshot (params+opt ~3 GB HBM on the flagship); on a degraded tunnel
    # a save takes minutes while epochs take seconds, so an unbounded queue
    # would accumulate snapshots until the chip OOMs. Beyond the bound,
    # queued-but-unstarted saves of the SAME name are superseded (crash
    # recovery only ever needs the latest), and submission blocks on the
    # oldest in-flight save otherwise.
    MAX_PENDING = 2

    def __init__(self, output_dir: str):
        self.output_dir = os.path.join(output_dir, "model_checkpoints")
        os.makedirs(self.output_dir, exist_ok=True)
        self._ckpt = ocp.StandardCheckpointer()
        self._pool = None
        self._pending: List[Any] = []    # (name, future) pairs
        self.superseded_saves = 0        # observability for long runs
        self._swap_lock = threading.Lock()   # swap/recover vs worker saves

    def _path(self, name: str) -> str:
        return os.path.join(os.path.abspath(self.output_dir), name)

    def _recover(self, name: str) -> None:
        """Adopt the newest COMPLETE checkpoint after a crash mid-swap.

        ``_save_sync`` writes the new tree to ``<name>.next`` first (Orbax
        itself is atomic: the dir only appears once the write finished),
        then swaps it into place. A kill at any point leaves one of:

          .next complete            -> adopt it (it is the newest state)
          <name> renamed to .old    -> restore it (the previous checkpoint)
          stray .old after the swap -> delete it

        so ``<name>`` always resolves to a complete checkpoint. Found the
        hard way: a 60-epoch soak killed mid-save at epoch 43 lost BOTH the
        old and new ``checkpoint-model`` under the previous
        delete-then-rewrite scheme, silently degrading resume to the
        epoch-1 best-model."""
        final = self._path(name)
        nxt, old = final + ".next", final + ".old"
        with self._swap_lock:
            if os.path.isdir(nxt):
                if os.path.isdir(final):
                    shutil.rmtree(final)
                os.rename(nxt, final)
            elif not os.path.isdir(final) and os.path.isdir(old):
                os.rename(old, final)
            if os.path.isdir(old):
                shutil.rmtree(old)

    def _save_sync(self, name: str, tree: Any,
                   on_complete: Optional[Any] = None) -> None:
        self._recover(name)             # adopt/clean any prior crash state
        final = self._path(name)
        nxt, old = final + ".next", final + ".old"
        # incomplete Orbax tmp dirs from killed writes (both the current
        # .next scheme and the pre-fix direct-write scheme) are garbage
        for stray in (glob.glob(final + ".orbax-checkpoint-tmp*")
                      + glob.glob(nxt + ".orbax-checkpoint-tmp*")):
            shutil.rmtree(stray, ignore_errors=True)
        self._ckpt.save(nxt, _to_numpy_tree(tree), force=True)
        self._ckpt.wait_until_finished()
        with self._swap_lock:
            # a concurrent _recover (exists/restore from another thread) may
            # have already adopted the completed .next as final
            if os.path.isdir(nxt):
                if os.path.isdir(final):
                    os.rename(final, old)
                os.rename(nxt, final)
            if os.path.isdir(old):
                shutil.rmtree(old)
        if on_complete is not None:
            on_complete()

    def save_tree(self, name: str, tree: Any, background: bool = False,
                  on_complete: Optional[Any] = None) -> None:
        """Save ``tree`` under ``name``; run ``on_complete()`` strictly AFTER
        the checkpoint has landed on disk. Metadata that points at the
        checkpoint (model_ckpt_info.json, model-metrics.json) must go
        through ``on_complete`` — writing it eagerly while a background
        save is in flight leaves a crash window where the metadata (and a
        resumed best_score) reference a checkpoint that never landed."""
        if not background:
            self._save_sync(name, tree, on_complete)
            return
        if self._pool is None:
            import concurrent.futures
            self._pool = concurrent.futures.ThreadPoolExecutor(
                1, thread_name_prefix="ckpt-save")
        # supersede queued-but-unstarted saves of the same name: the newer
        # tree is strictly more recent crash-recovery state
        kept = []
        for n, f in self._pending:
            if n == name and f.cancel():
                self.superseded_saves += 1
            elif not f.done():
                kept.append((n, f))
            else:
                f.result()               # surface any worker exception
        self._pending = kept
        while len(self._pending) >= self.MAX_PENDING:
            self._pending.pop(0)[1].result()     # bound HBM snapshots
        snap = _device_snapshot(tree)
        self._pending.append(
            (name, self._pool.submit(self._save_sync, name, snap,
                                     on_complete)))

    def flush(self) -> None:
        """Join all pending background saves (exceptions propagate;
        cancelled/superseded saves are never in the pending list)."""
        pending, self._pending = self._pending, []
        for _, f in pending:
            f.result()

    def restore_tree(self, name: str, target: Optional[Any] = None) -> Any:
        self._recover(name)
        return self._ckpt.restore(self._path(name), target)

    def exists(self, name: str) -> bool:
        self._recover(name)
        return os.path.isdir(self._path(name))

    def write_json(self, name: str, obj: Any) -> None:
        with open(os.path.join(self.output_dir, name), "w") as f:
            json.dump(obj, f)

    def read_json(self, name: str) -> Optional[Any]:
        p = os.path.join(self.output_dir, name)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)


class Callbacks:
    """Base: best-model saving (ref callbacks.py:10-57)."""

    def __init__(self, logger: Logger, output_dir: str,
                 save_final_model: bool = False):
        self.logger = logger
        self.save_final_model = save_final_model
        self.ckpt = CheckpointManager(output_dir)
        self.best_score = 0.0
        self.mode = "max"
        self.threshold = 0.0

    def better_score(self, score: float) -> bool:
        if self.mode == "max":
            return (score - self.best_score) > self.threshold
        return (self.best_score - score) > self.threshold

    def save_checkpoint(self, params: Any, epoch: int,
                        answer_spaces: List[str],
                        on_complete: Optional[Any] = None) -> None:
        self.logger.log_message(
            f"Saving new best-model with F-Score: {self.best_score:.4f}")

        info = {
            "epoch": epoch,
            "best_score": self.best_score,
            "answer_spaces": list(answer_spaces),
        }

        def _write_metadata() -> None:
            # Runs on the checkpoint worker AFTER the Orbax save lands, so
            # a crash mid-save can never leave metadata pointing at a
            # best-model that doesn't exist on disk.
            self.ckpt.write_json("model_ckpt_info.json", info)
            if on_complete is not None:
                on_complete()

        self.ckpt.save_tree("best-model", params, background=True,
                            on_complete=_write_metadata)

    def exit_training(self, params: Any) -> None:
        self.ckpt.flush()              # land any in-flight background saves
        self.logger.log_block(
            f"Exiting from training early. Best model score: "
            f"{self.best_score:.4f}. Saving final model: "
            f"{self.save_final_model} ")
        if self.save_final_model:
            self.logger.log_message("Saving model ...")
            self.ckpt.save_tree("final-model", params)
            self.logger.log_message("Done.")


class EarlyStopping(Callbacks):
    """Patience/threshold early stopping — wired for real (see module doc)."""

    def __init__(self, logger: Logger, output_dir: str,
                 save_final_model: bool = False, patience: int = 5,
                 mode: str = "max", threshold: float = 0.01):
        super().__init__(logger, output_dir, save_final_model)
        self.patience = patience
        self.mode = mode
        self.threshold = threshold
        self.best_score = 0.0 if mode == "max" else float("inf")
        self.num_bad_epoch = 0
        self.should_stop = False

        metrics = self.ckpt.read_json("model-metrics.json")
        if metrics is not None:                      # resume (ref :89-92)
            self.best_score = metrics["best-score"]

    def __call__(self, params: Any, score: float, epoch: int,
                 answer_spaces: List[str]) -> None:
        if self.better_score(score):
            self.best_score = score
            self.num_bad_epoch = 0
            self.save_checkpoint(
                params, epoch, answer_spaces,
                on_complete=lambda: self.ckpt.write_json(
                    "model-metrics.json", {"best-score": score}))
        else:
            self.num_bad_epoch += 1
            self.logger.log_new_line()
            self.logger.log_message(
                f"Bad Epoch. Total num bad epoch: {self.num_bad_epoch}")
            if self.num_bad_epoch >= self.patience:
                self.should_stop = True

    def save_epoch_checkpoint(self, params: Any) -> None:
        self.logger.log_new_line()
        self.logger.log_message("Saving Epoch Checkpoint")
        self.ckpt.save_tree("checkpoint-model", params, background=True)

    def save_state_dict_checkpoint(self, epoch: int, opt_state: Any,
                                   global_step: int = 0) -> None:
        self.ckpt.save_tree("state_dict_checkpoint", {
            "epoch": np.asarray(epoch),
            "global_step": np.asarray(global_step),
            "optimizer": opt_state}, background=True)
