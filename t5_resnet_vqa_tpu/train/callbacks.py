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

import fcntl
import glob
import json
import os
import shutil
import threading
from contextlib import contextmanager
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


def _tree_nbytes(tree: Any) -> int:
    """Estimated device bytes a snapshot of ``tree`` will occupy."""
    return sum(x.size * x.dtype.itemsize
               for x in jax.tree_util.tree_leaves(tree)
               if hasattr(x, "size") and hasattr(x, "dtype"))


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
    # ...and a BYTE bound on the snapshots those pending saves pin in HBM.
    # A count bound alone is family-relative: the ViT enc-dec family's
    # params+optimizer pair is ~3.9 GB, so two pending pairs + a best-model
    # snapshot + live state exhausted the chip mid-soak (round-4 ViT
    # 60-epoch soak: RESOURCE_EXHAUSTED at epoch ~8, reproduced, while the
    # CNN family's ~1.9 GB pairs survived 60 epochs in round 3). Submission
    # drains the oldest in-flight save BEFORE taking a new snapshot whenever
    # the new snapshot would push pinned bytes past this budget, so peak
    # checkpoint HBM = budget + one snapshot, regardless of model family.
    # device.memory_stats() is unavailable through the axon tunnel, hence a
    # static budget; tune via the ``snapshot_budget_bytes`` ctor arg for
    # chips with more/less HBM.
    MAX_PENDING_BYTES = 4 * 1024 ** 3

    # ``checkpoint-model`` (params) and ``state_dict_checkpoint``
    # (epoch + global_step + optimizer) are only meaningful as a PAIR from
    # the same training point (ref faster_rcnn_vqa_trainer.py:269-277
    # restores them together). They are saved through ``save_pair`` — one
    # worker task that writes BOTH ``.next`` dirs before swapping EITHER —
    # and recovered pair-aware, so no kill point can publish params from
    # epoch N next to an optimizer state from epoch N-1.
    PAIRED = ("checkpoint-model", "state_dict_checkpoint")

    def __init__(self, output_dir: str,
                 snapshot_budget_bytes: Optional[int] = None):
        self.output_dir = os.path.join(output_dir, "model_checkpoints")
        os.makedirs(self.output_dir, exist_ok=True)
        self._ckpt = ocp.StandardCheckpointer()
        self._pool = None
        self._pending: List[Any] = []    # (name, future, nbytes) triples
        self.snapshot_budget_bytes = (snapshot_budget_bytes
                                      or self.MAX_PENDING_BYTES)
        self.superseded_saves = 0        # observability for long runs
        # swap/recover vs worker saves — RLock so guarded sections can nest
        self._swap_lock = threading.RLock()
        self._writing: set = set()       # names mid-write on the worker
        self._fs_fd: Optional[int] = None    # cross-process flock fd
        self._fs_depth = 0

    @contextmanager
    def _guard(self):
        """Thread + CROSS-PROCESS guard for checkpoint-dir mutations and
        reads (advisor r3: a serving/eval/import process pointed at a live
        training output_dir could race the trainer's rename swap — both
        renaming .next into place, or a restore reading ``final`` while a
        swap renames it away). flock on ``.swap.lock`` serializes across
        processes; the RLock serializes threads and makes the flock depth
        counter safe (flock on two fds of the same file would self-deadlock
        within one process, so one fd + a depth count)."""
        with self._swap_lock:
            if self._fs_depth == 0:
                if self._fs_fd is None:
                    self._fs_fd = os.open(
                        os.path.join(self.output_dir, ".swap.lock"),
                        os.O_CREAT | os.O_RDWR, 0o644)
                fcntl.flock(self._fs_fd, fcntl.LOCK_EX)
            self._fs_depth += 1
            try:
                yield
            finally:
                self._fs_depth -= 1
                if self._fs_depth == 0:
                    fcntl.flock(self._fs_fd, fcntl.LOCK_UN)

    def _path(self, name: str) -> str:
        return os.path.join(os.path.abspath(self.output_dir), name)

    def _recover_one_locked(self, name: str) -> None:
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
        epoch-1 best-model. Caller holds ``_swap_lock``."""
        final = self._path(name)
        nxt, old = final + ".next", final + ".old"
        if os.path.isdir(nxt):
            if os.path.isdir(final):
                shutil.rmtree(final)
            os.rename(nxt, final)
        elif not os.path.isdir(final) and os.path.isdir(old):
            os.rename(old, final)
        if os.path.isdir(old):
            shutil.rmtree(old)

    def _recover(self, name: str) -> None:
        with self._guard():
            if name in self.PAIRED:
                self._recover_pair_locked()
            else:
                self._recover_one_locked(name)

    def _recover_pair_locked(self) -> None:
        """Pair-aware crash recovery for checkpoint-model/state_dict_checkpoint.

        ``_save_pair_sync`` writes BOTH ``.next`` dirs (params first, state
        last) before swapping EITHER, so at any kill point:

          state ``.next`` complete  -> the whole pair finished writing; adopt
                                       both (params ``.next`` may already have
                                       been swapped in — _recover_one handles
                                       each member's own swap windows)
          params ``.next`` only     -> the kill landed before the state write
                                       finished: the new pair never fully
                                       landed. Adopting the lone params .next
                                       would publish epoch-N params next to an
                                       epoch-N-1 optimizer state (the exact
                                       mixed-lineage hazard) — discard it and
                                       keep the previous consistent pair.

        Live saves are excluded: while a writer is mid-pair-write, a
        concurrent exists()/restore() must neither adopt nor discard half of
        an in-flight pair. In-process writers are visible via ``_writing``;
        writers in OTHER processes (a second trainer would be misuse, but a
        recovery sweep from serving/eval/import on a live output_dir is
        exactly the advisor's scenario) hold an flock on ``pair.lock`` for
        the WHOLE write+swap — if we cannot acquire it, a live writer owns
        the pair and recovery must leave everything alone (without this, a
        reader discarding the writer's completed params ``.next`` mid-window
        would let the subsequent state swap publish OLD params beside NEW
        optimizer state)."""
        a, b = self.PAIRED
        if self._writing & set(self.PAIRED):
            return
        fd = os.open(self._pair_lock_path(), os.O_CREAT | os.O_RDWR, 0o644)
        try:
            try:
                fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
            except OSError:
                return                      # live pair writer elsewhere
            a_next = self._path(a) + ".next"
            b_next = self._path(b) + ".next"
            if not os.path.isdir(b_next) and os.path.isdir(a_next):
                shutil.rmtree(a_next)
            self._recover_one_locked(a)
            self._recover_one_locked(b)
        finally:
            os.close(fd)                    # releases the flock if held

    def _clean_strays(self, name: str) -> None:
        # incomplete Orbax tmp dirs from killed writes (both the current
        # .next scheme and the pre-fix direct-write scheme) are garbage
        final = self._path(name)
        for stray in (glob.glob(final + ".orbax-checkpoint-tmp*")
                      + glob.glob(final + ".next.orbax-checkpoint-tmp*")):
            shutil.rmtree(stray, ignore_errors=True)

    def _write_next(self, name: str, tree: Any) -> str:
        nxt = self._path(name) + ".next"
        self._ckpt.save(nxt, _to_numpy_tree(tree), force=True)
        self._ckpt.wait_until_finished()
        return nxt

    def _swap_locked(self, name: str) -> None:
        # a concurrent _recover (exists/restore from another thread) may
        # have already adopted the completed .next as final
        final = self._path(name)
        nxt, old = final + ".next", final + ".old"
        if os.path.isdir(nxt):
            if os.path.isdir(final):
                os.rename(final, old)
            os.rename(nxt, final)
        if os.path.isdir(old):
            shutil.rmtree(old)

    def _save_sync(self, name: str, tree: Any,
                   on_complete: Optional[Any] = None) -> None:
        self._recover(name)             # adopt/clean any prior crash state
        self._clean_strays(name)
        with self._swap_lock:
            self._writing.add(name)
        try:
            self._write_next(name, tree)
            with self._guard():
                self._swap_locked(name)
        finally:
            with self._swap_lock:
                self._writing.discard(name)
        if on_complete is not None:
            on_complete()

    def _pair_lock_path(self) -> str:
        return os.path.join(self.output_dir, "pair.lock")

    def _save_pair_sync(self, tree_a: Any, tree_b: Any,
                        on_complete: Optional[Any] = None) -> None:
        """Save the checkpoint-model/state_dict_checkpoint PAIR atomically:
        both ``.next`` dirs land on disk before either swap, and both swaps
        happen under one lock hold, so no kill point (nor any concurrent
        recovery) can publish a params/optimizer pair from two different
        training points. The ``pair.lock`` flock is held for the whole
        write+swap so OTHER PROCESSES' recovery sweeps cannot mistake the
        in-flight lone params ``.next`` for crash debris (flock dies with
        the process — a killed writer never blocks later recovery). See
        _recover_pair_locked for the crash windows."""
        a, b = self.PAIRED
        with self._guard():
            self._recover_pair_locked()
        self._clean_strays(a)
        self._clean_strays(b)
        with self._swap_lock:
            self._writing.update(self.PAIRED)
        fd = os.open(self._pair_lock_path(), os.O_CREAT | os.O_RDWR, 0o644)
        try:
            fcntl.flock(fd, fcntl.LOCK_EX)
            self._write_next(a, tree_a)   # params first,
            self._write_next(b, tree_b)   # state last (the commit record)
            with self._guard():
                self._swap_locked(a)
                self._swap_locked(b)
        finally:
            os.close(fd)
            with self._swap_lock:
                self._writing.difference_update(self.PAIRED)
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
        self._submit(name, _tree_nbytes(tree),
                     lambda: (self._save_sync, name, _device_snapshot(tree),
                              on_complete))

    def save_pair(self, params: Any, state: Any, background: bool = False,
                  on_complete: Optional[Any] = None) -> None:
        """Save the checkpoint-model (``params``) + state_dict_checkpoint
        (``state``) crash-recovery pair as ONE atomic unit (advisor r3
        medium: two independent background saves left a minutes-wide kill
        window pairing epoch-N params with epoch-N-1 optimizer state)."""
        if not background:
            self._save_pair_sync(params, state, on_complete)
            return
        self._submit("+".join(self.PAIRED),
                     _tree_nbytes(params) + _tree_nbytes(state),
                     lambda: (self._save_pair_sync, _device_snapshot(params),
                              _device_snapshot(state), on_complete))

    def _submit(self, name: str, nbytes: int, make_task: Any) -> None:
        """Queue a background save of an ``nbytes``-sized device snapshot.

        ``make_task() -> (fn, *args)`` takes the snapshot; it runs on the
        CALLER thread strictly AFTER draining, so (a) the tree it copies is
        still pre-donation-safe (no training step has run since the caller
        built it) and (b) the copy is only allocated once the pinned-bytes
        budget has room for it."""
        if self._pool is None:
            import concurrent.futures
            self._pool = concurrent.futures.ThreadPoolExecutor(
                1, thread_name_prefix="ckpt-save")
        # supersede queued-but-unstarted saves of the same name: the newer
        # tree is strictly more recent crash-recovery state
        kept = []
        for n, f, b in self._pending:
            if n == name and f.cancel():
                self.superseded_saves += 1
            elif not f.done():
                kept.append((n, f, b))
            else:
                f.result()               # surface any worker exception
        self._pending = kept
        # bound pending snapshots by COUNT and by pinned HBM BYTES; draining
        # happens before make_task() allocates the new snapshot, so peak
        # checkpoint HBM never exceeds budget + one snapshot
        while self._pending and (
                len(self._pending) >= self.MAX_PENDING
                or sum(b for _, _, b in self._pending) + nbytes
                > self.snapshot_budget_bytes):
            self._pending.pop(0)[1].result()
        fn, *args = make_task()
        self._pending.append((name, self._pool.submit(fn, *args), nbytes))

    def flush(self) -> None:
        """Join all pending background saves (exceptions propagate;
        cancelled/superseded saves are never in the pending list)."""
        pending, self._pending = self._pending, []
        for _, f, _ in pending:
            f.result()

    def restore_tree(self, name: str, target: Optional[Any] = None) -> Any:
        # guard held across recover + read: a concurrent process's swap must
        # not rename ``final`` away mid-restore
        with self._guard():
            self._recover(name)
            return self._ckpt.restore(self._path(name), target)

    def exists(self, name: str) -> bool:
        with self._guard():
            self._recover(name)
            return os.path.isdir(self._path(name))

    def write_json(self, name: str, obj: Any) -> None:
        # tmp + fsync + rename + dir-fsync: a kill mid-write must never
        # leave truncated JSON for _try_resume/EarlyStopping to choke on,
        # and a host page-cache loss (the round-5 soak's fs incident) must
        # not roll the record back after the rename was observed
        path = os.path.join(self.output_dir, name)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(obj, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
        dir_fd = os.open(self.output_dir, os.O_RDONLY)
        try:
            os.fsync(dir_fd)
        finally:
            os.close(dir_fd)

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
        # id-layout version of the tokenizer the params were trained with
        # (set by the trainer; serialized so resume/serving can detect a
        # layout change — e.g. hash-v1 vs hash-v2-pinned id shifts)
        self.tokenizer_scheme: Optional[str] = None

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
            "tokenizer_scheme": self.tokenizer_scheme,
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

    def save_epoch_checkpoint(self, params: Any, epoch: int, opt_state: Any,
                              global_step: int = 0,
                              on_complete: Optional[Any] = None) -> None:
        """Submit the checkpoint-model + state_dict_checkpoint pair as one
        atomic background save (CheckpointManager.save_pair) — params and
        optimizer state can never land from two different training points.
        ``on_complete()`` runs on the checkpoint worker strictly after the
        pair has landed (the trainer uses it to track the durable resume
        point); a superseded save's on_complete never fires."""
        self.logger.log_new_line()
        self.logger.log_message("Saving Epoch Checkpoint")
        self.ckpt.save_pair(params, {
            "epoch": np.asarray(epoch),
            "global_step": np.asarray(global_step),
            "optimizer": opt_state}, background=True,
            on_complete=on_complete)
