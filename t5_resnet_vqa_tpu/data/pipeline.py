"""Prefetching input pipeline: host preprocessing overlapped with TPU compute.

The reference iterates a synchronous torch DataLoader with num_workers=0 —
every batch's cv2 decode + tokenize blocks the training step
(faster_rcnn_vqa_trainer.py:172-197, 326-332; SURVEY §3.5). Here a background
thread produces collated numpy batches into a bounded queue and (optionally)
eagerly transfers them to device, so step N+1's host work rides under step
N's device work — the BASELINE.json "preprocessing overlapped against model
compute" requirement.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional, Sequence

import jax
import numpy as np


class DataLoader:
    """Minimal map-style loader: dataset + collate -> fixed-size batches.

    drop_remainder=True keeps every batch the same shape (one XLA program).
    With drop_remainder=False the last partial batch is padded up to
    batch_size by repeating its first sample and a ``_valid`` count is added
    so metrics can ignore the padding.
    """

    def __init__(self, dataset, collate_fn: Callable, batch_size: int,
                 shuffle: bool = False, seed: int = 0,
                 drop_remainder: bool = True):
        self.dataset = dataset
        self.collate_fn = collate_fn
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_remainder = drop_remainder
        self._rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_remainder:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[dict]:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self._rng.shuffle(order)
        bs = self.batch_size
        for start in range(0, len(order), bs):
            idx = order[start:start + bs]
            if len(idx) < bs:
                if self.drop_remainder:
                    return
                valid = len(idx)
                idx = np.concatenate([idx, np.repeat(idx[:1], bs - len(idx))])
            else:
                valid = bs
            samples = [self.dataset[int(i)] for i in idx]
            batch = self.collate_fn(samples)
            batch["_valid"] = np.asarray(valid, np.int32)
            # dataset row ids (host metadata, "_"-stripped before the model):
            # the frozen-feature cache maps these to cached tower features
            batch["_indices"] = idx.astype(np.int32)
            yield batch


class Prefetcher:
    """Wrap any batch iterable; produce batches from a background thread.

    device_put=True additionally moves array leaves onto the (sharded or
    default) device inside the producer thread, overlapping H2D transfers.
    """

    def __init__(self, loader, num_prefetch: int = 2,
                 device_put: bool = False, sharding=None):
        self.loader = loader
        self.num_prefetch = max(1, num_prefetch)
        self.device_put = device_put
        self.sharding = sharding

    def __len__(self):
        return len(self.loader)

    def _transfer(self, batch: dict) -> dict:
        if not self.device_put:
            return batch
        out = {}
        for k, v in batch.items():
            # "_"-prefixed keys (`_valid`, `_indices`) are host-side metadata
            if (isinstance(v, np.ndarray) and v.dtype != object and v.ndim
                    and not k.startswith("_")):
                out[k] = (jax.device_put(v, self.sharding)
                          if self.sharding is not None else jax.device_put(v))
            else:
                out[k] = v
        if isinstance(batch.get("annotation_ids"), np.ndarray):
            # keep a host view so metric accounting never fetches per step
            out["_host_annotation_ids"] = batch["annotation_ids"]
        return out

    def __iter__(self):
        q: queue.Queue = queue.Queue(maxsize=self.num_prefetch)
        sentinel = object()
        err: list = []

        def producer():
            try:
                for batch in self.loader:
                    q.put(self._transfer(batch))
            except BaseException as e:  # surfaced on the consumer side
                err.append(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                if err:
                    raise err[0]
                return
            yield item
