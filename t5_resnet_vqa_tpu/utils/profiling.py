"""Profiling / tracing utilities.

The reference's only observability is wall-clock secs/batch logging
(faster_rcnn_vqa_trainer.py:331-339; SURVEY §5 "Tracing: none"). The TPU
build keeps that log format in the trainer and adds real tracing:

  * ``trace(logdir)`` — context manager around ``jax.profiler`` trace
    capture (TensorBoard-viewable protobufs).
  * ``StepTimer`` — rolling secs/step with the reference's 10%-interval
    averaging semantics, host-side only.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(logdir: str, create_perfetto_link: bool = False) -> Iterator[None]:
    """Capture a jax.profiler device trace into ``logdir``.

    Degrades to a no-op when the backend doesn't support profiling (e.g. the
    remote-tunneled device in this image).
    """
    import jax

    started = False
    try:
        jax.profiler.start_trace(logdir,
                                 create_perfetto_link=create_perfetto_link)
        started = True
    except Exception:
        pass
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


class StepTimer:
    """Accumulates per-step wall time; windows reset on read (the
    reference's ten-percent-interval pattern, trainer :331-363)."""

    def __init__(self):
        self.window_time = 0.0
        self.window_steps = 0
        self.total_time = 0.0
        self.total_steps = 0
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.time()
        return self

    def __exit__(self, *exc):
        dt = time.time() - self._t0
        self.window_time += dt
        self.window_steps += 1
        self.total_time += dt
        self.total_steps += 1
        return False

    def window_average(self) -> float:
        avg = self.window_time / max(1, self.window_steps)
        self.window_time = 0.0
        self.window_steps = 0
        return avg

    def total_average(self) -> float:
        return self.total_time / max(1, self.total_steps)
