"""Structured logging + per-stage wall-clock timers.

The reference's observability is ad-hoc `clock()` / `getTickCount()` prints
(ref 特征点匹配.cpp:365-366, 图像融合.cpp:715-716; SURVEY.md §5). The rebuild
gives each pipeline stage a named timer whose results are returned as a
metrics dict, plus optional `jax.profiler` trace annotation.
"""

from __future__ import annotations

import contextlib
import logging
import time

import jax


def get_logger(name: str = "imagestitch_tpu") -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        h = logging.StreamHandler()
        h.setFormatter(logging.Formatter(
            "%(asctime)s %(name)s %(levelname)s %(message)s"))
        logger.addHandler(h)
        logger.setLevel(logging.INFO)
    return logger


class StageTimer:
    """Accumulates per-stage wall-clock timings (block-until-ready on exit so
    device work is attributed to the stage that launched it)."""

    def __init__(self, sync: bool = True):
        self.sync = sync
        self.times_ms: dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str, *arrays):
        with jax.profiler.TraceAnnotation(name):
            t0 = time.perf_counter()
            yield
            if self.sync:
                for a in arrays:
                    jax.block_until_ready(a)
            self.times_ms[name] = self.times_ms.get(name, 0.0) + (
                time.perf_counter() - t0) * 1e3

    def summary(self) -> dict[str, float]:
        return dict(self.times_ms)
