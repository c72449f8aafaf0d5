"""Observability: loggers, timers, TPU profiling harness.

TPU-native counterparts of the reference's hook zoo (druglib/core/runner/
hooks: IterTimerHook, ProfilerHook wrapping torch.profiler, LogBuffer,
text/TensorBoard loggers):

  * get_logger       — named stream+file loggers (logger.py:25)
  * MetricsLogger    — JSONL metrics stream (replaces LogBuffer + text hook)
  * Timer / timed    — wall-clock with jax.block_until_ready
  * trace            — context manager around jax.profiler.trace: produces
                       a Perfetto/TensorBoard trace directory
"""
from __future__ import annotations

import contextlib
import json
import logging
import os
import time

_LOGGERS: dict = {}


def get_logger(name: str = "diffbindfr", log_file: str | None = None,
               level=logging.INFO):
    if name in _LOGGERS:
        return _LOGGERS[name]
    logger = logging.getLogger(name)
    logger.setLevel(level)
    logger.propagate = False
    fmt = logging.Formatter("%(asctime)s %(name)s %(levelname)s %(message)s")
    sh = logging.StreamHandler()
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if log_file:
        os.makedirs(os.path.dirname(os.path.abspath(log_file)), exist_ok=True)
        fh = logging.FileHandler(log_file)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    _LOGGERS[name] = logger
    return logger


class MetricsLogger:
    """Append-only JSONL metrics stream with simple windowed averaging."""

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self._fh = open(path, "a")
        self._window: dict = {}

    def log(self, step: int, **metrics):
        rec = {"step": int(step), "time": time.time()}
        for k, v in metrics.items():
            v = float(v)
            rec[k] = v
            self._window.setdefault(k, []).append(v)
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()

    def average(self, key: str, last: int = 50) -> float:
        vals = self._window.get(key, [])[-last:]
        return sum(vals) / len(vals) if vals else float("nan")

    def close(self):
        self._fh.close()


class Timer:
    """Wall-clock timer that waits for device work to finish."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()

    def elapsed(self, result=None) -> float:
        if result is not None:
            import jax

            jax.block_until_ready(result)
        return time.perf_counter() - self._t0


def timed(fn, *args, warmup: int = 1, iters: int = 3):
    """(min_seconds, result) for a jitted function, excluding compile."""
    import jax

    result = None
    for _ in range(max(warmup, 1)):
        result = jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        result = jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best, result


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace (view in TensorBoard/Perfetto/xprof)."""
    import jax

    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
