"""Tracing / profiling helpers (SURVEY.md §5.1 rebuild).

The reference's observability was wall-clock prints and a compile-time C++
timer flag; here: the JAX profiler (XLA trace viewer output) plus a
lightweight per-step host metrics recorder that writes one JSONL row per
step/epoch (throughput, losses) — machine-readable where the reference
appended to log files.
"""

from __future__ import annotations

import contextlib
import json
import os
import time


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture an XLA profiler trace (open with TensorBoard/xprof)."""
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """images/sec + step-time accounting (Speedometer equivalent,
    mutli_gpu_v3.py:162)."""

    def __init__(self, batch_size: int, report_every: int = 100, log=None):
        self.batch_size = batch_size
        self.report_every = report_every
        self.log = log
        self._count = 0
        self._tic = time.perf_counter()
        self.last_rate = 0.0

    def step(self) -> float | None:
        self._count += 1
        if self._count % self.report_every == 0:
            dt = time.perf_counter() - self._tic
            self.last_rate = self.report_every * self.batch_size / dt
            self._tic = time.perf_counter()
            if self.log is not None:
                self.log.info("speed: %.1f samples/sec", self.last_rate)
            return self.last_rate
        return None


class MetricsWriter:
    """Append-only JSONL metrics sink."""

    def __init__(self, path: str):
        self.path = path
        d = os.path.dirname(path)
        if d:
            os.makedirs(d, exist_ok=True)

    def write(self, **fields) -> None:
        with open(self.path, "a") as f:
            f.write(json.dumps(fields) + "\n")

    def read_all(self) -> list[dict]:
        if not os.path.exists(self.path):
            return []
        with open(self.path) as f:
            return [json.loads(l) for l in f if l.strip()]


def compiled_flops(fn, *example_args) -> float | None:
    """Total FLOPs of ``fn(*example_args)`` from XLA's own cost analysis.

    The mechanical denominator for MFU figures: ``jit(fn).lower(...)
    .compile().cost_analysis()["flops"]`` — so a headline MFU cannot
    silently drift from an analytic constant when the model changes
    (VERDICT r2 item 7). Returns None when the backend does not expose
    cost analysis (some plugin backends).
    """
    import jax

    try:
        compiled = jax.jit(fn).lower(*example_args).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):  # older jax returns [dict]
            cost = cost[0]
        flops = float(cost.get("flops", -1.0))
        return flops if flops > 0 else None
    except Exception:
        return None
