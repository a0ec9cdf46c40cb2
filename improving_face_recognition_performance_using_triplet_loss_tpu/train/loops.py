"""Epoch-level training loops (reference C8; train_efm.py:221-294 shape).

One generic loop drives every trainer in the stack (backbone joint, triplet
head, final frozen-backbone head): per-epoch train + validation passes, the
cosine-similarity CSV sink fed from the step's per-row device arrays, per-
epoch checkpointing with resume, and metric logging. Host work overlaps with
device steps because metric arrays are only synced when the sink flushes.
"""

from __future__ import annotations

import logging
import signal
import time
from dataclasses import dataclass, field
from typing import Callable, Iterable

import numpy as np

from ..eval.cosine import CosineSimilaritySink

log = logging.getLogger("facejax.train")


@dataclass
class EpochStats:
    """Aggregated per-epoch metrics (means of scalar step metrics)."""

    epoch: int
    train: dict[str, float] = field(default_factory=dict)
    valid: dict[str, float] = field(default_factory=dict)
    seconds: float = 0.0


class NonFiniteLossError(RuntimeError):
    """Raised when the training loss goes NaN/inf (failure detection,
    SURVEY.md §5.3 — the reference had no such guard and would silently
    train on garbage)."""


class PreemptionGuard:
    """Graceful-preemption support: on SIGTERM/SIGINT, finish the current
    batch, checkpoint, and exit cleanly so --resume continues where training
    stopped (elastic-recovery capability the reference lacked, SURVEY §5.3).
    """

    def __init__(self, signals=(signal.SIGTERM,)):
        self.requested = False
        self._signals = signals
        self._previous = {}

    def __enter__(self):
        def handler(signum, frame):
            self.requested = True

        for sig in self._signals:
            try:
                self._previous[sig] = signal.signal(sig, handler)
            except ValueError:
                pass  # not the main thread; polling still works
        return self

    def __exit__(self, *exc):
        for sig, prev in self._previous.items():
            signal.signal(sig, prev)
        return False


def _accumulate(sums: dict, counts: dict, metrics: dict,
                check_finite_key: str | None = None) -> None:
    for k, v in metrics.items():
        if getattr(v, "ndim", 0) == 0:
            val = float(v)
            if check_finite_key == k and not np.isfinite(val):
                raise NonFiniteLossError(f"non-finite {k}: {val}")
            sums[k] = sums.get(k, 0.0) + val
            counts[k] = counts.get(k, 0) + 1


def _means(sums: dict, counts: dict) -> dict[str, float]:
    return {k: sums[k] / counts[k] for k in sums}


def _chunked_batches(batches: Iterable, k: int):
    """Stack k consecutive (anc, pos, lab) batches along a new leading dim;
    drops a trailing partial chunk."""
    group: list = []
    for batch in batches:
        group.append(batch)
        if len(group) == k:
            yield tuple(np.stack(parts) for parts in zip(*group))
            group = []


def _unstack_metrics(metrics: dict, k: int):
    """[K, ...]-stacked metrics -> K per-step metric dicts (numpy, so the
    whole chunk syncs once)."""
    host = {key: np.asarray(v) for key, v in metrics.items()}
    return tuple({key: v[i] for key, v in host.items()} for i in range(k))


def train_loop(
    state,
    train_step: Callable,
    train_batches: Callable[[], Iterable],
    *,
    epochs: int,
    eval_step: Callable | None = None,
    eval_batches: Callable[[], Iterable] | None = None,
    sink: CosineSimilaritySink | None = None,
    checkpointer=None,
    checkpoint_every_epochs: int = 1,
    start_epoch: int = 0,
    device_put: Callable | None = None,
    on_epoch_end: Callable[[EpochStats], None] | None = None,
    preemption_guard: PreemptionGuard | None = None,
    scan_chunk: int = 0,
):
    """Run ``epochs`` epochs; returns (final_state, [EpochStats]).

    ``train_batches``/``eval_batches`` are zero-arg callables returning a
    fresh iterator of (anchor, positive, labels) (so epochs reshuffle).
    ``sink`` receives the per-row pos/neg cosine arrays every train batch
    (reference behavior, train_efm.py:250-255).

    ``scan_chunk > 1``: ``train_step`` must be a scanned step
    (train.make_scanned_step) consuming K stacked batches per call — one
    device dispatch per K steps (link-latency amortization). Leftover
    batches that don't fill a final chunk are dropped for that epoch
    (drop-last semantics; epochs reshuffle, so coverage rotates).
    """
    put = device_put or (lambda x: x)
    history: list[EpochStats] = []
    dropped_logged = False
    for epoch in range(start_epoch, epochs):
        tic = time.time()
        tsums: dict[str, float] = {}
        tcounts: dict[str, int] = {}
        if scan_chunk > 1:
            batch_iter = _chunked_batches(train_batches(), scan_chunk)
        else:
            batch_iter = train_batches()
        for anchor, positive, labels in batch_iter:
            state, metrics = train_step(state, put(anchor), put(positive),
                                         put(labels))
            if scan_chunk > 1:
                metric_steps = _unstack_metrics(metrics, scan_chunk)
            else:
                metric_steps = (metrics,)
            for m in metric_steps:
                _accumulate(tsums, tcounts, m, check_finite_key="loss")
                if sink is not None:
                    sink.append(np.asarray(m["pos_cos"]),
                                np.asarray(m["neg_cos"]))
            if preemption_guard is not None and preemption_guard.requested:
                if checkpointer is not None:
                    # save under the PREVIOUS completed epoch so --resume
                    # replays this partial epoch from its start
                    checkpointer.save(max(epoch - 1, 0), state, wait=True)
                log.warning("preemption requested: checkpointed and "
                            "stopping at epoch %d", epoch)
                return state, history
        if scan_chunk > 1 and not dropped_logged:
            dropped_logged = True
            log.info("scan_chunk=%d: trailing partial chunks are dropped "
                     "per epoch (drop-last)", scan_chunk)
        vsums: dict[str, float] = {}
        vcounts: dict[str, int] = {}
        if eval_step is not None and eval_batches is not None:
            for anchor, positive, labels in eval_batches():
                metrics = eval_step(state, put(anchor), put(positive),
                                    put(labels))
                _accumulate(vsums, vcounts, metrics)
        if sink is not None:
            sink.flush()
        stats = EpochStats(
            epoch=epoch,
            train=_means(tsums, tcounts),
            valid=_means(vsums, vcounts),
            seconds=time.time() - tic,
        )
        history.append(stats)
        msg = f"Epoch {epoch}: " + ", ".join(
            [f"train {k} {v:g}" for k, v in stats.train.items() if k != "acc"]
            + [f"train acc {stats.train['acc']:g}" for _ in [0] if "acc" in stats.train]
            + [f"valid {k} {v:g}" for k, v in stats.valid.items()]
        ) + f", in {stats.seconds:.1f} sec"
        log.info(msg)
        if checkpointer is not None and (epoch + 1) % checkpoint_every_epochs == 0:
            checkpointer.save(epoch, state)
        if on_epoch_end is not None:
            on_epoch_end(stats)
    if checkpointer is not None:
        checkpointer.wait()
    return state, history


def resume_if_available(checkpointer, state):
    """Restore the latest checkpoint if one exists; returns (state, epoch0)."""
    if checkpointer is None:
        return state, 0
    step = checkpointer.latest_step()
    if step is None:
        return state, 0
    state = checkpointer.restore(state, step)
    return state, int(step) + 1
