"""Host->device prefetching (input-pipeline overlap, SURVEY.md §7 step 11).

The reference overlaps input with compute via 14 RecordIO preprocess threads
(train_efm.py:179). The JAX-native equivalent: device transfers for the next
batch(es) are issued while the current step runs — JAX dispatch is async, so
keeping a small ring of already-device-put batches is enough to hide host
latency.
"""

from __future__ import annotations

import collections
from typing import Iterable, Iterator

import jax


def prefetch_to_device(iterator: Iterable, size: int = 2,
                       device=None) -> Iterator:
    """Yield items from ``iterator`` with up to ``size`` batches resident on
    device ahead of consumption. Items may be tuples/pytrees of arrays."""
    queue = collections.deque()

    def put(item):
        return jax.device_put(item, device)

    it = iter(iterator)
    try:
        for _ in range(size):
            queue.append(put(next(it)))
    except StopIteration:
        pass
    while queue:
        out = queue.popleft()
        try:
            queue.append(put(next(it)))
        except StopIteration:
            pass
        yield out
