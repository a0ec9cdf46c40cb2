"""Celeb1M-scale streaming input: sharded pair batching over an mmap store.

The reference feeds 4.6M images through ``mx.io.ImageRecordIter`` with
RecordIO files, 14 preprocess threads, and KVStore worker sharding
(``part_index``/``num_parts``; train_efm.py:135-136, 179). The TPU-native
equivalent here reads a packed uint8 mmap store (images.npy + labels.npy,
written streaming by :class:`~..data.records.ImageStoreWriter`):

- **per-host sharding**: each host takes a contiguous row shard (contiguous
  for mmap page locality; KVStore ``part_index`` semantics);
- **two-level windowed shuffle**: shuffle the order of fixed-size windows,
  then rows within each window — decorrelates batches while bounding the
  random-IO working set to one window (a full 4.6M-row permutation would
  touch every page of a ~75 GB file per epoch);
- **global positive lookup**: anchors pair with the first-seen row of their
  identity (define_pos, train_efm.py:37-45) read from the *whole* store —
  every host can read the shared mmap, so positives never need a shuffle
  exchange;
- **uint8 end-to-end**: batches stay uint8 until the jitted train step
  normalizes on device (4x less host RAM + PCIe traffic than float32).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

from .pairs import build_positive_index
from .records import load_image_store_mmap


def shard_bounds(n: int, host_id: int, num_hosts: int) -> tuple[int, int]:
    """Contiguous [start, stop) row range of host ``host_id``'s shard.

    Remainder rows go to the first ``n % num_hosts`` hosts, so shard sizes
    differ by at most one row.
    """
    if not (0 <= host_id < num_hosts):
        raise ValueError(f"host_id {host_id} out of range for {num_hosts}")
    base, rem = divmod(n, num_hosts)
    start = host_id * base + min(host_id, rem)
    return start, start + base + (1 if host_id < rem else 0)


class ShardedPairBatcher:
    """Yield uint8 ``(anchor, positive, labels)`` batches from an mmap image
    store, optionally restricted to one host's shard.

    Matches :class:`~.pairs.PairBatcher` semantics (canonical-positive
    lookup, drop last partial batch) but never materializes the dataset:
    per-batch fancy indexing on the memmap reads only the touched pages.

    Args:
      store: either a directory path of an mmap store, or a preloaded
        ``(images, labels)`` pair (images may be a memmap).
      shuffle_window: rows per shuffle window (two-level shuffle). ``0`` or
        ``>= shard size`` degrades to a full in-shard permutation.
    """

    def __init__(
        self,
        store,
        batch_size: int,
        *,
        host_id: int = 0,
        num_hosts: int = 1,
        shuffle: bool = True,
        shuffle_window: int = 65536,
        seed: int = 0,
        positive_index: np.ndarray | None = None,
    ):
        if isinstance(store, (str, bytes)):
            self.images, self.labels = load_image_store_mmap(store)
        else:
            self.images, self.labels = store
        self.labels = np.asarray(self.labels).astype(np.int64).ravel()
        n = self.images.shape[0]
        if n != self.labels.shape[0]:
            raise ValueError("images/labels length mismatch")
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.shuffle_window = int(shuffle_window)
        self._rng = np.random.default_rng(seed)
        self.start, self.stop = shard_bounds(n, host_id, num_hosts)
        # the positive index is GLOBAL (labels array is ~37 MB at 4.6M rows;
        # building it is one vectorized np.unique pass)
        self.positive_index = (
            build_positive_index(self.labels)
            if positive_index is None else np.asarray(positive_index)
        )

    @property
    def shard_size(self) -> int:
        return self.stop - self.start

    def __len__(self) -> int:
        return self.shard_size // self.batch_size

    def _epoch_order(self) -> np.ndarray:
        rows = np.arange(self.start, self.stop, dtype=np.int64)
        if not self.shuffle:
            return rows
        w = self.shuffle_window
        if w <= 0 or w >= rows.size:
            return self._rng.permutation(rows)
        n_win = (rows.size + w - 1) // w
        win_order = self._rng.permutation(n_win)
        out = np.empty_like(rows)
        pos = 0
        for win in win_order:
            chunk = rows[win * w:(win + 1) * w]
            out[pos:pos + chunk.size] = self._rng.permutation(chunk)
            pos += chunk.size
        return out

    def __iter__(self) -> Iterator[tuple[np.ndarray, np.ndarray, np.ndarray]]:
        order = self._epoch_order()
        bs = self.batch_size
        for start in range(0, order.size - bs + 1, bs):
            idx = np.sort(order[start:start + bs])  # sorted = sequential IO
            labels = self.labels[idx]
            anchor = np.asarray(self.images[idx])
            pos_rows = self.positive_index[labels]
            positive = np.asarray(self.images[pos_rows])
            yield anchor, positive, labels
