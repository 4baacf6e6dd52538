"""Batched episode loading with background workers and device prefetch.

Replaces the reference's torch DataLoader (reference:
src/dataset/dataset.py:61-68, workers + pin_memory) with a thread-pool
pipeline: cv2 decode/transform release the GIL, batches are collated into
contiguous numpy arrays, and up to ``prefetch`` device batches are staged
ahead with ``jax.device_put`` so the TPU never waits on the host.

Episode order: training shuffles indices each epoch with a per-epoch seed;
validation iterates sequentially and wraps around (the reference restarts an
exhausted iterator mid-run, src/test.py:149-153).
"""

from __future__ import annotations

import itertools
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict, Iterable, Iterator, List, Optional, Sequence

import numpy as np

try:
    import jax
except Exception:  # pragma: no cover
    jax = None


def collate(records: Sequence[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    keys = records[0].keys()
    return {k: np.stack([r[k] for r in records], axis=0) for k in keys}


class EpisodeLoader:
    """Iterable over collated episode batches.

    Args:
      dataset: index-addressable record source (EpisodicDataset, ...).
      batch_size: episodes per batch (static shape; short tails dropped in
        shuffle mode, wrapped in sequential mode).
      shuffle: reshuffle each epoch (seeded).
      num_workers: decode threads; 0 = synchronous.
      device_put: stage collated batches onto the default device.
      prefetch: number of batches prepared ahead.
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 num_workers: int = 2, seed: int = 2021,
                 device_put: bool = False, prefetch: int = 2,
                 drop_last: bool = True, rank: int = 0, world: int = 1):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = num_workers
        self.seed = seed
        self.device_put = device_put and jax is not None
        self.prefetch = max(1, prefetch)
        self.drop_last = drop_last
        self.epoch = 0
        # DistributedSampler analog (reference src/dataset/dataset.py:57-68):
        # process `rank` of `world` covers indices rank, rank+world, ...;
        # every rank is padded (by cyclic wrap, like DistributedSampler's
        # total_size padding) to the SAME per-rank count — unequal batch
        # counts would deadlock collective eval loops on multi-host.
        assert 0 <= rank < world, (rank, world)
        self.rank = rank
        self.world = world

    def _per_rank(self) -> int:
        return -(-len(self.dataset) // self.world)  # ceil

    def __len__(self) -> int:
        n = self._per_rank()
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _index_stream(self) -> Iterator[int]:
        # Multi-host wrap bias, BOUNDED: every rank pads to ceil(n/world) by
        # cyclic wrap, so across ranks at most (world*ceil(n/world) - n) <=
        # world-1 dataset indices repeat per pass — the same padding as
        # torch's DistributedSampler (the reference's val path,
        # src/dataset/dataset.py:57-68); tests/test_data.py quantifies it.
        # For the episodic samplers a repeated index still draws a fresh
        # random episode (no bias); deterministic replay would double-score
        # episodes, so episodic_val_loader REFUSES replay with world > 1.
        n = len(self.dataset)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            order = rng.permutation(n).tolist()
        else:
            order = list(range(n))
        for k in range(self._per_rank()):
            yield order[(self.rank + self.world * k) % n]

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        idx_stream = self._index_stream()

        def batches_of_indices():
            while True:
                chunk = list(itertools.islice(idx_stream, self.batch_size))
                if len(chunk) < self.batch_size:
                    if chunk and not self.drop_last:
                        yield chunk
                    return
                yield chunk

        if self.num_workers <= 0:
            for chunk in batches_of_indices():
                yield self._finalize([self.dataset[i] for i in chunk])
            return

        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put_or_abort(item) -> bool:
            """Queue.put that gives up when the consumer abandoned the iterator
            (otherwise the producer thread and its batches leak forever)."""
            while not stop.is_set():
                try:
                    out_q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for chunk in batches_of_indices():
                        if stop.is_set():
                            return
                        records = list(pool.map(self.dataset.__getitem__, chunk))
                        if not put_or_abort(self._finalize(records)):
                            return
            except Exception as e:  # surface worker errors to the consumer
                put_or_abort(e)
            finally:
                put_or_abort(None)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    return
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()

    def _finalize(self, records: List[Dict[str, np.ndarray]]) -> Dict[str, Any]:
        batch = collate(records)
        if self.device_put:
            batch = jax.device_put(batch)
        return batch


def infinite(loader: EpisodeLoader) -> Iterator[Dict[str, Any]]:
    """Wrap-around iteration (validation semantics of the reference)."""
    while True:
        produced = False
        for batch in loader:
            produced = True
            yield batch
        if not produced:
            raise RuntimeError(
                f"loader yields no batches (dataset of {len(loader.dataset)} "
                f"items < batch_size {loader.batch_size} with drop_last)"
            )
