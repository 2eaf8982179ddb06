"""TPU-native input pipeline: per-host sharding + background prefetch.

The reference relies on torch DataLoader workers + DeepSpeed's per-rank
samplers (scripts `--dataloader_num_workers 4`). The TPU equivalent: each
*host* loads only its shard of the global batch (`host_shard`), batches are
assembled on background threads, and `DeviceLoader` keeps a small queue of
batches already transferred to device with the right `NamedSharding` — so
the jitted step never waits on host I/O (double buffering).
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Dict, Iterator, Optional, Sequence

import numpy as np
import jax


def host_shard(indices: Sequence[int], process_index: Optional[int] = None,
               process_count: Optional[int] = None) -> Sequence[int]:
    """This host's slice of the global index stream (multihost DP)."""
    pi = process_index if process_index is not None else jax.process_index()
    pc = process_count if process_count is not None else jax.process_count()
    return list(indices)[pi::pc]


class BatchLoader:
    """Threaded batch assembly: dataset[idx] in worker threads → collated
    numpy batches (the torch DataLoader role, without torch)."""

    def __init__(self, dataset, batch_size: int, collate: Callable,
                 sampler: Optional[Iterator[int]] = None,
                 num_workers: int = 2, seed: int = 0,
                 drop_last: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate = collate
        self.sampler = sampler
        self.num_workers = max(num_workers, 1)
        self.seed = seed
        self.drop_last = drop_last

    def _indices(self):
        if self.sampler is not None:
            return list(self.sampler)
        rng = np.random.default_rng(self.seed)
        return rng.permutation(len(self.dataset)).tolist()

    def __iter__(self):
        from concurrent.futures import ThreadPoolExecutor
        idx = self._indices()
        nb = len(idx) // self.batch_size
        if not self.drop_last and len(idx) % self.batch_size:
            nb += 1
        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            for b in range(nb):
                chunk = idx[b * self.batch_size:(b + 1) * self.batch_size]
                items = list(pool.map(self.dataset.__getitem__, chunk))
                yield self.collate(items)

    def __len__(self):
        return len(self._indices()) // self.batch_size


class DeviceLoader:
    """Wrap a host batch iterator with background device transfer.

    `sharding` may be a single sharding or a dict key→sharding; batches are
    `jax.device_put` on a prefetch thread so the accelerator never idles on
    PCIe/host time (the double-buffering pattern).
    """

    def __init__(self, iterator, sharding=None, prefetch: int = 2):
        self.iterator = iterator
        self.sharding = sharding
        self.prefetch = prefetch

    def _put(self, batch: Dict[str, Any]):
        if self.sharding is None:
            return batch
        if isinstance(self.sharding, dict):
            return {k: (jax.device_put(v, self.sharding[k])
                        if k in self.sharding and hasattr(v, "shape") else v)
                    for k, v in batch.items()}
        return {k: (jax.device_put(v, self.sharding)
                    if hasattr(v, "shape") else v)
                for k, v in batch.items()}

    def __iter__(self):
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        err = []

        def feed():
            try:
                for batch in self.iterator:
                    q.put(self._put(batch))
            except Exception as e:        # surface loader errors to consumer
                err.append(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=feed, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                if err:
                    raise err[0]
                return
            yield item
