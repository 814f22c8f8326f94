"""Minimal data loader: shuffling, batching, drop-last, process sharding.

Replaces the reference's torch DataLoader + HF Accelerate per-rank sharding
(`tts/experiments/trainer.py:211-239`): in the JAX runtime each host process
loads ``1/num_processes`` of every batch (sharded by ``process_index``), and
the trainer forms globally-sharded device arrays from host-local batches.
"""

from __future__ import annotations

import random
from typing import Callable, Iterator, Sequence


class DataLoader:
    def __init__(self, dataset: Sequence, collate_fn: Callable, batch_size: int,
                 shuffle: bool = False, drop_last: bool = True, seed: int = 0,
                 num_shards: int = 1, shard_index: int = 0, prefetch: int = 2):
        if batch_size % num_shards != 0:
            raise ValueError("batch_size must divide evenly across processes")
        self.prefetch = prefetch
        self.dataset = dataset
        self.collate_fn = collate_fn
        self.batch_size = batch_size
        self.local_batch_size = batch_size // num_shards
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.num_shards = num_shards
        self.shard_index = shard_index
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __len__(self) -> int:
        n = len(self.dataset) // self.batch_size
        if not self.drop_last and len(self.dataset) % self.batch_size:
            n += 1
        return max(n, 0)

    def _batches(self) -> Iterator[dict]:
        order = list(range(len(self.dataset)))
        if self.shuffle:
            random.Random(self.seed + self.epoch).shuffle(order)
        for start in range(0, len(order), self.batch_size):
            idxs = order[start:start + self.batch_size]
            if len(idxs) < self.batch_size:
                if self.drop_last:
                    break
                # pad the final batch by cycling so every process shard gets
                # the same local batch size (globally-consistent SPMD shapes)
                pad_to = -(-len(idxs) // self.num_shards) * self.num_shards
                idxs = idxs + [idxs[i % len(idxs)] for i in range(pad_to - len(idxs))]
            # CONTIGUOUS per-process slices, not strided: process p's local
            # rows land at global batch positions [p*local, (p+1)*local) in
            # make_array_from_process_local_data (process 0's devices lead
            # the mesh's data axis), so the multi-process global batch has
            # the SAME sample order as the single-process batch. Strided
            # sharding permuted the global order, which silently decoupled
            # per-POSITION randomness (flow-matching time/noise draws,
            # dropout masks) from the equivalent 1-process run — observed
            # as a 0.7% first-step loss delta in the 2-process test.
            per = len(idxs) // self.num_shards
            local = idxs[self.shard_index * per:(self.shard_index + 1) * per]
            if hasattr(self.dataset, "get_batch"):
                # batched front-end: one fused featurization call per batch
                samples = self.dataset.get_batch(local)
            else:
                samples = [self.dataset[i] for i in local]
            yield self.collate_fn(samples)

    def __iter__(self) -> Iterator[dict]:
        if not self.prefetch:
            yield from self._batches()
            return
        # background-thread prefetch: overlap host feature extraction /
        # collation with device steps (the Accelerate-dataloader-worker
        # equivalent; thread-based since samples are numpy + stdlib IO)
        import queue
        import threading

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        abandoned = threading.Event()
        failure: list[BaseException] = []

        def producer():
            try:
                for batch in self._batches():
                    while not abandoned.is_set():
                        try:
                            q.put(batch, timeout=0.1)
                            break
                        except queue.Full:
                            continue
                    if abandoned.is_set():
                        return
            except BaseException as e:  # noqa: BLE001 — re-raised below
                # a producer crash (bad file, broken feature) must FAIL the
                # epoch in the consumer, not silently truncate it to the
                # batches produced so far
                failure.append(e)
            finally:
                while not abandoned.is_set():
                    try:
                        q.put(sentinel, timeout=0.1)
                        break
                    except queue.Full:
                        continue

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    if failure:
                        raise failure[0]
                    break
                yield item
        finally:
            # consumer may abandon mid-epoch (eval_batches cap, early stop):
            # unblock and reap the producer instead of leaking it
            abandoned.set()
            thread.join()
