"""Host-side data pipeline: multi-threaded decode/augment -> batched numpy.

Counterpart of the reference's tf.data generator pipeline
(reference data/base_dataloader.py:32-54: from_generator -> repeat ->
shuffle(2000) -> map(12 threads) -> batch -> prefetch(1)). Rebuilt without
tf.data: a pool of worker threads runs the dataset's `sample(idx, rng)`
(PIL/numpy — PIL releases the GIL in its C loops), the consumer reassembles
results in sequence order into fixed-shape numpy batches, and a bounded
queue provides prefetch back-pressure. Deterministic: each sample's RNG is
seeded by (seed, epoch, index), so results are independent of worker count
and scheduling.

Datasets implement:
    __len__() -> int
    sample(idx: int, rng: np.random.Generator) -> dict[str, np.ndarray]
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Iterator, Protocol

import numpy as np


class Dataset(Protocol):
    def __len__(self) -> int: ...

    def sample(self, idx: int, rng: np.random.Generator) -> dict[str, np.ndarray]: ...


def _stack(samples: list[dict[str, np.ndarray]]) -> dict[str, np.ndarray]:
    keys = samples[0].keys()
    return {k: np.stack([s[k] for s in samples], axis=0) for k in keys}


_SENTINEL = object()


class HostDataPipeline:
    def __init__(
        self,
        dataset: Dataset,
        batch_size: int,
        shuffle: bool = False,
        repeat: bool = False,
        num_workers: int | None = None,
        prefetch: int = 2,
        seed: int = 0,
        drop_remainder: bool | None = None,
        shard_id: int = 0,
        num_shards: int = 1,
        start_sample: int = 0,
        shard_granularity: str = "sample",
    ):
        """shard_id/num_shards: per-host data sharding for multi-host DP —
        every host draws the same seeded permutation and takes a strided
        slice, so shards partition each epoch exactly (pass
        jax.process_index()/jax.process_count()).

        shard_granularity: 'sample' (default) strides individual indices —
        right for training, where each host feeds a local slice of every
        global batch. 'batch' strides whole batch_size-aligned chunks of
        the index stream, so each host's batches() yields EXACTLY the
        batches a single-host run would produce at global batch indices
        shard_id, shard_id+num_shards, … — right for embarrassingly
        parallel sweeps (multi-host evaluate) where per-batch outputs must
        be byte-identical to the single-host run.

        start_sample: resume the index stream after this many already-
        consumed samples (per shard). Each epoch's permutation is seeded
        independently by (seed, epoch), so the fast-forward is O(1): jump
        to epoch start_sample // shard_len, offset start_sample % shard_len.
        Combined with the per-(seed, epoch, idx) sample RNG, a resumed run
        continues the EXACT data stream the interrupted run would have
        produced (train.py passes step * batch_size on resume)."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.repeat = repeat
        if num_workers is None:
            # the reference's 12 tf.data map-threads assume a multi-core
            # host (data/base_dataloader.py:48); PIL releases the GIL in
            # its C loops so a few threads per core overlap decode+augment,
            # but far more than that thrashes (measured: docs/PERF.md)
            num_workers = min(12, 4 * (os.cpu_count() or 1))
        self.num_workers = max(1, num_workers)
        self.prefetch = max(1, prefetch)
        self.seed = seed
        if not 0 <= shard_id < num_shards:
            raise ValueError(f"shard_id {shard_id} not in [0, {num_shards})")
        if shard_granularity not in ("sample", "batch"):
            raise ValueError(f"unknown shard_granularity {shard_granularity!r}")
        self.shard_id = shard_id
        self.num_shards = num_shards
        self.shard_granularity = shard_granularity
        self.start_sample = start_sample
        # training (repeat) wants static shapes -> drop remainder; eval
        # sweeps want every sample -> keep the ragged final batch
        self.drop_remainder = repeat if drop_remainder is None else drop_remainder

    def __len__(self) -> int:
        n = len(self._shard(np.arange(len(self.dataset))))
        if self.drop_remainder:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _shard(self, idxs: np.ndarray) -> np.ndarray:
        if self.num_shards == 1:
            return idxs
        if self.shard_granularity == "batch":
            b = self.batch_size
            chunks = [idxs[i : i + b] for i in range(0, len(idxs), b)]
            own = chunks[self.shard_id :: self.num_shards]
            return np.concatenate(own) if own else idxs[:0]
        return idxs[self.shard_id :: self.num_shards]

    def _index_stream(self) -> Iterator[tuple[int, int]]:
        n = len(self.dataset)
        shard_len = len(self._shard(np.arange(n)))
        epoch, offset = (0, 0)
        if self.start_sample and shard_len:
            epoch, offset = divmod(self.start_sample, shard_len)
        while True:
            # each epoch's order is seeded independently -> O(1) resume
            order_rng = np.random.default_rng(
                np.random.SeedSequence([self.seed, epoch])
            )
            idxs = order_rng.permutation(n) if self.shuffle else np.arange(n)
            for i in self._shard(idxs)[offset:]:
                yield epoch, int(i)
            offset = 0
            epoch += 1
            if not self.repeat:
                return

    def samples(self) -> Iterator[dict[str, np.ndarray]]:
        """Yield individual samples, in deterministic sequence order."""
        empty_exc, full_exc = queue.Empty, queue.Full
        in_q: queue.Queue = queue.Queue(maxsize=self.num_workers * 2)
        out_q: queue.Queue = queue.Queue(
            maxsize=self.prefetch * self.batch_size + self.num_workers
        )
        stop = threading.Event()

        def _put(q, item) -> bool:
            """Blocking put that aborts when the consumer goes away (keeps
            every thread stoppable; the generator's finally only sets the
            flag, so teardown is interpreter-shutdown-safe)."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except full_exc:
                    continue
            return False

        def worker():
            while not stop.is_set():
                try:
                    item = in_q.get(timeout=0.1)
                except empty_exc:
                    continue
                if item is _SENTINEL:
                    _put(in_q, _SENTINEL)
                    return
                seq, epoch, idx = item
                rng = np.random.default_rng(
                    np.random.SeedSequence([self.seed, epoch, idx])
                )
                try:
                    result = self.dataset.sample(idx, rng)
                except Exception as e:  # surfaced to the consumer
                    result = e
                _put(out_q, (seq, result))

        def feeder():
            seq = 0
            for epoch, idx in self._index_stream():
                if not _put(in_q, (seq, epoch, idx)):
                    return
                seq += 1
            _put(in_q, _SENTINEL)
            _put(out_q, (seq, _SENTINEL))  # end marker carries the total

        threads = [
            threading.Thread(target=worker, daemon=True) for _ in range(self.num_workers)
        ] + [threading.Thread(target=feeder, daemon=True)]
        for t in threads:
            t.start()

        try:
            pending: dict[int, object] = {}
            next_seq = 0
            total = None
            while total is None or next_seq < total:
                if next_seq in pending:
                    result = pending.pop(next_seq)
                    if isinstance(result, Exception):
                        raise result
                    yield result
                    next_seq += 1
                    continue
                seq, result = out_q.get()
                if result is _SENTINEL:
                    total = seq
                    continue
                pending[seq] = result
        finally:
            stop.set()  # all threads poll this flag; no draining needed

    def batches(self) -> Iterator[dict[str, np.ndarray]]:
        buf: list[dict] = []
        for sample in self.samples():
            buf.append(sample)
            if len(buf) == self.batch_size:
                yield _stack(buf)
                buf = []
        if buf and not self.drop_remainder:
            yield _stack(buf)


def device_prefetch(
    batches: Iterator[dict], size: int = 2, sharding=None
) -> Iterator[dict]:
    """Move batches to device `size` steps ahead of the consumer (the
    tf.data `prefetch(1)`-to-device equivalent; reference
    data/base_dataloader.py:51-52). jax.device_put is async, so H2D
    transfers overlap the running step. `sharding`: an optional
    jax.sharding.Sharding (e.g. parallel.batch_sharding(mesh)) that lays
    each batch out across the mesh as it lands on device. Multi-process:
    each host feeds its LOCAL batches and the global arrays are assembled
    via parallel.put_batch (make_array_from_process_local_data)."""
    import collections

    import jax

    def put(batch):
        if sharding is None:
            return jax.device_put(batch)
        from ..parallel import put_batch

        return put_batch(batch, sharding)

    ahead: collections.deque = collections.deque()
    it = iter(batches)
    try:
        for _ in range(size):
            ahead.append(put(next(it)))
    except StopIteration:
        pass
    while ahead:
        out = ahead.popleft()
        try:
            ahead.append(put(next(it)))
        except StopIteration:
            pass
        yield out
