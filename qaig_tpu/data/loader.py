"""Batching data loader with background prefetch.

TPU-native replacement for the reference's
``torch.utils.data.DataLoader(num_workers=4, shuffle=True)`` usage
(``train_autoencoder.py:156-160`` etc.): a thread-pool prefetcher that keeps
a small queue of ready host batches so the accelerator never waits on cv2 /
.npy decode.  Batches are stacked numpy arrays (NCHW), converted to device
arrays by the jitted train step; drop_remainder defaults to True so every
step sees a static shape (no XLA recompilation).
"""

import queue
import threading

import numpy as np


def _stack(samples):
    if isinstance(samples[0], (tuple, list)):
        cols = list(zip(*samples))
        return tuple(
            np.stack(c) if isinstance(c[0], np.ndarray) else list(c)
            for c in cols)
    return np.stack(samples)


class DataLoader:
    """``batch_size`` is the GLOBAL batch.  Under multihost
    (``process_count > 1``) every process draws the same shuffled order
    (seeded host-side RNG, identical on all processes) and yields only its
    contiguous ``batch_size / process_count`` slice of each global batch —
    the rows its devices own under a ('data',) sharding; assemble with
    ``train.common.put_global_batch``."""

    def __init__(self, dataset, batch_size, shuffle=True, seed=0,
                 drop_remainder=True, prefetch=2, process_index=0,
                 process_count=1, num_workers=4):
        if batch_size % process_count:
            raise ValueError(
                f"global batch {batch_size} not divisible by "
                f"{process_count} processes")
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_remainder = drop_remainder
        self.prefetch = prefetch
        self.process_index = process_index
        self.process_count = process_count
        self.num_workers = num_workers
        self._rng = np.random.default_rng(seed)

    def __len__(self):
        n = len(self.dataset)
        if self.drop_remainder:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batch_indices(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self._rng.shuffle(order)
        limit = (len(order) // self.batch_size * self.batch_size
                 if self.drop_remainder else len(order))
        per_proc = self.batch_size // self.process_count
        for start in range(0, limit, self.batch_size):
            batch = order[start:start + self.batch_size]
            if self.process_count > 1:
                lo = self.process_index * per_proc
                batch = batch[lo:lo + per_proc]
            yield batch

    def __iter__(self):
        """Background-thread prefetching iterator."""
        q = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        error = []

        load_batch = getattr(self.dataset, "load_batch", None)

        # Per-item fallback decodes fan out over a small pool (the
        # reference runs num_workers=4 worker processes;
        # ``train_autoencoder.py:159``).  cv2/numpy release the GIL during
        # decode, so threads scale on multi-core hosts.
        from concurrent.futures import ThreadPoolExecutor
        pool = (ThreadPoolExecutor(max_workers=self.num_workers)
                if self.num_workers > 1 else None)

        def fetch_items(idx_batch):
            if pool is None:
                return [self.dataset[int(i)] for i in idx_batch]
            return list(pool.map(self.dataset.__getitem__,
                                 [int(i) for i in idx_batch]))

        stop = threading.Event()

        def q_put(item):
            """Put that gives up once the consumer is gone — an abandoned
            iterator (e.g. ``next(iter(loader))``) must not leave the
            worker blocked in ``q.put`` forever."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for idx_batch in self._batch_indices():
                    if stop.is_set():
                        return
                    if load_batch is not None:
                        batch = load_batch([int(i) for i in idx_batch])
                        if batch is not None:
                            if not q_put(batch):
                                return
                            continue
                    if not q_put(_stack(fetch_items(idx_batch))):
                        return
            except BaseException as e:  # surfaced on the consumer side
                error.append(e)
            finally:
                q_put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    if error:
                        raise error[0]
                    return
                yield item
        finally:
            # runs promptly when the generator is closed or abandoned
            # (CPython refcounting): release the worker and the pool
            stop.set()
            if pool is not None:
                pool.shutdown(wait=False)
