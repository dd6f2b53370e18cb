"""Host data pipeline: parallel decode + prefetch feeding static-shape batches.

Replaces the reference's ``torch.utils.data.DataLoader(num_workers=4,
pin_memory=True)`` (``/root/reference/utils/train_eval_util.py:49,96``) with
a thread-pool decoder (PIL releases the GIL during JPEG decode/resize) and a
bounded prefetch queue, so host decode overlaps device compute — the
double-buffered feed called for by the north star (BASELINE.md).

Batches are **uint8 HWC with static shapes**: the final partial batch is
padded (``valid`` marks real rows) so the jitted device step never
recompiles; padding rows are dropped after score readback, reproducing the
reference's tail truncation (``detection_util.py:249``).
"""

from __future__ import annotations

import os
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, NamedTuple, Optional, Sequence, Tuple

import numpy as np

from mcm_tpu.data.transforms import load_image_uint8


class Batch(NamedTuple):
    images: np.ndarray   # uint8 [B, S, S, 3]
    labels: np.ndarray   # int32 [B]
    valid: int           # number of non-padding rows


class DataPipeline:
    """Iterate (path, label) datasets as prefetched uint8 batches.

    Parameters
    ----------
    dataset:      indexable of (path, label) with __len__.
    batch_size:   static batch size (padded final batch).
    image_size:   square output resolution (resize shorter side + center crop).
    num_workers:  decoder threads (default: min(16, cpu count)).
    prefetch:     batches resident in the queue ahead of the consumer.
    """

    def __init__(self, dataset, batch_size: int, image_size: int = 224,
                 num_workers: Optional[int] = None, prefetch: int = 2,
                 drop_remainder: bool = False):
        self.dataset = dataset
        self.batch_size = batch_size
        self.image_size = image_size
        self.num_workers = num_workers or min(16, os.cpu_count() or 4)
        self.prefetch = max(1, prefetch)
        self.drop_remainder = drop_remainder

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_remainder:
            return n // self.batch_size
        return -(-n // self.batch_size)

    @property
    def num_samples(self) -> int:
        return len(self.dataset)

    def _decode(self, idx: int) -> Tuple[np.ndarray, int]:
        path, label = self.dataset[idx]
        return load_image_uint8(path, self.image_size), label

    def __iter__(self) -> Iterator[Batch]:
        n = len(self.dataset)
        num_batches = len(self)
        if num_batches == 0:
            return
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer(pool: ThreadPoolExecutor):
            try:
                for b in range(num_batches):
                    if stop.is_set():
                        return
                    lo = b * self.batch_size
                    hi = min(lo + self.batch_size, n)
                    futures = [pool.submit(self._decode, i)
                               for i in range(lo, hi)]
                    q.put(("batch", futures, hi - lo))
                q.put(("done", None, 0))
            except BaseException as e:  # surface worker errors to consumer
                q.put(("error", e, 0))

        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            thread = threading.Thread(target=producer, args=(pool,),
                                      daemon=True)
            thread.start()
            try:
                while True:
                    kind, payload, valid = q.get()
                    if kind == "done":
                        return
                    if kind == "error":
                        raise payload
                    images = np.zeros((self.batch_size, self.image_size,
                                       self.image_size, 3), dtype=np.uint8)
                    labels = np.zeros((self.batch_size,), dtype=np.int32)
                    for row, fut in enumerate(payload):
                        img, label = fut.result()
                        images[row] = img
                        labels[row] = label
                    if valid:  # replicate last real row into padding rows
                        images[valid:] = images[valid - 1]
                        labels[valid:] = labels[valid - 1]
                    yield Batch(images, labels, valid)
            finally:
                stop.set()
                # drain so the producer can exit
                while not q.empty():
                    try:
                        q.get_nowait()
                    except queue.Empty:
                        break


def collect_scores(score_batches: Sequence[np.ndarray],
                   valids: Sequence[int], total: int) -> np.ndarray:
    """Concatenate per-batch score vectors dropping padding rows, truncated
    to the dataset length (reference ``detection_util.py:249`` semantics)."""
    parts = [np.asarray(s)[:v] for s, v in zip(score_batches, valids)]
    return np.concatenate(parts, axis=0)[:total].copy()
