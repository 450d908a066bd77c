"""Continuous-batching serving engine.

The reference is a synchronous library call with no serving stack
(SURVEY.md §5 "failure detection ... absent"); BASELINE.json's north star
adds "continuous batching of image streams across hosts". This module is the
single-host building block: an async request queue that coalesces incoming
images into fixed-shape batches (one compiled program), pads short batches,
and fans results back out to per-request futures. Multi-host serving layers
this over a DP mesh (parallel/) with one engine per host feeding its batch
shard.
"""

from __future__ import annotations

import dataclasses
import queue
import threading
import time
from concurrent.futures import Future

import numpy as np

__all__ = ["ServingEngine", "ServingStats"]


@dataclasses.dataclass
class ServingStats:
    requests: int = 0
    batches: int = 0
    padded_slots: int = 0

    @property
    def mean_batch_fill(self):
        total = self.requests + self.padded_slots
        return self.requests / total if total else 0.0


class ServingEngine:
    """Coalesces single-image requests into batched device calls.

    Args:
      infer_fn: callable (B, H, W, 3) float32 -> (B, num_classes); typically
        ``Interpreter.__call__`` (already jitted; fixed batch => one program).
      batch_size: compiled batch shape; short batches are padded.
      max_delay_ms: max time the batcher waits to fill a batch.
    """

    def __init__(self, infer_fn, batch_size=32, max_delay_ms=5.0,
                 input_dtype=None):
        self.infer_fn = infer_fn
        self.batch_size = batch_size
        self.max_delay = max_delay_ms / 1e3
        self.stats = ServingStats()
        # One engine-wide input dtype: the compiled program has a single
        # input signature, so every batch must be homogeneous. ``None``
        # locks to the first request's (normalised) dtype; mismatched later
        # requests are rejected at submit() rather than silently promoted
        # by np.stack (int8+float32 -> float32 would recompile the program
        # and feed the int8-I/O dequant a dtype it wasn't configured for).
        self._input_dtype = (np.dtype(input_dtype)
                             if input_dtype is not None else None)
        self._dtype_lock = threading.Lock()
        self._queue: queue.Queue = queue.Queue()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def submit(self, image) -> Future:
        """Enqueue one (H, W, 3) image; resolves to its class probabilities.

        The image dtype is preserved (int8/uint8 requests flow through to an
        ``Interpreter(input_scale=...)`` unwidened — the int8-I/O serving
        path quarters host->device bytes vs float32). All requests must
        share the engine's input dtype (set explicitly or locked to the
        first request); mismatches raise TypeError."""
        fut: Future = Future()
        img = np.asarray(image)
        if img.dtype not in (np.dtype(np.int8), np.dtype(np.uint8)):
            img = img.astype(np.float32, copy=False)
        with self._dtype_lock:
            if self._input_dtype is None:
                self._input_dtype = img.dtype
            elif img.dtype != self._input_dtype:
                raise TypeError(
                    f"request dtype {img.dtype} does not match the engine's "
                    f"input dtype {self._input_dtype}; one compiled program "
                    "serves every batch, so requests must be homogeneous")
        self._queue.put((img, fut))
        return fut

    def predict(self, image, timeout=None):
        return self.submit(image).result(timeout=timeout)

    def close(self):
        self._stop.set()
        self._thread.join(timeout=5)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def _collect(self):
        """Block for the first request, then fill the batch up to max_delay."""
        try:
            first = self._queue.get(timeout=0.1)
        except queue.Empty:
            return []
        items = [first]
        deadline = time.monotonic() + self.max_delay
        while len(items) < self.batch_size:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                items.append(self._queue.get(timeout=remaining))
            except queue.Empty:
                break
        return items

    def _loop(self):
        while not self._stop.is_set():
            items = self._collect()
            if not items:
                continue
            images = np.stack([img for img, _ in items])
            pad = self.batch_size - len(items)
            if pad:
                images = np.concatenate(
                    [images,
                     np.zeros((pad, *images.shape[1:]), images.dtype)])
            try:
                out = np.asarray(self.infer_fn(images))
            except Exception as e:  # propagate to every waiter
                for _, fut in items:
                    fut.set_exception(e)
                continue
            self.stats.requests += len(items)
            self.stats.batches += 1
            self.stats.padded_slots += pad
            for i, (_, fut) in enumerate(items):
                fut.set_result(out[i])
