"""EmbeddingBatcher: coalesce concurrent embed requests into one forward.

The reference's embedding actor serves exactly one text per message over
a depth-2 channel (/root/reference/src/embedding/embedding_service.rs:142-167,
bin/dawnsearch.rs:59), so concurrent searches serialize through the
model. Here a worker thread drains whatever requests accumulated —
up to `max_batch`, waiting at most `max_wait_ms` after the first — and
runs ONE bucketed forward for all of them. Latency under load drops
from O(queue) model calls to O(1).
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from typing import Callable, Sequence

import numpy as np

from dawnsearch_tpu.utils.logging import METRICS, service_logger

log = service_logger("Batcher")


class EmbeddingBatcher:
    def __init__(
        self,
        encode_fn: Callable[[Sequence[str]], np.ndarray],
        max_batch: int = 64,
        max_wait_ms: float = 5.0,
    ):
        self._encode = encode_fn
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1000.0
        self._q: queue.Queue = queue.Queue()
        self._shutdown = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="embed-batcher")
        self._thread.start()

    def embed(self, text: str, timeout: float | None = 30.0) -> np.ndarray:
        """Blocking single-text embed (coalesced under the hood)."""
        return self.embed_async(text).result(timeout=timeout)

    def embed_async(self, text: str) -> "Future[np.ndarray]":
        if self._shutdown.is_set():
            raise RuntimeError("batcher is shut down")
        fut: Future = Future()
        self._q.put((text, fut))
        return fut

    def embed_many(self, texts: Sequence[str],
                   timeout: float | None = 60.0) -> np.ndarray:
        """Batch entry point for ingestion — bypasses the queue, one call."""
        return self._encode(list(texts))

    def _run(self) -> None:
        while not self._shutdown.is_set():
            try:
                first = self._q.get(timeout=0.1)
            except queue.Empty:
                continue
            if first is None:
                break
            batch = [first]
            deadline = self.max_wait
            t0 = time.monotonic()
            while len(batch) < self.max_batch:
                remaining = deadline - (time.monotonic() - t0)
                if remaining <= 0:
                    break
                try:
                    item = self._q.get(timeout=remaining)
                except queue.Empty:
                    break
                if item is None:
                    self._shutdown.set()
                    break
                batch.append(item)
            texts = [t for t, _ in batch]
            try:
                vecs = self._encode(texts)
                for (_, fut), v in zip(batch, vecs):
                    fut.set_result(v)
                METRICS.inc("batches", 1)
                METRICS.inc("batched_texts", len(batch))
            except Exception as e:  # propagate to every waiter
                for _, fut in batch:
                    if not fut.done():
                        fut.set_exception(e)

    def stop(self) -> None:
        self._shutdown.set()
        self._q.put(None)
        self._thread.join(timeout=5.0)
