"""ExtractionService: background ingestion loop feeding the index.

Rebuild of /root/reference/src/index/extraction_service.rs:40-125 —
an endless loop that picks a WARC file, streams pages out of it, and
feeds the search service — with two deliberate changes:

- Pages are inserted in embed-batch-sized groups (one batched forward +
  one batched index add) instead of one ExtractedPage message each
  (extraction_service.rs:94-99 / search_service.rs:158-181, the
  reference's ingest-throughput ceiling).
- The WARC source is pluggable: `CommonCrawlSource` mirrors the
  reference (random file from the crawl's warc.paths.gz,
  extraction_service.rs:41-52, 60 s error backoff :54-57), while
  `LocalWarcSource` serves offline corpora and tests.
"""

from __future__ import annotations

import glob
import gzip
import io
import os
import queue
import random
import threading
import time
from typing import Iterator

from dawnsearch_tpu.ingest.pages import ExtractedPage, iter_pages
from dawnsearch_tpu.utils.logging import METRICS, service_logger

log = service_logger("Extraction")

CRAWL = "CC-MAIN-2023-23"  # extraction_service.rs:31-32
PATHS_URL = (f"https://data.commoncrawl.org/crawl-data/{CRAWL}/warc.paths.gz")
ERROR_BACKOFF_S = 60.0  # extraction_service.rs:54-57
BETWEEN_FILES_S = 10.0  # extraction_service.rs:58-59


class LocalWarcSource:
    """Round-robin over local WARC files (offline corpora, tests)."""

    def __init__(self, pattern: str, loop: bool = False):
        self.pattern = pattern
        self.loop = loop

    def files(self) -> Iterator[io.BufferedIOBase | str]:
        while True:
            paths = sorted(glob.glob(self.pattern))
            if not paths:
                return
            for p in paths:
                yield p
            if not self.loop:
                return


class CommonCrawlSource:
    """Random WARC files from a Common Crawl listing
    (extraction_service.rs:41-52). Streams over HTTPS; in a zero-egress
    environment every fetch raises and the service backs off."""

    def __init__(self, crawl: str = CRAWL):
        self.crawl = crawl
        self._paths: list[str] | None = None

    def _listing(self) -> list[str]:
        if self._paths is None:
            import urllib.request
            url = (f"https://data.commoncrawl.org/crawl-data/"
                   f"{self.crawl}/warc.paths.gz")
            with urllib.request.urlopen(url, timeout=60) as r:
                self._paths = gzip.decompress(r.read()).decode().split()
            log.info("crawl %s: %d warc files", self.crawl, len(self._paths))
        return self._paths

    def files(self) -> Iterator[io.BufferedIOBase]:
        import urllib.request
        while True:
            path = random.choice(self._listing())  # random file (:52)
            url = f"https://data.commoncrawl.org/{path}"
            log.info("streaming %s", url)
            yield io.BufferedReader(urllib.request.urlopen(url, timeout=120))


class ExtractionService:
    """Two-stage pipeline: the extraction thread parses WARC records and
    fills a bounded queue of page batches; the insert thread drains it
    into embed+index. Host-side extraction of batch i+1 overlaps the
    device work of batch i (the reference does everything serially,
    one page at a time)."""

    def __init__(self, service, source=None, batch_size: int = 64,
                 max_pages: int | None = None):
        self.service = service
        self.source = source if source is not None else CommonCrawlSource()
        self.batch_size = batch_size
        self.max_pages = max_pages  # stop after N (tests); None = forever
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self._insert_thread: threading.Thread | None = None
        self._batches: "queue.Queue" = queue.Queue(maxsize=4)
        self.pages_ingested = 0

    def start(self) -> "ExtractionService":
        self._insert_thread = threading.Thread(
            target=self._insert_loop, daemon=True, name="extraction-insert")
        self._insert_thread.start()
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="extraction")
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=10.0)
        self._batches.put(None)
        if self._insert_thread is not None:
            self._insert_thread.join(timeout=10.0)

    def join(self, timeout: float | None = None) -> None:
        """Wait until extraction AND inserts drain (tests/one-shot runs)."""
        if self._thread is not None:
            self._thread.join(timeout)
        self._batches.join()

    def _insert_loop(self) -> None:
        while True:
            batch = self._batches.get()
            if batch is None:
                self._batches.task_done()
                return
            try:
                self._insert(batch)
            except Exception:
                log.exception("insert batch failed")
            finally:
                self._batches.task_done()

    def _insert(self, batch: list[ExtractedPage]) -> None:
        t0 = time.perf_counter()
        self.service.insert_pages(
            [(p.url, p.title, p.text) for p in batch])
        dt = time.perf_counter() - t0
        self.pages_ingested += len(batch)
        METRICS.inc("pages_extracted", len(batch))
        # throughput meter like the reference's (warc.rs:107-114)
        log.info("ingested %d pages in %.2fs (%.1f pages/s, total %d)",
                 len(batch), dt, len(batch) / max(dt, 1e-9),
                 self.pages_ingested)

    def _run(self) -> None:
        while not self._stop.is_set():
            try:
                progressed = False
                for f in self.source.files():
                    progressed = True
                    batch: list[ExtractedPage] = []
                    produced = 0
                    for page in iter_pages(f):
                        if self._stop.is_set():
                            return
                        batch.append(page)
                        if len(batch) >= self.batch_size:
                            produced += len(batch)
                            self._batches.put(batch)
                            batch = []
                        if self.max_pages is not None and \
                                self.pages_ingested + produced + \
                                len(batch) >= self.max_pages:
                            break
                    if batch:
                        produced += len(batch)
                        self._batches.put(batch)
                    if self.max_pages is not None and \
                            self.pages_ingested + produced >= self.max_pages:
                        return
                    if self._stop.wait(
                            0 if self.max_pages else BETWEEN_FILES_S):
                        return
                if not progressed:
                    return  # empty local source: nothing to do
                if self.max_pages is None and isinstance(
                        self.source, LocalWarcSource) and not self.source.loop:
                    return  # local one-shot drained
            except Exception as e:
                log.warning("ingestion error: %s; backing off %.0fs",
                            e, ERROR_BACKOFF_S)
                if self._stop.wait(ERROR_BACKOFF_S):
                    return
