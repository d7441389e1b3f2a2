"""Durable SQLite page store — the source of truth for index rebuilds.

Mirrors the reference schema and invariants
(/root/reference/src/search/search_provider.rs:84-99):
`page(id INTEGER PRIMARY KEY, url TEXT, title TEXT, text TEXT,
embedding BLOB)` with a unique URL index; embeddings stored as 1536-byte
little-endian f32 blobs, validated normalized on write and on verify
(search_provider.rs:265-267, 289-327).

Thread model: one shared connection guarded by a lock. The reference
pins SearchService to one blocking thread (dawnsearch.rs:76-78); here
HTTP handler threads and the ingest worker all reach the store, so the
connection is opened with check_same_thread=False and every statement
runs under an RLock (SQLite serializes writers anyway; the lock keeps
cursor use coherent).
"""

from __future__ import annotations

import os
import sqlite3
import threading
from typing import Iterator, NamedTuple

import numpy as np

from dawnsearch_tpu.ops.vector import EM_LEN, bytes_to_embedding, embedding_to_bytes


class PageRecord(NamedTuple):
    id: int
    url: str
    title: str
    text: str


class PageStore:
    def __init__(self, path: str = ":memory:", dim: int = EM_LEN):
        self.dim = dim
        if path != ":memory:":
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self.conn = sqlite3.connect(path, check_same_thread=False)
        self._lock = threading.RLock()
        self._in_txn = False
        if path != ":memory:":
            # WAL + synchronous=NORMAL: one fsync per WAL checkpoint
            # instead of two per commit. Measured 1.2k -> >20k
            # inserts/s on disk; an OS crash can lose the last moments
            # of ingest but never corrupts, and the device index is
            # rebuilt FROM this store on boot, so the two stay
            # consistent (the reference accepts rusqlite defaults and
            # re-ingests dropped pages the same way).
            self.conn.execute("PRAGMA journal_mode=WAL")
            self.conn.execute("PRAGMA synchronous=NORMAL")
        self.conn.execute(
            "CREATE TABLE IF NOT EXISTS page ("
            " id INTEGER PRIMARY KEY,"
            " url TEXT NOT NULL,"
            " title TEXT NOT NULL,"
            " text TEXT NOT NULL,"
            " embedding BLOB NOT NULL)"
        )
        try:
            self.conn.execute(
                "CREATE UNIQUE INDEX IF NOT EXISTS page_url ON page(url)"
            )
            self._unique_url = True
        except sqlite3.IntegrityError:
            # An adopted reference store (dawnsearch.sqlite) can hold
            # duplicate URLs: its dup guard is check-then-insert with a
            # non-unique index (search_provider.rs:96-99, 254-263). Keep
            # lookups indexed and fall back to the same explicit check
            # in insert().
            self.conn.execute(
                "CREATE INDEX IF NOT EXISTS page_url_scan ON page(url)"
            )
            self._unique_url = False
        self.conn.commit()

    def __len__(self) -> int:
        with self._lock:
            (n,) = self.conn.execute("SELECT COUNT(*) FROM page").fetchone()
        return int(n)

    def max_id(self) -> int:
        with self._lock:
            (m,) = self.conn.execute(
                "SELECT COALESCE(MAX(id), -1) FROM page").fetchone()
        return int(m)

    def has_url(self, url: str) -> bool:
        """Duplicate-URL check before insert (search_provider.rs:254-263)."""
        with self._lock:
            row = self.conn.execute(
                "SELECT 1 FROM page WHERE url = ? LIMIT 1", (url,)
            ).fetchone()
        return row is not None

    def insert(self, url: str, title: str, text: str,
               embedding: np.ndarray) -> int | None:
        """Insert; returns new rowid or None on duplicate URL."""
        blob = embedding_to_bytes(embedding)  # validates normalization
        with self._lock:
            if not self._unique_url and self.has_url(url):
                return None
            try:
                cur = self.conn.execute(
                    "INSERT INTO page (url, title, text, embedding) "
                    "VALUES (?,?,?,?)",
                    (url, title, text, blob),
                )
            except sqlite3.IntegrityError:
                return None
            if not self._in_txn:
                self.conn.commit()
            return int(cur.lastrowid)

    def transaction(self):
        """Context manager: suppress per-insert commits inside, one
        commit at exit — callers that loop insert() (e.g. the fused
        ingest's verified store_pages) pay one fsync per batch."""
        import contextlib

        @contextlib.contextmanager
        def _txn():
            with self._lock:
                self._in_txn = True
                try:
                    yield self
                except BaseException:
                    # commit-on-error would persist a partial batch and
                    # silently break the row_id -> store_id(+1) contract
                    # the callers protect; roll back instead
                    self._in_txn = False
                    self.conn.rollback()
                    raise
                self._in_txn = False
                self.conn.commit()
        return _txn()

    def insert_batch(
        self, rows: "list[tuple[str, str, str, np.ndarray]]"
    ) -> list[int | None]:
        """Batched insert in ONE transaction (one commit for the whole
        embed-batch instead of per page — the ingest hot path). Returns
        per-row new id or None on duplicate URL."""
        encoded = [(url, title, text, embedding_to_bytes(emb))
                   for url, title, text, emb in rows]
        ids: list[int | None] = []
        with self._lock:
            try:
                for url, title, text, blob in encoded:
                    if not self._unique_url and self.has_url(url):
                        ids.append(None)
                        continue
                    try:
                        cur = self.conn.execute(
                            "INSERT INTO page (url, title, text, embedding) "
                            "VALUES (?,?,?,?)", (url, title, text, blob))
                        ids.append(int(cur.lastrowid))
                    except sqlite3.IntegrityError:
                        ids.append(None)
            except BaseException:
                # A mid-batch failure (disk full, I/O error) must NOT
                # commit the accepted prefix: the caller never learns
                # those ids, index.add never runs for them, and every
                # later device row would map to the wrong store row
                # (the row_id -> store_id+1 contract transaction()'s
                # docstring protects). Roll back unless inside an
                # enclosing transaction, which handles it at its exit.
                if not self._in_txn:
                    self.conn.rollback()
                raise
            if not self._in_txn:
                self.conn.commit()
        return ids

    def get(self, page_id: int) -> tuple[PageRecord, np.ndarray] | None:
        with self._lock:
            row = self.conn.execute(
                "SELECT id, url, title, text, embedding FROM page WHERE id = ?",
                (page_id,),
            ).fetchone()
        if row is None:
            return None
        return PageRecord(*row[:4]), bytes_to_embedding(row[4], self.dim)

    def get_many(self, page_ids: list[int]) -> dict[int, PageRecord]:
        """Metadata join for search hits (search_provider.rs:218-240)."""
        if not page_ids:
            return {}
        q = ",".join("?" * len(page_ids))
        with self._lock:
            rows = self.conn.execute(
                f"SELECT id, url, title, text FROM page WHERE id IN ({q})",
                page_ids,
            ).fetchall()
        return {r[0]: PageRecord(*r) for r in rows}

    def embeddings_for(self, page_ids: list[int]) -> dict[int, np.ndarray]:
        """Batch f32 embedding fetch (the re-rank stage's join)."""
        if not page_ids:
            return {}
        q = ",".join("?" * len(page_ids))
        with self._lock:
            rows = self.conn.execute(
                f"SELECT id, embedding FROM page WHERE id IN ({q})",
                page_ids,
            ).fetchall()
        return {r[0]: np.frombuffer(r[1], dtype="<f4") for r in rows}

    def embedding_for_page(self, page_id: int) -> np.ndarray | None:
        """More-like-this lookup (search_provider.rs:183-195)."""
        with self._lock:
            row = self.conn.execute(
                "SELECT embedding FROM page WHERE id = ?", (page_id,)
            ).fetchone()
        return None if row is None else bytes_to_embedding(row[0], self.dim)

    def iter_embeddings(self, batch: int = 4096
                        ) -> Iterator[tuple[np.ndarray, np.ndarray]]:
        """(ids, embeddings) batches in id order — index rebuild source
        (search_provider.rs:127-153)."""
        with self._lock:
            cur = self.conn.execute(
                "SELECT id, embedding FROM page ORDER BY id")
        while True:
            with self._lock:
                rows = cur.fetchmany(batch)
            if not rows:
                return
            ids = np.array([r[0] for r in rows], dtype=np.int64)
            embs = np.stack([
                np.frombuffer(r[1], dtype="<f4") for r in rows
            ])
            yield ids, embs

    def verify(self) -> int:
        """Scan every embedding for byte length and normalization
        (search_provider.rs:289-327). Returns number of rows checked;
        raises on the first corrupt row."""
        n = 0
        with self._lock:
            cur = self.conn.execute(
                "SELECT id, embedding FROM page ORDER BY id")
        while True:
            with self._lock:
                rows = cur.fetchmany(4096)
            if not rows:
                return n
            for page_id, blob in rows:
                try:
                    bytes_to_embedding(blob, self.dim)
                except ValueError as e:
                    raise ValueError(f"page {page_id}: {e}") from e
                n += 1

    def close(self) -> None:
        with self._lock:
            self.conn.close()
