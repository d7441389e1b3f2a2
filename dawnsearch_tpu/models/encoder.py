"""SentenceEncoder: tokenize -> bucketed jit forward -> pooled unit vectors.

The serving-side replacement for the reference's EmbeddingProvider
(embedding_service.rs:49-140). Differences, all TPU-driven:

- The reference pads each batch to its longest member (BatchLongest,
  embedding_service.rs:101-109); under XLA that means a recompile per
  novel shape. We bucket sequence lengths AND batch sizes to a small
  static set, so the jit cache stays bounded and steady-state serving
  never recompiles.
- The reference embeds one text per request message
  (embedding_service.rs:157-167). Here `encode()` takes arbitrarily many
  texts and tiles them through device-sized batches; the serving layer
  adds cross-request batching on top (serving/batcher.py).
"""

from __future__ import annotations

import bisect
import functools
from typing import Sequence

import jax
import numpy as np

from dawnsearch_tpu.models.bert import BertConfig, MINILM_L6, Params, encode_batch
from dawnsearch_tpu.models.tokenizer import WordPieceTokenizer
from dawnsearch_tpu.utils.logging import METRICS, service_logger

log = service_logger("Embedding")


class SentenceEncoder:
    def __init__(
        self,
        params: Params,
        tokenizer: WordPieceTokenizer,
        cfg: BertConfig = MINILM_L6,
        seq_buckets: Sequence[int] = (16, 32, 64, 128, 256, 512),
        # 512/1024 exist for BULK INGEST (amortizing the dispatch
        # round-trip, ~80 ms through a tunnel); warmup() skips them so
        # serving startup stays bounded — they compile on first use.
        batch_buckets: Sequence[int] = (1, 8, 32, 64, 128, 256, 512, 1024),
        mask_padding: bool = True,
        include_padding_in_pool: bool = False,
    ):
        self.params = params
        self.tokenizer = tokenizer
        self.cfg = cfg
        self.seq_buckets = sorted(seq_buckets)
        self.batch_buckets = sorted(batch_buckets)
        self.mask_padding = mask_padding
        self.include_padding_in_pool = include_padding_in_pool
        if self.seq_buckets[-1] > cfg.max_position_embeddings:
            raise ValueError("seq bucket exceeds max_position_embeddings")

    @property
    def dim(self) -> int:
        return self.cfg.hidden_size

    def _bucket(self, buckets: list[int], n: int) -> int:
        i = bisect.bisect_left(buckets, n)
        return buckets[min(i, len(buckets) - 1)]

    @functools.cached_property
    def _jitted(self):
        return functools.partial(
            encode_batch,
            cfg=self.cfg,
            mask_padding=self.mask_padding,
            include_padding=self.include_padding_in_pool,
        )

    def encode(self, texts: Sequence[str]) -> np.ndarray:
        """Texts -> (N, H) float32 unit vectors."""
        if not texts:
            return np.zeros((0, self.dim), dtype=np.float32)
        max_seq = self.seq_buckets[-1]
        return self.encode_tokenized(
            [self.tokenizer.encode(t, max_len=max_seq) for t in texts])

    def encode_tokenized(self, ids_list: list[list[int]]) -> np.ndarray:
        """Pre-tokenized id lists -> (N, H) float32 unit vectors (the
        ingest pipeline tokenizes on its own thread — re-tokenizing
        here would redo that work under the provider lock).

        Chunks are DISPATCHED without synchronizing and gathered once at
        the end, so host-side padding of chunk i+1 overlaps device
        compute of chunk i (the device queue executes in order). Rows
        sort by length so chunks bucket tightly; order restored at the
        end."""
        if not ids_list:
            return np.zeros((0, self.dim), dtype=np.float32)
        order = sorted(range(len(ids_list)), key=lambda i: len(ids_list[i]))
        out = np.zeros((len(ids_list), self.dim), dtype=np.float32)
        max_batch = self.batch_buckets[-1]
        pending = []  # (chunk row ids, device array)
        with METRICS.timer("embed_forward"):
            for start in range(0, len(order), max_batch):
                chunk = order[start: start + max_batch]
                pending.append(
                    (chunk,
                     self._dispatch_chunk([ids_list[i] for i in chunk])))
            for chunk, vecs in pending:
                out[chunk] = np.asarray(vecs)[: len(chunk)]
        METRICS.inc("texts_embedded", len(ids_list))
        return out

    def pad_batch(self, ids_list: list[list[int]]
                  ) -> tuple[np.ndarray, np.ndarray]:
        """Token id lists -> bucketed (input_ids, mask) arrays."""
        n = len(ids_list)
        if n > self.batch_buckets[-1]:
            # callers chunk at the top bucket (encode/_dispatch_chunk,
            # the fused paths' _chunk_by_bucket); a direct over-size
            # call would otherwise die on an opaque IndexError below
            raise ValueError(
                f"batch of {n} exceeds the top batch bucket "
                f"{self.batch_buckets[-1]}; chunk it (see encode())")
        seq = self._bucket(self.seq_buckets, max(len(ids) for ids in ids_list))
        bsz = self._bucket(self.batch_buckets, n)
        pad_id = self.tokenizer.pad_id
        input_ids = np.full((bsz, seq), pad_id, dtype=np.int32)
        mask = np.zeros((bsz, seq), dtype=np.int32)
        for r, ids in enumerate(ids_list):
            ids = ids[:seq]
            input_ids[r, : len(ids)] = ids
            mask[r, : len(ids)] = 1
        # Padding rows get a bare [CLS][SEP] so normalization never sees zeros.
        for r in range(n, bsz):
            input_ids[r, 0] = self.tokenizer.cls_id
            input_ids[r, 1] = self.tokenizer.sep_id
            mask[r, :2] = 1
        return input_ids, mask

    def tokenize_texts(self, texts: Sequence[str]) -> list[list[int]]:
        max_seq = self.seq_buckets[-1]
        return [self.tokenizer.encode(t, max_len=max_seq) for t in texts]

    def _dispatch_chunk(self, ids_list: list[list[int]]) -> jax.Array:
        """Pad to buckets and enqueue one forward; no host sync."""
        input_ids, mask = self.pad_batch(ids_list)
        return self._jitted(self.params, jax.numpy.asarray(input_ids),
                            jax.numpy.asarray(mask))

    def warmup(self, max_batch: int = 256) -> None:
        """Pre-compile the (batch, seq) bucket grid to avoid serving
        stalls. Buckets past `max_batch` (the bulk-ingest sizes) are
        skipped — a first ingest batch tolerates a compile stall, a
        first query shouldn't."""
        for seq in self.seq_buckets:
            for bsz in (b for b in self.batch_buckets if b <= max_batch):
                ids = np.full((bsz, seq), self.tokenizer.pad_id, np.int32)
                ids[:, 0] = self.tokenizer.cls_id
                ids[:, 1] = self.tokenizer.sep_id
                m = np.zeros((bsz, seq), np.int32)
                m[:, :2] = 1
                jax.block_until_ready(
                    self._jitted(self.params, jax.numpy.asarray(ids),
                                 jax.numpy.asarray(m)))
        log.info("encoder warmup complete (%d shapes)",
                 len(self.seq_buckets) *
                 sum(1 for b in self.batch_buckets if b <= max_batch))
