"""Serving layer: batched embedding, search orchestration, HTTP frontend.

Rebuild of the reference's actor pipeline (embedding_service /
search_service / http_service, doc/architecture.md:3-19). The TPU-first
difference is cross-request batching everywhere: the reference embeds
one text per message (embedding_service.rs:157-167) and inserts one
page at a time (search_service.rs:158-181); here queries coalesce into
device-sized batches and ingestion flows through a batched pipeline.
"""

from dawnsearch_tpu.serving.batcher import EmbeddingBatcher  # noqa: F401
from dawnsearch_tpu.serving.search_service import SearchService  # noqa: F401
