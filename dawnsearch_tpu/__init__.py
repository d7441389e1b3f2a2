"""DawnSearch-TPU: a TPU-native distributed semantic search engine.

A ground-up JAX/XLA/Pallas rebuild of the capability set of
`dawn-search/dawnsearch` (Rust, reference at /root/reference):

- all-MiniLM-L6-v2 sentence encoder compiled for TPU (flash-attention +
  fused mean-pool Pallas kernels), batched across requests
  (reference: src/embedding/{model,embedding_service}.rs)
- TPU-resident vector index: brute-force batched matmul top-k for small
  shards, IVF for large ones, i8 scalar quantization for memory parity
  with USearch (reference: src/search/search_provider.rs)
- shard-parallel search over a `jax.sharding.Mesh` with `lax.top_k` over
  `all_gather` merges riding ICI (reference: inter-node fan-out in
  src/net/udp_service.rs + src/search/best_results.rs)
- durable SQLite page store, save/load/verify (src/search/search_provider.rs)
- HTTP search frontend with cross-request query batching
  (src/net/{http_service,web}.rs)
- Common Crawl WARC ingestion, readability-style extraction, language
  filter (src/index/*, src/search/page_source.rs)
- tracker-coordinated P2P network over UDP with msgpack packets, i24
  wire quantization and smaz-compressed inserts (src/net/*, src/bin/dawntrack.rs)
"""

__version__ = "0.1.0"

from dawnsearch_tpu.ops.vector import EM_LEN  # noqa: F401
