"""Index + durable storage: the TPU-native replacement for USearch+SQLite.

Reference: src/search/search_provider.rs (USearch HNSW via C++ FFI +
SQLite page store). Here the index is device-resident (flat brute-force
matmul top-k as the exactness oracle; IVF for large shards) and the
durable source of truth stays a host-side SQLite store from which the
device index is fully rebuildable — same recovery story as the
reference (search_provider.rs:111-153).
"""
