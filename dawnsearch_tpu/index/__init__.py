"""Index + durable storage: the TPU-native replacement for USearch+SQLite.

Reference: src/search/search_provider.rs (USearch HNSW via C++ FFI +
SQLite page store). Here the index is device-resident (flat brute-force
matmul top-k as the exactness oracle; IVF for large shards) and the
durable source of truth stays a host-side SQLite store from which the
device index is fully rebuildable — same recovery story as the
reference (search_provider.rs:111-153).
"""

from __future__ import annotations


def load_index(path: str):
    """Load whichever index kind a snapshot holds (flat / ivf / auto).

    The reference's single `index.usearch` file encodes its own format;
    our .npz snapshots carry a `kind` marker (older flat snapshots are
    recognized by their `codes` array).
    """
    import numpy as np

    with np.load(path, allow_pickle=False) as z:
        names = set(z.files)
    if "kind" in names:
        import numpy as _np
        with _np.load(path, allow_pickle=False) as z:
            kind = str(z["kind"])
        if kind == "sharded":
            from dawnsearch_tpu.parallel.sharded_index import ShardedFlatIndex
            return ShardedFlatIndex.load(path)
        from dawnsearch_tpu.index.auto import AutoIndex
        return AutoIndex.load(path)
    if "centroids" in names:
        from dawnsearch_tpu.index.ivf import IVFIndex
        return IVFIndex.load(path)
    from dawnsearch_tpu.index.flat import FlatIndex
    return FlatIndex.load(path)
