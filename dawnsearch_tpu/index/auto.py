"""AutoIndex: exact flat index that upgrades itself to IVF at scale.

USearch gives the reference one growable object with good behavior at
every size (search_provider.rs:35-42,280-284). On TPU, measured brute
force stays the fastest engine far beyond USearch's comfort zone (see
DEFAULT_TRAIN_THRESHOLD below); AutoIndex starts as a FlatIndex and,
when `train_threshold` rows accumulate, trains centroids on the
resident vectors and migrates them into an IVFIndex — transparently to
the SearchProvider.

Row ids are global insertion order in both stages (FlatIndex row ids
are already that; the IVF stage carries them as user ids).
"""

from __future__ import annotations

import os

import numpy as np

from dawnsearch_tpu.index.flat import FlatIndex
from dawnsearch_tpu.index.ivf import IVFIndex
from dawnsearch_tpu.ops.vector import EM_LEN
from dawnsearch_tpu.utils.logging import service_logger

log = service_logger("AutoIndex")

# Measured on v5e at 1M x 384: exact brute force (i8 codes, bf16 MXU
# matmul, approx_min_k) runs ~50k QPS at recall 0.984, while
# gather-based IVF manages ~4.6k QPS at recall 0.930 — per-query HBM
# gathers are ~10x slower than the sequential scan the MXU eats. So on
# TPU the flat index stays optimal far beyond USearch's comfort zone;
# IVF only pays once the corpus outgrows the time/memory budget of a
# full scan (multi-10M rows per chip). On CPU the crossover is much
# earlier (matmuls are the expensive part there).
DEFAULT_TRAIN_THRESHOLD = 8_000_000


class AutoIndex:
    def __init__(
        self,
        dim: int = EM_LEN,
        dtype: str = "i8",
        max_capacity: int | None = None,
        n_centroids: int = 1024,
        nprobe: int = 32,
        train_threshold: int = DEFAULT_TRAIN_THRESHOLD,
        multi_assign: int = 1,
    ):
        self.dim = dim
        self.dtype = dtype
        self.max_capacity = max_capacity
        self.n_centroids = n_centroids
        self.nprobe = nprobe
        self.train_threshold = train_threshold
        self.multi_assign = multi_assign
        # flat stage stores the configured dtype (i8 keeps the 8M-row
        # stage HBM-feasible); migration trains on dequantized rows.
        self.flat: FlatIndex | None = FlatIndex(
            dim=dim, dtype=dtype, max_capacity=max_capacity)
        self.ivf: IVFIndex | None = None

    @property
    def _active(self):
        return self.ivf if self.ivf is not None else self.flat

    def __len__(self) -> int:
        return len(self._active)

    @property
    def nbytes(self) -> int:
        return self._active.nbytes

    @property
    def capacity(self) -> int:
        if self.ivf is not None:
            return self.ivf.n_centroids * self.ivf.list_capacity
        return self.flat.capacity

    def _upgrade(self) -> None:
        """Train on resident rows and migrate (one-time)."""
        n = len(self.flat)
        log.info("upgrading to IVF at %d rows (%d centroids, nprobe %d)",
                 n, self.n_centroids, self.nprobe)
        rows = np.asarray(self.flat._codes[:n], np.float32)
        if self.flat.dtype == "i8":  # dequantize for centroid training
            rows *= np.asarray(self.flat._scales[:n])[:, None]
        per_list = max(128, int(2 * n / self.n_centroids))
        ivf = IVFIndex(dim=self.dim, dtype=self.dtype,
                       n_centroids=self.n_centroids, nprobe=self.nprobe,
                       list_capacity=per_list,
                       multi_assign=self.multi_assign)
        # k-means converges on a sample; training on all 8M+ rows only
        # burns device time
        if n > 1_000_000:
            sample = rows[np.random.default_rng(0).choice(
                n, 1_000_000, replace=False)]
        else:
            sample = rows
        ivf.train(sample, iters=10)
        ivf.add(rows, ids=np.arange(n, dtype=np.int64))
        self.ivf = ivf
        self.flat = None

    def add(self, vectors: np.ndarray) -> np.ndarray:
        rows = np.atleast_2d(np.asarray(vectors, np.float32))
        if self.ivf is not None:
            return self.ivf.add(rows)
        ids = self.flat.add(rows)
        if len(self.flat) >= self.train_threshold:
            self._upgrade()
        return ids

    def search(self, queries: np.ndarray, k: int
               ) -> tuple[np.ndarray, np.ndarray]:
        return self._active.search(queries, k)

    # -- persistence --------------------------------------------------------

    def save(self, path: str) -> None:
        self._active.save(path + ".stage")
        with open(path + ".stage", "rb") as f:
            payload = f.read()
        os.remove(path + ".stage")
        np.savez(path + ".tmp",
                 kind="auto",
                 stage="ivf" if self.ivf is not None else "flat",
                 payload=np.frombuffer(payload, np.uint8),
                 n_centroids=self.n_centroids, nprobe=self.nprobe,
                 train_threshold=self.train_threshold,
                 multi_assign=self.multi_assign,
                 dtype=self.dtype, dim=self.dim)
        os.replace(path + ".tmp.npz", path)

    @classmethod
    def load(cls, path: str, **kwargs) -> "AutoIndex":
        import io
        with np.load(path, allow_pickle=False) as z:
            stage = str(z["stage"])
            idx = cls(dim=int(z["dim"]), dtype=str(z["dtype"]),
                      n_centroids=int(z["n_centroids"]),
                      nprobe=int(z["nprobe"]),
                      train_threshold=int(z["train_threshold"]),
                      multi_assign=(int(z["multi_assign"])
                                    if "multi_assign" in z.files else 1),
                      **kwargs)
            buf = io.BytesIO(z["payload"].tobytes())
        if stage == "ivf":
            idx.ivf = IVFIndex.load(buf)
            idx.flat = None
        else:
            idx.flat = FlatIndex.load(buf)
        return idx
