"""Sidecar embedding dumps: write from WARC, load, bulk-index."""

import hashlib

import numpy as np

from dawnsearch_tpu.index.provider import SearchProvider
from dawnsearch_tpu.ingest.sidecar import (
    index_sidecars, load_sidecar, write_sidecar)
from dawnsearch_tpu.ingest.warc import write_warc

ENGLISH = ("The history of the lighthouse is a story of the sea and of the "
           "people who kept the light burning through every storm along "
           "this rocky coast for over a century of nights. ") * 5


def encode(texts):
    out = []
    for t in texts:
        seed = int.from_bytes(hashlib.md5(t.encode()).digest()[:4], "little")
        v = np.random.default_rng(seed).standard_normal(384)
        out.append((v / np.linalg.norm(v)).astype(np.float32))
    return np.stack(out)


def test_sidecar_roundtrip_and_bulk_index(tmp_path):
    warc = str(tmp_path / "in.warc.gz")
    write_warc(warc, [
        (f"https://sc.example/{i}",
         (f"<html><head><title>Doc {i}</title></head><body><p>{ENGLISH} "
          f"number {i}</p></body></html>").encode())
        for i in range(6)])
    out = str(tmp_path / "in.sidecar.npz")
    n = write_sidecar(warc, encode, out, batch_size=4)
    assert n == 6
    embs, urls, titles, texts = load_sidecar(out)
    assert embs.shape == (6, 384) and len(urls) == 6
    assert titles[0] == "Doc 0"
    np.testing.assert_allclose(np.linalg.norm(embs, axis=1), 1.0, atol=1e-5)

    provider = SearchProvider(data_dir=None, verify_on_load=False)
    total = index_sidecars(provider, [out])
    assert total == 6 and len(provider.store) == 6
    res = provider.search_embeddings(embs[3], k=1)[0]
    assert res.pages[0].url == "https://sc.example/3"


def test_sidecar_max_pages(tmp_path):
    warc = str(tmp_path / "in.warc.gz")
    write_warc(warc, [
        (f"https://sc.example/{i}",
         (f"<html><body><p>{ENGLISH} {i}</p></body></html>").encode())
        for i in range(5)])
    out = str(tmp_path / "lim.npz")
    assert write_sidecar(warc, encode, out, batch_size=2, max_pages=3) == 3
