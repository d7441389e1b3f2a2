"""i4 capacity tier: nibble packing, FlatIndex paths, fused kernel.

The i4 tier halves storage vs i8 (0.5 byte/dim, row-block packed —
ops/quant.py) to ~double the single-chip row envelope; recall is
coarser than i8, so the serving contract is overfetch + exact re-rank
(the provider's existing host f32 re-rank engages automatically:
dtype != "f32" counts as quantized). No reference counterpart —
USearch's smallest scalar mode is f8 (examples_old/search_usearch.rs:39);
this goes below it for capacity, with the re-rank restoring accuracy.
"""

import os

import numpy as np
import pytest

from dawnsearch_tpu.index.flat import FlatIndex
from dawnsearch_tpu.ops.quant import (
    blend_rows_i4, pack_i4_np, quantize_i4_vals, quantize_i4_vals_np,
    unpack_i4, unpack_i4_np, write_rows_i4)


def brute_force(q, x, k):
    d = 1.0 - q @ x.T
    idx = np.argsort(d, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(d, idx, axis=1), idx


# -- packing / quantization ----------------------------------------------


def test_i4_pack_roundtrip(unit_vectors):
    x = unit_vectors(64)
    vals, scales = quantize_i4_vals_np(x)
    assert vals.shape == (64, 384) and vals.dtype == np.uint8
    assert vals.min() >= 1 and vals.max() <= 15
    packed = pack_i4_np(vals, block=64)
    assert packed.shape == (32, 384) and packed.dtype == np.uint8
    codes = unpack_i4_np(packed, block=64)
    assert codes.shape == (64, 384) and codes.dtype == np.int8
    assert codes.min() >= -7 and codes.max() <= 7
    np.testing.assert_array_equal(codes, vals.astype(np.int8) - 8)
    # reconstruction error bounded by half a step per element
    recon = codes.astype(np.float32) * scales[:, None]
    step = scales[:, None]
    assert np.all(np.abs(recon - x) <= 0.5 * step + 1e-6)
    # at least one element per row hits the absmax level +-7
    assert np.all(np.abs(codes).max(axis=1) == 7)


def test_i4_row_block_layout(unit_vectors):
    """Within a packing block of T logical rows, packed row p holds row
    p in the LOW nibble and row p + T/2 in the HIGH nibble — the layout
    whose lane dim stays D (a 128-multiple), so XLA never pads/copies
    the codes (ops/quant.py header; the round-4 redesign)."""
    x = unit_vectors(32)
    vals, _ = quantize_i4_vals_np(x)
    packed = pack_i4_np(vals, block=16)  # 2 blocks of 16 rows
    for b in range(2):
        for p in range(8):
            np.testing.assert_array_equal(
                packed[b * 8 + p] & 0xF, vals[b * 16 + p])
            np.testing.assert_array_equal(
                packed[b * 8 + p] >> 4, vals[b * 16 + 8 + p])


def test_i4_device_matches_host(unit_vectors):
    x = unit_vectors(32)
    hv, hs = quantize_i4_vals_np(x)
    dv, ds = quantize_i4_vals(x)
    np.testing.assert_array_equal(hv, np.asarray(dv))
    np.testing.assert_allclose(hs, np.asarray(ds), rtol=1e-6)
    # jnp unpack agrees with the numpy twin on the same packed buffer
    import jax.numpy as jnp
    packed = pack_i4_np(hv, block=32)
    np.testing.assert_array_equal(
        unpack_i4_np(packed, block=32),
        np.asarray(unpack_i4(jnp.asarray(packed), block=32)))


def test_i4_odd_dim_rejected():
    with pytest.raises(ValueError, match="even dim"):
        quantize_i4_vals_np(np.ones((2, 383), np.float32))
    with pytest.raises(ValueError, match="even dim"):
        FlatIndex(dim=383, dtype="i4")


def test_i4_write_rows_partial_blocks(unit_vectors):
    """write_rows_i4: appends at arbitrary (unaligned) offsets land the
    right nibbles without disturbing earlier rows — the read-modify-
    write shared by FlatIndex.add and the fused ingest programs."""
    import jax.numpy as jnp
    block = 16
    cap = 64
    buf = jnp.zeros((cap // 2, 384), jnp.uint8)
    x = unit_vectors(cap)
    vals, _ = quantize_i4_vals_np(x)
    # append in awkward run lengths crossing half-block boundaries
    start = 0
    for n in (3, 9, 17, 5, 30):
        buf = write_rows_i4(buf, jnp.asarray(vals[start:start + n]),
                            start, block)
        start += n
    got = unpack_i4_np(np.asarray(buf), block=block)
    np.testing.assert_array_equal(got, vals.astype(np.int16) - 8)


def test_i4_blend_rows_matches_write(unit_vectors):
    """blend_rows_i4 with a full-true mask and zero shift == a plain
    write; masked-off rows keep old contents (the sharded no-op-shard
    contract)."""
    import jax.numpy as jnp
    block = 16
    buf = jnp.zeros((32, 384), jnp.uint8)  # 64 logical rows
    x = unit_vectors(24)
    vals, _ = quantize_i4_vals_np(x)
    mask = jnp.ones((24,), bool)
    buf = blend_rows_i4(buf, jnp.asarray(vals), 0, 5, mask, block)
    got = unpack_i4_np(np.asarray(buf), block=block)
    np.testing.assert_array_equal(got[5:29], vals.astype(np.int16) - 8)
    # all-false mask: a no-op write leaves the buffer untouched
    other, _ = quantize_i4_vals_np(unit_vectors(24))
    buf2 = blend_rows_i4(buf, jnp.asarray(other), 0, 5,
                         jnp.zeros((24,), bool), block)
    np.testing.assert_array_equal(np.asarray(buf2), np.asarray(buf))


# -- FlatIndex XLA path ---------------------------------------------------


def test_i4_index_recall_small(unit_vectors):
    """XLA chunked path: i4 storage error costs recall vs i8 but the
    top-1 self-match and the bulk of top-10 survive at small N."""
    x = unit_vectors(2000)
    q = x[:16]  # self-queries: exact match must dominate
    idx = FlatIndex(dtype="i4", capacity=2048)
    idx.add(x)
    assert idx._codes.shape == (idx.capacity // 2, 384)  # 2 rows/byte-row
    d, i = idx.search(q, 10)
    assert (i[:, 0] == np.arange(16)).mean() >= 0.9
    fresh = unit_vectors(8)
    bd, bi = brute_force(fresh, x, 10)
    d2, i2 = idx.search(fresh, 10)
    # raw i4 recall is loose; assert it is usable, the re-rank tests
    # below assert the serving-quality number
    hits = np.mean([len(set(a) & set(b)) / 10 for a, b in zip(i2, bi)])
    assert hits >= 0.5


def test_i4_with_f16_rerank_restores_recall(unit_vectors):
    """exact="f16" device re-rank on top of i4 codes: recall back to
    ~exact at small N (the serving-quality configuration when HBM
    allows the +2 B/dim shadow)."""
    x = unit_vectors(2000)
    q = unit_vectors(8)
    idx = FlatIndex(dtype="i4", capacity=2048, exact="f16", rerank_extra=50)
    idx.add(x)
    d, i = idx.search(q, 10)
    bd, bi = brute_force(q, x, 10)
    hits = np.mean([len(set(a) & set(b)) / 10 for a, b in zip(i, bi)])
    assert hits >= 0.95
    np.testing.assert_allclose(d[:, 0], bd[:, 0], atol=2e-3)


def test_i4_growth_and_reconstruct(unit_vectors):
    idx = FlatIndex(dtype="i4", capacity=64, segment=64)
    rows = []
    for _ in range(4):
        b = unit_vectors(40)
        rows.append(b)
        idx.add(b)
    x = np.concatenate(rows)
    assert len(idx) == 160 and idx.capacity >= 160
    d, i = idx.search(x[77:78], 1)
    assert i[0, 0] == 77
    r = idx.reconstruct(77)
    assert r.shape == (384,)
    assert 1.0 - r @ x[77] < 5e-3  # i4 reconstruction error bound


def test_i4_nbytes_half_of_i8(unit_vectors):
    i8 = FlatIndex(dtype="i8", capacity=16384, segment=16384)
    i4 = FlatIndex(dtype="i4", capacity=16384, segment=16384)
    # codes halve; the f32 scales array is identical
    assert i4.nbytes == i8.nbytes - 16384 * 384 // 2


def test_i4_save_load_roundtrip(tmp_path, unit_vectors):
    x = unit_vectors(300)
    idx = FlatIndex(dtype="i4", capacity=512)
    idx.add(x)
    p = os.path.join(tmp_path, "i4.npz")
    idx.save(p)
    idx2 = FlatIndex.load(p)
    assert idx2.dtype == "i4" and idx2.dim == 384 and len(idx2) == 300
    d1, i1 = idx.search(x[:4], 5)
    d2, i2 = idx2.search(x[:4], 5)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(d1, d2, atol=1e-6)


def test_i4_load_backfills_requested_shadow(tmp_path, unit_vectors):
    """exact="f16" requested on a shadow-less i4 snapshot: the shadow
    backfills from DEQUANTIZED i4 codes (not zeros; round-2 advisor
    class of bug)."""
    x = unit_vectors(200)
    idx = FlatIndex(dtype="i4", capacity=256)
    idx.add(x)
    p = os.path.join(tmp_path, "i4.npz")
    idx.save(p)
    idx2 = FlatIndex.load(p, exact="f16")
    assert idx2.device_rerank
    shadow = np.asarray(idx2._exact[:200], np.float32)
    # the shadow carries the i4 quantization error, not zeros
    assert np.all(np.linalg.norm(shadow, axis=1) > 0.9)
    d, i = idx2.search(x[:4], 5)
    assert (i[:, 0] == np.arange(4)).all()


# -- fused Pallas kernel (interpret mode on CPU) --------------------------


def test_i4_fused_selector_matches_xla_path(unit_vectors):
    """The i4 fused kernel's candidates match brute force at the same
    rate as the XLA i4 path — the two-matmul plane split and the
    shared argmin tail are score-equivalent."""
    x = unit_vectors(16384)
    q = unit_vectors(16)
    idx = FlatIndex(dtype="i4", capacity=16384, segment=16384,
                    selector="fused")
    idx.fused_min_rows = 0
    idx.add(x)
    from dawnsearch_tpu.ops import scan_select
    assert scan_select.eligible(idx.count, idx.capacity, idx.dim,
                                idx.dtype, idx.selector, 0)
    d, i = idx.search(q, 10)
    assert np.all(np.diff(d, axis=1) >= -1e-6)
    # compare against the XLA chunked path on the same storage
    idx_xla = FlatIndex(dtype="i4", capacity=16384, segment=16384,
                        selector="approx")
    idx_xla.add(x)
    dx, ix = idx_xla.search(q, 10)
    overlap = np.mean([len(set(a) & set(b)) / 10 for a, b in zip(i, ix)])
    assert overlap >= 0.7  # windowed-candidate loss only
    np.testing.assert_allclose(d[:, 0], dx[:, 0], atol=2e-2)
    # top-1 self-queries survive the fused path
    ds, is_ = idx.search(x[:8], 5)
    assert (is_[:, 0] == np.arange(8)).mean() >= 0.9


def test_i4_fused_qi8_and_bf16_agree(unit_vectors):
    """Both scoring branches of the i4 kernel (s8xs8 and bf16)."""
    import jax.numpy as jnp
    from dawnsearch_tpu.ops.scan_select import search_select

    x = unit_vectors(16384)
    q = unit_vectors(8)
    idx = FlatIndex(dtype="i4", capacity=16384, segment=16384)
    idx.add(x)
    args = (idx._codes, idx._scales, jnp.asarray(q), jnp.int32(idx.count))
    d0, i0 = map(np.asarray, search_select(*args, 10, qi8=False))
    d1, i1 = map(np.asarray, search_select(*args, 10, qi8=True))
    overlap = np.mean([len(set(a) & set(b)) / 10 for a, b in zip(i0, i1)])
    assert overlap >= 0.7
    np.testing.assert_allclose(d0[:, 0], d1[:, 0], atol=1e-2)


def test_i4_fused_partial_fill_masks_tail(unit_vectors):
    x = unit_vectors(300)
    idx = FlatIndex(dtype="i4", capacity=16384, segment=16384,
                    selector="fused")
    idx.fused_min_rows = 0
    idx.add(x)
    d, i = idx.search(x[:2], 20)
    valid = i >= 0
    assert np.all(i[valid] < 300)
    assert np.all(np.isinf(d[~valid]))
    assert i[0, 0] == 0


def test_i4_fused_with_device_rerank(unit_vectors):
    x = unit_vectors(16384)
    q = unit_vectors(4)
    idx = FlatIndex(dtype="i4", capacity=16384, segment=16384,
                    selector="fused", exact="f16", rerank_extra=50)
    idx.fused_min_rows = 0
    idx.add(x)
    d, i = idx.search(q, 10)
    for b in range(4):
        for dd, ii in zip(d[b], i[b]):
            if ii >= 0:
                assert abs(dd - (1.0 - q[b] @ x[ii])) < 2e-3


# -- fused ingest (one-dispatch encode+quantize+write) ---------------------


@pytest.fixture(scope="module")
def mini_encoder():
    import jax
    from dawnsearch_tpu.models.bert import BertConfig
    from dawnsearch_tpu.models.encoder import SentenceEncoder
    from dawnsearch_tpu.models.tokenizer import (
        WordPieceTokenizer, build_vocab_from_corpus)
    from dawnsearch_tpu.models.weights import init_params

    corpus = ["the lighthouse keeper watched the storm",
              "quantum matrix operations on tensor processors",
              "a recipe for sourdough bread and butter",
              "railway schedules across the mountain pass",
              "deep sea creatures of the midnight zone"]
    cfg = BertConfig(vocab_size=2048, hidden_size=64, num_layers=2,
                     num_heads=4, intermediate_size=128,
                     max_position_embeddings=64)
    vocab = build_vocab_from_corpus(corpus, size=2048)
    params = init_params(jax.random.key(0), cfg)
    enc = SentenceEncoder(params, WordPieceTokenizer(vocab), cfg=cfg,
                          seq_buckets=(16, 32), batch_buckets=(1, 8, 32))
    enc._corpus = corpus
    return enc


def test_i4_fused_ingest_flat(mini_encoder):
    """FusedIngestPath on an i4 FlatIndex: in-program quantize_i4
    writes packed rows; searches hit the same pages the split path
    inserts."""
    from dawnsearch_tpu.index.provider import SearchProvider
    from dawnsearch_tpu.serving.batcher import EmbeddingBatcher
    from dawnsearch_tpu.serving.search_service import SearchService

    corpus = mini_encoder._corpus
    provider = SearchProvider(data_dir=None, dim=64, index_dtype="i4",
                              verify_on_load=False)
    batcher = EmbeddingBatcher(mini_encoder.encode, max_batch=8)
    svc = SearchService(provider, batcher)
    try:
        assert svc._fused_ingest is not None  # supports() gate open
        pages = [(f"https://i4/{i}", "t", corpus[i % 5] + f" {i}")
                 for i in range(12)]
        ids = svc.insert_pages(pages)
        assert all(i is not None for i in ids)
        assert provider.index.dtype == "i4"
        # 2 logical rows per stored byte-row, lane dim = full D
        assert provider.index._codes.shape[1] == 64
        res = svc.text_search("t\n" + pages[3][2], search_remote=False)
        assert res.pages[0].page_id == ids[3]
    finally:
        batcher.stop()
        svc.shutdown()


def test_i4_sharded_fused_ingest(mini_encoder):
    """ShardedFusedIngestPath on an i4 ShardedFlatIndex over the mesh."""
    from dawnsearch_tpu.parallel.mesh import make_mesh
    from dawnsearch_tpu.parallel.sharded_index import ShardedFlatIndex
    from dawnsearch_tpu.serving.fused import ShardedFusedIngestPath

    corpus = mini_encoder._corpus
    ix = ShardedFlatIndex(mesh=make_mesh(), dim=64, dtype="i4",
                          capacity_per_shard=16, segment=16)
    assert ShardedFusedIngestPath.supports(ix)
    path = ShardedFusedIngestPath(mini_encoder, ix)
    texts = [corpus[i % 5] + f" {i}" for i in range(20)]
    emb = path.ingest(texts)
    assert emb.shape == (20, 64) and len(ix) == 20
    d, u = ix.search(emb[:4] / np.linalg.norm(emb[:4], axis=1,
                                              keepdims=True), 1)
    assert (u[:, 0] == np.arange(4)).all()


# -- sharded tier ----------------------------------------------------------


def test_sharded_i4_end_to_end(unit_vectors):
    """i4 through ShardedFlatIndex on the 8-device mesh: stripe, search
    with f16 device re-rank, save/reload (same and re-striped shard
    counts), and the packed (S, cap, D/2) layout."""
    import tempfile

    from dawnsearch_tpu.parallel.mesh import make_mesh
    from dawnsearch_tpu.parallel.sharded_index import ShardedFlatIndex

    mesh = make_mesh()
    x = unit_vectors(1000)
    q = unit_vectors(6)
    ix = ShardedFlatIndex(mesh=mesh, dtype="i4", capacity_per_shard=256,
                          segment=256, exact="f16", rerank_extra=50)
    assert ix._codes.shape == (8, 128, 384)
    ids = ix.add(x)
    np.testing.assert_array_equal(ids, np.arange(1000))
    d, u = ix.search(q, 10)
    bd, bi = brute_force(q, x, 10)
    hits = np.mean([len(set(a) & set(b)) / 10 for a, b in zip(u, bi)])
    assert hits >= 0.95  # f16 re-rank erases i4 error at this N
    np.testing.assert_allclose(d[:, 0], bd[:, 0], atol=2e-3)

    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "s.npz")
        ix.save(p)
        # same shard count: buffers reload verbatim
        ix2 = ShardedFlatIndex.load(p, mesh=mesh)
        assert ix2.dtype == "i4" and ix2.dim == 384
        d2, u2 = ix2.search(q, 10)
        np.testing.assert_array_equal(u, u2)
        # different shard count: rows re-stripe through add() from the
        # f16 shadow
        from jax.sharding import Mesh
        import jax
        sub = Mesh(np.asarray(jax.devices()[:4]), ("shard",))
        ix3 = ShardedFlatIndex.load(p, mesh=sub)
        assert len(ix3) == 1000 and ix3.n_shards == 4
        d3, u3 = ix3.search(q, 10)
        hits3 = np.mean([len(set(a) & set(b)) / 10 for a, b in zip(u3, bi)])
        assert hits3 >= 0.9


def test_sharded_i4_fused_selector(unit_vectors):
    """Per-shard i4 Pallas score+select under shard_map (gate lowered
    for the CPU test — the i4 kernel variant running inside the
    sharded search program)."""
    from dawnsearch_tpu.parallel.mesh import make_mesh
    from dawnsearch_tpu.parallel.sharded_index import ShardedFlatIndex

    x = unit_vectors(4096)
    ix = ShardedFlatIndex(mesh=make_mesh(), dtype="i4", exact="f16",
                          capacity_per_shard=16384, segment=16384,
                          rerank_extra=50)
    ix.fused_min_rows = 0
    ix.add(x)
    d, u = ix.search(x[:8], 5)
    assert (u[:, 0] == np.arange(8)).all()
    assert np.all(d[:, 0] < 1e-2)
    assert np.all(np.diff(d, axis=1) >= -1e-6)


def test_sharded_i4_no_shadow_restripe(unit_vectors):
    """Re-striping an i4 snapshot WITHOUT an f16 shadow dequantizes the
    packed codes (the unpack_i4_np branch in load)."""
    import tempfile

    import jax
    from jax.sharding import Mesh
    from dawnsearch_tpu.parallel.mesh import make_mesh
    from dawnsearch_tpu.parallel.sharded_index import ShardedFlatIndex

    x = unit_vectors(400)
    ix = ShardedFlatIndex(mesh=make_mesh(), dtype="i4",
                          capacity_per_shard=128, segment=128)
    ix.add(x)
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "s.npz")
        ix.save(p)
        sub = Mesh(np.asarray(jax.devices()[:2]), ("shard",))
        ix2 = ShardedFlatIndex.load(p, mesh=sub)
        assert len(ix2) == 400
        # dequantized rows carry i4 error only: self-queries still hit
        d, u = ix2.search(x[:8], 1)
        assert (u[:, 0] == np.arange(8)).mean() >= 0.9


# -- provider integration --------------------------------------------------


def test_i4_legacy_dimplane_snapshot_migrates(tmp_path, unit_vectors):
    """Pre-round-4 snapshots stored per-row dim-plane nibbles
    ((cap, D/2), no i4_block key); load migrates them into the
    row-block layout and searches still self-hit."""
    x = unit_vectors(300)
    vals, scales = quantize_i4_vals_np(x)
    # old layout: byte j = dims j | D/2+j << 4, one packed row per row
    old = (vals[:, :192] | (vals[:, 192:] << 4)).astype(np.uint8)
    cap = 512
    old = np.pad(old, ((0, cap - 300), (0, 0)))
    p = os.path.join(tmp_path, "legacy.npz")
    np.savez(p, codes=old,
             scales=np.pad(scales, (0, cap - 300), constant_values=1.0),
             exact=np.empty(0), count=300, dtype="i4", dim=384)
    idx = FlatIndex.load(p)
    assert idx.dtype == "i4" and len(idx) == 300
    assert idx._codes.shape == (idx.capacity // 2, 384)
    d, i = idx.search(x[:8], 5)
    assert (i[:, 0] == np.arange(8)).all()
    # saving again writes the new layout (i4_block key present)
    p2 = os.path.join(tmp_path, "new.npz")
    idx.save(p2)
    with np.load(p2) as z:
        assert int(z["i4_block"]) == idx._i4_block
    idx2 = FlatIndex.load(p2)
    d2, i2 = idx2.search(x[:8], 5)
    np.testing.assert_array_equal(i, i2)


def test_i4_misaligned_chunk_rejected():
    """An i4 segment that neither aligns to the fused tile nor divides
    the scan chunk would break whole-block chunking — refused at
    construction with an actionable message."""
    with pytest.raises(ValueError, match="chunk % block"):
        FlatIndex(dtype="i4", capacity=192, segment=96, chunk=65536)


def test_i4_fetch_width_ladder():
    """The measured fetch-width ladder (ops/quant.i4_fetch_width):
    monotone in count, never below k, i8-default-compatible floor."""
    from dawnsearch_tpu.ops.quant import i4_fetch_width

    assert i4_fetch_width(100_000, 10) == 64
    assert i4_fetch_width(2_000_000, 10) == 128
    assert i4_fetch_width(8_000_000, 10) == 256
    assert i4_fetch_width(32_000_000, 10) == 512
    assert i4_fetch_width(100_000, 200) == 200  # never truncates k
    widths = [i4_fetch_width(n, 10)
              for n in (1, 10**5, 10**6, 4 * 10**6, 10**7, 10**8)]
    assert widths == sorted(widths)


def test_i4_device_rerank_widens_fetch(unit_vectors):
    """The DEVICE f16 re-rank paths use the same i4 ladder as the host
    path (review finding: they fetched the i8 k+30 default, which the
    study measured at 0.99x re-ranked recall on i4 codes)."""
    ix = FlatIndex(dtype="i4", exact="f16", rerank_extra=30)
    ix.add(unit_vectors(200))
    assert ix.device_fetch_width(10) == 64     # ladder, not 10 + 30
    assert ix.device_fetch_width(100) == 130   # k+extra once past the ladder

    from dawnsearch_tpu.parallel.sharded_index import ShardedFlatIndex
    sx = ShardedFlatIndex(dtype="i4", exact="f16", rerank_extra=30,
                          capacity_per_shard=1024, segment=1024)
    sx.add(unit_vectors(200))
    assert sx.device_fetch_width(10) == 64


def test_provider_i4_widens_fetch(unit_vectors):
    """SearchProvider asks an i4 index for the ladder width, not the
    i8 default k+30 (the CPU study measured 0.99x re-ranked recall at
    kf=40 — doc/performance.md i4 tier)."""
    from dawnsearch_tpu.index.provider import SearchProvider

    seen = {}

    class SpyIndex(FlatIndex):
        def search(self, queries, k):
            seen["k"] = k
            return super().search(queries, k)

    def factory():
        return SpyIndex(dtype="i4")
    factory.load_kwargs = {}

    sp = SearchProvider(index_factory=factory)
    vecs = unit_vectors(200)
    sp.insert_pages([f"http://x/{j}" for j in range(200)],
                    [f"t{j}" for j in range(200)],
                    [f"text {j}" for j in range(200)], vecs)
    sp.search_embeddings(vecs[:2], k=10)
    assert seen["k"] == 64  # ladder width at 200 rows, not 10 + 30


def test_provider_i4_end_to_end(tmp_path, unit_vectors):
    """index_dtype="i4" through SearchProvider: insert, search (host
    f32 re-rank engages: i4 is quantized storage), save, reload."""
    from dawnsearch_tpu.index.provider import SearchProvider

    d = str(tmp_path)
    sp = SearchProvider(data_dir=d, index_dtype="i4")
    vecs = unit_vectors(200)
    ids = sp.insert_pages([f"http://x/{j}" for j in range(200)],
                          [f"t{j}" for j in range(200)],
                          [f"text {j}" for j in range(200)], vecs)
    assert all(i is not None for i in ids)
    res = sp.search_embeddings(vecs[:3], k=5)
    # self-hits first: i4 raw error is erased by the host f32 re-rank
    assert [r.pages[0].url for r in res] == [f"http://x/{j}" for j in range(3)]
    assert all(r.pages[0].distance < 1e-4 for r in res)
    sp.save()
    sp2 = SearchProvider(data_dir=d, index_dtype="i4")
    assert len(sp2.index) == 200 and sp2.index.dtype == "i4"
    res2 = sp2.search_embeddings(vecs[:3], k=5)
    assert [r.pages[0].url for r in res2] == [f"http://x/{j}" for j in range(3)]


def test_i4_prepacked_stream_matches_rmw_adds(unit_vectors):
    """Host pre-packed block-aligned appends (round 5: the i4 bulk
    build ships 0.5 byte/dim and writes with a plain
    dynamic_update_slice) are BIT-IDENTICAL to the read-modify-write
    path taken by unaligned adds, including a misaligned commit of a
    block-multiple batch (pre-packed in _prepare, unpacked back in
    _commit) and the final search results."""
    rows = unit_vectors(160)
    # block = segment = 32 here, so 32/64-row batches pre-pack
    a = FlatIndex(dtype="i4", capacity=160, segment=32, chunk=32)
    a.add(rows[:64])          # aligned: direct packed write
    a.add(rows[64:80])        # 16 rows: RMW path (not a block multiple)
    a.add(rows[80:112])       # 32 rows at count=80: pre-packed but
    #                           MISALIGNED commit -> unpack fallback
    a.add(rows[112:160])      # 48 rows at count=112
    b = FlatIndex(dtype="i4", capacity=160, segment=32, chunk=32)
    for i in range(0, 160, 16):  # every commit misaligned-or-RMW-sized
        b.add(rows[i:i + 16])
    np.testing.assert_array_equal(np.asarray(a._codes),
                                  np.asarray(b._codes))
    np.testing.assert_array_equal(np.asarray(a._scales),
                                  np.asarray(b._scales))
    q = unit_vectors(8)
    da, ia = a.search(q, 5)
    db, ib = b.search(q, 5)
    np.testing.assert_array_equal(ia, ib)
    np.testing.assert_allclose(da, db, rtol=1e-6)
    # and add_stream (the bulk-build path) agrees too
    c = FlatIndex(dtype="i4", capacity=160, segment=32, chunk=32)
    c.add_stream(iter([rows[:96], rows[96:160]]))
    np.testing.assert_array_equal(np.asarray(a._codes),
                                  np.asarray(c._codes))
