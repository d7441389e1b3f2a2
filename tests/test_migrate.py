"""Reference data_dir takeover: adoption + migrate tool.

A reference deployment's data_dir holds `dawnsearch.sqlite`
(/root/reference/src/search/search_provider.rs:81-99) and
`index.usearch`. Switching to this node must work without a manual
export: SearchProvider adopts the reference store in place and rebuilds
the device index from it; `python -m dawnsearch_tpu migrate` compacts
the stores adoption can't serve directly (id gaps, corrupt rows).
"""

from __future__ import annotations

import os
import sqlite3

import numpy as np
import pytest

from dawnsearch_tpu.index.migrate import migrate_data_dir, migrate_store
from dawnsearch_tpu.index.provider import SearchProvider
from dawnsearch_tpu.ops.vector import embedding_to_bytes


def make_reference_db(path: str, rows, with_unique_index: bool = False):
    """Write a DB with the REFERENCE's exact schema (search_provider.rs:
    84-99): `text INTEGER NOT NULL` declared affinity and a NON-unique
    find_by_url index. `rows` = [(id, url, title, text, emb), ...]."""
    conn = sqlite3.connect(path)
    conn.execute(
        "CREATE TABLE IF NOT EXISTS page ("
        " id INTEGER PRIMARY KEY, url TEXT NOT NULL,"
        " title TEXT NOT NULL, text INTEGER NOT NULL,"
        " embedding BLOB NOT NULL)")
    conn.execute("CREATE INDEX IF NOT EXISTS find_by_url on page(url)")
    for row_id, url, title, text, emb in rows:
        conn.execute(
            "INSERT INTO page (id, url, title, text, embedding) "
            "VALUES (?,?,?,?,?)",
            (row_id, url, title, text, embedding_to_bytes(emb)))
    conn.commit()
    conn.close()


def unit_rows(n: int, start_id: int = 1, seed: int = 0):
    rng = np.random.default_rng(seed)
    embs = rng.standard_normal((n, 384)).astype(np.float32)
    embs /= np.linalg.norm(embs, axis=1, keepdims=True)
    return [(start_id + i, f"https://ref.example/{start_id + i}",
             f"title {start_id + i}", f"text {start_id + i}", embs[i])
            for i in range(n)], embs


def test_provider_adopts_reference_store(tmp_path):
    rows, embs = unit_rows(64)
    make_reference_db(str(tmp_path / "dawnsearch.sqlite"), rows)
    (tmp_path / "index.usearch").write_bytes(b"opaque hnsw bytes")

    prov = SearchProvider(data_dir=str(tmp_path), max_pages=1000)
    assert len(prov.store) == 64
    assert len(prov.index) == 64
    # search returns the right page through the adopted store's join
    res = prov.search_embeddings(embs[7:8], k=3)[0]
    assert res.pages[0].url == "https://ref.example/8"
    # inserts keep flowing into the adopted store
    new = embs[0:1] * -1.0
    ids = prov.insert_pages(["https://new.example/1"], ["t"], ["x"], new)
    assert ids == [65]
    prov.shutdown()
    # no pages.sqlite was created; the reference file kept growing
    assert not (tmp_path / "pages.sqlite").exists()


def test_adoption_prefers_existing_pages_sqlite(tmp_path):
    # both files present: pages.sqlite wins (adoption is for fresh dirs)
    rows, _ = unit_rows(4)
    _, embs2 = unit_rows(2, seed=1)
    make_reference_db(str(tmp_path / "dawnsearch.sqlite"), rows)
    p1 = SearchProvider(data_dir=str(tmp_path), max_pages=10)
    assert len(p1.store) == 4  # adopted (no pages.sqlite yet)
    p1.shutdown()

    os.rename(tmp_path / "dawnsearch.sqlite", tmp_path / "moved.sqlite")
    p2 = SearchProvider(data_dir=str(tmp_path), max_pages=10)
    p2.insert_pages(["https://a/1"], ["t"], ["x"], embs2[:1])
    p2.shutdown()  # creates an empty-then-1-row pages.sqlite
    os.rename(tmp_path / "moved.sqlite", tmp_path / "dawnsearch.sqlite")

    p3 = SearchProvider(data_dir=str(tmp_path), max_pages=10)
    assert len(p3.store) == 1  # pages.sqlite, not the 4-row reference db
    p3.shutdown()


def test_duplicate_urls_fall_back_to_checked_inserts(tmp_path):
    rows, embs = unit_rows(6)
    # the reference's check-then-insert guard is not transactional —
    # simulate the duplicate it can leak
    rows[3] = (rows[3][0], rows[2][1], "dup title", "dup text",
               rows[3][4])
    make_reference_db(str(tmp_path / "dawnsearch.sqlite"), rows)

    prov = SearchProvider(data_dir=str(tmp_path), max_pages=1000)
    assert not prov.store._unique_url  # unique index refused, fallback on
    assert len(prov.store) == 6
    # dup-skip semantics survive without the unique index
    ids = prov.insert_pages([rows[0][1]], ["t"], ["x"], embs[:1])
    assert ids == [None]
    ids = prov.insert_pages(["https://novel.example/"], ["t"], ["x"],
                            embs[:1])
    assert ids == [7]
    prov.shutdown()


def test_gappy_ids_refused_then_migrated(tmp_path):
    rows, embs = unit_rows(8)
    del rows[4]  # ids 1,2,3,4,6,7,8 — breaks row_id = store_id - 1
    make_reference_db(str(tmp_path / "dawnsearch.sqlite"), rows)

    with pytest.raises(ValueError, match="migrate"):
        SearchProvider(data_dir=str(tmp_path), max_pages=1000)

    summary = migrate_data_dir(str(tmp_path))
    assert summary["copied"] == 7
    assert (tmp_path / "pages.sqlite").exists()
    prov = SearchProvider(data_dir=str(tmp_path), max_pages=1000)
    assert len(prov.store) == 7 and len(prov.index) == 7
    # row 6 in the source (embs[5]) is findable post-compaction
    res = prov.search_embeddings(embs[5:6], k=1)[0]
    assert res.pages[0].url == "https://ref.example/6"
    prov.shutdown()


def test_migrate_skips_corrupt_and_duplicate_rows(tmp_path):
    rows, _ = unit_rows(5)
    make_reference_db(str(tmp_path / "dawnsearch.sqlite"), rows)
    conn = sqlite3.connect(tmp_path / "dawnsearch.sqlite")
    conn.execute("INSERT INTO page (id, url, title, text, embedding) "
                 "VALUES (9, 'https://bad/', 't', 'x', ?)", (b"short",))
    conn.execute("INSERT INTO page (id, url, title, text, embedding) "
                 "VALUES (10, ?, 't', 'x', ?)",
                 (rows[0][1], embedding_to_bytes(rows[1][4])))
    conn.commit()
    conn.close()

    summary = migrate_data_dir(str(tmp_path))
    assert summary == {"source_rows": 7, "copied": 5,
                       "skipped_corrupt": 1, "skipped_duplicate_url": 1}


def test_migrate_compacts_gappy_pages_sqlite_with_backup(tmp_path):
    rows, embs = unit_rows(4)
    del rows[1]
    make_reference_db(str(tmp_path / "pages.sqlite"), rows)

    summary = migrate_data_dir(str(tmp_path))
    assert summary["copied"] == 3
    assert os.path.exists(summary["backup"])
    prov = SearchProvider(data_dir=str(tmp_path), max_pages=100)
    assert len(prov.index) == 3
    prov.shutdown()


def test_migrate_refuses_overwrite(tmp_path):
    rows, _ = unit_rows(2)
    make_reference_db(str(tmp_path / "dawnsearch.sqlite"), rows)
    (tmp_path / "pages.sqlite.migrating").write_bytes(b"")
    # a dead staging file is cleared, but an existing destination is not
    with pytest.raises(FileExistsError):
        migrate_store(str(tmp_path / "dawnsearch.sqlite"),
                      str(tmp_path / "dawnsearch.sqlite"))


def test_interrupted_migration_leaves_no_partial_store(tmp_path,
                                                       monkeypatch):
    """A migrate run that dies mid-copy must not leave a partial (or
    empty) pages.sqlite shadowing the reference data — the copy lands
    in a staging file and only an atomic rename publishes it."""
    rows, _ = unit_rows(6)
    make_reference_db(str(tmp_path / "dawnsearch.sqlite"), rows)

    from dawnsearch_tpu.index.store import PageStore
    real_insert = PageStore.insert
    calls = {"n": 0}

    def dying_insert(self, *a, **kw):
        calls["n"] += 1
        if calls["n"] == 4:
            raise RuntimeError("disk full")
        return real_insert(self, *a, **kw)

    monkeypatch.setattr(PageStore, "insert", dying_insert)
    with pytest.raises(RuntimeError, match="disk full"):
        migrate_data_dir(str(tmp_path))
    monkeypatch.setattr(PageStore, "insert", real_insert)

    # the die left only staging debris; adoption/migration still sees
    # the untouched reference store
    assert not (tmp_path / "pages.sqlite").exists()
    summary = migrate_data_dir(str(tmp_path))
    assert summary["copied"] == 6
    prov = SearchProvider(data_dir=str(tmp_path), max_pages=100)
    assert len(prov.index) == 6
    prov.shutdown()


def test_second_compaction_refuses_to_clobber_backup(tmp_path):
    """pages.sqlite.pre-migrate may be the only copy of rows a previous
    migration skipped — a re-run must refuse, not overwrite it."""
    rows, _ = unit_rows(4)
    del rows[1]
    make_reference_db(str(tmp_path / "pages.sqlite"), rows)
    summary = migrate_data_dir(str(tmp_path))
    assert os.path.exists(summary["backup"])
    with pytest.raises(FileExistsError, match="pre-migrate"):
        migrate_data_dir(str(tmp_path))
    # the refusal cost nothing: store and backup both intact
    prov = SearchProvider(data_dir=str(tmp_path), max_pages=100)
    assert len(prov.index) == 3
    prov.shutdown()


def test_adopting_oversized_store_names_the_cap(tmp_path):
    """A reference store larger than max_pages must fail the rebuild
    with the remedy (raise max_pages), not a bare 'index full'."""
    rows, _ = unit_rows(8)
    make_reference_db(str(tmp_path / "dawnsearch.sqlite"), rows)
    with pytest.raises(ValueError, match="max_pages"):
        SearchProvider(data_dir=str(tmp_path), max_pages=4)
    # ...and the refusal closed the store: the adopted file is free to
    # be migrated/moved immediately (no lingering connection)
    prov = SearchProvider(data_dir=str(tmp_path), max_pages=100)
    assert len(prov.index) == 8
    prov.shutdown()


def test_constructor_raise_closes_store(tmp_path, monkeypatch):
    rows, _ = unit_rows(5)
    del rows[2]  # gappy -> contiguity refusal
    make_reference_db(str(tmp_path / "dawnsearch.sqlite"), rows)
    from dawnsearch_tpu.index.store import PageStore
    closed = []
    real_close = PageStore.close
    monkeypatch.setattr(PageStore, "close",
                        lambda self: (closed.append(True),
                                      real_close(self))[1])
    with pytest.raises(ValueError, match="migrate"):
        SearchProvider(data_dir=str(tmp_path), max_pages=100)
    assert closed


def test_migrate_cli(tmp_path, capsys):
    rows, _ = unit_rows(3)
    make_reference_db(str(tmp_path / "dawnsearch.sqlite"), rows)
    from dawnsearch_tpu.__main__ import main
    assert main(["migrate", "--data-dir", str(tmp_path)]) == 0
    out = capsys.readouterr().out
    assert '"copied": 3' in out
    assert (tmp_path / "pages.sqlite").exists()


def test_migrate_infers_dim_from_store(tmp_path, unit_vectors):
    """migrate hard-coded dim=384; a 768-dim (MPNet) store had EVERY
    row counted corrupt and an empty pages.sqlite swapped in (round-3
    review). dim now comes from the first stored blob."""
    import numpy as np

    from dawnsearch_tpu.index.migrate import migrate_data_dir
    from dawnsearch_tpu.index.store import PageStore

    d = tmp_path / "mp"
    d.mkdir()
    rng = np.random.default_rng(5)
    v = rng.standard_normal((3, 768)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    st = PageStore(str(d / "dawnsearch.sqlite"), dim=768)
    for i in range(3):
        st.insert(f"http://m/{i}", f"t{i}", f"x{i}", v[i])
    st.close()
    summary = migrate_data_dir(str(d))
    assert summary["copied"] == 3 and summary["skipped_corrupt"] == 0
    out = PageStore(str(d / "pages.sqlite"), dim=768)
    assert len(out) == 3
    out.close()


def test_cli_migrate_honors_pre_subcommand_flags(tmp_path, unit_vectors):
    """`--data-dir X migrate` must migrate X: argparse subparsers that
    redefine a parent dest clobber parent-parsed values with their
    defaults (verified on 3.12), so migrate once ran against the
    default config's data_dir instead (round-3 review)."""
    import numpy as np

    from dawnsearch_tpu.__main__ import main
    from dawnsearch_tpu.index.store import PageStore

    d = tmp_path / "cli"
    d.mkdir()
    v = unit_vectors(2)
    st = PageStore(str(d / "dawnsearch.sqlite"))
    st.insert("http://c/0", "t", "x", v[0])
    st.close()
    rc = main(["--data-dir", str(d), "migrate"])
    assert rc == 0
    out = PageStore(str(d / "pages.sqlite"))
    assert len(out) == 1
    out.close()
    # the post-subcommand form keeps working too
    d2 = tmp_path / "cli2"
    d2.mkdir()
    st = PageStore(str(d2 / "dawnsearch.sqlite"))
    st.insert("http://c/1", "t", "x", v[1])
    st.close()
    assert main(["migrate", "--data-dir", str(d2)]) == 0
    out = PageStore(str(d2 / "pages.sqlite"))
    assert len(out) == 1
    out.close()
