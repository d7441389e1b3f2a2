"""AutoIndex (examples/auto_index.py — demoted experiment, round 3):
flat->IVF upgrade, id stability, persistence in both stages."""

import numpy as np

from tests.conftest import load_example

AutoIndex = load_example("auto_index").AutoIndex


def test_upgrade_preserves_ids(unit_vectors):
    x = unit_vectors(600)
    ix = AutoIndex(dtype="f32", n_centroids=8, nprobe=8, train_threshold=256)
    ids0 = ix.add(x[:200])
    assert ix.ivf is None
    ids1 = ix.add(x[200:])  # crosses threshold -> upgrade
    assert ix.ivf is not None and ix.flat is None
    assert len(ix) == 600
    np.testing.assert_array_equal(ids0, np.arange(200))
    np.testing.assert_array_equal(ids1, np.arange(200, 600))
    # full probe: every original row findable under its original id
    d, i = ix.search(x[:32], k=1)
    np.testing.assert_array_equal(i[:, 0], np.arange(32))
    assert np.all(d[:, 0] < 1e-3)


def test_flat_stage_exact(unit_vectors):
    x = unit_vectors(100)
    ix = AutoIndex(train_threshold=1000)
    ix.add(x)
    d, i = ix.search(x[:5], k=3)
    np.testing.assert_array_equal(i[:, 0], np.arange(5))


def test_save_load_flat_stage(tmp_path, unit_vectors):
    x = unit_vectors(50)
    ix = AutoIndex(train_threshold=1000)
    ix.add(x)
    p = str(tmp_path / "auto.npz")
    ix.save(p)
    ld = AutoIndex.load(p)  # product load_index no longer routes here
    assert isinstance(ld, AutoIndex) and ld.ivf is None and len(ld) == 50
    np.testing.assert_array_equal(ld.search(x[:4], 2)[1], ix.search(x[:4], 2)[1])
    ld.add(unit_vectors(3))
    assert len(ld) == 53


def test_save_load_ivf_stage(tmp_path, unit_vectors):
    x = unit_vectors(300)
    ix = AutoIndex(dtype="i8", n_centroids=4, nprobe=4, train_threshold=128)
    ix.add(x)
    assert ix.ivf is not None
    p = str(tmp_path / "auto.npz")
    ix.save(p)
    ld = AutoIndex.load(p)
    assert ld.ivf is not None and len(ld) == 300
    np.testing.assert_array_equal(ld.search(x[:4], 3)[1], ix.search(x[:4], 3)[1])
