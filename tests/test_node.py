"""Node bootstrap: config -> services -> HTTP, persistence across restarts."""

import hashlib
import json
import urllib.request

import numpy as np
import pytest

from dawnsearch_tpu.config import Config
from dawnsearch_tpu.node import DawnNode, random_instance_id


class HashEncoder:
    """Deterministic stand-in for the model (node tests don't need BERT)."""

    def encode(self, texts):
        out = []
        for t in texts:
            seed = int.from_bytes(hashlib.md5(t.encode()).digest()[:4], "little")
            v = np.random.default_rng(seed).standard_normal(384).astype(np.float32)
            out.append(v / np.linalg.norm(v))
        return np.stack(out)


def make_cfg(tmp_path, **kw):
    cfg = Config()
    cfg.data_dir = str(tmp_path / "data")
    cfg.web = True
    cfg.web_listen_address = "127.0.0.1:0"
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


def get_json(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def post_json(url, obj):
    req = urllib.request.Request(
        url, data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=10) as r:
        return json.loads(r.read())


def test_instance_id_shape():
    a, b = random_instance_id(), random_instance_id()
    assert len(a) == 16 and a.isalnum() and a != b


def test_node_end_to_end_and_persistence(tmp_path):
    cfg = make_cfg(tmp_path)
    with DawnNode(cfg, encoder=HashEncoder()) as node:
        base = f"http://127.0.0.1:{node.http_port}"
        post_json(base + "/api/insert", {"pages": [
            {"url": f"https://e.com/{i}", "title": f"T{i}", "text": f"body {i}"}
            for i in range(10)]})
        data = get_json(base + "/api/search?q=T3%0Abody+3")
        assert data["results"][0]["url"] == "https://e.com/3"
        assert get_json(base + "/api/stats")["pages_indexed"] == 10
        inst = node.instance_id

    # restart on the same data dir: snapshot (saved at shutdown) reloads
    with DawnNode(cfg, encoder=HashEncoder()) as node2:
        base = f"http://127.0.0.1:{node2.http_port}"
        assert get_json(base + "/api/stats")["pages_indexed"] == 10
        data = get_json(base + "/api/search?q=T3%0Abody+3")
        assert data["results"][0]["url"] == "https://e.com/3"
        assert node2.instance_id != inst  # fresh id per process


def test_node_rebuild_without_snapshot(tmp_path):
    cfg = make_cfg(tmp_path)
    with DawnNode(cfg, encoder=HashEncoder()) as node:
        base = f"http://127.0.0.1:{node.http_port}"
        post_json(base + "/api/insert", {"pages": [
            {"url": "https://e.com/a", "title": "Alpha", "text": "first"}]})
    # delete the snapshot; the store must rebuild the index
    import os
    from dawnsearch_tpu.index.provider import INDEX_FILE
    os.remove(os.path.join(cfg.data_dir, INDEX_FILE))
    with DawnNode(cfg, encoder=HashEncoder()) as node2:
        base = f"http://127.0.0.1:{node2.http_port}"
        data = get_json(base + "/api/search?q=Alpha%0Afirst")
        assert data["results"][0]["url"] == "https://e.com/a"


def test_node_ivf_config_removed(tmp_path):
    """index_kind="ivf" left the product tree in round 3 (53x slower
    than flat at lower recall in its own best regime); the config must
    fail fast with a pointer, not silently serve a worse engine."""
    import pytest

    cfg = make_cfg(tmp_path, index_kind="ivf")
    with pytest.raises(ValueError, match="removed"):
        DawnNode(cfg, encoder=HashEncoder())


def test_node_migrates_legacy_auto_snapshot(tmp_path):
    """A node restarted on a round-2 era AutoIndex snapshot rebuilds
    the index from the page store as the configured (flat) kind — the
    demotion migrates data automatically."""
    cfg = make_cfg(tmp_path)
    with DawnNode(cfg, encoder=HashEncoder()) as node:
        base = f"http://127.0.0.1:{node.http_port}"
        post_json(base + "/api/insert", {"pages": [
            {"url": f"https://e.com/{i}", "title": f"T{i}", "text": f"b {i}"}
            for i in range(5)]})
    # overwrite the snapshot with an auto-kind one (legacy layout)
    import numpy as np

    from dawnsearch_tpu.index.provider import INDEX_FILE
    import os
    np.savez(os.path.join(cfg.data_dir, "legacy"), kind="auto",
             stage="flat", payload=np.zeros(4, np.uint8),
             n_centroids=4, nprobe=4, train_threshold=-1,
             multi_assign=1, dtype="i8", dim=384)
    os.replace(os.path.join(cfg.data_dir, "legacy.npz"),
               os.path.join(cfg.data_dir, INDEX_FILE))
    with DawnNode(cfg, encoder=HashEncoder()) as node:
        base = f"http://127.0.0.1:{node.http_port}"
        assert get_json(base + "/api/stats")["pages_indexed"] == 5
        data = get_json(base + "/api/search?q=T2%0Ab+2")
        assert data["results"][0]["url"] == "https://e.com/2"


def test_node_device_rerank_config(tmp_path):
    """index_rerank="device" end-to-end through the product surface:
    insert -> search (pre-ranked on device) -> snapshot reload keeps
    the f16 shadow."""
    cfg = make_cfg(tmp_path, index_rerank="device")
    with DawnNode(cfg, encoder=HashEncoder()) as node:
        assert node.provider.index.device_rerank
        base = f"http://127.0.0.1:{node.http_port}"
        post_json(base + "/api/insert", {"pages": [
            {"url": f"https://r.com/{i}", "title": f"T{i}", "text": f"body {i}"}
            for i in range(12)]})
        data = get_json(base + "/api/search?q=T5%0Abody+5")
        assert data["results"][0]["url"] == "https://r.com/5"
        ds = [r["distance"] for r in data["results"]]
        assert ds == sorted(ds)
    with DawnNode(cfg, encoder=HashEncoder()) as node2:
        assert node2.provider.index.device_rerank  # shadow survived reload
        base = f"http://127.0.0.1:{node2.http_port}"
        data = get_json(base + "/api/search?q=T5%0Abody+5")
        assert data["results"][0]["url"] == "https://r.com/5"
