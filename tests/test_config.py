"""Config layering tests (vs src/config.rs:42-73)."""

from dawnsearch_tpu.config import Config


def test_defaults():
    cfg = Config.load(path=None, env={})
    assert cfg.web is False
    assert cfg.data_dir == "data"
    assert cfg.index_capacity == 1_000_000


def test_file_then_env_override(tmp_path):
    toml = tmp_path / "DawnSearch.toml"
    toml.write_text('web = true\ndata_dir = "from_file"\ndebug = 1\n')
    cfg = Config.load(str(toml), env={"DAWNSEARCH_DATA_DIR": "from_env"})
    assert cfg.web is True
    assert cfg.data_dir == "from_env"  # env wins (config.rs:46-49)
    assert cfg.debug == 1


def test_env_coercion():
    env = {
        "DAWNSEARCH_UDP": "true",
        "DAWNSEARCH_DEBUG": "2",
        "DAWNSEARCH_TRACKERS": "t1:7230, t2:7230",
        "DAWNSEARCH_EMBED_MAX_WAIT_MS": "2.5",
        "DAWNSEARCH_SEQ_BUCKETS": "32,64",
    }
    cfg = Config.load(path=None, env=env)
    assert cfg.udp is True
    assert cfg.debug == 2
    assert cfg.trackers == ["t1:7230", "t2:7230"]
    assert cfg.embed_max_wait_ms == 2.5
    assert cfg.seq_buckets == (32, 64)


def test_summary_prints_all_flags():
    s = Config.load(path=None, env={}).summary()
    assert "index_cc" in s and "trackers" in s
