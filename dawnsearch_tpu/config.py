"""Layered config: TOML file + DAWNSEARCH_* env-var overrides.

Rebuild of the reference config system (/root/reference/src/config.rs:23-88):
same 10 core flags and layering semantics (file then env, env wins,
config.rs:46-49), plus a TPU engine section the reference has no
equivalent for (batching, index capacity, quantization, mesh shape).
"""

from __future__ import annotations

import dataclasses
import os
import tomllib
from typing import Any

ENV_PREFIX = "DAWNSEARCH_"


@dataclasses.dataclass
class Config:
    # --- reference flags (config.rs:54-71, DawnSearch.toml.example) ---
    index_cc: bool = False
    web: bool = False
    web_listen_address: str = "0.0.0.0:8080"
    udp: bool = False
    udp_listen_address: str = "0.0.0.0:7231"
    accept_insert: bool = False
    upnp: bool = False
    trackers: list[str] = dataclasses.field(default_factory=list)
    data_dir: str = "data"
    debug: int = 0

    # --- TPU engine section (new) ---
    # safetensors + vocab.txt + config.json; shapes and model family
    # (BERT/MiniLM or MPNet) are read from config.json — drop
    # all-MiniLM-L6-v2 or all-mpnet-base-v2 here (models/weights.py)
    model_dir: str | None = None
    embed_batch_size: int = 64  # cross-request batching cap
    # pages per ingest batch (tokenize + one fused device program +
    # one store transaction). 512 won the round-3 concurrent-load soak
    # on BOTH axes (4.2k pages/s under 4-thread query load at p99
    # 324-335 ms, vs 1024's 2.9k at 657 ms and 256's 2.3k at 406 ms —
    # doc/performance.md "Concurrent-load soak"); batches amortize the
    # ~80 ms tunneled dispatch round-trip, but a 1024 encode blocks the
    # device queue twice as long per program for queries sharing the
    # chip. When the chip is QUERY-IDLE the insert thread coalesces
    # waiting batches up to the encoder's top bucket automatically
    # (extraction_service.py QUERY_IDLE_S), so standalone backfills
    # still get batch-1024 dispatch amortization — this size is the
    # under-load operating point only.
    ingest_batch_size: int = 512
    # extraction worker processes (0 = in-thread). The extraction
    # thread's Python share serializes with tokenize/insert on the GIL
    # at ~3k pages/s; workers break that for long production runs at a
    # few seconds of startup each (doc/performance.md). Workers spawn
    # fresh interpreters: if you embed DawnNode in your own script,
    # guard its entry point with `if __name__ == "__main__":` (standard
    # multiprocessing contract; `python -m dawnsearch_tpu` is guarded)
    ingest_workers: int = 0
    # pages/s ceiling for background ingest (0 = unlimited). Ingest
    # encodes share the chip with queries; the measured operating
    # points live ONCE, in doc/performance.md "Concurrent-load soak"
    # (e.g. 2200 held query p99 ~246 ms on one v5e; unlimited reached
    # ~4.2k pages/s at p99 ~330 ms).
    ingest_rate_limit: float = 0.0
    # how recently a query must have dispatched (seconds) to suppress
    # ingest batch coalescing — the knob between bulk-backfill dispatch
    # amortization and query tail latency. Sweep measured in
    # doc/performance.md "Concurrent-load soak" (round-5).
    ingest_query_idle_s: float = 2.0
    embed_max_wait_ms: float = 5.0  # batcher flush deadline
    # 512 matches the reference's full BERT window (model.rs:123,147);
    # a 2048-char page (page_source.rs:113) is ~400-500 tokens.
    seq_buckets: tuple[int, ...] = (16, 32, 64, 128, 256, 512)
    compute_dtype: str = "bf16"  # encoder matmul dtype: "bf16" | "f32"
    attn_impl: str = "fused"  # "fused" (packed Pallas) | "xla"
    # "layer" (whole-layer Pallas) | "layer_i8" (W8A8 projections —
    # +21/+28% at BERT-base/large widths, a LOSS at MiniLM; see
    # doc/performance.md "i8 projections") | "ops" (per-op kernels)
    layer_impl: str = "layer"
    pool_impl: str = "xla"  # "xla" | "fused"
    index_capacity: int = 1_000_000  # page cap (search_provider.rs:164-166)
    index_dtype: str = "i8"  # "f32" | "bf16" | "i8" | "i4" (capacity tier)
    index_kind: str = "flat"  # "flat" | "sharded" (device-parallel);
    # "ivf" was removed in round 3 — measured 53x slower than flat at
    # LOWER recall even on clustered corpora (doc/performance.md);
    # the experiment lives in examples/ivf_index.py
    # "host" re-ranks quantized candidates with the store's f32 rows;
    # "device" keeps an f16 shadow buffer on the chip and re-ranks inside
    # the search program (+2 bytes/dim HBM, no host round-trip)
    index_rerank: str = "host"
    # DEPRECATED (round 3): parsed for old-TOML compatibility only —
    # index_kind="ivf" was removed (see index_kind above); these flags
    # have no effect. The experiment keeps them as constructor args in
    # examples/ivf_index.py / examples/auto_index.py.
    ivf_ncentroids: int = 256
    ivf_nprobe: int = 16
    ivf_train_threshold: int = 100_000
    ivf_multi_assign: int = 1
    mesh_shards: int = 0  # device-parallel index shards; 0 = all devices
    search_k: int = 20  # results per query (search_provider.rs:214)
    # "dawn" (versionable msgpack) | "reference" (rmp-serde byte-compat,
    # joins a reference swarm; decode always accepts both)
    wire_format: str = "dawn"
    # "auto" (the default: i8 on the dawn wire, i24 on the reference
    # wire) | "i24" (3 B/dim, reference-parity) | "i8" (1 B/dim + scale:
    # Search/Embedding packets drop ~1180 B -> ~420 B at a cosine
    # perturbation ~4e-5, far below the selector's re-rank floor —
    # measured 2.8x query bytes at equal results, tests/test_two_phase).
    # i8 is dawn-format only — the reference layout is fixed i24; every
    # dawn decoder accepts both, so i8 and i24 nodes interoperate
    # per-frame and "auto" never changes what a node can DECODE.
    wire_embedding: str = "auto"
    search_deadline_ms: float = 200.0  # P2P collection deadline (udp_service.rs:301)
    # Two-phase remote search (the reference's own sketched evolution,
    # udp_packets.rs:40-43 commented-out SearchSummary/PageRequest):
    # responders reply with tiny distance summaries, the searcher merges
    # globally and requests only the winning pages — measured ~3x fewer
    # reply bytes at equal results (tests/test_two_phase.py) for one
    # extra round-trip, so it defaults ON. Dawn wire format only
    # (auto-disabled under wire_format="reference"); legacy/reference
    # peers still answer with full pages and merge fine
    # (doc/networking.md "mixed swarms").
    two_phase_search: bool = True
    announce_interval_s: float = 60.0  # tracker heartbeat (dawnsearch.rs:122-128)
    jax_platform: str = ""  # "" = default; "cpu" forces host platform
    jax_cpu_devices: int = 0  # >0: virtual host device count (testing)
    warc_source: str = ""  # glob of local WARC files; "" = Common Crawl
    warmup: bool = False  # pre-compile the encoder bucket grid at boot
    compilation_cache: bool = False  # persist XLA compiles under data_dir
    # --- multi-host (DCN) tier (parallel/multihost.py) ---
    # One sharded index spanning several JAX processes: process 0 runs
    # the full node, the rest run SPMD followers. Requires
    # index_kind="sharded" and a shared data_dir. "" = single-process.
    dist_coordinator: str = ""  # jax.distributed coordinator host:port
    dist_num_processes: int = 1
    dist_process_id: int = 0
    dist_ping_interval: float = 60.0  # follower keepalive frame
    dist_control_port: int = 0  # leader control-stream TCP port
    #                             (0 = coordinator port + 1)
    # ADD coalescing: queue leader-side adds and broadcast one combined
    # plan at this many rows (or before any search/save). 1 disables.
    # Measured: per-op control-plane cost amortizes ~linearly
    # (doc/multihost.md "Measured control-plane cost").
    dist_add_flush_rows: int = 8192

    @classmethod
    def load(cls, path: str | None = "DawnSearch.toml", env: dict | None = None) -> "Config":
        """File (if present) then DAWNSEARCH_* env overrides (config.rs:42-73)."""
        raw: dict[str, Any] = {}
        if path and os.path.exists(path):
            with open(path, "rb") as f:
                raw.update(tomllib.load(f))
        env = dict(os.environ if env is None else env)
        fields = {f.name: f for f in dataclasses.fields(cls)}
        for key, val in env.items():
            if not key.startswith(ENV_PREFIX):
                continue
            name = key[len(ENV_PREFIX):].lower()
            if name in fields:
                raw[name] = _coerce(val, fields[name].type)
        known = {k: v for k, v in raw.items() if k in fields}
        cfg = cls(**known)
        if isinstance(cfg.seq_buckets, list):
            cfg.seq_buckets = tuple(cfg.seq_buckets)
        return cfg

    def summary(self) -> str:
        """Printable flag summary (reference config.rs:75-88)."""
        lines = [f"[Config] {f.name} = {getattr(self, f.name)!r}"
                 for f in dataclasses.fields(self)]
        return "\n".join(lines)


def _coerce(val: str, typ: Any) -> Any:
    t = str(typ)
    if "bool" in t:
        return val.strip().lower() in ("1", "true", "yes", "on")
    if "int" in t and "tuple" not in t and "list" not in t:
        return int(val)
    if "float" in t:
        return float(val)
    if "list" in t or "tuple" in t:
        items = [x.strip() for x in val.split(",") if x.strip()]
        if "int" in t:
            return tuple(int(x) for x in items)
        return items
    return val
