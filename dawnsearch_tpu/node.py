"""DawnNode: process bootstrap — wire config -> services, run, shut down.

Rebuild of the reference's main-binary bootstrap
(/root/reference/src/bin/dawnsearch.rs:37-154): load config, create the
data dir, start the embedding path, the search provider/service, the
save timer (10 min, dawnsearch.rs:81-88), the HTTP frontend if `web`,
the Common Crawl extractor if `index_cc`, the UDP P2P service if `udp`,
then wait for SIGINT/SIGTERM and shut everything down saving the index
(dawnsearch.rs:141-152).
"""

from __future__ import annotations

import os
import random
import string
import threading

from dawnsearch_tpu.config import Config
from dawnsearch_tpu.utils.logging import service_logger, set_debug

log = service_logger("Node")

SAVE_INTERVAL_S = 600.0  # reference: 10-minute save timer (dawnsearch.rs:84)


def random_instance_id(n: int = 16) -> str:
    """16 random alphanumerics (udp_service.rs:150-154)."""
    alphabet = string.ascii_letters + string.digits
    return "".join(random.choice(alphabet) for _ in range(n))


def make_encoder(cfg: Config):
    """Build the SentenceEncoder: pretrained weights + vocab from
    cfg.model_dir when present, self-contained fallback otherwise
    (the reference downloads from HF Hub, embedding_service.rs:60-85;
    this environment is zero-egress so weights are provided locally)."""
    from dawnsearch_tpu.models.encoder import SentenceEncoder
    from dawnsearch_tpu.models.tokenizer import build_vocab_from_corpus
    from dawnsearch_tpu.models.tokenizer_native import best_tokenizer
    from dawnsearch_tpu.models.weights import load_params

    import jax.numpy as jnp

    from dawnsearch_tpu.models.bert import BertConfig

    base_cfg = BertConfig(
        dtype=jnp.bfloat16 if cfg.compute_dtype == "bf16" else jnp.float32,
        attn_impl=cfg.attn_impl, pool_impl=cfg.pool_impl,
        layer_impl=cfg.layer_impl)
    params, pretrained, bert_cfg = load_params(cfg.model_dir, cfg=base_cfg)
    vocab_path = (os.path.join(cfg.model_dir, "vocab.txt")
                  if cfg.model_dir else None)
    bpe_vocab = (os.path.join(cfg.model_dir, "vocab.json")
                 if cfg.model_dir else None)
    bpe_merges = (os.path.join(cfg.model_dir, "merges.txt")
                  if cfg.model_dir else None)
    have_vocab = False
    if bpe_vocab and os.path.exists(bpe_vocab) and os.path.exists(bpe_merges):
        # RoBERTa-family checkpoints ship a byte-level BPE vocab
        # (vocab.json + merges.txt), not a WordPiece vocab.txt
        from dawnsearch_tpu.models.tokenizer_bpe_native import \
            best_bpe_tokenizer
        tok = best_bpe_tokenizer(bpe_vocab, bpe_merges)  # C++ when built
        have_vocab = True
    else:
        if vocab_path and os.path.exists(vocab_path):
            vocab = {}
            with open(vocab_path, encoding="utf-8") as f:
                for i, line in enumerate(f):
                    vocab[line.rstrip("\r\n")] = i
            have_vocab = True
        else:
            corpus = [string.ascii_lowercase, string.digits,
                      "the quick brown fox jumps over the lazy dog"]
            vocab = build_vocab_from_corpus(corpus, size=4096)
            if pretrained:
                log.warning(
                    "pretrained weights but no vocab.txt / "
                    "vocab.json+merges.txt — tokenization will not "
                    "match the checkpoint")
        tok = best_tokenizer(vocab)  # C++ WordPiece when built
    if pretrained and have_vocab and tok.pad_id != bert_cfg.pad_token_id:
        # MPNet/RoBERTa derive position ids from
        # `input_ids != cfg.pad_token_id` (models/mpnet.py) while the
        # encoder pads batches with the TOKENIZER's pad id — a
        # disagreement silently corrupts every position embedding, so
        # refuse the checkpoint instead
        raise ValueError(
            f"tokenizer pad id {tok.pad_id} != config.json pad_token_id "
            f"{bert_cfg.pad_token_id} — mismatched checkpoint files in "
            f"{cfg.model_dir}")
    log.info("encoder ready (pretrained=%s, dtype=%s, hidden=%d, layers=%d)",
             pretrained, cfg.compute_dtype, bert_cfg.hidden_size,
             bert_cfg.num_layers)
    return SentenceEncoder(params, tok, cfg=bert_cfg,
                           seq_buckets=tuple(cfg.seq_buckets))


def _sharded_mesh(cfg: Config):
    import jax

    from dawnsearch_tpu.parallel.mesh import make_mesh
    n = (cfg.mesh_shards if cfg.mesh_shards > 0
         else len(jax.devices()))  # 0 = every device
    return make_mesh({"shard": n}, devices=jax.devices()[:n])


def make_index_factory(cfg: Config, dim: int = 384, crew=None):
    """Index per config: exact flat (default), IVF for large corpora,
    or device-sharded flat over a mesh. The returned factory carries
    `.load_kwargs` — the configuration a snapshot RELOAD must re-apply
    (snapshots store data, not policy; SearchProvider passes these to
    load_index). With `crew` (a multihost.MultihostCrew on the leader),
    sharded indexes are wrapped so every op broadcasts to the SPMD
    followers first (parallel/multihost.py)."""
    def _exact():
        return ("f16" if (cfg.index_rerank == "device"
                          and cfg.index_dtype != "f32") else None)

    # Validate the kind HERE, not inside factory(): a node whose
    # snapshot loads never invokes the factory, so a deferred check
    # would boot fine and then surface the config error weeks later
    # inside a mid-request rebuild path (round-3 review).
    if cfg.index_kind == "ivf":
        # Round-3 removal after the earn-or-demote benchmark: IVF
        # measured 555 QPS at re-ranked recall 0.988 vs flat's
        # 29,254 QPS at 0.9992 IN ITS OWN best regime (8M rows,
        # 4096 tight clusters, cluster-local queries —
        # doc/performance.md). 53x slower at lower recall is not a
        # product tier on this hardware; scale past one chip is
        # index_kind="sharded". The experiment remains runnable at
        # examples/ivf_index.py + examples/bench_ivf_8m.py.
        raise ValueError(
            'index_kind="ivf" was removed (measured strictly worse '
            'than "flat" on both axes in every regime incl. '
            "clustered corpora — doc/performance.md); use \"flat\" "
            'or "sharded", or see examples/ivf_index.py for the '
            "experiment")
    if cfg.index_kind not in ("flat", "sharded"):
        raise ValueError(f"unknown index_kind {cfg.index_kind}")

    if cfg.dist_num_processes > 1:
        # (checked on leader AND follower — make_index_factory builds
        # the follower's replica too, so both refuse identically)
        if cfg.index_kind != "sharded":
            raise ValueError('multihost mode (dist_num_processes > 1) '
                             'requires index_kind="sharded"')
        if cfg.mesh_shards != 0:
            import jax
            if cfg.mesh_shards != len(jax.devices()):
                # a sub-mesh could exclude every device of some process,
                # which then holds no addressable shard of any buffer
                # and cannot even read the replicated search outputs
                raise ValueError(
                    "multihost mode shards over every device in the "
                    "cluster; leave mesh_shards = 0")

    def factory():
        if cfg.index_kind == "flat":
            from dawnsearch_tpu.index.flat import FlatIndex
            return FlatIndex(dim=dim, dtype=cfg.index_dtype,
                             max_capacity=cfg.index_capacity,
                             exact=_exact())

        def make_inner():
            from dawnsearch_tpu.parallel.sharded_index import \
                ShardedFlatIndex
            return ShardedFlatIndex(mesh=_sharded_mesh(cfg), dim=dim,
                                    dtype=cfg.index_dtype,
                                    max_capacity=cfg.index_capacity,
                                    exact=_exact())
        if crew is not None:
            from dawnsearch_tpu.parallel import multihost
            return multihost.build_fresh(
                crew, make_inner, dim,
                flush_rows=cfg.dist_add_flush_rows)
        return make_inner()

    def load_kwargs():
        kw = {"max_capacity": cfg.index_capacity}
        if cfg.index_kind in ("flat", "sharded"):
            kw["exact"] = _exact()
        if cfg.index_kind == "sharded":
            kw["mesh"] = _sharded_mesh(cfg)
        if crew is not None:
            from dawnsearch_tpu.parallel import multihost
            kw["_sharded_loader"] = multihost.crew_sharded_loader(
                crew, flush_rows=cfg.dist_add_flush_rows)
        return kw

    factory.load_kwargs = load_kwargs
    return factory


class DawnNode:
    """One running node. Use as a context manager or call start()/stop()."""

    def __init__(self, cfg: Config, encoder=None):
        self.cfg = cfg
        set_debug(cfg.debug)
        self.instance_id = random_instance_id()
        os.makedirs(cfg.data_dir, exist_ok=True)
        if cfg.compilation_cache:
            # restart-to-serving in seconds instead of recompiling the
            # bucket grid (first compile ~20-40s/shape on TPU)
            import jax
            jax.config.update("jax_compilation_cache_dir",
                              os.path.join(cfg.data_dir, ".jax_cache"))

        from dawnsearch_tpu.index.provider import SearchProvider
        from dawnsearch_tpu.serving.batcher import EmbeddingBatcher
        from dawnsearch_tpu.serving.search_service import SearchService

        self.crew = None
        if cfg.dist_num_processes > 1:
            # multi-host leader: join the cluster BEFORE the encoder's
            # first device use, and broadcast every index op to the
            # SPMD followers (parallel/multihost.py)
            from dawnsearch_tpu.parallel import multihost
            if cfg.dist_process_id != 0:
                raise ValueError(
                    "DawnNode is the leader; run followers via "
                    "`python -m dawnsearch_tpu` with dist_process_id>0")
            multihost.init_distributed(cfg.dist_coordinator,
                                       cfg.dist_num_processes,
                                       cfg.dist_process_id)
            self.crew = multihost.MultihostCrew(
                ping_interval=cfg.dist_ping_interval,
                coordinator=cfg.dist_coordinator,
                control_port=cfg.dist_control_port)
        self.encoder = encoder if encoder is not None else make_encoder(cfg)
        self.batcher = EmbeddingBatcher(
            self.encoder.encode, max_batch=cfg.embed_batch_size,
            max_wait_ms=cfg.embed_max_wait_ms)
        dim = getattr(self.encoder, "dim", 384)
        self.provider = SearchProvider(
            data_dir=cfg.data_dir, dim=dim, index_dtype=cfg.index_dtype,
            max_pages=cfg.index_capacity,
            index_factory=make_index_factory(cfg, dim=dim, crew=self.crew))
        self.udp = None
        if cfg.udp:
            from dawnsearch_tpu.net.udp_service import UdpService
            self.udp = UdpService(cfg, self.instance_id)
        self.service = SearchService(
            self.provider, self.batcher, instance_id=self.instance_id,
            k=cfg.search_k, remote=self.udp)
        if self.udp is not None:
            self.udp.attach(self.service)

        self.http_server = None
        self._http_thread = None
        self.extractor = None
        self._save_timer: threading.Timer | None = None
        self._timer_lock = threading.Lock()
        self._stopped = threading.Event()

    # -- lifecycle ----------------------------------------------------------

    def start(self) -> "DawnNode":
        if self.cfg.warmup and hasattr(self.encoder, "warmup"):
            self.encoder.warmup()  # avoid first-query compile stalls
        if self.cfg.web:
            from dawnsearch_tpu.serving.http_service import start_http_service
            self.http_server, self._http_thread = start_http_service(
                self.service, self.cfg.web_listen_address,
                accept_insert=self.cfg.accept_insert)
        if self.udp is not None:
            self.udp.start()
        if self.cfg.index_cc:
            from dawnsearch_tpu.ingest.extraction_service import (
                CommonCrawlSource, ExtractionService, LocalWarcSource,
                WarcLedger)
            ledger = WarcLedger(
                os.path.join(self.cfg.data_dir, "ingested_warcs.txt"))
            source = (LocalWarcSource(self.cfg.warc_source)
                      if self.cfg.warc_source
                      else CommonCrawlSource(ledger=ledger))
            self.extractor = ExtractionService(
                self.service, source=source,
                batch_size=self.cfg.ingest_batch_size, ledger=ledger,
                workers=self.cfg.ingest_workers,
                rate_limit=self.cfg.ingest_rate_limit,
                query_idle_s=self.cfg.ingest_query_idle_s)
            self.extractor.start()
        self._schedule_save()
        log.info("node %s up (web=%s udp=%s index_cc=%s, %d pages)",
                 self.instance_id, self.cfg.web, self.cfg.udp,
                 self.cfg.index_cc, len(self.provider.store))
        return self

    def _schedule_save(self) -> None:
        # under _timer_lock with a re-check: without it, stop() could
        # cancel the already-FIRED old timer while this thread was past
        # its own _stopped check, leaving a stray timer that calls
        # save() on the closed provider minutes after shutdown
        # (round-3 review; matters for embedded/long-lived processes)
        with self._timer_lock:
            if self._stopped.is_set():
                return
            self._save_timer = threading.Timer(SAVE_INTERVAL_S,
                                               self._save_tick)
            self._save_timer.daemon = True
            self._save_timer.start()

    def _save_tick(self) -> None:
        if self._stopped.is_set():
            return
        try:
            self.service.save()
        except Exception:
            log.exception("periodic save failed")
        self._schedule_save()

    def stop(self) -> None:
        """SIGTERM path: cancel timers, stop frontends, save, close
        (dawnsearch.rs:141-152)."""
        if self._stopped.is_set():
            return
        self._stopped.set()
        with self._timer_lock:  # pairs with _schedule_save's re-check
            if self._save_timer is not None:
                self._save_timer.cancel()
        if self.extractor is not None:
            self.extractor.stop()
        if self.http_server is not None:
            self.http_server.shutdown()
        if self.udp is not None:
            self.udp.stop()
        self.batcher.stop()
        self.service.shutdown()
        if self.crew is not None:
            # AFTER the final save (shutdown saves through the crew's
            # SAVE collective) — releases the followers with OP_STOP
            self.crew.shutdown()
        log.info("node %s stopped", self.instance_id)

    def __enter__(self) -> "DawnNode":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()

    @property
    def http_port(self) -> int | None:
        return None if self.http_server is None else \
            self.http_server.server_address[1]

    def run_forever(self) -> None:
        """Block until SIGINT/SIGTERM."""
        import signal

        done = threading.Event()

        def handler(signum, frame):
            log.info("signal %d — shutting down", signum)
            done.set()

        signal.signal(signal.SIGINT, handler)
        signal.signal(signal.SIGTERM, handler)
        done.wait()
        self.stop()
