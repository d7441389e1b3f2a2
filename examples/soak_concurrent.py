"""Concurrent-load soak: query threads hammer /api/search over HTTP
WHILE the extraction service ingests a synthetic WARC.

The round-2 measurement of this workload showed query p99 3.5 s — every
query stacked behind a batch-1024 fused-ingest dispatch that held the
provider lock for its full execute+readback+store critical section.
Round 3 holds the device-state lock only while programs are ENQUEUED
(serving/search_service.py), so this script is the acceptance gate:
target p99 <= 300 ms at >= 2k pages/s ingest (VERDICT round 2, item 1).

Reference workload shape: the dawnsearch node serving searches while
the extraction loop inserts (bin/dawnsearch.rs:64-78 actor split).

Run ON THE CHIP (axon), in the background, and poll the output:
    python examples/soak_concurrent.py [--prefill 524288] [--pages 8192]
Prints progress to stderr, ONE summary JSON line to stdout at the end.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import threading
import time
import urllib.parse
import urllib.request

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("DAWNSEARCH_JAX_PLATFORM"):
    import jax
    jax.config.update("jax_platforms",
                      os.environ["DAWNSEARCH_JAX_PLATFORM"])


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def build_stack(prefill: int, max_pages: int, device_rerank: bool = False):
    import jax
    import jax.numpy as jnp

    # persistent compile cache: the warmup's cold compiles through the
    # tunnel cost 5-20 min per fresh process otherwise (DawnNode does
    # the same via cfg.compilation_cache)
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("DAWNSEARCH_JAX_CACHE",
                                     "/tmp/dawnsearch_jax_cache"))

    from dawnsearch_tpu.index.provider import SearchProvider
    from dawnsearch_tpu.models.bert import BertConfig
    from dawnsearch_tpu.models.encoder import SentenceEncoder
    from dawnsearch_tpu.models.tokenizer import build_vocab_from_corpus
    from dawnsearch_tpu.models.tokenizer_native import best_tokenizer
    from dawnsearch_tpu.models.weights import init_params
    from dawnsearch_tpu.serving.batcher import EmbeddingBatcher
    from dawnsearch_tpu.serving.search_service import SearchService

    body = ("The lighthouse keeper carried supplies up the winding stairs "
            "every morning while the gulls circled over the rocks and the "
            "fishing boats left the harbor before first light. ") * 6
    params = init_params(jax.random.key(0))
    vocab = build_vocab_from_corpus([body], size=4096)
    enc = SentenceEncoder(params, best_tokenizer(vocab),
                          cfg=BertConfig(dtype=jnp.bfloat16))
    batcher = EmbeddingBatcher(enc.encode)
    factory = None
    if device_rerank:
        # the f16-shadow tier (config index_rerank="device"): candidates
        # re-rank on device inside the fused program instead of a host
        # f32 pass — a second soak operating point for the tail story
        from dawnsearch_tpu.index.flat import FlatIndex
        factory = lambda: FlatIndex(dim=384, dtype="i8", exact="f16")
    provider = SearchProvider(data_dir=None, verify_on_load=False,
                              max_pages=max_pages, index_factory=factory)
    service = SearchService(provider, batcher)

    # Prefill the index + store to serving scale so queries scan a
    # realistic row count (the fused selector gate needs >= 262144).
    # Embeddings are synthetic unit vectors; store rows keep the
    # row_id = store_id - 1 contract intact for the ingest that follows.
    t0 = time.perf_counter()
    rng = np.random.default_rng(7)
    bs = 16384
    done = 0
    while done < prefill:
        n = min(bs, prefill - done)
        embs = rng.standard_normal((n, 384), dtype=np.float32)
        embs /= np.linalg.norm(embs, axis=1, keepdims=True)
        provider.insert_pages(
            [f"https://prefill.example/{done + i}" for i in range(n)],
            [f"prefill {done + i}" for i in range(n)],
            ["prefill body"] * n, embs)
        done += n
        if done % (bs * 8) == 0:
            log(f"prefill {done}/{prefill}")
    log(f"prefill {done} rows in {time.perf_counter() - t0:.1f}s "
        f"(index {len(provider.index)})")
    return enc, batcher, provider, service, body


def make_warc(path: str, body: str, n_pages: int) -> None:
    from dawnsearch_tpu.ingest.warc import write_warc
    words = body.split()
    rng = np.random.default_rng(3)
    records = []
    for i in range(n_pages):
        shuffled = " ".join(rng.permutation(words))
        records.append((
            f"https://soak.example/{i}",
            (f"<html><head><title>Page {i}</title></head><body>"
             f"<article><p>{shuffled}</p></article></body></html>"
             ).encode()))
    write_warc(path, records)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--prefill", type=int, default=524288)
    ap.add_argument("--pages", type=int, default=8192)
    ap.add_argument("--threads", type=int, default=4)
    ap.add_argument("--batch", type=int, default=512,
                    help="ingest_batch_size (the round-2 tail's knob)")
    ap.add_argument("--rate", type=float, default=0.0,
                    help="ingest rate limit, pages/s (0 = unlimited)")
    ap.add_argument("--query-idle", type=float, default=None,
                    help="coalescing recency gate, seconds "
                         "(config ingest_query_idle_s; default 2.0)")
    ap.add_argument("--query-duty", type=str, default="",
                    help="bursty query load: 'ON,OFF' seconds (e.g. "
                         "'2,4'). Continuous load never opens the "
                         "query-idle gate, so this is how the sweep "
                         "measures the tail a query pays when it "
                         "arrives right after a coalesced dispatch")
    ap.add_argument("--port", type=int, default=8931)
    ap.add_argument("--device-rerank", action="store_true",
                    help="f16-shadow on-device re-rank tier "
                         "(config index_rerank='device')")
    args = ap.parse_args()

    from dawnsearch_tpu.ingest.extraction_service import (
        ExtractionService, LocalWarcSource)
    from dawnsearch_tpu.serving.http_service import start_http_service

    enc, batcher, provider, service, body = build_stack(
        args.prefill, max_pages=args.prefill + args.pages + 1024,
        device_rerank=args.device_rerank)

    td = tempfile.TemporaryDirectory()
    warc = f"{td.name}/soak.warc.gz"
    make_warc(warc, body, args.pages)

    # Pre-grow the index past everything this run will insert: capacity
    # growth recompiles the (capacity-specialized) query + ingest
    # programs, and a ~2 min tunnel cold-compile inside the measurement
    # window would poison p99 with a one-off that steady-state serving
    # (doubling growth, O(log N) compiles per index lifetime) amortizes.
    target_cap = args.prefill + args.pages + 2 * args.batch + 4096
    if provider.index.capacity < target_cap:
        provider.index._grow_to(target_cap)

    # warm the serving + ingest programs (compile outside the window)
    log("warmup: compiling query + ingest programs")
    service.insert_pages([(f"https://warm.example/{i}", "w", body)
                          for i in range(args.batch)])
    for q in ("lighthouse keeper storm", "fishing boats harbor light"):
        service.text_search(q, search_remote=False)  # default k = HTTP's

    http, _ = start_http_service(service, listen=f"127.0.0.1:{args.port}")
    base = f"http://127.0.0.1:{args.port}"

    # Warm the EXACT serving shapes: the HTTP handler's default k AND
    # every coalesced batch bucket the query threads can produce (with
    # T threads the CoalescingBatcher forms batches of 1..T, which pad
    # to the encoder's 1- and 8-buckets). A shape first seen mid-window
    # cold-compiles ~30-120 s through the tunnel UNDER THE DEVICE LOCK,
    # stalling both queries and ingest — observed as a 27 s ingest gap
    # and a 55 s readback p99 before this warmup was exact.
    warm_qs = ["lighthouse keeper storm", "gulls over the rocks",
               "fishing boats before first light", "the harbor at dawn",
               "supplies up the stairs", "winding stairs morning",
               "storm over the rocks", "first light boats"]
    svc_k = service.k  # text_search default (the /api/search path)
    for b in (1, min(8, len(warm_qs))):
        service._fused_text_batch([(q, svc_k) for q in warm_qs[:b]])
    with urllib.request.urlopen(
            f"{base}/api/search?q=lighthouse", timeout=600) as r:
        r.read()
    log("warmup: HTTP query path compiled (batch buckets 1, 8)")
    from dawnsearch_tpu.utils.logging import METRICS
    METRICS.reset()  # percentiles below exclude warmup compiles

    lat: list[float] = []
    lat_lock = threading.Lock()
    errors = [0]
    stop = threading.Event()
    queries = [
        "lighthouse keeper storm", "gulls over the rocks",
        "fishing boats before first light", "supplies up the stairs",
        "winding stairs every morning", "the harbor at dawn",
    ]

    duty_on = duty_off = 0.0
    if args.query_duty:
        duty_on, duty_off = (float(x) for x in args.query_duty.split(","))

    duty_epoch = time.perf_counter()  # shared: phases align across threads

    def query_loop(tid: int) -> None:
        i = tid
        cycle_t0 = duty_epoch
        while not stop.is_set():
            if duty_off > 0.0:
                # bursty load: all threads share one wall-clock phase so
                # the OFF window is genuinely query-free (the idle gate
                # sees no queries and coalescing engages); the first
                # query of each ON window is the one that can land right
                # behind a coalesced 2048-page dispatch — the tail this
                # mode exists to measure
                phase = (time.perf_counter() - cycle_t0) % (duty_on
                                                            + duty_off)
                if phase >= duty_on:
                    if stop.wait(min(0.05, duty_on + duty_off - phase)):
                        return
                    continue
            q = urllib.parse.quote(queries[i % len(queries)])
            t0 = time.perf_counter()
            try:
                with urllib.request.urlopen(
                        f"{base}/api/search?q={q}", timeout=30) as r:
                    r.read()
                dt = time.perf_counter() - t0
                with lat_lock:
                    lat.append(dt)
            except Exception as e:
                errors[0] += 1
                log(f"query error: {e}")
            i += 1

    n_before = len(provider.store)
    ex = ExtractionService(service, source=LocalWarcSource(warc),
                           batch_size=args.batch, rate_limit=args.rate,
                           query_idle_s=args.query_idle)
    threads = [threading.Thread(target=query_loop, args=(t,))
               for t in range(args.threads)]
    t0 = time.perf_counter()
    ex.start()
    for t in threads:
        t.start()
    ex.join(timeout=900)
    ingest_dt = time.perf_counter() - t0
    stop.set()
    for t in threads:
        t.join(timeout=60)
    http.shutdown()

    n_pages = len(provider.store) - n_before
    pps = n_pages / ingest_dt
    arr = np.asarray(lat)
    summary = {
        "metric": "soak_query_p99_ms",
        "value": round(float(np.percentile(arr, 99)) * 1000, 1),
        "unit": "ms",
        "p50_ms": round(float(np.percentile(arr, 50)) * 1000, 1),
        "p90_ms": round(float(np.percentile(arr, 90)) * 1000, 1),
        "max_ms": round(float(arr.max()) * 1000, 1),
        "queries": int(arr.size),
        "query_errors": errors[0],
        "ingest_pages_per_sec": round(pps, 1),
        "ingest_pages": n_pages,
        "ingest_seconds": round(ingest_dt, 1),
        "prefill_rows": args.prefill,
        "ingest_batch": args.batch,
        "ingest_rate_limit": args.rate,
        "query_idle_s": ex.query_idle_s,
        "query_duty": args.query_duty or "continuous",
        "insert_batches": sorted({int(s) for s in
                                  METRICS.values("ingest_insert_batch")}),
        "threads": args.threads,
        "rerank": "device_f16" if args.device_rerank else "host_f32",
    }
    snap = METRICS.snapshot()
    for key in ("fused_query_dispatch", "fused_ingest_dispatch",
                "fused_ingest", "index_search"):
        for suffix in ("p50_ms", "p99_ms", "count"):
            k = f"{key}_{suffix}"
            if k in snap:
                summary[k] = round(snap[k], 1)
    print(json.dumps(summary), flush=True)
    batcher.stop()
    service.shutdown()
    td.cleanup()


if __name__ == "__main__":
    main()
