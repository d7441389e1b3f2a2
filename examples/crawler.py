"""Link-following web crawler feeding a node's insert API.

Capability-envelope twin of the reference's live crawler experiment
(/root/reference/examples_old/crawl.rs:15-225, which crawled from seed
URLs into Postgres): BFS over hyperlinks with per-host politeness,
readability extraction + English filter (the same pipeline ingestion
uses), inserting into a running node via POST /api/insert.

Run: python examples/crawler.py https://seed.example [more seeds...] \
        [--node http://127.0.0.1:8080] [--max-pages 100]
"""

from __future__ import annotations

import argparse
import collections
import json
import os
import sys
import time
import urllib.parse
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dawnsearch_tpu.ingest import native
from dawnsearch_tpu.ingest.lang import is_english
from dawnsearch_tpu.ingest.pages import MAX_TEXT, MAX_TITLE, MIN_CLEAN_TEXT
from dawnsearch_tpu.utils.text import slice_up_to


def fetch(url: str, timeout: float = 10.0) -> str | None:
    req = urllib.request.Request(url, headers={"User-Agent": "DawnSearchBot"})
    try:
        with urllib.request.urlopen(req, timeout=timeout) as r:
            if "text/html" not in r.headers.get("Content-Type", ""):
                return None
            return r.read(250_000).decode("utf-8", errors="ignore")
    except Exception as e:
        print(f"  fetch failed {url}: {e}")
        return None


def crawl(seeds: list[str], node: str, max_pages: int = 100,
          per_host_delay: float = 1.0) -> int:
    queue = collections.deque(seeds)
    seen: set[str] = set(seeds)
    last_hit: dict[str, float] = {}
    batch, inserted = [], 0

    def flush():
        nonlocal batch, inserted
        if not batch:
            return
        req = urllib.request.Request(
            node + "/api/insert",
            data=json.dumps({"pages": batch}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=60) as r:
            out = json.loads(r.read())
        inserted += len(out.get("inserted", []))
        print(f"inserted {len(out.get('inserted', []))} "
              f"(skipped {out.get('skipped', 0)}), total {inserted}")
        batch = []

    while queue and inserted + len(batch) < max_pages:
        url = queue.popleft()
        host = urllib.parse.urlsplit(url).netloc
        wait = last_hit.get(host, 0) + per_host_delay - time.time()
        if wait > 0:
            time.sleep(wait)
        last_hit[host] = time.time()
        html = fetch(url)
        if html is None:
            continue
        doc = native.extract(html)
        for link in doc.links:
            absu = urllib.parse.urljoin(url, link)
            if absu.startswith("http") and "?" not in absu \
                    and "#" not in absu and absu not in seen:
                seen.add(absu)
                queue.append(absu)
        text = " ".join(doc.text.split())
        if len(text) < MIN_CLEAN_TEXT or not is_english(text):
            continue
        batch.append({"url": url,
                      "title": slice_up_to(doc.title, MAX_TITLE),
                      "text": slice_up_to(text, MAX_TEXT)})
        if len(batch) >= 16:
            flush()
    flush()
    return inserted


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("seeds", nargs="+")
    ap.add_argument("--node", default="http://127.0.0.1:8080")
    ap.add_argument("--max-pages", type=int, default=100)
    args = ap.parse_args()
    n = crawl(args.seeds, args.node, args.max_pages)
    print(f"done: {n} pages")
