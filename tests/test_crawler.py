"""examples/crawler.py end-to-end against a loopback web + a real node.

Closes VERDICT r1 weak #6's last untested script: the crawler's BFS,
per-host politeness bookkeeping, link absolutization, filters, and
/api/insert batching all run for real — the "web" is a local HTTP
server serving interlinked pages, the node is a DawnNode on a
hash encoder (reference twin: examples_old/crawl.rs:15-225).
"""

import http.server
import importlib.util
import os
import threading

from dawnsearch_tpu.node import DawnNode
from tests.test_ingest import ENGLISH
from tests.test_node import HashEncoder, get_json, make_cfg

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

spec = importlib.util.spec_from_file_location(
    "crawler", os.path.join(REPO, "examples", "crawler.py"))
crawler = importlib.util.module_from_spec(spec)
spec.loader.exec_module(crawler)


def site_pages(n=6):
    pages = {}
    for i in range(n):
        links = "".join(f'<a href="/page{j}.html">next {j}</a>'
                        for j in (i + 1, i + 2) if j < n)
        # a querystring link and an anchor link must be skipped
        links += '<a href="/page0.html?x=1">q</a><a href="#top">top</a>'
        pages[f"/page{i}.html"] = (
            f"<html><head><title>Page {i}</title></head><body>"
            f"<article><p>{ENGLISH} Page number {i}.</p></article>"
            f"{links}</body></html>").encode()
    return pages


def test_crawler_end_to_end(tmp_path):
    pages = site_pages()

    class Handler(http.server.BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            body = pages.get(self.path)
            if body is None:
                self.send_response(404)
                self.end_headers()
                return
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    web = f"http://127.0.0.1:{httpd.server_address[1]}"

    cfg = make_cfg(tmp_path)
    try:
        with DawnNode(cfg, encoder=HashEncoder()) as node:
            base = f"http://127.0.0.1:{node.http_port}"
            n = crawler.crawl([web + "/page0.html"], base, max_pages=10,
                              per_host_delay=0.0)
            assert n == 6  # all reachable pages, nothing else
            stats = get_json(base + "/api/stats")
            assert stats["pages_indexed"] == 6
            # content round-trips through extraction + the insert API
            data = get_json(base + "/api/search?q=" +
                            "Page%203%0A" + "lighthouse")
            urls = [r["url"] for r in data["results"]]
            assert any(u.endswith("/page3.html") for u in urls)
    finally:
        httpd.shutdown()


def test_crawler_skips_non_html_and_dedups(tmp_path):
    served = []

    class Handler(http.server.BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            served.append(self.path)
            if self.path == "/data.bin":
                body = b"\x00\x01binary"
                ctype = "application/octet-stream"
            else:
                body = (f"<html><title>T</title><body><article><p>{ENGLISH}"
                        f"</p></article>"
                        '<a href="/data.bin">bin</a>'
                        '<a href="/a.html">a</a>'
                        '<a href="/a.html">a again</a></body></html>'
                        ).encode()
                ctype = "text/html"
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    web = f"http://127.0.0.1:{httpd.server_address[1]}"
    cfg = make_cfg(tmp_path)
    try:
        with DawnNode(cfg, encoder=HashEncoder()) as node:
            base = f"http://127.0.0.1:{node.http_port}"
            crawler.crawl([web + "/a.html"], base, max_pages=5,
                          per_host_delay=0.0)
        # /a.html fetched once (dedup), /data.bin fetched but rejected
        assert served.count("/a.html") == 1
        assert served.count("/data.bin") == 1
    finally:
        httpd.shutdown()
