"""Raw-UDP query client: embed locally, fan out Search datagrams,
collect Page replies under a deadline.

Capability twin of /root/reference/examples_old/search_udp.rs (which
loads all-MiniLM-L6-v2 locally, rmp-serializes a Search packet with the
i24-quantized embedding, sends it to a peer, and prints the Page
replies). This client speaks either wire format (net/packets.py);
with --wire reference the datagrams are byte-compatible with a Rust
reference node.

Run (against a local node started with DAWNSEARCH_UDP=true):
    python examples/search_udp.py "your query" 127.0.0.1:7231 \
        [--model-dir DIR] [--wire dawn|reference] [--deadline 0.5]

Without --model-dir the query embeds with random weights — fine for
exercising the protocol, not for ranking quality.
"""

from __future__ import annotations

import random
import socket
import sys
import time

import numpy as np


def search_once(embedding: np.ndarray, peer: tuple[str, int],
                wire: str = "dawn", deadline: float = 0.5,
                distance_limit: float | None = None) -> list:
    """Send one raw Search datagram to `peer`, collect Page replies
    until `deadline`; returns them sorted by distance (the
    search_udp.rs loop body)."""
    from dawnsearch_tpu.net import packets

    search_id = random.getrandbits(63)
    pkt = packets.encode(
        packets.Search(search_id=search_id, distance_limit=distance_limit,
                       embedding=np.asarray(embedding, np.float32)),
        wire_format=wire)
    sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    try:
        sock.settimeout(0.05)
        sock.sendto(pkt, peer)
        hits = []
        end = time.monotonic() + deadline
        while time.monotonic() < end:
            try:
                data, _ = sock.recvfrom(2048)
            except socket.timeout:
                continue
            p = packets.decode(data)
            if isinstance(p, packets.Page) and p.search_id == search_id:
                hits.append(p)
    finally:
        sock.close()
    hits.sort(key=lambda p: p.distance)
    return hits


def main() -> None:
    # flags may appear anywhere; their VALUES must not leak into the
    # positionals (query, peer)
    opts = {"wire": "dawn", "deadline": "0.5", "model-dir": ""}
    args: list[str] = []
    argv = sys.argv[1:]
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--"):
            name = a[2:]
            if name not in opts or i + 1 >= len(argv):
                print(__doc__)
                raise SystemExit(2)
            opts[name] = argv[i + 1]
            i += 2
        else:
            args.append(a)
            i += 1
    if len(args) < 2:
        print(__doc__)
        raise SystemExit(2)
    query, peer = args[0], args[1]
    host, _, port = peer.partition(":")
    wire = opts["wire"]
    deadline = float(opts["deadline"])
    model_dir = opts["model-dir"] or None

    from dawnsearch_tpu.config import Config
    from dawnsearch_tpu.node import make_encoder

    t0 = time.perf_counter()
    print("Loading model...", end="", flush=True)
    enc = make_encoder(Config(model_dir=model_dir))
    emb = np.asarray(enc.encode([query])[0], np.float32)
    print(f" {1000 * (time.perf_counter() - t0):.0f} ms")

    hits = search_once(emb, (host or "127.0.0.1", int(port)),
                       wire=wire, deadline=deadline)
    for p in hits:
        print(f"{p.distance:7.4f}  {p.url}  {p.title!r}")
    print(f"({len(hits)} pages from the network in {deadline:.2f}s)")


if __name__ == "__main__":
    main()
