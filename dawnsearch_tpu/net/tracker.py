"""Tracker: UDP rendezvous server for open-network membership.

Rebuild of the reference's `dawntrack` binary
(/root/reference/src/bin/dawntrack.rs:31-116): keeps an in-memory peer
map; on Announce records the peer's source address + last_seen
(dawntrack.rs:71-92), rewrites a loopback source to the configured
external address so a tracker co-hosted with a node advertises a
reachable addr (dawntrack.rs:77-82), and replies with every *other*
peer seen in the last 10 minutes, chunked 25 per packet
(dawntrack.rs:93-109). All other packet types are ignored
(dawntrack.rs:111).
"""

from __future__ import annotations

import socket
import threading
import time

from dawnsearch_tpu.net import packets
from dawnsearch_tpu.net.packets import Announce, PeerInfo, Peers
from dawnsearch_tpu.utils.logging import service_logger

log = service_logger("Tracker")

PEER_FRESH_S = 600.0  # advertise peers seen in the last 10 min (dawntrack.rs:95)
PEERS_PER_PACKET = 25  # dawntrack.rs:99-109


def parse_addr(addr: str) -> tuple[str, int]:
    host, _, port = addr.rpartition(":")
    return host or "0.0.0.0", int(port)


class Tracker:
    def __init__(self, listen: str = "0.0.0.0:7230",
                 external_address: str | None = None,
                 fresh_s: float = PEER_FRESH_S,
                 wire_format: str = packets.WIRE_DAWN):
        self.listen = listen
        self.external_address = external_address
        self.wire = wire_format
        self.fresh_s = fresh_s
        self.peers: dict[str, PeerInfo] = {}  # instance_id -> info
        self._lock = threading.Lock()
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self._sock.bind(parse_addr(listen))
        self._sock.settimeout(0.25)
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    @property
    def port(self) -> int:
        return self._sock.getsockname()[1]

    def _handle(self, data: bytes, src: tuple[str, int]) -> None:
        try:
            pkt = packets.decode(data)
        except Exception:
            log.debug("undecodable %d B from %s", len(data), src)
            return
        if not isinstance(pkt, Announce):
            return  # dawntrack.rs:111
        host, port = src
        if host in ("127.0.0.1", "::1") and self.external_address:
            host = self.external_address  # dawntrack.rs:77-82
        now = int(time.time())
        info = PeerInfo(pkt.instance_id, f"{host}:{port}",
                        pkt.accept_insert, pkt.pages_indexed, last_seen=now)
        with self._lock:
            self.peers[pkt.instance_id] = info
            # prune stale entries while already scanning (the reference
            # only FILTERS at reply time, dawntrack.rs:95 — a public
            # tracker fed spoofed random instance_ids would otherwise
            # grow without bound and every announce is O(all ever seen))
            stale = [iid for iid, p in self.peers.items()
                     if now - p.last_seen >= 2 * self.fresh_s]
            for iid in stale:
                del self.peers[iid]
            fresh = [p for iid, p in self.peers.items()
                     if iid != pkt.instance_id
                     and now - p.last_seen < self.fresh_s]
        log.debug("announce %s @%s (%d pages); %d fresh peers",
                  pkt.instance_id, info.addr, pkt.pages_indexed, len(fresh))
        for i in range(0, len(fresh), PEERS_PER_PACKET):
            chunk = fresh[i: i + PEERS_PER_PACKET]
            self._sock.sendto(packets.encode(Peers(chunk), self.wire), src)
        if not fresh:  # always ack so nodes learn the tracker is alive
            self._sock.sendto(packets.encode(Peers([]), self.wire), src)

    def _serve(self) -> None:
        while not self._stop.is_set():
            try:
                data, src = self._sock.recvfrom(65536)
            except socket.timeout:
                continue
            except OSError:
                break
            try:
                self._handle(data, src)
            except Exception:
                log.exception("tracker handler failed")

    def start(self) -> "Tracker":
        self._thread = threading.Thread(target=self._serve, daemon=True,
                                        name="tracker")
        self._thread.start()
        log.info("tracker on %s", self.listen)
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=2.0)
        self._sock.close()

    def run_forever(self) -> None:
        self.start()
        try:
            while True:
                time.sleep(3600)
        except KeyboardInterrupt:
            self.stop()
