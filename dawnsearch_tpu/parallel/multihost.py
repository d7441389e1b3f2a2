"""Multi-host (DCN) tier: one sharded index spanning multiple JAX processes.

SURVEY §2.3 maps the reference's peer fan-out (one UDP datagram per
peer, host-side merge — /root/reference/src/net/udp_service.rs:297-330,
src/search/search_service.rs:213-276) to two TPU-native tiers: XLA
collectives over ICI within a slice (parallel/sharded_index.py), and
the host UDP/DCN tier for open-membership swarms (net/udp_service.py).
This module adds the tier between them: a CLOSED deployment of N JAX
processes (multi-host pod or multi-slice) serving ONE ShardedFlatIndex
whose "shard" mesh axis spans every process's devices, so the
cross-host hop is an XLA `all_gather` riding the runtime's DCN
collectives — not application datagrams.

Design (the standard JAX multi-controller contract):

- Every process executes the SAME jitted programs in the SAME order on
  the global mesh. Process 0 (the leader) runs the full DawnNode —
  HTTP/UDP frontends, encoder, store, ingest. Processes 1..N-1 run
  `follower_main`: a loop that learns each operation from a host-side
  control stream and executes its device half in lockstep.
- The control plane is an ORDERED TCP STREAM from the leader to each
  follower (one extra port next to the jax.distributed coordinator): a
  fixed (8,) int64 header frame (opcode + shape metadata), then the
  payload bytes the header determines. The stream order IS the program
  order. Earlier rounds rode `multihost_utils.broadcast_one_to_all`
  (device collectives) for control traffic too; measured on the
  2-process gloo crew that spent ~40 ms/op of host+collective overhead
  on what a loopback socket does in microseconds — control traffic is
  host data, so it rides a host transport, and the device collectives
  are reserved for the device data plane (search/gather programs).
- Ordering: the leader holds one crew lock across send AND the
  following device dispatch, making its op order identical to the
  followers' sequential loop — collectives inside the search/write
  programs then pair up across processes by construction.
- Failure model is fail-stop, like `jax.distributed` itself: a process
  that dies takes the crew down (the leader's next send raises on a
  dead socket; a follower's recv raises on EOF; a desynced device
  collective surfaces a distributed error). Restart the crew.
  Open-membership robustness (deadlines, stragglers, partial results)
  stays the UDP tier's job — that is exactly the reference's split
  between its index and its network (SURVEY §5 "failure detection").
- A keepalive PING frame (dist_ping_interval, default 60 s) doubles as
  liveness detection: it keeps the leader's sockets exercised so a
  dead follower surfaces at the next ping, not weeks later.

The leader's SearchProvider sees a `MultihostShardedIndex`: the same
duck-typed index surface, with every state-touching entry point
prefixed by a control-stream send. It deliberately does NOT expose
`search_dispatch` (the provider then serializes searches under its
device lock — required here, since the stream order IS the program
order) and is not a FlatIndex/ShardedFlatIndex instance (the fused
serving paths' isinstance gates then opt out, so followers never need
the encoder or token streams).

ADD wire: the leader runs the host half of the insert ONCE
(quantization, stripe planning, block building —
ShardedFlatIndex._prepare_add) and ships the finished per-shard blocks;
followers go straight to the device writes (_commit_add). That both
cuts the wire bytes for quantized storage 4x (codes travel as 1
byte/dim — i8 codes, or i4 biased nibble VALUES, whose 0.5 byte/dim
packing is position-dependent and happens inside the device write,
ops/quant.blend_rows_i4) and removes the follower's duplicated host
work — the round-4 measurement had every process receiving every f32
row and re-quantizing it (round-4 VERDICT item 5). Block content is
bit-identical on every process by construction (same plan object).

ADD coalescing: small adds (the ingest contract is 256-512-row
sub-batches) do not broadcast one op each — the leader queues them in
a host-side pending buffer and flushes ONE prepared plan when the
buffer reaches `flush_rows`, or right before any op that must observe
the rows (search, save). This is the crew twin of the single-process
ingest coalescing (ingest/extraction_service.py): per-op cost —
stripe planning, block building, 6 sharded device_puts, one donating
shard_map write, on EVERY process — amortizes over flush_rows rows
instead of the caller's batch. Correctness is unchanged: ids are
assigned at add() time (the wire pins them), deterministic capacity
refusals still raise at add() (against committed+pending occupancy,
so a flush can never refuse), and no search can run before the rows
it should see are committed. The trade is index-visibility latency
under pure bulk ingest with zero queries — bounded by flush_rows and
erased by the store: rows live in SQLite from insert time and the
index rebuilds from it (index/provider.py), so a crash loses no data.

Shared state contract: all processes read the same config (TOML) and
`data_dir` must be a shared (or replicated) filesystem — followers load
the same index snapshot bytes the leader loads. The SQLite store stays
leader-only. Snapshot save gathers the sharded buffers to every host
(one full copy in host RAM) and the leader writes the standard
"sharded" .npz, so single-process runs reload multihost snapshots
unchanged and vice versa.

Verified end-to-end on this machine by tests/test_multihost.py: two OS
processes x two virtual CPU devices each (gloo device collectives + the
TCP control stream — the same code paths a real pod takes over DCN),
exact-recall parity against numpy, leader save -> single-process reload.
"""

from __future__ import annotations

import socket
import threading
import time

import numpy as np

from dawnsearch_tpu.utils.logging import service_logger

log = service_logger("Multihost")

OP_PING = 0
OP_INIT = 1
OP_SEARCH = 2
OP_ADD = 3
OP_SAVE = 4
OP_STOP = 5

_HEADER_LEN = 8
_HEADER_BYTES = _HEADER_LEN * 8

# Control-socket buffer target: ~10 ADD frames of a 256-row f32 batch
# in flight before the leader's sendall blocks — the send pipeline
# depth that replaces the old collective wire's MAX_INFLIGHT cap, now
# enforced by the kernel instead of Python.
_SOCK_BUF = 8 << 20
_CONNECT_TIMEOUT_S = 120.0

_init_done = False


def init_distributed(coordinator: str, num_processes: int,
                     process_id: int) -> None:
    """`jax.distributed.initialize` exactly once, BEFORE first device
    use (the backend binds to the cluster at initialization; a later
    call is an error). Call sites: the CLI right after config parse,
    DawnNode.__init__ (idempotent), follower_main."""
    global _init_done
    if _init_done or num_processes <= 1:
        return
    import jax
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    _init_done = True
    log.info("distributed runtime up: process %d/%d via %s",
             process_id, num_processes, coordinator)


def control_address(coordinator: str, control_port: int = 0
                    ) -> tuple[str, int]:
    """The control stream lives on the coordinator's host, one port up
    by default (dist_control_port overrides)."""
    host, _, port = coordinator.rpartition(":")
    if not host:
        raise ValueError(f"dist_coordinator needs host:port, got "
                         f"{coordinator!r}")
    return host, control_port or int(port) + 1


def _recv_exact(sock: socket.socket, n: int) -> bytearray:
    buf = bytearray(n)
    view = memoryview(buf)
    got = 0
    while got < n:
        try:
            r = sock.recv_into(view[got:], n - got)
        except socket.timeout:
            raise RuntimeError(
                "multihost control stream silent past the liveness "
                "bound (no frame or keepalive ping) — leader host "
                "presumed dead; fail-stop") from None
        if r == 0:
            raise RuntimeError(
                "multihost control stream closed by the leader "
                "(crew is down — fail-stop)")
        got += r
    return buf


class MultihostCrew:
    """The TCP control plane shared by leader wrapper and follower
    loop. All sends happen under `lock`; the leader holds it across the
    subsequent device dispatch too (see module docstring)."""

    def __init__(self, ping_interval: float = 60.0,
                 coordinator: str = "", control_port: int = 0):
        import jax
        self.is_leader = jax.process_index() == 0
        self.n_processes = jax.process_count()
        self.lock = threading.RLock()
        self._ping_interval = ping_interval
        self._timer: threading.Timer | None = None
        self._timer_lock = threading.Lock()
        self._stopped = False
        self._socks: list[socket.socket] = []  # leader: one per follower
        self._sock: socket.socket | None = None  # follower: to the leader
        if self.n_processes > 1:
            host, port = control_address(coordinator, control_port)
            if self.is_leader:
                self._accept_followers(host, port)
            else:
                self._connect_leader(host, port)
        if self.is_leader and ping_interval > 0:
            self._schedule_ping()

    # -- connection setup ----------------------------------------------------

    def _accept_followers(self, host: str, port: int) -> None:
        """Bind the coordinator host's interface (not 0.0.0.0 — the
        control stream carries index writes) and accept every follower.
        Blocks, like jax.distributed.initialize just did for the same
        process set, so the wait is bounded by the cluster being up."""
        ls = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        ls.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        ls.bind((host, port))
        ls.listen(self.n_processes - 1)
        ls.settimeout(_CONNECT_TIMEOUT_S)
        try:
            for _ in range(self.n_processes - 1):
                conn, addr = ls.accept()
                conn.settimeout(None)
                conn.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
                conn.setsockopt(socket.SOL_SOCKET, socket.SO_SNDBUF,
                                _SOCK_BUF)
                pid = int(np.frombuffer(_recv_exact(conn, 8), np.int64)[0])
                self._socks.append(conn)
                log.info("control stream up: follower %d from %s", pid, addr)
        finally:
            ls.close()

    def _connect_leader(self, host: str, port: int) -> None:
        import jax
        deadline = time.monotonic() + _CONNECT_TIMEOUT_S
        while True:
            try:
                s = socket.create_connection((host, port), timeout=5.0)
                break
            except OSError:
                if time.monotonic() >= deadline:
                    raise
                time.sleep(0.1)  # leader binds in ITS crew constructor
        # Liveness bound: a leader HOST that dies without FIN/RST (power
        # loss, partition) must not leave this follower in recv_into
        # forever holding its device claim. The keepalive PING frames
        # (ping_interval) satisfy a recv timeout of many intervals; the
        # generous multiple tolerates leader-side stalls where no ping
        # can be sent for a while (e.g. a multi-GB INIT snapshot load
        # holds the crew lock). SO_KEEPALIVE catches the same at the
        # TCP layer for crews that disable pings.
        if self._ping_interval > 0:
            s.settimeout(max(10.0 * self._ping_interval, 300.0))
        else:
            s.settimeout(None)
        s.setsockopt(socket.SOL_SOCKET, socket.SO_KEEPALIVE, 1)
        s.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        s.setsockopt(socket.SOL_SOCKET, socket.SO_RCVBUF, _SOCK_BUF)
        s.sendall(np.int64(jax.process_index()).tobytes())
        self._sock = s

    # -- leader side ----------------------------------------------------------

    def _send_frames(self, header: np.ndarray, payloads: tuple) -> None:
        """One ordered write per follower socket: header frame, then
        payload bytes. Kernel socket buffers (_SOCK_BUF) give the send
        pipeline its depth; a follower that stopped reading eventually
        blocks the leader here — visible backpressure, and a dead
        socket raises (fail-stop)."""
        bufs = [header.tobytes()]
        bufs += [memoryview(np.ascontiguousarray(p)).cast("B")
                 for p in payloads]
        for s in self._socks:
            for b in bufs:
                s.sendall(b)

    def send(self, op: int, meta: tuple = (), payloads: tuple = ()) -> None:
        header = np.zeros(_HEADER_LEN, np.int64)
        header[0] = op
        header[1:1 + len(meta)] = meta
        with self.lock:
            # re-check under the lock: a keepalive ping that passed its
            # outer _stopped check can otherwise win the lock AFTER
            # shutdown() sent OP_STOP and the followers exited,
            # confusing the stream tail
            if self._stopped and op != OP_STOP:
                if op == OP_PING:
                    return  # benign timer race; just stop pinging
                # fail FAST: the followers exited on OP_STOP, so the
                # device program this op would dispatch is a peerless
                # global-mesh collective — it would hang, not error
                raise RuntimeError(
                    "multihost crew stopped; op rejected (followers "
                    "already released by OP_STOP)")
            self._send_frames(header, payloads)

    def _schedule_ping(self) -> None:
        with self._timer_lock:
            if self._stopped:
                return
            self._timer = threading.Timer(self._ping_interval, self._ping)
            self._timer.daemon = True
            self._timer.start()

    def _ping(self) -> None:
        if self._stopped:
            return
        try:
            self.send(OP_PING)
        except Exception:
            log.exception("keepalive ping failed")
        self._schedule_ping()

    def shutdown(self) -> None:
        """Stop the keepalive and release the followers (OP_STOP)."""
        if self._stopped:
            return
        self._stopped = True
        with self._timer_lock:
            if self._timer is not None:
                self._timer.cancel()
        if self.is_leader:
            self._send_stop()

    def _send_stop(self) -> None:
        """Release the followers: per-socket OP_STOP sends, so one
        follower that died earlier cannot keep the release from
        reaching the healthy ones (they would otherwise die later on
        EOF fail-stop with a scary 'crew is down' error) nor abort the
        caller's shutdown mid-way with a BrokenPipeError."""
        header = np.zeros(_HEADER_LEN, np.int64)
        header[0] = OP_STOP
        hb = header.tobytes()
        with self.lock:
            for s in self._socks:
                try:
                    s.sendall(hb)
                except OSError:
                    log.warning("OP_STOP skipped a dead follower "
                                "socket (it already failed stop)")
                try:
                    s.close()  # close flushes queued frames first
                except OSError:
                    pass

    # -- follower side ---------------------------------------------------------

    def recv_header(self) -> np.ndarray:
        if self._sock is None:
            raise RuntimeError("recv_header on a crew with no control "
                               "stream (single-process or leader)")
        return np.frombuffer(_recv_exact(self._sock, _HEADER_BYTES),
                             np.int64)

    def recv(self, shape: tuple, dtype) -> np.ndarray:
        if self._sock is None:
            raise RuntimeError("recv on a crew with no control stream")
        n = int(np.prod(shape)) * np.dtype(dtype).itemsize
        return np.frombuffer(_recv_exact(self._sock, n),
                             dtype).reshape(shape)


_REPL_JIT: dict = {}  # mesh -> jitted replicate-identity (avoid a
#                       guaranteed recompile per save from a fresh lambda)


def _replicated(arr, mesh):
    """DISPATCH an all-gather of a mesh-sharded array to every process
    (host RAM cost: one full copy once materialized), via a cached
    jitted identity with replicated out-sharding — a collective, so
    every process must dispatch it in lockstep. Returns the async
    jax.Array; the caller materializes it OFF the crew lock."""
    fn = _REPL_JIT.get(mesh)
    if fn is None:
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P
        fn = jax.jit(lambda x: x, out_shardings=NamedSharding(mesh, P()))
        _REPL_JIT[mesh] = fn
    return fn(arr)


def _gather_snapshot(inner) -> dict:
    """Collective: dispatch replication of the index buffers and package
    them in the exact array set ShardedFlatIndex.deferred_save writes,
    so the snapshot is byte-layout-identical to a single-process one.
    Values are still async jax.Arrays (plus host scalars) — dispatch
    order is what must stay in lockstep across processes; the multi-GB
    readback happens in _materialize, outside the crew lock."""
    has_scales = inner.dtype in ("i8", "i4")
    has_exact = inner.exact is not None
    return dict(
        kind="sharded",
        codes=_replicated(inner._codes, inner.mesh),
        scales=(_replicated(inner._scales, inner.mesh) if has_scales
                else np.empty(0)),
        exact=(_replicated(inner._exact, inner.mesh) if has_exact
               else np.empty(0)),
        ids=_replicated(inner._ids, inner.mesh),
        counts=np.array(inner._counts),
        next_id=inner._next_id,
        dtype=inner.dtype,
        dim=inner.dim,
    )


def _materialize(blobs: dict) -> dict:
    """Force the gathered buffers to host numpy (blocks on the transfer;
    inputs are immutable jax.Arrays already scheduled, so later adds
    cannot change what this reads)."""
    return {k: np.asarray(v) for k, v in blobs.items()}


def _pad8(n: int) -> int:
    return -(-n // 8) * 8


def _pack_plan(plan: dict) -> tuple[np.ndarray, tuple]:
    """Serialize a _prepare_add plan into (meta, one uint8 payload).
    Layout (every section 8-byte aligned so the follower can view
    in place): row_blocks | scale_blocks? | exact_blocks? | id_blocks |
    lens | starts | ids."""
    parts = [plan["row_blocks"]]
    if plan["scale_blocks"] is not None:
        parts.append(plan["scale_blocks"])
    if plan["exact_blocks"] is not None:
        parts.append(plan["exact_blocks"])
    parts += [plan["id_blocks"], plan["lens"], plan["starts"], plan["ids"]]
    sizes = [_pad8(p.nbytes) for p in parts]
    buf = np.zeros(sum(sizes), np.uint8)
    off = 0
    for p, sz in zip(parts, sizes):
        # one copy per part (the slice-assign); tobytes() would
        # materialize a second full intermediate on the hot ingest path
        buf[off:off + p.nbytes] = np.ascontiguousarray(p).reshape(-1) \
            .view(np.uint8)
        off += sz
    S, max_rows = plan["id_blocks"].shape
    n = plan["ids"].shape[0]
    dim = plan["row_blocks"].shape[2]
    meta = (S, max_rows, n, dim, plan["grown_cap"])
    return meta, (buf,)


def _unpack_plan(inner, h: np.ndarray, buf: np.ndarray) -> dict:
    """Inverse of _pack_plan, shapes from the header + the follower's
    own (identical) index config."""
    S, max_rows, n, dim, grown_cap = (int(h[1]), int(h[2]), int(h[3]),
                                      int(h[4]), int(h[5]))
    row_dt = {"f32": np.float32, "bf16": np.float32, "i8": np.int8,
              "i4": np.uint8}[inner.dtype]
    has_scales = inner.dtype in ("i8", "i4")
    has_exact = inner.exact is not None
    off = 0

    def take(shape, dtype):
        nonlocal off
        nbytes = int(np.prod(shape)) * np.dtype(dtype).itemsize
        a = buf[off:off + nbytes].view(dtype).reshape(shape)
        off += _pad8(nbytes)
        return a

    plan = dict(grown_cap=grown_cap)
    plan["row_blocks"] = take((S, max_rows, dim), row_dt)
    plan["scale_blocks"] = (take((S, max_rows), np.float32)
                            if has_scales else None)
    plan["exact_blocks"] = (take((S, max_rows, dim), np.float16)
                            if has_exact else None)
    plan["id_blocks"] = take((S, max_rows), np.int32)
    plan["lens"] = take((S,), np.int32)
    plan["starts"] = take((S,), np.int32)
    plan["ids"] = take((n,), np.int64)
    return plan


def _bucket(n: int, lo: int = 8) -> int:
    """Next power of two >= n (>= lo): bounds the DEVICE search
    program's batch-shape count to O(log max_batch) compiles (the wire
    itself carries exact sizes — TCP frames need no shape bucketing)."""
    return max(lo, 1 << (max(n, 1) - 1).bit_length())


class MultihostShardedIndex:
    """Leader-side index: ShardedFlatIndex surface, send-prefixed.

    Wraps (not subclasses) so the fused serving paths' isinstance gates
    reject it and every mutation/search funnels through add()/search()
    — the two entry points the followers mirror."""

    def __init__(self, inner, crew: MultihostCrew, flush_rows: int = 8192):
        self.inner = inner
        self.crew = crew
        # ADD coalescing (module docstring): pending host rows await one
        # combined broadcast. All pending state is guarded by crew.lock
        # (the same lock that orders the stream, so flush-before-search
        # is race-free by construction). flush_rows <= 1 disables.
        self.flush_rows = max(1, int(flush_rows))
        self._pending: list[tuple[np.ndarray, np.ndarray]] = []
        self._pending_n = 0
        self._pending_next = inner._next_id

    # -- delegated read-only surface ---------------------------------------

    def __len__(self) -> int:
        return len(self.inner) + self._pending_n

    @property
    def dim(self) -> int:
        return self.inner.dim

    @property
    def dtype(self) -> str:
        return self.inner.dtype

    @property
    def capacity(self) -> int:
        return self.inner.capacity

    @property
    def max_capacity(self):
        return self.inner.max_capacity

    @property
    def nbytes(self) -> int:
        return self.inner.nbytes

    @property
    def device_rerank(self) -> bool:
        return self.inner.device_rerank

    def device_fetch_width(self, k: int) -> int:
        return self.inner.device_fetch_width(k)

    # -- send-prefixed ops ---------------------------------------------------

    def add(self, vectors, ids=None) -> np.ndarray:
        rows = np.asarray(vectors, np.float32)
        if rows.ndim == 1:
            rows = rows[None, :]
        if rows.ndim != 2 or rows.shape[1] != self.inner.dim:
            raise ValueError(f"expected (n, {self.inner.dim}) rows, got "
                             f"{rows.shape}")
        n = rows.shape[0]
        if n == 0:
            return np.empty((0,), np.int64)
        with self.crew.lock:
            # Deterministic refusal HERE, against committed + pending
            # occupancy, so the deferred flush can never refuse and
            # followers never see a refused op (the follower-loop
            # contract). Same condition as ShardedFlatIndex._plan_insert:
            # total remaining room after all permitted growth.
            free = self.inner.free_slots()
            if free is not None and self._pending_n + n > free:
                from dawnsearch_tpu.index.flat import IndexFull
                raise IndexFull(
                    f"sharded index full: {n} rows, "
                    f"{max(0, free - self._pending_n)} free slots")
            if ids is None:
                # materialize ids HERE so the wire pins them — both sides
                # then insert identical (row, id) pairs by contract, not
                # by trusting _next_id to have stayed in sync
                ids = np.arange(self._pending_next,
                                self._pending_next + n, dtype=np.int64)
            ids = np.asarray(ids, np.int64)
            if len(ids) != n:
                raise ValueError("ids/rows length mismatch")
            if len(ids):
                self._pending_next = max(self._pending_next,
                                         int(ids.max()) + 1)
            self._pending.append((rows, ids))
            self._pending_n += n
            if self._pending_n >= self.flush_rows:
                self._flush_pending()
            return ids

    def _flush_pending(self) -> None:
        """Broadcast + commit every queued add as ONE prepared plan.
        Caller holds crew.lock."""
        if not self._pending:
            return
        if len(self._pending) == 1:
            rows, ids = self._pending[0]
        else:
            rows = np.concatenate([r for r, _ in self._pending])
            ids = np.concatenate([i for _, i in self._pending])
        self._pending.clear()
        self._pending_n = 0
        # host half ONCE, on the leader: quantize + stripe plan + block
        # build (+ any growth, which the plan records so the follower
        # replays it). Cannot refuse: add() pre-checked occupancy.
        plan = self.inner._prepare_add(rows, ids)
        meta, payloads = _pack_plan(plan)
        self.crew.send(OP_ADD, meta, payloads)
        self.inner._commit_add(plan)
        self._pending_next = max(self._pending_next, self.inner._next_id)

    def flush(self) -> None:
        """Commit pending adds now (search/save do this implicitly)."""
        with self.crew.lock:
            self._flush_pending()

    def search(self, queries, k: int):
        q = np.asarray(queries, np.float32)
        single = q.ndim == 1
        if single:
            q = q[None, :]
        B = q.shape[0]
        Bp = _bucket(B)
        qp = np.empty((Bp, q.shape[1]), np.float32)
        qp[:B] = q
        qp[B:] = q[0]  # pad by repetition: padding must stay unit-norm
        with self.crew.lock:
            self._flush_pending()  # results must observe queued adds
            self.crew.send(OP_SEARCH, (Bp, B, k, q.shape[1]), (qp,))
            d, u = self.inner.search(qp, k)
        d, u = d[:B], u[:B]
        if single:
            return d[0], u[0]
        return d, u

    def save(self, path: str) -> None:
        self.deferred_save()(path)

    def deferred_save(self):
        """Collective gather DISPATCH now (all processes in lockstep,
        ~ms under the crew lock), readback + file write deferred to the
        returned callable — so the caller's deferred-write contract
        (provider autosave off the query path) holds for the multi-GB
        readback too, and the follower side has no file to write.

        HBM cost of the deferral window: the gather replicates the full
        index buffers on every device until write() drops them. The
        device-to-host copy is started EAGERLY (copy_to_host_async)
        right after dispatch, so write()'s materialization doesn't
        re-wait on the transfer — but the device copies free only when
        write() runs; call it promptly (the provider autosave does)."""
        from dawnsearch_tpu.index.flat import _atomic_savez
        with self.crew.lock:
            self._flush_pending()  # the snapshot must hold queued adds
            self.crew.send(OP_SAVE)
            blobs = _gather_snapshot(self.inner)
        for v in blobs.values():
            if hasattr(v, "copy_to_host_async"):
                v.copy_to_host_async()

        def write(path: str) -> None:
            _atomic_savez(path, **_materialize(blobs))
            blobs.clear()  # free the replicated device copies

        return write


def build_fresh(crew: MultihostCrew, make_inner, dim: int,
                flush_rows: int = 8192) -> MultihostShardedIndex:
    """Announce INIT(fresh), then construct — under the crew lock, and
    in that order: materializing device buffers on a cross-process mesh
    is ITSELF a collective (device_put reshards across hosts), so the
    followers must be constructing their replica concurrently, and no
    keepalive ping may interleave with the construction collectives. A
    second INIT (the provider discarded a stale snapshot and rebuilt)
    makes followers rebuild too."""
    with crew.lock:
        crew.send(OP_INIT, (0, dim))
        inner = make_inner()
    return MultihostShardedIndex(inner, crew, flush_rows=flush_rows)


def crew_sharded_loader(crew: MultihostCrew, flush_rows: int = 8192):
    """`load_index(_sharded_loader=...)` hook: announce INIT(loaded)
    BEFORE loading (see build_fresh — the load's device_puts are
    collectives), then load + wrap under the crew lock. If the load
    raises, the follower loading the same snapshot bytes raises
    identically and returns to its INIT wait, while the provider falls
    back to the factory — which announces a fresh INIT."""
    import numpy as np

    from dawnsearch_tpu.parallel.sharded_index import ShardedFlatIndex

    def load(path: str, kwargs: dict) -> MultihostShardedIndex:
        with np.load(path, allow_pickle=False) as z:
            dim = int(z["dim"])
        with crew.lock:
            crew.send(OP_INIT, (1, dim))
            inner = ShardedFlatIndex.load(path, **kwargs)
        return MultihostShardedIndex(inner, crew, flush_rows=flush_rows)

    return load


def run_follower(crew: MultihostCrew, cfg, index_path: str) -> None:
    """The follower loop: materialize the index replica on INIT, then
    mirror every stream op until OP_STOP. Payloads are received
    unconditionally (a skipped recv would desync the stream). The
    exception contract is uniform with INIT: only DETERMINISTIC
    host-side refusals (ValueError validation, IndexFull capacity) are
    co-skipped — they raised identically on the leader BEFORE any
    dispatch, so both sides skip the program and stay in lockstep.
    (ADD cannot refuse here at all: the leader refuses in _prepare_add,
    before the op hits the wire.) Anything else (device OOM, XLA
    runtime error — follower-LOCAL failures) propagates and kills this
    process: fail-stop, because the leader has already dispatched or
    will dispatch its half of a global-mesh collective this process can
    no longer match, and a logged-and-continued desync would wedge the
    crew silently at the NEXT collective instead (round-3 VERDICT
    weak-4). An op arriving while this follower has no index is the
    same fail-stop."""
    from dawnsearch_tpu.index import load_index
    from dawnsearch_tpu.index.flat import IndexFull
    from dawnsearch_tpu.node import make_index_factory

    inner = None
    while True:
        h = crew.recv_header()
        op = int(h[0])
        if op == OP_PING:
            continue
        if op == OP_STOP:
            log.info("follower released")
            return
        if op == OP_INIT:
            loaded, dim = int(h[1]), int(h[2])
            factory = make_index_factory(cfg, dim=dim)
            try:
                if loaded:
                    lk = factory.load_kwargs()
                    inner = load_index(index_path, **lk)
                else:
                    inner = factory()
            except Exception:
                # the leader's twin load raised the same way (same
                # snapshot bytes, same code); it will announce a fresh
                # INIT from its factory fallback — wait for it
                inner = None
                log.exception("follower INIT failed; awaiting re-INIT")
                continue
            log.info("follower index ready (loaded=%d, dim=%d, %d rows)",
                     loaded, dim, len(inner))
            continue
        # payload shapes come from the HEADER, never from local state:
        # payloads are consumed unconditionally even when this follower
        # has no index yet (a skipped recv would desync the stream)
        # inner is None past this point means this follower's INIT
        # failed for a follower-local reason (NFS hiccup, OOM) while the
        # leader's succeeded — the leader is about to enter a global-mesh
        # collective we cannot join. Skipping it would hang the leader
        # inside the device program forever; fail-stop instead (the
        # module contract: a desynced process takes the crew down
        # visibly, via the runtime's distributed error).
        if op == OP_SEARCH:
            bp, b, k, dim = (int(h[1]), int(h[2]), int(h[3]), int(h[4]))
            q = crew.recv((bp, dim), np.float32)
            if inner is None:
                raise RuntimeError(
                    "follower got SEARCH with no index (INIT failed "
                    "locally while the leader's succeeded) — failing "
                    "stop rather than desyncing the collective")
            try:
                inner.search(q, k)
            except (ValueError, IndexFull):
                # deterministic host-side refusal: the leader's twin
                # call raised identically BEFORE dispatching, so both
                # sides skip the program and stay in lockstep
                log.exception("follower search refused (leader too)")
        elif op == OP_ADD:
            # the leader's finished _prepare_add plan: per-shard blocks,
            # already quantized/striped — this follower's only job is
            # the device half (_commit_add), bit-identical by
            # construction. Payload size from the header + this
            # follower's own (identical) index config.
            S, max_rows, n, dim = (int(h[1]), int(h[2]), int(h[3]),
                                   int(h[4]))
            row_dt = {"f32": 4, "bf16": 4, "i8": 1, "i4": 1}
            if inner is None:
                # even the recv size needs inner.dtype — nothing sane
                # to consume; fail-stop (leader will wedge visibly)
                raise RuntimeError(
                    "follower got ADD with no index (INIT failed "
                    "locally while the leader's succeeded) — failing "
                    "stop rather than desyncing the collective")
            nbytes = _pad8(S * max_rows * dim * row_dt[inner.dtype])
            if inner.dtype in ("i8", "i4"):
                nbytes += _pad8(S * max_rows * 4)
            if inner.exact is not None:
                nbytes += _pad8(S * max_rows * dim * 2)
            nbytes += _pad8(S * max_rows * 4)  # id_blocks
            nbytes += 2 * _pad8(S * 4)         # lens, starts
            nbytes += _pad8(n * 8)             # ids
            buf = crew.recv((nbytes,), np.uint8)
            plan = _unpack_plan(inner, h, buf)
            inner._commit_add(plan)
        elif op == OP_SAVE:
            if inner is None:
                raise RuntimeError(
                    "follower got SAVE with no index (INIT failed "
                    "locally while the leader's succeeded) — failing "
                    "stop rather than desyncing the collective")
            try:
                _gather_snapshot(inner)  # participate; leader writes
            except (ValueError, IndexFull):
                log.exception("follower save-gather refused (leader too)")
        else:
            log.warning("unknown op %d — ignored", op)


def follower_main(cfg) -> None:
    """Entry point for `python -m dawnsearch_tpu` when
    dist_process_id > 0: join the cluster, mirror the leader until
    OP_STOP. No encoder, store, or frontend — the follower's entire job
    is the device half of the SPMD programs."""
    import os

    init_distributed(cfg.dist_coordinator, cfg.dist_num_processes,
                     cfg.dist_process_id)
    crew = MultihostCrew(ping_interval=cfg.dist_ping_interval,
                         coordinator=cfg.dist_coordinator,
                         control_port=cfg.dist_control_port)
    from dawnsearch_tpu.index.provider import INDEX_FILE
    index_path = os.path.join(cfg.data_dir, INDEX_FILE)
    run_follower(crew, cfg, index_path)
