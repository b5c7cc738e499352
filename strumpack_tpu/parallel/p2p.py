"""Host-side point-to-point exchange between jax.distributed processes.

The reference's distributed symbolic phase and subtree redistribution
use MPI point-to-point (isend/recv_any_src in
``EliminationTreeMPIDist.cpp:470-587``, packed ``RedistSubTree`` buffers
in ``Redistribute.hpp:136``).  JAX exposes only device collectives and
`multihost_utils.process_allgather` — an allgather of row blocks
replicates the whole matrix on every host, exactly the memory ceiling a
distributed symbolic exists to remove.  This module provides the missing
primitive: a TCP alltoallv between the processes of one
``jax.distributed`` job.

Rendezvous: each process opens a listening socket and the (host, port)
pairs are shared through ONE tiny `process_allgather`.  The exchange
itself runs a ring schedule (P-1 rounds; round r sends to
``(pid+r) % P`` while receiving from ``(pid-r) % P``), so per-process
traffic is only what was addressed to it.
"""
from __future__ import annotations

import pickle
import socket
import struct
import threading


_SERVER = None          # (socket, host, port)
_ADDRS = None           # [(host, port)] per process


def _ensure_server():
    global _SERVER, _ADDRS
    if _SERVER is not None:
        return
    import jax
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(max(jax.process_count(), 8))
    host, port = srv.getsockname()
    _SERVER = srv
    import numpy as np
    from jax.experimental import multihost_utils as mh
    # ship the port through one allgather of a single int (hosts are
    # assumed reachable at the coordinator-visible address; for the
    # single-machine oversubscribed runs this is loopback)
    ports = np.asarray(mh.process_allgather(np.asarray([port]))).reshape(-1)
    _ADDRS = [("127.0.0.1", int(p)) for p in ports]


def _send_all(sock, payload: bytes):
    sock.sendall(struct.pack("<Q", len(payload)))
    sock.sendall(payload)


def _recv_all(sock) -> bytes:
    def read(nbytes):
        buf = b""
        while len(buf) < nbytes:
            chunk = sock.recv(nbytes - len(buf))
            if not chunk:
                raise ConnectionError("peer closed during recv")
            buf += chunk
        return buf
    (ln,) = struct.unpack("<Q", read(8))
    return read(ln)


def alltoallv(dest_objs: dict[int, object]) -> dict[int, object]:
    """Send ``dest_objs[q]`` (any picklable object) to process q; returns
    {p: obj} for every process p that addressed this one.  Collective —
    every process must call it the same number of times."""
    import jax
    P = jax.process_count()
    pid = jax.process_index()
    if P == 1:
        out = {}
        if pid in dest_objs:
            out[pid] = dest_objs[pid]
        return out
    _ensure_server()
    srv = _SERVER
    received: dict[int, object] = {}
    if pid in dest_objs:
        received[pid] = dest_objs[pid]

    def recv_round():
        conn, _ = srv.accept()
        try:
            src, payload = pickle.loads(_recv_all(conn))
            received[src] = payload
        finally:
            conn.close()

    for r in range(1, P):
        dst = (pid + r) % P
        t = threading.Thread(target=recv_round, daemon=True)
        t.start()
        c = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        c.connect(_ADDRS[dst])
        try:
            _send_all(c, pickle.dumps(
                (pid, dest_objs.get(dst)), protocol=pickle.HIGHEST_PROTOCOL))
        finally:
            c.close()
        t.join(timeout=600)
        if t.is_alive():
            raise TimeoutError(f"p2p round {r}: receive timed out")
    return {p: o for p, o in received.items() if o is not None}
