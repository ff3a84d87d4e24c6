"""TCP front for the serving host: cross-process waveform inference.

No reference equivalent (/root/reference/main.py serves nothing over the
wire). A stdlib-only length-prefixed binary protocol — deliberately
boring, so any language can speak it without a codegen step:

request  : magic ``b"SFN1"`` + ``<II`` (k, L) + k*L float32 (LE)
response : ``<iI``  (status, m)
           status 0: m = E (coords per waveform), then k*E float32
           status 1: m = byte length of a UTF-8 error message, then it
           status 2: m = byte length of a UTF-8 JSON document, then it

stats    : magic ``b"SFNS"`` (no further header) → status-2 response with
           the host's live stats (occupancy, latency percentiles, bucket
           counts; per-length when the daemon routes several artifacts) —
           production monitoring without stopping the daemon

A connection carries any number of request/response cycles (connection
reuse amortizes the TCP handshake at high request rates); requests from
MANY connections coalesce into shared device batches via ``ServingHost``.
The server is a ``ThreadingTCPServer``: one OS thread per connection
blocks on its Future while the single dispatcher thread feeds the chip —
the thread count is bounded by open connections, not request rate.
"""

from __future__ import annotations

import socket
import socketserver
import struct
import threading
from typing import Optional, Tuple

import numpy as np

from stofnet_tpu.serving.host import ServingHost

MAGIC = b"SFN1"
STATS_MAGIC = b"SFNS"
_REQ_HDR = struct.Struct("<II")
_RSP_HDR = struct.Struct("<iI")
# sanity bound on k*L so a corrupt/hostile header cannot make the server
# attempt a multi-GB read (128 Mi samples = 512 MB payload)
_MAX_SAMPLES = 128 * 1024 * 1024


def _recv_exact(sock_file, n: int) -> Optional[bytes]:
    """Read exactly n bytes from a file-like socket; None on clean EOF at
    a message boundary; raises on a mid-message EOF."""
    buf = sock_file.read(n)
    if not buf:
        return None
    if len(buf) != n:
        raise ConnectionError(f"short read: wanted {n} bytes, got {len(buf)}")
    return buf


class _Handler(socketserver.StreamRequestHandler):
    def handle(self) -> None:
        while True:
            magic = _recv_exact(self.rfile, len(MAGIC))
            if magic is None:
                return  # client closed between requests
            if magic == STATS_MAGIC:
                import json

                data = json.dumps(self.server.host.stats()).encode()
                self.wfile.write(_RSP_HDR.pack(2, len(data)) + data)
                self.wfile.flush()
                continue
            if magic != MAGIC:
                self._send_error(f"bad magic {magic!r}")
                return  # framing is lost; drop the connection
            head = _recv_exact(self.rfile, _REQ_HDR.size)
            if head is None:
                raise ConnectionError("EOF inside request header")
            k, length = _REQ_HDR.unpack(head)
            if not (1 <= k * length <= _MAX_SAMPLES):
                self._send_error(f"refusing request of {k}x{length} samples")
                return
            payload = _recv_exact(self.rfile, 4 * k * length)
            if payload is None:
                raise ConnectionError("EOF inside request payload")
            x = np.frombuffer(payload, "<f4").reshape(k, 1, length)
            try:
                out = np.asarray(self.server.host.infer(x), "<f4")
            except Exception as e:  # noqa: BLE001 — report, keep serving
                self._send_error(f"{type(e).__name__}: {e}")
                continue
            self.wfile.write(_RSP_HDR.pack(0, out.shape[1]))
            self.wfile.write(out.tobytes())
            self.wfile.flush()

    def _send_error(self, msg: str) -> None:
        data = msg.encode()
        self.wfile.write(_RSP_HDR.pack(1, len(data)) + data)
        self.wfile.flush()


class ServingTCPServer(socketserver.ThreadingTCPServer):
    allow_reuse_address = True
    daemon_threads = True

    def __init__(self, address: Tuple[str, int], host: ServingHost):
        super().__init__(address, _Handler)
        self.host = host


def start_server(host: ServingHost, address: Tuple[str, int] = ("127.0.0.1", 0)
                 ) -> Tuple[ServingTCPServer, threading.Thread, int]:
    """Bind (port 0 = ephemeral), serve on a daemon thread; returns
    (server, thread, bound_port). Stop with ``server.shutdown()``."""
    server = ServingTCPServer(address, host)
    thread = threading.Thread(target=server.serve_forever, daemon=True,
                              name="stofnet-serving-tcp")
    thread.start()
    return server, thread, server.server_address[1]


class ServingClient:
    """Blocking client for the protocol above. One in-flight request per
    client; open one client per concurrent caller (or pool them)."""

    def __init__(self, address: Tuple[str, int], timeout: float = 120.0):
        self._sock = socket.create_connection(address, timeout=timeout)
        self._f = self._sock.makefile("rwb")

    def infer(self, x: np.ndarray) -> np.ndarray:
        """(L,) → (E,); (k, L) or (k, 1, L) → (k, E)."""
        x = np.asarray(x, "<f4")
        squeeze = x.ndim == 1
        rows = x.reshape((1, -1) if squeeze else (x.shape[0], -1))
        k, length = rows.shape
        self._f.write(MAGIC + _REQ_HDR.pack(k, length) + rows.tobytes())
        self._f.flush()
        head = _recv_exact(self._f, _RSP_HDR.size)
        if head is None:
            raise ConnectionError("server closed the connection")
        status, m = _RSP_HDR.unpack(head)
        body = _recv_exact(self._f, (4 * k * m) if status == 0 else m)
        if status != 0:
            raise RuntimeError(f"server error: "
                               f"{(body or b'').decode(errors='replace')}")
        if body is None:
            raise ConnectionError("EOF inside response payload")
        out = np.frombuffer(body, "<f4").reshape(k, m)
        return out[0] if squeeze else out

    def stats(self) -> dict:
        """Query the daemon's live serving stats (occupancy, latency
        percentiles, bucket counts; per-length for routed daemons)."""
        import json

        self._f.write(STATS_MAGIC)
        self._f.flush()
        head = _recv_exact(self._f, _RSP_HDR.size)
        if head is None:
            raise ConnectionError("server closed the connection")
        status, m = _RSP_HDR.unpack(head)
        body = _recv_exact(self._f, m)
        if status == 1:
            raise RuntimeError(f"server error: "
                               f"{(body or b'').decode(errors='replace')}")
        if status != 2 or body is None:
            raise ConnectionError(f"bad stats response (status={status})")
        return json.loads(body.decode())

    def close(self) -> None:
        try:
            self._f.close()
        finally:
            self._sock.close()

    def __enter__(self) -> "ServingClient":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
