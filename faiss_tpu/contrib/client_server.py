"""Distributed search over sockets — analogue of contrib/rpc.py +
contrib/client_server.py.

A SearchServer serves one index over a localhost/remote TCP socket with a
length-prefixed JSON+binary protocol (no pickle: untrusted peers must not
gain code execution — an intentional deviation from the reference's
pickle-RPC). ClientIndex fans a query out to many servers and merges with
k-select, the IndexShards pattern over machines.

For intra-pod scale-out prefer parallel/sharded.py (ICI collectives); this
module covers the multi-host-over-TCP deployment recipe.
"""

from __future__ import annotations

import json
import socket
import socketserver
import struct
import threading

import numpy as np

from ..extra import merge_knn_results


def _send_msg(sock, header: dict, arrays: list[np.ndarray]) -> None:
    header = dict(header)
    header["arrays"] = [
        {"dtype": str(a.dtype), "shape": list(a.shape)} for a in arrays
    ]
    hbytes = json.dumps(header).encode()
    sock.sendall(struct.pack("<I", len(hbytes)))
    sock.sendall(hbytes)
    for a in arrays:
        b = np.ascontiguousarray(a).tobytes()
        sock.sendall(struct.pack("<Q", len(b)))
        sock.sendall(b)


def _recv_exact(sock, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("peer closed")
        buf += chunk
    return buf


def _recv_msg(sock):
    (hlen,) = struct.unpack("<I", _recv_exact(sock, 4))
    header = json.loads(_recv_exact(sock, hlen))
    arrays = []
    for spec in header.pop("arrays", []):
        (blen,) = struct.unpack("<Q", _recv_exact(sock, 8))
        a = np.frombuffer(_recv_exact(sock, blen), dtype=spec["dtype"])
        arrays.append(a.reshape(spec["shape"]))
    return header, arrays


class SearchServer:
    """Serve index.search over TCP (reference: rpc.py Server)."""

    def __init__(self, index, port: int = 0, host: str = "127.0.0.1"):
        self.index = index
        outer = self

        class Handler(socketserver.BaseRequestHandler):
            def handle(self):
                while True:
                    try:
                        header, arrays = _recv_msg(self.request)
                    except (ConnectionError, struct.error):
                        return
                    if header["op"] == "search":
                        D, I = outer.index.search(arrays[0], header["k"])
                        _send_msg(self.request, {"ok": True}, [D, I.astype(np.int64)])
                    elif header["op"] == "ntotal":
                        _send_msg(
                            self.request,
                            {"ok": True, "ntotal": outer.index.ntotal},
                            [],
                        )
                    elif header["op"] == "close":
                        return

        self.server = socketserver.ThreadingTCPServer((host, port), Handler)
        self.server.daemon_threads = True
        self.port = self.server.server_address[1]
        self.thread = threading.Thread(target=self.server.serve_forever, daemon=True)

    def start(self):
        self.thread.start()
        return self

    def stop(self):
        self.server.shutdown()


class ClientIndex:
    """Fan out searches to index servers and merge
    (reference: contrib/client_server.py:17 ClientIndex)."""

    def __init__(self, machine_ports):
        self.socks = []
        for host, port in machine_ports:
            s = socket.create_connection((host, port))
            self.socks.append(s)
        self.ntotal = 0
        for s in self.socks:
            _send_msg(s, {"op": "ntotal"}, [])
            header, _ = _recv_msg(s)
            self.ntotal += header["ntotal"]

    def search(self, x, k: int):
        x = np.ascontiguousarray(x, np.float32)
        Ds, Is = [], []
        for s in self.socks:  # could be parallelized with threads
            _send_msg(s, {"op": "search", "k": k}, [x])
        for s in self.socks:
            _, (D, I) = _recv_msg(s)
            Ds.append(D)
            Is.append(I)
        return merge_knn_results(np.stack(Ds), np.stack(Is))

    def close(self):
        for s in self.socks:
            try:
                _send_msg(s, {"op": "close"}, [])
                s.close()
            except OSError:
                pass
