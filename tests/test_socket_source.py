"""Live socket ingestion tests: UDP (RFC 5426 one-datagram-one-message)
and TCP (RFC 6587 octet-counting + LF framing) receivers feeding the
same parse stages as the batch flagship, checked against the per-row
reference parser on identical lines."""

import socket
import time

import numpy as np
import pyarrow as pa

from sylk.functions.reference_semantics import parse_line
from sylk.sources.socket_source import (TCPLineReceiver, UDPLineReceiver,
                                        serve_counts)
from sylk.sources.transcripts import synth_batch


def _lines(n: int) -> list[str]:
    return synth_batch(np.arange(n, dtype=np.int64)).column("text").to_pylist()


def _expected_counts(lines: list[str]) -> dict[tuple[int, int], int]:
    out: dict[tuple[int, int], int] = {}
    for ln in lines:
        rec = parse_line(ln)
        if rec["ok"]:
            k = (rec["facility"], rec["severity"])
            out[k] = out.get(k, 0) + 1
    return out


def _wait_pending(receiver, expect: int, timeout: float = 10.0) -> int:
    import ray

    deadline = time.time() + timeout
    while time.time() < deadline:
        n = ray.get(receiver.pending.remote())
        if n >= expect:
            return n
        time.sleep(0.05)
    return ray.get(receiver.pending.remote())


def test_udp_receiver_end_to_end(ray_session):
    import ray

    lines = _lines(400)
    recv = UDPLineReceiver.remote()
    host, port = ray.get(recv.address.remote())
    try:
        s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        for i, ln in enumerate(lines):
            s.sendto(ln.encode(), (host, port))
            if i % 100 == 99:  # pace the burst like a real shipper
                time.sleep(0.01)
        s.close()
        got = _wait_pending(recv, len(lines))
        # loopback UDP at this size/pace must not shed; full delivery
        assert got == len(lines)
        totals, rows = serve_counts(recv, poll_s=0.05, idle_exit=2)
        assert rows == len(lines)
        expected = _expected_counts(lines)
        actual = {(f, sv): n for f, sv, n in zip(
            totals.column("facility").to_pylist(),
            totals.column("severity").to_pylist(),
            totals.column("n").to_pylist())}
        assert actual == expected
    finally:
        ray.get(recv.stop.remote())


def test_tcp_receiver_both_framings(ray_session):
    import ray

    lines = _lines(120)
    recv = TCPLineReceiver.remote()
    host, port = ray.get(recv.address.remote())
    try:
        # connection 1: RFC 6587 octet counting (<len> SP <msg>)
        c1 = socket.create_connection((host, port))
        for ln in lines[:60]:
            b = ln.encode()
            c1.sendall(str(len(b)).encode() + b" " + b)
        c1.close()
        # connection 2: LF non-transparent framing, incl. a final
        # unterminated line and CRLF endings
        c2 = socket.create_connection((host, port))
        payload = b"\r\n".join(ln.encode() for ln in lines[60:])
        c2.sendall(payload)  # last line has no trailing LF
        c2.close()
        got = _wait_pending(recv, len(lines))
        assert got == len(lines)
        tbl = ray.get(recv.drain.remote())
        assert sorted(tbl.column("text").to_pylist()) == sorted(lines)
        # buffer empties after drain; a second drain is schema-stable
        empty = ray.get(recv.drain.remote())
        assert empty.num_rows == 0 and empty.schema.names == [
            "text", "recv_ns", "peer"]
    finally:
        ray.get(recv.stop.remote())


def test_udp_receiver_invalid_utf8(ray_session):
    """Invalid UTF-8 datagrams decode with replacement and flow through
    (the parse stage's Unicode rejection semantics then apply)."""
    import ray

    recv = UDPLineReceiver.remote()
    host, port = ray.get(recv.address.remote())
    try:
        s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        s.sendto(b"<34>1 - - - - - - \xff\xfe", (host, port))
        s.close()
        assert _wait_pending(recv, 1) == 1
        tbl = ray.get(recv.drain.remote())
        assert tbl.num_rows == 1
        assert "�" in tbl.column("text").to_pylist()[0]
    finally:
        ray.get(recv.stop.remote())


def _wait_count(fn_remote, expect: int, timeout: float = 10.0) -> int:
    import ray

    deadline = time.time() + timeout
    while time.time() < deadline:
        v = ray.get(fn_remote.remote())
        if v >= expect:
            return v
        time.sleep(0.05)
    return ray.get(fn_remote.remote())


def test_tcp_receiver_frame_overflow_bounded(ray_session):
    """ADVICE r5: an unvalidated octet-count header or a delimiter-free
    stream must not grow the per-connection buffer without bound — the
    receiver counts a drop and closes the connection, and keeps serving
    well-formed peers."""
    import ray

    recv = TCPLineReceiver.remote(max_frame=256)
    host, port = ray.get(recv.address.remote())
    try:
        # hostile octet-count header: dropped + connection closed
        c1 = socket.create_connection((host, port))
        c1.sendall(b"999999999999 ")
        assert _wait_count(recv.dropped, 1) == 1
        c1.settimeout(5)
        assert c1.recv(1) == b""  # receiver closed its side
        c1.close()
        # delimiter-free LF stream beyond the cap: dropped too
        c2 = socket.create_connection((host, port))
        c2.sendall(b"x" * 1000)
        assert _wait_count(recv.dropped, 2) == 2
        c2.close()
        # nothing buffered from either hostile peer; new peers still work
        assert ray.get(recv.pending.remote()) == 0
        c3 = socket.create_connection((host, port))
        c3.sendall(b"5 hello")
        c3.close()
        assert _wait_pending(recv, 1) == 1
        tbl = ray.get(recv.drain.remote())
        assert tbl.column("text").to_pylist() == ["hello"]
    finally:
        ray.get(recv.stop.remote())
