"""Loopback coverage for the driver-plane transports (SURVEY §2.1 S1/S2/
S3/S10 — reference util.py:192-241, runcommand.py:463-498, github.py:60-143).

The real hosts are unreachable in this sandbox, so each transport runs
against an in-process 127.0.0.1 stub: a stdlib HTTP server for the chunked
download and versioned-file fetch, a minimal socket-level FTP server for
the listing+regex select, and an S3-shaped PUT recorder behind boto3's
``endpoint_url`` seam.  This executes the exact client code paths the
cluster would use — only the peer is faked.
"""

from __future__ import annotations

import http.server
import os
import re
import socket
import threading

import pytest

from db_migration_spark.sources.ingest import (
    fetch_versioned_file,
    ftp_select,
    http_download,
    s3_upload,
)


# ---------------------------------------------------------------------------
# HTTP (S2 chunked download + S3 versioned-file fetch)
# ---------------------------------------------------------------------------


class _Handler(http.server.BaseHTTPRequestHandler):
    payload = b"x" * (25 * 1024) + b"END"  # > 2 chunks at 10 KiB

    def do_GET(self):  # noqa: N802 — http.server API
        self.send_response(200)
        self.send_header("Content-Length", str(len(self.payload)))
        self.end_headers()
        self.wfile.write(self.payload)

    def log_message(self, *a):  # silence
        pass


@pytest.fixture()
def http_port():
    srv = http.server.HTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv.server_address[1]
    srv.shutdown()


def test_http_download_chunked(http_port, tmp_path):
    dest = str(tmp_path / "dl" / "file.bin")
    out = http_download(f"http://127.0.0.1:{http_port}/file.bin", dest)
    assert out == dest
    with open(dest, "rb") as fh:
        assert fh.read() == _Handler.payload


def test_fetch_versioned_file_builds_tag_url(http_port, tmp_path):
    dest = str(tmp_path / "models.wrm")
    out = fetch_versioned_file(
        f"http://127.0.0.1:{http_port}", "WS290", "wspec/models.wrm", dest
    )
    assert out == dest and os.path.getsize(dest) == len(_Handler.payload)


# ---------------------------------------------------------------------------
# FTP (S1 listing + regex select) — minimal socket-level server speaking
# just enough RFC 959 for ftplib: USER/PASS, CWD, TYPE, PASV, NLST, QUIT
# ---------------------------------------------------------------------------

_FTP_FILES = ["dump_a.ace.gz", "dump_b.ace.gz", "README.txt", "md5sums"]


def _ftp_server(ctrl: socket.socket, files: list[str]):
    conn, _ = ctrl.accept()
    f = conn.makefile("rwb")

    def send(line: str):
        f.write((line + "\r\n").encode())
        f.flush()

    send("220 stub ftp")
    data_listener = None
    while True:
        raw = f.readline()
        if not raw:
            break
        cmd = raw.decode().strip()
        verb = cmd.split(" ", 1)[0].upper()
        if verb == "USER":
            send("331 need password")
        elif verb == "PASS":
            send("230 logged in")
        elif verb in ("CWD", "TYPE"):
            send("250 ok" if verb == "CWD" else "200 ok")
        elif verb == "PASV":
            data_listener = socket.socket()
            data_listener.bind(("127.0.0.1", 0))
            data_listener.listen(1)
            p = data_listener.getsockname()[1]
            send(f"227 entering passive (127,0,0,1,{p >> 8},{p & 255})")
        elif verb == "NLST":
            send("150 list follows")
            d, _ = data_listener.accept()
            d.sendall(("\r\n".join(files) + "\r\n").encode())
            d.close()
            data_listener.close()
            send("226 done")
        elif verb == "QUIT":
            send("221 bye")
            break
        else:
            send("502 not implemented")
    conn.close()


def test_ftp_select_listing_regex():
    ctrl = socket.socket()
    ctrl.bind(("127.0.0.1", 0))
    ctrl.listen(1)
    host_port = ctrl.getsockname()[1]
    t = threading.Thread(
        target=_ftp_server, args=(ctrl, _FTP_FILES), daemon=True
    )
    t.start()
    import ftplib

    # ftp_select takes a bare host; drive the same code path with an
    # explicit port by monkeypatching FTP's default port
    orig_port = ftplib.FTP.port
    ftplib.FTP.port = host_port
    try:
        got = ftp_select("127.0.0.1", "/pub/dumps", r".*\.ace\.gz$")
    finally:
        ftplib.FTP.port = orig_port
        ctrl.close()
    assert got == ["dump_a.ace.gz", "dump_b.ace.gz"]


# ---------------------------------------------------------------------------
# S3 (S10 artifact upload) — boto3 against a loopback PUT recorder
# ---------------------------------------------------------------------------


class _S3Stub(http.server.BaseHTTPRequestHandler):
    received: dict[str, bytes] = {}

    def do_PUT(self):  # noqa: N802
        n = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(n)
        self.received[self.path] = body
        self.send_response(200)
        self.send_header("ETag", '"stub"')
        self.end_headers()

    def log_message(self, *a):
        pass


def test_s3_upload_puts_objects(tmp_path, monkeypatch):
    pytest.importorskip("boto3")
    # static dummy credentials so boto3 signs without a metadata lookup
    monkeypatch.setenv("AWS_ACCESS_KEY_ID", "stub")
    monkeypatch.setenv("AWS_SECRET_ACCESS_KEY", "stub")
    monkeypatch.setenv("AWS_DEFAULT_REGION", "us-east-1")
    _S3Stub.received = {}
    srv = http.server.HTTPServer(("127.0.0.1", 0), _S3Stub)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        p1 = tmp_path / "backup.tar.xz"
        p1.write_bytes(b"artifact-bytes")
        keys = s3_upload(
            [str(p1)],
            "bucket",
            "releases/WS290",
            endpoint_url=f"http://127.0.0.1:{port}",
        )
        assert keys == ["releases/WS290/backup.tar.xz"]
        assert any(
            re.search(r"backup\.tar\.xz$", path) and body == b"artifact-bytes"
            for path, body in _S3Stub.received.items()
        ), f"no PUT recorded: {list(_S3Stub.received)}"
    finally:
        srv.shutdown()
