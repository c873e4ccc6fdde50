"""FTP fetch: URL composition vs the reference's format string
(plutogpssim.c:38, 2428-2445), plus an end-to-end download -> gunzip ->
parse -> first-superframe drive against a local fake FTP server (the
fake-iio pattern from test_iio_sink) — real network access is optional
and never required."""

from __future__ import annotations

import calendar
import gzip
import os
import socket
import threading

import numpy as np
import pytest

from pluto_gps_sim_tpu.ingest.fetch import compose_rinex_url, fetch_rinex


def _ts(y, m, d, hh, mm=0):
    return calendar.timegm((y, m, d, hh, mm, 0, 0, 0, 0))


def test_url_v2():
    # 2023-06-15 14:30 UTC -> doy 166, previous hour 13 -> 'n'
    url = compose_rinex_url(use_rinex3=False, now=_ts(2023, 6, 15, 14, 30))
    assert url == "ftp://igs.bkg.bund.de/IGS/nrt/166/13/ffmj166n.23n.gz"


def test_url_v3():
    url = compose_rinex_url(use_rinex3=True, now=_ts(2023, 6, 15, 14, 30))
    assert url == "ftp://igs.bkg.bund.de/IGS/nrt_v3/166/13/func166n.23n.gz"


def test_url_midnight_quirk():
    """At hour 0 the reference wraps to hour 23 WITHOUT decrementing the
    day (c:2434-2437) — quirk preserved."""
    url = compose_rinex_url(use_rinex3=False, now=_ts(2023, 6, 15, 0, 10))
    assert url == "ftp://igs.bkg.bund.de/IGS/nrt/166/23/ffmj166x.23n.gz"


# --------------------------------------------------------------------------
# fake FTP server: just enough of RFC 959 for urllib/ftplib's anonymous
# binary RETR (USER/PASS/CWD/TYPE/PASV/RETR/QUIT), serving one payload
# for every requested path


class _FakeFtpServer:
    def __init__(self, payload: bytes):
        self.payload = payload
        self.retr_paths: list[str] = []
        self.cwd_trail: list[str] = []
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(4)
        self.sock.settimeout(20.0)
        self.port = self.sock.getsockname()[1]
        self.thread = threading.Thread(target=self._serve, daemon=True)
        self.thread.start()

    def _serve(self):
        try:
            conn, _ = self.sock.accept()
        except OSError:
            return
        conn.settimeout(20.0)
        fp = conn.makefile("rwb")

        def reply(line):
            fp.write(line.encode() + b"\r\n")
            fp.flush()

        reply("220 fake IGS NRT server")
        data_listener = None
        try:
            while True:
                raw = fp.readline()
                if not raw:
                    break
                cmd, _, arg = raw.decode().strip().partition(" ")
                cmd = cmd.upper()
                if cmd == "USER":
                    reply("331 anonymous ok, send password")
                elif cmd == "PASS":
                    reply("230 logged in")
                elif cmd == "CWD":
                    self.cwd_trail.append(arg)
                    reply("250 ok")
                elif cmd == "TYPE":
                    reply("200 type set")
                elif cmd == "PASV":
                    data_listener = socket.socket(
                        socket.AF_INET, socket.SOCK_STREAM)
                    data_listener.bind(("127.0.0.1", 0))
                    data_listener.listen(1)
                    data_listener.settimeout(20.0)
                    p = data_listener.getsockname()[1]
                    reply(f"227 Entering Passive Mode "
                          f"(127,0,0,1,{p >> 8},{p & 0xFF})")
                elif cmd == "RETR":
                    self.retr_paths.append(arg)
                    reply("150 opening BINARY connection")
                    dconn, _ = data_listener.accept()
                    dconn.sendall(self.payload)
                    dconn.close()
                    data_listener.close()
                    data_listener = None
                    reply("226 transfer complete")
                elif cmd == "QUIT":
                    reply("221 bye")
                    break
                else:
                    reply("502 not implemented")
        except OSError:
            pass
        finally:
            fp.close()
            conn.close()

    def close(self):
        try:
            self.sock.close()
        except OSError:
            pass


@pytest.fixture
def fake_ftp(fixture_paths):
    with open(fixture_paths["rinex2"], "rb") as f:
        payload = gzip.compress(f.read())
    srv = _FakeFtpServer(payload)
    yield srv
    srv.close()


def test_fetch_download_gunzip_parse(fake_ftp, tmp_path):
    """fetch_rinex's actual download/write path: FTP RETR from the fake
    server -> gz file on disk -> transparent-gunzip RINEX parse
    (rinex.py:68) — the reference's curl path c:2428-2474 +
    fwrite_rinex c:2192."""
    from pluto_gps_sim_tpu.ingest import read_rinex2

    dest = str(tmp_path / "rinex2.gz")
    url = fetch_rinex(dest, base_url=f"ftp://127.0.0.1:{fake_ftp.port}/IGS/")
    assert url.startswith(f"ftp://127.0.0.1:{fake_ftp.port}/IGS/nrt/")
    assert fake_ftp.retr_paths or fake_ftp.cwd_trail
    with open(dest, "rb") as f:
        assert f.read() == fake_ftp.payload  # byte-faithful write
    rin = read_rinex2(dest)
    assert rin.n_sets >= 1


def test_cli_ftp_end_to_end(fake_ftp, tmp_path, monkeypatch):
    """CLI -f end-to-end: download -> gunzip -> parse -> scenario ->
    first superframe of IQ, with the catalog server swapped for the
    local fake (download path otherwise identical)."""
    from pluto_gps_sim_tpu import cli
    from pluto_gps_sim_tpu.ingest import fetch as fetch_mod

    monkeypatch.setattr(fetch_mod, "RINEX_FTP_URL",
                        f"ftp://127.0.0.1:{fake_ftp.port}/IGS/")
    monkeypatch.chdir(tmp_path)  # the CLI writes ./rinex2.gz (c:33-34)
    out = str(tmp_path / "iq.bin")
    rc = cli.main(["-f", "-l", "35.681298,139.766247,10.0",
                   "-s", "2600000", "-d", "0.3", "-o", out])
    assert rc == 0
    assert os.path.exists(tmp_path / "rinex2.gz")
    iq = np.fromfile(out, dtype=np.int16)
    assert iq.size == int(2600000 * 0.3) * 2
    assert np.any(iq != 0)
