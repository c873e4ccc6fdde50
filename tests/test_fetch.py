"""FTP fetch URL composition vs the reference's format string
(plutogpssim.c:38, 2428-2445).  Network access itself is optional and
never exercised in tests."""

from __future__ import annotations

import calendar

from pluto_gps_sim_tpu.ingest.fetch import compose_rinex_url


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
