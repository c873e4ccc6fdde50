"""Unit tests: GPS time conversions and WGS-84 geodesy."""

import math

import numpy as np
import pytest

from pluto_gps_sim_tpu.models.geodesy import (
    ecef2neu,
    llh2xyz,
    ltcmat,
    neu2azel,
    xyz2llh,
)
from pluto_gps_sim_tpu.models.gpstime import (
    DateTime,
    GpsTime,
    date2gps,
    gps2date,
    inc_gps_time,
    sub_gps_time,
)


def test_date2gps_known_epochs():
    # GPS epoch start: Jan 6 1980 is week 0, Sunday
    g = date2gps(DateTime(1980, 1, 6, 0, 0, 0.0))
    assert g.week == 0 and g.sec == 0.0
    # One week later
    g = date2gps(DateTime(1980, 1, 13, 0, 0, 0.0))
    assert g.week == 1 and g.sec == 0.0
    # A modern date with known week: 2023-01-10 is GPS week 2244, Tuesday
    g = date2gps(DateTime(2023, 1, 10, 0, 0, 0.0))
    assert g.week == 2244
    assert g.sec == 2 * 86400.0


def test_gps2date_roundtrip():
    for (y, m, d, hh, mm, sec) in [
        (2023, 1, 10, 12, 34, 56.0),
        (2020, 2, 29, 23, 59, 59.0),   # leap day
        (1999, 8, 22, 0, 0, 0.0),
        (2030, 12, 31, 6, 7, 8.0),
    ]:
        g = date2gps(DateTime(y, m, d, hh, mm, sec))
        t = gps2date(g)
        assert (t.y, t.m, t.d, t.hh, t.mm) == (y, m, d, hh, mm)
        assert abs(t.sec - sec) < 1e-9


def test_inc_sub_gps_time():
    g = GpsTime(2244, 604799.95)
    g1 = inc_gps_time(g, 0.1)  # crosses week boundary
    assert g1.week == 2245
    assert abs(g1.sec - 0.05) < 1e-9
    assert abs(sub_gps_time(g1, g) - 0.1) < 1e-9

    # millisecond rounding semantics (c:853)
    g2 = inc_gps_time(GpsTime(0, 0.0), 0.1 + 4.9e-4)
    assert g2.sec == 0.1
    g3 = inc_gps_time(GpsTime(0, 0.0), 0.1 + 5.1e-4)
    assert abs(g3.sec - 0.101) < 1e-15

    # negative wrap
    g4 = inc_gps_time(GpsTime(10, 0.05), -0.1)
    assert g4.week == 9 and abs(g4.sec - 604799.95) < 1e-9


def test_llh_xyz_roundtrip():
    llh = np.array([35.681298 / 57.2957795131, 139.766247 / 57.2957795131, 10.0])
    xyz = np.asarray(llh2xyz(llh))
    back = np.asarray(xyz2llh(xyz))
    assert np.allclose(back[:2], llh[:2], atol=1e-9)
    assert abs(back[2] - llh[2]) < 1e-3  # reference's own 1e-3 m tolerance

    # ECEF magnitude sanity for a surface point
    assert 6.3e6 < np.linalg.norm(xyz) < 6.4e6


def test_xyz2llh_degenerate_origin():
    out = np.asarray(xyz2llh(np.zeros(3)))
    assert out[0] == 0.0 and out[1] == 0.0 and out[2] == -6378137.0


def test_neu_azel():
    llh = np.array([0.5, 1.0, 100.0])
    t = np.asarray(ltcmat(llh))
    # A vector pointing straight up in the local frame
    up = np.asarray(llh2xyz(llh)) - np.asarray(llh2xyz(np.array([0.5, 1.0, 0.0])))
    neu = np.asarray(ecef2neu(up, t))
    azel = np.asarray(neu2azel(neu))
    assert abs(azel[1] - math.pi / 2) < 1e-6  # elevation ~ +90 deg

    # due-north horizontal vector -> az 0, el 0
    neu = np.array([1000.0, 0.0, 0.0])
    azel = np.asarray(neu2azel(neu))
    assert abs(azel[0]) < 1e-12 and abs(azel[1]) < 1e-12

    # due-west -> az 270 deg (az wrapped into [0, 2pi))
    neu = np.array([0.0, -1000.0, 0.0])
    azel = np.asarray(neu2azel(neu))
    assert abs(azel[0] - 3 * math.pi / 2) < 1e-9


def test_batched_geodesy():
    """xyz2llh broadcasts over leading axes (the round-5 numpy port
    replaced vmap with plain broadcasting) and the batched rows match
    the per-point calls bit-for-bit."""
    pts = np.array([[6378137.0 + h, 1000.0 * h, 2000.0] for h in range(8)])
    out = np.asarray(xyz2llh(pts))
    assert out.shape == (8, 3)
    assert np.all(np.isfinite(out))
    for i in range(8):
        assert np.array_equal(out[i], np.asarray(xyz2llh(pts[i])))


def test_inc_gps_time_grid_matches_scalar():
    """inc_gps_time_grid must be elementwise IEEE-identical to the
    scalar inc_gps_time (it feeds the scheduler's epoch grid, where a
    single-ulp difference moves the ms anchor)."""
    from pluto_gps_sim_tpu.models.gpstime import (
        GpsTime, inc_gps_time, inc_gps_time_grid)

    for g0 in (GpsTime(2244, 172800.0),
               GpsTime(2244, 259200.123),
               GpsTime(2250, 604769.95)):   # 30 s shy of week rollover
        dts = 0.1 * np.arange(901)          # 90 s grid
        secs, weeks = inc_gps_time_grid(g0, dts)
        for j in (0, 1, 299, 300, 301, 900):
            want = inc_gps_time(g0, float(dts[j]))
            assert secs[j] == want.sec, (g0, j, secs[j], want.sec)
            assert weeks[j] == want.week, (g0, j)
        # the rollover case must actually cross the week boundary
    g0 = GpsTime(2250, 604769.95)
    secs, weeks = inc_gps_time_grid(g0, 0.1 * np.arange(901))
    assert weeks.min() == 2250 and weeks.max() == 2251
    assert (secs < 604800.0).all() and (secs >= 0.0).all()
