"""Klobuchar ionospheric-delay branch tests (plutogpssim.c:1612-1683):
disabled -> 0, invalid params -> F*5e-9*c fallback, |x|>=1.57 -> same
fallback inside the full model, day wrap, amplitude/period clamps."""

from __future__ import annotations

import dataclasses

import numpy as np
import pytest

from pluto_gps_sim_tpu.constants import SPEED_OF_LIGHT
from pluto_gps_sim_tpu.ingest import read_rinex2
from pluto_gps_sim_tpu.models.orbits import ionospheric_delay
from pluto_gps_sim_tpu.types import IonoUtc


def _llh_azel(el_deg=45.0, az_deg=120.0, lat=35.68, lon=139.77):
    d2r = np.pi / 180.0
    llh = np.array([lat * d2r, lon * d2r, 10.0])
    azel = np.array([az_deg * d2r, el_deg * d2r])
    return llh, azel


def _iono(fixture_paths) -> IonoUtc:
    return read_rinex2(fixture_paths["rinex2"]).ionoutc


def test_disabled_returns_zero(fixture_paths):
    io = _iono(fixture_paths)
    io.enable = np.array(False)
    llh, azel = _llh_azel()
    assert float(ionospheric_delay(io, 43200.0, llh, azel)) == 0.0


def test_invalid_params_fallback(fixture_paths):
    """vflg=False -> F * 5e-9 * c (c:1626-1627)."""
    io = _iono(fixture_paths)
    io.vflg = np.array(False)
    llh, azel = _llh_azel(el_deg=30.0)
    got = float(ionospheric_delay(io, 43200.0, llh, azel))
    E = (30.0 / 180.0)  # semi-circles
    F = 1.0 + 16.0 * (0.53 - E) ** 3
    assert got == pytest.approx(F * 5.0e-9 * SPEED_OF_LIGHT, rel=1e-12)


def test_night_far_from_peak_uses_fallback_branch(fixture_paths):
    """|x| >= 1.57 -> F*(5e-9)*c, same value as the invalid-params
    fallback (c:1674-1681)."""
    io = _iono(fixture_paths)
    llh, azel = _llh_azel(el_deg=30.0)
    # local time far from 50400 s (14:00): pick g_sec so t ~ 0
    lam_i_term = 43200.0 * (llh[1] / np.pi)
    g_night = (-lam_i_term) % 86400.0  # t ~ 0 -> x ~ -2*pi*50400/per
    got = float(ionospheric_delay(io, g_night, llh, azel))
    io2 = _iono(fixture_paths)
    io2.vflg = np.array(False)
    fallback = float(ionospheric_delay(io2, g_night, llh, azel))
    assert got == pytest.approx(fallback, rel=1e-12)


def test_daytime_delay_positive_and_larger_at_low_elevation(fixture_paths):
    io = _iono(fixture_paths)
    llh, azel_hi = _llh_azel(el_deg=80.0)
    _, azel_lo = _llh_azel(el_deg=10.0)
    # 14:00 local: t = 50400 -> x = 0 (peak)
    g_peak = 50400.0 - 43200.0 * (llh[1] / np.pi)
    hi = float(ionospheric_delay(io, g_peak, llh, azel_hi))
    lo = float(ionospheric_delay(io, g_peak, llh, azel_lo))
    assert 0.0 < hi < lo < 120.0  # obliquity grows toward the horizon


def test_day_wrap_periodicity(fixture_paths):
    """t computed mod 86400 (the reference's while loops, c:1665-1670)."""
    io = _iono(fixture_paths)
    llh, azel = _llh_azel()
    a = float(ionospheric_delay(io, 1000.0, llh, azel))
    b = float(ionospheric_delay(io, 1000.0 + 86400.0, llh, azel))
    assert a == pytest.approx(b, rel=1e-12)
