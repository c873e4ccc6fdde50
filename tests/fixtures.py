"""Deterministic synthetic test fixtures: RINEX nav files + motion CSVs.

Generates an almanac-like 24-satellite GPS constellation and writes it in
column-exact RINEX v2 / v3 navigation format (FORTRAN D-exponents), so the
ingest, orbit, and synthesis layers can be exercised hermetically (the
reference ships no test data; gps-sdr-sim-style brdc files are fetched
from IGS, which we cannot do offline).
"""

from __future__ import annotations

import math
import os

import numpy as np

# Chosen scenario epoch: 2023/01/10 00:00:00 UTC -> GPS week 2244
T0 = dict(y=2023, m=1, d=10, hh=0, mm=0, sec=0.0)


def _fort(x: float, width: int = 19, prec: int = 12) -> str:
    """FORTRAN-style %19.12E with 'D' exponent, matching brdc files."""
    s = f"{x: .{prec}E}"
    mant, exp = s.split("E")
    return f"{mant}D{int(exp):+03d}".rjust(width)


def constellation(n_sat: int = 24, seed: int = 7) -> list[dict]:
    """Almanac-like orbital elements for n_sat GPS satellites."""
    rng = np.random.RandomState(seed)
    sats = []
    for i in range(n_sat):
        prn = i + 1
        plane = i % 6
        slot = i // 6
        sats.append(dict(
            prn=prn,
            af0=rng.uniform(-5e-4, 5e-4),
            af1=rng.uniform(-5e-12, 5e-12),
            af2=0.0,
            iode=10 + i,
            crs=rng.uniform(-100, 100),
            deltan=rng.uniform(3e-9, 6e-9),
            m0=(2 * math.pi * slot / 4.0 + 0.15 * plane) % (2 * math.pi) - math.pi,
            cuc=rng.uniform(-5e-6, 5e-6),
            ecc=rng.uniform(0.001, 0.02),
            cus=rng.uniform(-5e-6, 5e-6),
            sqrta=5153.7 + rng.uniform(-1.0, 1.0),
            cic=rng.uniform(-2e-7, 2e-7),
            omg0=(2 * math.pi * plane / 6.0) - math.pi,
            cis=rng.uniform(-2e-7, 2e-7),
            inc0=0.958 + rng.uniform(-0.02, 0.02),
            crc=rng.uniform(150, 300),
            aop=rng.uniform(-math.pi, math.pi),
            omgdot=rng.uniform(-8.3e-9, -7.7e-9),
            idot=rng.uniform(-1e-10, 1e-10),
            codeL2=1,
            svhlth=0,
            tgd=rng.uniform(-1e-8, 1e-8),
            iodc=10 + i,
        ))
    return sats


# GPS week/second for T0 (date2gps equivalent, kept standalone so fixtures
# don't depend on the package under test)
def _date2gps(y, m, d, hh, mm, sec):
    doy = (0, 31, 59, 90, 120, 151, 181, 212, 243, 273, 304, 334)
    ye = y - 1980
    lpdays = ye // 4 + 1
    if ye % 4 == 0 and m <= 2:
        lpdays -= 1
    de = ye * 365 + doy[m - 1] + d + lpdays - 6
    return de // 7, float(de % 7) * 86400.0 + hh * 3600.0 + mm * 60.0 + sec


GM_EARTH = 3.986005e14


def propagate_set(s: dict, dt: float) -> dict:
    """Advance orbital elements by dt seconds so consecutive ephemeris
    sets describe a CONTINUOUS orbit (like real broadcast uploads).

    Without this the satellite 'teleports' at a set handover; the
    resulting ~MHz Doppler step sends the reference simulator's carrier
    phase out of its LUT range and segfaults it (plutogpssim.c:2701 has
    no index clamp)."""
    if dt == 0.0:
        return dict(s)
    a = s["sqrta"] ** 2
    n = math.sqrt(GM_EARTH / a**3) + s["deltan"]
    two_pi = 2.0 * math.pi

    def wrap(x):
        return (x + math.pi) % two_pi - math.pi

    out = dict(s)
    out["m0"] = wrap(s["m0"] + n * dt)
    out["omg0"] = wrap(s["omg0"] + s["omgdot"] * dt)
    out["inc0"] = s["inc0"] + s["idot"] * dt
    out["af0"] = s["af0"] + s["af1"] * dt + s["af2"] * dt * dt
    out["iode"] = s["iode"] + 1
    out["iodc"] = s["iodc"] + 1
    return out


def write_rinex2(path: str, n_sets: int = 2, n_sat: int = 24,
                 set_gap_hours: float = 2.0) -> None:
    sats = constellation(n_sat)
    week, tow0 = _date2gps(**T0)
    lines = []

    def hdr(content: str, tag: str) -> None:
        lines.append(f"{content:<60}{tag}")

    hdr(f"{2.10:9.2f}{'':11}{'N: GPS NAV DATA':<20}", "RINEX VERSION / TYPE")
    hdr(f"{'pluto-gps-sim-tpu':<20}{'test':<20}{'20230110 000000 UTC':<20}",
        "PGM / RUN BY / DATE")
    hdr("  " + "".join(f"{v:12.4E}" for v in
                       (1.1176e-08, 1.4901e-08, -5.9605e-08, -1.1921e-07)).replace("E", "D"),
        "ION ALPHA")
    hdr("  " + "".join(f"{v:12.4E}" for v in
                       (9.0112e+04, 1.6384e+04, -1.9661e+05, -6.5536e+04)).replace("E", "D"),
        "ION BETA")
    hdr("   " + _fort(2.793967723846e-09) + _fort(8.881784197001e-16)
        + f"{331776:9d}{week:9d}", "DELTA-UTC: A0,A1,T,W")
    hdr(f"{18:6d}", "LEAP SECONDS")
    hdr("", "END OF HEADER")

    yy = T0["y"] % 100
    for iset in range(n_sets):
        hh = T0["hh"] + int(iset * set_gap_hours)
        for s0 in sats:
            s = propagate_set(s0, iset * set_gap_hours * 3600.0)
            toc_sec = tow0 + iset * set_gap_hours * 3600.0
            ep = (f"{s['prn']:2d} {yy:02d} {T0['m']:2d} {T0['d']:2d} "
                  f"{hh:2d} {T0['mm']:2d} {T0['sec']:4.1f}"
                  + _fort(s["af0"]) + _fort(s["af1"]) + _fort(s["af2"]))
            lines.append(ep)
            orb = [
                (float(s["iode"]), s["crs"], s["deltan"], s["m0"]),
                (s["cuc"], s["ecc"], s["cus"], s["sqrta"]),
                (toc_sec, s["cic"], s["omg0"], s["cis"]),
                (s["inc0"], s["crc"], s["aop"], s["omgdot"]),
                (s["idot"], float(s["codeL2"]), float(week), 0.0),
                (2.0, float(s["svhlth"]), s["tgd"], float(s["iodc"])),
                (toc_sec, 4.0, 0.0, 0.0),
            ]
            for row in orb:
                lines.append("   " + "".join(_fort(v) for v in row))

    with open(path, "wt") as fp:
        fp.write("\n".join(lines) + "\n")


def write_rinex3(path: str, n_sets: int = 2, n_sat: int = 24,
                 set_gap_hours: float = 2.0) -> None:
    sats = constellation(n_sat)
    week, tow0 = _date2gps(**T0)
    lines = []

    def hdr(content: str, tag: str) -> None:
        lines.append(f"{content:<60}{tag}")

    hdr(f"{3.04:9.2f}{'':11}{'N: GNSS NAV DATA':<20}{'G: GPS':<9}",
        "RINEX VERSION / TYPE")
    hdr(f"{'pluto-gps-sim-tpu':<20}{'test':<20}{'20230110 000000 UTC':<20}",
        "PGM / RUN BY / DATE")
    hdr("GPSA " + "".join(f"{v:12.4E}" for v in
                          (1.1176e-08, 1.4901e-08, -5.9605e-08, -1.1921e-07)),
        "IONOSPHERIC CORR")
    hdr("GPSB " + "".join(f"{v:12.4E}" for v in
                          (9.0112e+04, 1.6384e+04, -1.9661e+05, -6.5536e+04)),
        "IONOSPHERIC CORR")
    hdr(f"GPUT {2.7939677238e-09:17.10E}{8.881784197e-16:16.9E}"
        f"{331776:7d}{week:6d}", "TIME SYSTEM CORR")
    hdr(f"{18:6d}", "LEAP SECONDS")
    hdr("", "END OF HEADER")

    for iset in range(n_sets):
        hh = T0["hh"] + int(iset * set_gap_hours)
        for s0 in sats:
            s = propagate_set(s0, iset * set_gap_hours * 3600.0)
            toc_sec = tow0 + iset * set_gap_hours * 3600.0
            ep = (f"G{s['prn']:02d} {T0['y']:4d} {T0['m']:02d} {T0['d']:02d} "
                  f"{hh:02d} {T0['mm']:02d} {int(T0['sec']):02d}"
                  + _fort(s["af0"]) + _fort(s["af1"]) + _fort(s["af2"]))
            lines.append(ep)
            orb = [
                (float(s["iode"]), s["crs"], s["deltan"], s["m0"]),
                (s["cuc"], s["ecc"], s["cus"], s["sqrta"]),
                (toc_sec, s["cic"], s["omg0"], s["cis"]),
                (s["inc0"], s["crc"], s["aop"], s["omgdot"]),
                (s["idot"], float(s["codeL2"]), float(week), 0.0),
                (2.0, float(s["svhlth"]), s["tgd"], float(s["iodc"])),
                (toc_sec, 4.0, 0.0, 0.0),
            ]
            for row in orb:
                lines.append("    " + "".join(_fort(v) for v in row))

    with open(path, "wt") as fp:
        fp.write("\n".join(lines) + "\n")


def write_circle_motion(path: str, n: int = 300,
                        center_llh=(35.681298, 139.766247, 10.0),
                        radius_m: float = 50.0) -> None:
    """10 Hz circular trajectory around a fixed LLH point, ECEF CSV."""
    lat = math.radians(center_llh[0])
    lon = math.radians(center_llh[1])
    a, e = 6378137.0, 0.0818191908426
    nrad = a / math.sqrt(1 - (e * math.sin(lat)) ** 2)
    cx = (nrad + center_llh[2]) * math.cos(lat) * math.cos(lon)
    cy = (nrad + center_llh[2]) * math.cos(lat) * math.sin(lon)
    cz = ((1 - e * e) * nrad + center_llh[2]) * math.sin(lat)
    # local east/north unit vectors
    east = (-math.sin(lon), math.cos(lon), 0.0)
    north = (-math.sin(lat) * math.cos(lon), -math.sin(lat) * math.sin(lon),
             math.cos(lat))
    with open(path, "wt") as fp:
        for i in range(n):
            t = i * 0.1
            ang = 2 * math.pi * t / 30.0
            de = radius_m * math.cos(ang)
            dn = radius_m * math.sin(ang)
            x = cx + de * east[0] + dn * north[0]
            y = cy + de * east[1] + dn * north[1]
            z = cz + de * east[2] + dn * north[2]
            fp.write(f"{t:.1f},{x:.3f},{y:.3f},{z:.3f}\n")


def fixture_dir() -> str:
    d = os.path.join(os.path.dirname(__file__), "data")
    os.makedirs(d, exist_ok=True)
    return d


def ensure_fixtures() -> dict:
    d = fixture_dir()
    paths = {
        "rinex2": os.path.join(d, "brdc_test.23n"),
        "rinex3": os.path.join(d, "brdc_test.rnx"),
        "motion": os.path.join(d, "circle_test.csv"),
    }
    if not os.path.exists(paths["rinex2"]):
        write_rinex2(paths["rinex2"])
    if not os.path.exists(paths["rinex3"]):
        write_rinex3(paths["rinex3"])
    if not os.path.exists(paths["motion"]):
        write_circle_motion(paths["motion"])
    return paths
