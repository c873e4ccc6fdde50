"""RINEX v2/v3 parser + user-motion ingest tests.

The reference's two parsers (readRinex2 c:874, readRinex3 c:1241) produce
identical ephemeris structures from the two encodings of the same data;
we assert that equivalence on the synthetic fixture constellation, plus
the parser's quirk-sensitive behaviors: FORTRAN D-exponents, >1 h toc
gap set-splitting, gzip transparency, the svhlth MSB fix (c:1200), and
header iono/UTC flag gating (vflg only when all four groups present,
c:999).
"""

from __future__ import annotations

import gzip
import os

import numpy as np
import pytest

from pluto_gps_sim_tpu.ingest import (read_rinex2, read_rinex3,
                                      read_user_motion)
from pluto_gps_sim_tpu.ingest.rinex import RinexError
from pluto_gps_sim_tpu.constants import MAX_SAT

_ORBIT_FIELDS = ["af0", "af1", "af2", "iode", "crs", "deltan", "m0", "cuc",
                 "ecc", "cus", "sqrta", "toe_sec", "cic", "omg0", "cis",
                 "inc0", "crc", "aop", "omgdot", "idot", "svhlth", "tgd",
                 "iodc", "A", "n", "sq1e2", "omgkdot"]


def test_v2_v3_equivalence(fixture_paths):
    """Same constellation through both format paths -> same ephemerides."""
    r2 = read_rinex2(fixture_paths["rinex2"])
    r3 = read_rinex3(fixture_paths["rinex3"])
    assert r2.n_sets == r3.n_sets
    for iset in range(r2.n_sets):
        a, b = r2.eph[iset], r3.eph[iset]
        assert np.array_equal(a.vflg, b.vflg)
        for f in _ORBIT_FIELDS:
            av, bv = getattr(a, f), getattr(b, f)
            np.testing.assert_allclose(av[a.vflg], bv[a.vflg], rtol=1e-12,
                                       err_msg=f)
    for f in ("alpha0", "beta0", "A0", "A1", "dtls"):
        np.testing.assert_allclose(float(getattr(r2.ionoutc, f)),
                                   float(getattr(r3.ionoutc, f)),
                                   rtol=1e-9, err_msg=f)


def test_set_splitting_on_toc_gap(fixture_paths):
    """Records >1 h apart open a new ephemeris set (c:1048-1054)."""
    rin = read_rinex2(fixture_paths["rinex2"])
    assert rin.n_sets == 2
    dt = (float(rin.eph[1].toc_sec[0]) - float(rin.eph[0].toc_sec[0]))
    assert dt == pytest.approx(7200.0)


def test_gzip_transparency(fixture_paths, tmp_path):
    gz = str(tmp_path / "brdc.23n.gz")
    with open(fixture_paths["rinex2"], "rb") as f_in, \
            gzip.open(gz, "wb") as f_out:
        f_out.write(f_in.read())
    a = read_rinex2(fixture_paths["rinex2"])
    b = read_rinex2(gz)
    assert np.array_equal(a.eph[0].sqrta, b.eph[0].sqrta)


def test_derived_working_variables(fixture_paths):
    """A, n, sq1e2, omgkdot derived exactly as c:1221-1224."""
    from pluto_gps_sim_tpu.constants import GM_EARTH, OMEGA_EARTH
    rin = read_rinex2(fixture_paths["rinex2"])
    e = rin.eph[0]
    sv = int(np.flatnonzero(e.vflg)[0])
    A = e.sqrta[sv] ** 2
    assert e.A[sv] == pytest.approx(A, rel=1e-15)
    assert e.n[sv] == pytest.approx(
        np.sqrt(GM_EARTH / A**3) + e.deltan[sv], rel=1e-15)
    assert e.sq1e2[sv] == pytest.approx(
        np.sqrt(1.0 - e.ecc[sv] ** 2), rel=1e-15)
    assert e.omgkdot[sv] == pytest.approx(e.omgdot[sv] - OMEGA_EARTH,
                                          rel=1e-15)


def test_svhlth_msb_fix(fixture_paths, tmp_path):
    """svhlth in (0,32) gets its MSB set on ingest (c:1200-1201)."""
    with open(fixture_paths["rinex2"]) as fp:
        lines = fp.read().splitlines(keepends=True)
    # BROADCAST ORBIT 6 of the first record: header(7) + clock(1) + 6 lines
    i = 7 + 6
    assert "D" in lines[i]
    # fields: accuracy, health, tgd, iodc -> patch field 2 (cols 22..41)
    from fixtures import _fort
    patched = lines[i][:22] + _fort(5.0) + lines[i][41:]
    out = str(tmp_path / "hlth.23n")
    with open(out, "w") as fp:
        fp.writelines(lines[:i] + [patched] + lines[i + 1:])
    rin = read_rinex2(out)
    assert int(rin.eph[0].svhlth[0]) == 5 + 32


def test_header_flag_gating(fixture_paths, tmp_path):
    """ionoutc.vflg requires ION ALPHA + ION BETA + DELTA-UTC + LEAP
    SECONDS all present (c:999)."""
    with open(fixture_paths["rinex2"]) as fp:
        lines = fp.read().splitlines(keepends=True)
    out = str(tmp_path / "nobeta.23n")
    with open(out, "w") as fp:
        fp.writelines(l for l in lines if "ION BETA" not in l)
    rin = read_rinex2(out)
    assert not bool(rin.ionoutc.vflg)
    full = read_rinex2(fixture_paths["rinex2"])
    assert bool(full.ionoutc.vflg)


def test_wrong_version_rejected(fixture_paths):
    with pytest.raises(RinexError):
        read_rinex2(fixture_paths["rinex3"])
    with pytest.raises(RinexError):
        read_rinex3(fixture_paths["rinex2"])


def test_malformed_files_rejected(tmp_path, fixture_paths):
    garbage = str(tmp_path / "garbage.23n")
    with open(garbage, "w") as fp:
        fp.write("hello world\nnot rinex at all\n")
    with pytest.raises(RinexError):
        read_rinex2(garbage)
    with pytest.raises(RinexError):
        read_rinex3(garbage)

    # header without END OF HEADER
    with open(fixture_paths["rinex2"]) as fp:
        lines = fp.read().splitlines(keepends=True)
    noend = str(tmp_path / "noend.23n")
    with open(noend, "w") as fp:
        fp.writelines(l for l in lines if "END OF HEADER" not in l)
    with pytest.raises(RinexError):
        read_rinex2(noend)


def test_truncated_record_drops_partial(tmp_path, fixture_paths):
    """A file cut mid-record keeps all complete records and silently
    drops the partial one (reference: gzgets NULL -> break, c:1078)."""
    with open(fixture_paths["rinex2"]) as fp:
        lines = fp.read().splitlines(keepends=True)
    # header (7 lines) + 2 complete records (8 lines each) + half a record
    out = str(tmp_path / "trunc.23n")
    with open(out, "w") as fp:
        fp.writelines(lines[:7 + 16 + 4])
    rin = read_rinex2(out)
    assert int(rin.eph[0].vflg.sum()) == 2


def test_v3_non_gps_records_skipped(fixture_paths, tmp_path):
    """RINEX v3 parsers must ignore non-'G' constellation records
    (c:1381)."""
    with open(fixture_paths["rinex3"]) as fp:
        text = fp.read()
    lines = text.splitlines(keepends=True)
    hdr_end = next(i for i, l in enumerate(lines) if "END OF HEADER" in l)
    rec = lines[hdr_end + 1:hdr_end + 9]
    fake = ["E" + rec[0][1:]] + rec[1:]  # a Galileo record clone
    out = str(tmp_path / "mixed.rnx")
    with open(out, "w") as fp:
        fp.writelines(lines[:hdr_end + 1] + fake + lines[hdr_end + 1:])
    a = read_rinex3(fixture_paths["rinex3"])
    b = read_rinex3(out)
    assert np.array_equal(a.eph[0].sqrta, b.eph[0].sqrta)
    assert a.n_sets == b.n_sets


def test_user_motion_ingest(fixture_paths):
    xyz = read_user_motion(fixture_paths["motion"])
    assert xyz.ndim == 2 and xyz.shape[1] == 3
    assert xyz.shape[0] <= 3000  # USER_MOTION_SIZE cap (h:25)
    r = np.linalg.norm(xyz, axis=1)
    assert np.all((r > 6.3e6) & (r < 6.5e6))  # on the Earth's surface


def test_user_motion_row_cap(tmp_path):
    path = str(tmp_path / "long.csv")
    with open(path, "w") as fp:
        for i in range(3100):
            fp.write(f"{i / 10:.1f},-3813477.954,3554276.552,3662785.237\n")
    xyz = read_user_motion(path)
    assert xyz.shape[0] == 3000  # truncates like the reference (c:1807)
