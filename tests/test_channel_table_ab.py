"""Epoch-solve A/B at the observable level: the reference prints a
startup table of PRN / azimuth / elevation / geometric range / iono delay
for every allocated channel (plutogpssim.c:2634-2639).  Parse it and
compare against our allocator state field by field — localizes any orbit
/ geodesy / Klobuchar divergence to the exact quantity, unlike the IQ
A/B which only says "something differs"."""

from __future__ import annotations

import os
import re

import numpy as np

from ref_harness import harness

from pluto_gps_sim_tpu.constants import R2D
from pluto_gps_sim_tpu.ingest import read_rinex2
from pluto_gps_sim_tpu.models.geodesy import llh2xyz
from pluto_gps_sim_tpu.runtime import select_ephemeris_set, setup_scenario
from pluto_gps_sim_tpu.runtime.scheduler import Scheduler

_ROW = re.compile(r"^(\d{2}) +([\d.-]+) +([\d.-]+) +([\d.-]+) +([\d.-]+)\s*$")


def _parse_table(stderr: str) -> dict[int, tuple]:
    rows = {}
    for line in stderr.splitlines():
        m = _ROW.match(line)
        if m:
            prn, az, el, rng, iono = m.groups()
            rows[int(prn)] = (float(az), float(el), float(rng), float(iono))
    return rows


def test_startup_channel_table_matches(oracle_exe, tmp_path, fixture_paths):
    cap = os.path.join(str(tmp_path), "cap.bin")
    stderr = harness.run_oracle(
        oracle_exe, fixture_paths["rinex2"], cap, 1,
        extra_args=["-l", "35.681298,139.766247,10.0"])
    ref = _parse_table(stderr)
    assert len(ref) >= 6, f"no channel table in oracle stderr:\n{stderr}"

    rin = read_rinex2(fixture_paths["rinex2"])
    g0 = setup_scenario(rin, None)
    ieph = select_ephemeris_set(rin, g0)
    xyz = np.asarray(llh2xyz(
        np.array([35.681298 / R2D, 139.766247 / R2D, 10.0])))
    st = Scheduler(rin, g0, ieph, xyz, fs=1e6).state

    ours = {}
    for c in range(st.prn.size):
        if st.prn[c] > 0:
            ours[int(st.prn[c])] = (
                float(st.azel[c, 0] * R2D) % 360.0,
                float(st.azel[c, 1] * R2D),
                float(st.d0[c]),
                float(st.iono_delay[c]),
            )

    assert set(ref) == set(ours), (sorted(ref), sorted(ours))
    for prn, (az, el, rng, iono) in ref.items():
        oaz, oel, orng, oiono = ours[prn]
        # reference prints az possibly negative/unwrapped; compare mod 360
        assert abs((oaz - az + 180) % 360 - 180) < 0.06, (prn, "az", az, oaz)
        assert abs(oel - el) < 0.06, (prn, "el", el, oel)
        assert abs(orng - rng) < 0.5, (prn, "range", rng, orng)  # 0.1f print
        assert abs(oiono - iono) < 0.06, (prn, "iono", iono, oiono)
