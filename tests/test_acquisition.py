"""Receiver-side validation: FFT acquisition over our synthesized IQ.

The reference's only correctness check was feeding its RF output to a
real GPS receiver (its README bench-setup section; SURVEY.md §4).  These
tests run the software equivalent against our IQ: every simulated PRN
must produce a correlation peak at the Doppler and code phase the
scheduler planned, and an absent PRN must not acquire.  This is
independent of the golden oracle — it validates the signal against the
GPS ICD's structure (C/A spreading, carrier convention), not against
another implementation.
"""

from __future__ import annotations

import numpy as np
import pytest

from fixtures import ensure_fixtures

from pluto_gps_sim_tpu.constants import CA_SEQ_LEN, R2D
from pluto_gps_sim_tpu.ingest import read_rinex2
from pluto_gps_sim_tpu.models.geodesy import llh2xyz
from pluto_gps_sim_tpu.ops.synth_jnp import pack_plan, \
    synth_superframe_precise
from pluto_gps_sim_tpu.runtime import select_ephemeris_set, setup_scenario
from pluto_gps_sim_tpu.runtime.scheduler import Scheduler
from pluto_gps_sim_tpu.utils.acquisition import acquire, acquire_all

FS = 2_600_000.0
TOKYO_LLH = np.array([35.681298 / R2D, 139.766247 / R2D, 10.0])


@pytest.fixture(scope="module")
def scenario():
    """One precise-path block (0.1 s) plus the plan that produced it."""
    paths = ensure_fixtures()
    rin = read_rinex2(paths["rinex2"])
    g0 = setup_scenario(rin, None)
    ieph = select_ephemeris_set(rin, g0)
    xyz = np.asarray(llh2xyz(TOKYO_LLH))
    sched = Scheduler(rin, g0, ieph, xyz, fs=FS)
    plan = sched.plan(1)
    iq = synth_superframe_precise(pack_plan(plan))   # [1, N, 2] int16
    return plan, iq


def test_every_simulated_prn_acquires(scenario):
    plan, iq = scenario
    active = [c for c in range(len(plan.prn))
              if plan.prn[c] > 0 and plan.active[0, c]]
    assert len(active) >= 4, "fixture scenario should have >=4 channels"
    n_per_code = int(round(FS * 1e-3))
    for c in active:
        prn = int(plan.prn[c])
        res = acquire(iq, FS, prn)
        assert res.detected, f"PRN {prn} not acquired: {res}"
        assert res.peak_ratio > 2.0, f"PRN {prn} weak peak: {res}"

        # Doppler must match the planned carrier: within one 250 Hz grid
        # bin — the 1 ms coherent sinc is ~1 kHz wide, so a weak channel's
        # peak can land in the adjacent bin under cross-channel noise
        f_true = float(plan.f_carr[0, c])
        assert abs(res.doppler_hz - f_true) <= 250.0, \
            f"PRN {prn}: acquired Doppler {res.doppler_hz:+.1f} Hz, " \
            f"planned {f_true:+.1f} Hz"

        # code phase: chip 0 next crosses at (1023 - cp0)/v samples
        cp0 = float(plan.code_phase[0, c]) % CA_SEQ_LEN
        v = float(plan.f_code[0, c]) / FS          # chips/sample
        n_true = ((CA_SEQ_LEN - cp0) % CA_SEQ_LEN) / v % n_per_code
        err = abs(res.code_offset - n_true)
        err = min(err, n_per_code - err)           # circular distance
        assert err <= 2.0, \
            f"PRN {prn}: code offset {res.code_offset:.1f}, " \
            f"expected {n_true:.1f} (err {err:.2f} samples)"


def test_absent_prn_does_not_acquire(scenario):
    plan, iq = scenario
    present = {int(p) for p in plan.prn if p > 0}
    absent = [p for p in range(1, 33) if p not in present][:3]
    assert absent
    for prn in absent:
        res = acquire(iq, FS, prn)
        assert not res.detected, f"false acquisition: {res}"
        assert res.peak_ratio < 2.8, f"absent PRN {prn} too strong: {res}"


def test_noise_does_not_acquire():
    rng = np.random.RandomState(11)
    iq = rng.randint(-400, 400, size=(1, 3 * 2600, 2)).astype(np.int16)
    for prn in (1, 7, 19):
        res = acquire(iq, FS, prn)
        assert not res.detected, f"acquired PRN {prn} from noise: {res}"


def test_acquire_all_matches_plan(scenario):
    """acquire_all's detected set == the plan's active PRN set."""
    plan, iq = scenario
    present = {int(plan.prn[c]) for c in range(len(plan.prn))
               if plan.prn[c] > 0 and plan.active[0, c]}
    results = acquire_all(iq, FS)
    hits = {r.prn for r in results if r.detected}
    assert hits == present, (sorted(hits), sorted(present))


def test_acquire_interleaved_flat_layout(scenario):
    """A .bin-file-shaped flat int16 stream acquires identically."""
    plan, iq = scenario
    flat = np.ascontiguousarray(iq).reshape(-1)     # interleaved I,Q
    prn = int(plan.prn[np.flatnonzero(plan.prn)[0]])
    a = acquire(iq, FS, prn)
    b = acquire(flat, FS, prn)
    assert b.detected
    assert (a.doppler_hz, a.code_offset) == (b.doppler_hz, b.code_offset)


def test_acquisition_at_fs5mhz():
    """The receiver tooling is sample-rate generic: at fs=5 MHz (the
    reference's RF-bandwidth ceiling) every planned PRN acquires at the
    planned Doppler and code phase from one precise-path block."""
    fs = 5_000_000.0
    paths = ensure_fixtures()
    rin = read_rinex2(paths["rinex2"])
    g0 = setup_scenario(rin, None)
    ieph = select_ephemeris_set(rin, g0)
    xyz = np.asarray(llh2xyz(TOKYO_LLH))
    sched = Scheduler(rin, g0, ieph, xyz, fs=fs)
    plan = sched.plan(1)
    iq = synth_superframe_precise(pack_plan(plan))

    n_per_code = int(round(fs * 1e-3))
    active = [c for c in range(len(plan.prn))
              if plan.prn[c] > 0 and plan.active[0, c]]
    assert len(active) >= 4
    for c in active:
        prn = int(plan.prn[c])
        res = acquire(iq, fs, prn)
        assert res.detected and res.peak_ratio > 2.0, f"PRN {prn}: {res}"
        assert abs(res.doppler_hz - float(plan.f_carr[0, c])) <= 250.0
        cp0 = float(plan.code_phase[0, c]) % CA_SEQ_LEN
        v = float(plan.f_code[0, c]) / fs
        n_true = ((CA_SEQ_LEN - cp0) % CA_SEQ_LEN) / v % n_per_code
        err = abs(res.code_offset - n_true)
        err = min(err, n_per_code - err)
        assert err <= 3.0, f"PRN {prn}: code offset err {err:.2f} samples"


def test_silent_iq_does_not_acquire():
    """All-zero IQ (a gain/mask bug writing a silent file) must report
    detected=False with ratio 0 for every PRN — peak and sidelobe are
    both 0 there, and an inf ratio would make --selfcheck PASS on
    exactly the silent-output failure class it exists to catch."""
    fs = 2_600_000.0
    iq = np.zeros(4 * int(round(fs * 1e-3)) + 4, dtype=np.int16)
    for prn in (1, 7, 32):
        res = acquire(iq, fs, prn)
        assert not res.detected, res
        assert res.peak_ratio == 0.0, res
