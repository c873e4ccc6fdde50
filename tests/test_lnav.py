"""LNAV codec tests: (32,26) parity vs the ICD-GPS-200 equations,
subframe structure, and the 30 s nav-message scheduler.

The parity oracle below is implemented independently from the canonical
ICD-200 Table 20-XIV equations (bit-index lists), NOT from the
reference's bitmask formulation (plutogpssim.c:776) — so it genuinely
cross-checks the masks rather than restating them.
"""

from __future__ import annotations

import numpy as np
import pytest

from pluto_gps_sim_tpu.constants import MAX_CHAN, N_DWRD
from pluto_gps_sim_tpu.ingest import read_rinex2
from pluto_gps_sim_tpu.models import lnav
from pluto_gps_sim_tpu.models.gpstime import GpsTime

# ICD-GPS-200 Table 20-XIV: D25..D30 as XORs of data bits d1..d24
_ICD = {
    25: ("D29", [1, 2, 3, 5, 6, 10, 11, 12, 13, 14, 17, 18, 20, 23]),
    26: ("D30", [2, 3, 4, 6, 7, 11, 12, 13, 14, 15, 18, 19, 21, 24]),
    27: ("D29", [1, 3, 4, 5, 7, 8, 12, 13, 14, 15, 16, 19, 20, 22]),
    28: ("D30", [2, 4, 5, 6, 8, 9, 13, 14, 15, 16, 17, 20, 21, 23]),
    29: ("D30", [1, 3, 5, 6, 7, 9, 10, 14, 15, 16, 17, 18, 21, 22, 24]),
    30: ("D29", [3, 5, 6, 8, 9, 10, 11, 13, 15, 19, 22, 23, 24]),
}


def _bit(word: int, i: int) -> int:
    """Data bit d_i (i=1..24 -> bit 29..6); parity D_j (j=25..30 -> 5..0)."""
    return (word >> (30 - i)) & 1


def _icd_parity_ok(word: int, d29s: int, d30s: int) -> bool:
    """Check a 30-bit transmitted word against the ICD-200 equations."""
    # recover raw data: transmitted data bits are XORed with D30*
    d = [0] + [_bit(word, i) ^ d30s for i in range(1, 25)]
    for j, (prev, idxs) in _ICD.items():
        want = (d29s if prev == "D29" else d30s)
        for i in idxs:
            want ^= d[i]
        if _bit(word, j) != want:
            return False
    return True


def test_parity_matches_icd_equations():
    rng = np.random.RandomState(42)
    for _ in range(500):
        data = int(rng.randint(0, 1 << 24)) << 6
        d29s = int(rng.randint(0, 2))
        d30s = int(rng.randint(0, 2))
        src = data | (d29s << 31) | (d30s << 30)
        word = lnav.compute_checksum(src, nib=False)
        assert _icd_parity_ok(word, d29s, d30s), \
            f"parity mismatch for src={src:#010x}"


def test_parity_nib_solve_forces_zero_tail():
    """Words 2 and 10 solve two non-information bits so D29=D30=0
    (c:786-797) — required so the next word's chaining starts clean."""
    rng = np.random.RandomState(7)
    for _ in range(200):
        data = int(rng.randint(0, 1 << 24)) << 6
        src = data | (int(rng.randint(0, 4)) << 30)
        word = lnav.compute_checksum(src, nib=True)
        assert word & 0x3 == 0
        assert _icd_parity_ok(word, (src >> 31) & 1, (src >> 30) & 1)


def test_parity_d30_inversion():
    """When D30*=1 the 24 data bits are transmitted inverted (c:800)."""
    data = 0x00ABCDEF << 6
    w0 = lnav.compute_checksum(data, nib=False)
    w1 = lnav.compute_checksum(data | (1 << 30), nib=False)
    assert (w0 >> 6) & 0xFFFFFF == 0xABCDEF
    assert (w1 >> 6) & 0xFFFFFF == 0xABCDEF ^ 0xFFFFFF


@pytest.fixture(scope="module")
def sbf(fixture_paths):
    rin = read_rinex2(fixture_paths["rinex2"])
    return lnav.eph_to_subframes(rin.eph[0], 0, rin.ionoutc)


def test_subframe_structure(sbf):
    assert sbf.shape == (5, 10)
    for isbf in range(5):
        # TLM preamble 10001011 in d1..d8 of word 1 (c:647 et seq.)
        assert (int(sbf[isbf][0]) >> 22) & 0xFF == 0x8B
        # subframe ID in HOW d20..d22
        sfid = (int(sbf[isbf][1]) >> 8) & 0x7
        assert sfid == isbf + 1
        # wn deliberately 0 in SF1 word 3 (stamped at transmit, c:595-597)
        if isbf == 0:
            assert (int(sbf[0][2]) >> 20) & 0x3FF == 0


def test_generate_nav_msg_parity_chain(sbf):
    """All 60 transmitted words satisfy ICD parity with chained D29*/D30*."""
    dwrd = np.zeros(N_DWRD, dtype=np.uint32)
    g = GpsTime(2244, 172800.0)
    g0 = lnav.generate_nav_msg(g, sbf, dwrd, init=True)
    assert g0.sec == 172800.0  # already a 30 s boundary

    prev = 0
    for i in range(N_DWRD):
        w = int(dwrd[i])
        assert _icd_parity_ok(w, (prev >> 1) & 1, prev & 1), f"word {i}"
        prev = w


def test_generate_nav_msg_tow_and_wn(sbf):
    dwrd = np.zeros(N_DWRD, dtype=np.uint32)
    g = GpsTime(2244, 172800.0)
    lnav.generate_nav_msg(g, sbf, dwrd, init=True)

    # HOW word (word 2 of each subframe) carries incrementing TOW
    base_tow = 172800 // 6
    for isbf in range(5):
        how = int(dwrd[(isbf + 1) * 10 + 1])
        d30s = int(dwrd[(isbf + 1) * 10]) & 1
        tow = ((how >> 13) & 0x1FFFF) ^ (0x1FFFF if d30s else 0)
        assert tow == base_tow + 1 + isbf

    # WN (mod 1024) in SF1 word 3 d1..d10
    w3 = int(dwrd[12])
    d30s = int(dwrd[11]) & 1
    wn = ((w3 >> 20) & 0x3FF) ^ (0x3FF if d30s else 0)
    assert wn == 2244 % 1024


def test_generate_nav_msg_steady_state_shift(sbf):
    """init=False moves last frame's SF5 into slot 0 (c:1853-1859), so the
    bit pointer can index before the 30 s boundary."""
    dwrd = np.zeros(N_DWRD, dtype=np.uint32)
    lnav.generate_nav_msg(GpsTime(2244, 172800.0), sbf, dwrd, init=True)
    sf5_prev = dwrd[50:60].copy()
    lnav.generate_nav_msg(GpsTime(2244, 172830.0), sbf, dwrd, init=False)
    assert np.array_equal(dwrd[0:10], sf5_prev)


def test_nav_bits_feed_scheduler(fixture_paths):
    """Scheduler's +-1 bit table is the MSB-first expansion of dwrd."""
    from pluto_gps_sim_tpu.models.geodesy import llh2xyz
    from pluto_gps_sim_tpu.runtime import (select_ephemeris_set,
                                           setup_scenario)
    from pluto_gps_sim_tpu.runtime.scheduler import Scheduler

    rin = read_rinex2(fixture_paths["rinex2"])
    g0 = setup_scenario(rin, None)
    ieph = select_ephemeris_set(rin, g0)
    xyz = np.asarray(llh2xyz(np.array([0.6227, 2.4404, 10.0])))
    sched = Scheduler(rin, g0, ieph, xyz, fs=1e6)
    plan = sched.plan(1)
    st = sched.state
    c = int(np.flatnonzero(st.prn > 0)[0])
    bits = plan.bits[c].reshape(N_DWRD, 30)
    for iwrd in (0, 9, 37):
        w = int(st.dwrd[c][iwrd])
        # bit 1 -> +1, bit 0 -> -1 (the reference's dataBit*2-1, c:2723)
        want = np.array([2 * ((w >> (29 - k)) & 1) - 1 for k in range(30)],
                        dtype=np.int8)
        assert np.array_equal(bits[iwrd], want)


def test_nav_msg_batch_matches_scalar():
    """The vectorized boundary refresh (scheduler's host fast path) is
    word-for-word the scalar generate_nav_msg per channel, for both
    init and steady-state refresh, on random subframe content."""
    rng = np.random.default_rng(7)
    for _ in range(10):
        n_ch = int(rng.integers(1, MAX_CHAN + 1))
        sbf = (rng.integers(0, 1 << 24, size=(n_ch, 5, 10),
                            dtype=np.uint32) << np.uint32(6))
        g = GpsTime(int(rng.integers(1000, 3000)),
                    float(rng.integers(0, 20000) * 30))
        for init in (True, False):
            d_scalar = rng.integers(0, 1 << 30, size=(n_ch, N_DWRD),
                                    dtype=np.uint32)
            d_batch = d_scalar.copy()
            g0s = [lnav.generate_nav_msg(g, sbf[c], d_scalar[c], init)
                   for c in range(n_ch)]
            g0b = lnav.generate_nav_msg_batch(g, sbf, d_batch, init)
            assert np.array_equal(d_scalar, d_batch)
            assert all(g0.week == g0b.week and g0.sec == g0b.sec
                       for g0 in g0s)


def test_nav_refresher_matches_batch():
    """NavRefresher (frame-invariant words cached, only HOWs recomputed)
    is word-for-word generate_nav_msg_batch(init=False) across many
    boundaries, subframe-content changes (rollover) and a week-number
    change — on dwrd chains produced by a real init (the nib-solve 00
    LSBs the cache relies on hold for any REAL chain, not for random
    dwrd bytes)."""
    rng = np.random.default_rng(11)
    n_ch = 7
    sbf = (rng.integers(0, 1 << 24, size=(n_ch, 5, 10),
                        dtype=np.uint32) << np.uint32(6))
    g = GpsTime(2244, 172800.0)
    d_ref = np.zeros((n_ch, N_DWRD), np.uint32)
    lnav.generate_nav_msg_batch(g, sbf, d_ref, init=True)
    d_fast = d_ref.copy()
    refresher = lnav.NavRefresher()
    for step in range(1, 25):
        gs = GpsTime(g.week + (1 if step >= 20 else 0),
                     g.sec + 30.0 * step)
        if step == 10:       # ephemeris rollover: new subframe content
            sbf = (rng.integers(0, 1 << 24, size=(n_ch, 5, 10),
                                dtype=np.uint32) << np.uint32(6))
        g0b = lnav.generate_nav_msg_batch(gs, sbf, d_ref, init=False)
        g0f = refresher.refresh(gs, sbf, d_fast)
        assert np.array_equal(d_ref, d_fast), f"diverged at step {step}"
        assert g0b.week == g0f.week and g0b.sec == g0f.sec
