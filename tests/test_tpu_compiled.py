"""Compiled-TPU correctness gate — RUN_TPU=1 (needs a real TPU chip).

Everything else in the suite runs the Pallas kernel in interpret mode on
CPU (tests/conftest.py pins the CPU backend), which exercises the math
but not the Mosaic lowering.  These tests run the ACTUAL compiled
artifacts on the attached chip against the f64 precise path:

    RUN_TPU=1 python -m pytest tests/test_tpu_compiled.py -q -s

bench.py performs the same kernel check before every timing run, so the
driver's benchmark is also a compiled-correctness run; this test exists
so `RUN_TPU=1 pytest` can gate a toolchain upgrade without benching.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from pluto_gps_sim_tpu.constants import R2D
from pluto_gps_sim_tpu.ingest import read_rinex2
from pluto_gps_sim_tpu.models.geodesy import llh2xyz
from pluto_gps_sim_tpu.runtime import select_ephemeris_set, setup_scenario

pytestmark = pytest.mark.skipif(
    os.environ.get("RUN_TPU") != "1",
    reason="needs a real TPU chip; enable with RUN_TPU=1")

TOKYO = np.array([35.681298 / R2D, 139.766247 / R2D, 10.0])


def _tpu():
    import jax
    tpus = [d for d in jax.devices() if d.platform == "tpu"]
    if not tpus:
        pytest.skip("no TPU device present")
    return tpus[0]


def _scenario(fixture_paths, fs):
    from pluto_gps_sim_tpu.ops.synth_jnp import pack_plan
    from pluto_gps_sim_tpu.runtime.scheduler import Scheduler
    rin = read_rinex2(fixture_paths["rinex2"])
    g0 = setup_scenario(rin, None)
    ieph = select_ephemeris_set(rin, g0)
    sched = Scheduler(rin, g0, ieph, np.asarray(llh2xyz(TOKYO)), fs=fs)
    return pack_plan(sched.plan(4))


def _assert_tracks_precise(got, golden, what):
    """Bit-exact up to the kernel's documented 1e-11-class floors (u32
    phase-quantization straddles, Q36 chip edges): the bound allows ~4
    components per 2M, far below any real regression (a gain-trunc or
    carrier-level regression reads 1e-4..1e-3 here), and measured runs
    report 100.000000% / max err 0."""
    exact = float(np.mean(got == golden))
    max_err = int(np.abs(got.astype(np.int64)
                         - golden.astype(np.int64)).max())
    print(f"{what}: bit-exact {exact:.6%}, max component err {max_err}")
    assert exact >= 1.0 - 2e-6, f"{what}: bit-exact {exact:.6%}"
    assert max_err <= 8, f"{what}: max err {max_err} (chip/nav flip?)"


def test_compiled_pallas_vs_precise(fixture_paths):
    from pluto_gps_sim_tpu.ops import synth_pallas as sp
    from pluto_gps_sim_tpu.ops.synth_jnp import synth_superframe_precise
    dp = _scenario(fixture_paths, fs=2_600_000.0)
    golden = synth_superframe_precise(dp)
    out = np.asarray(sp.synth_blocks_pallas(
        sp.build_block_params(dp), sp.pack_ca_tables([dp.ca2]),
        np.zeros(dp.n_blocks, np.int32), dp.block_samples,
        device=_tpu()))[:, :dp.block_samples]
    got = np.stack([(out & 0xFFFF).astype(np.uint16).view(np.int16),
                    (out >> 16).astype(np.int16)], axis=-1)
    _assert_tracks_precise(got, golden, "compiled pallas")


def test_compiled_tiled_vs_precise(fixture_paths):
    """The XLA fallback path compiled for TPU (per-tile anchors make it
    track the f64 path even closer than the per-block Pallas NCOs)."""
    from pluto_gps_sim_tpu.ops.synth_jnp import (
        synth_superframe_precise, synth_superframe_tiled)
    dp = _scenario(fixture_paths, fs=2_600_000.0)
    golden = synth_superframe_precise(dp)
    got = synth_superframe_tiled(dp, device=_tpu())
    _assert_tracks_precise(got, golden, "compiled tiled")


def test_compiled_pallas_fs5mhz(fixture_paths):
    """fs=5 MHz: 500k-sample blocks stress the top of the Q24/Q36 ramp
    range (padded n reaches 524287 of the 524288 bound)."""
    from pluto_gps_sim_tpu.ops import synth_pallas as sp
    from pluto_gps_sim_tpu.ops.synth_jnp import synth_superframe_precise
    dp = _scenario(fixture_paths, fs=5_000_000.0)
    golden = synth_superframe_precise(dp)
    out = np.asarray(sp.synth_blocks_pallas(
        sp.build_block_params(dp), sp.pack_ca_tables([dp.ca2]),
        np.zeros(dp.n_blocks, np.int32), dp.block_samples,
        device=_tpu()))[:, :dp.block_samples]
    got = np.stack([(out & 0xFFFF).astype(np.uint16).view(np.int16),
                    (out >> 16).astype(np.int16)], axis=-1)
    _assert_tracks_precise(got, golden, "compiled pallas fs=5MHz")


def test_compiled_pallas_fs10mhz_split(fixture_paths):
    """fs=10 MHz: 1M-sample blocks exceed the kernel's Q24 range and
    split into 2 re-anchored 500k sub-blocks (ops.synth_jnp.split_plan,
    round 5 — the reference accepts any -s >= 1 MHz, c:2326-2329; round
    4 fell back to the tiled path here).  The compiled kernel on the
    split plan must track the split precise path at the standard bound,
    and the reassembled rows must track the UNSPLIT precise path."""
    from pluto_gps_sim_tpu.ops import synth_pallas as sp
    from pluto_gps_sim_tpu.ops.synth_jnp import (
        split_plan, synth_superframe_precise)
    dp = _scenario(fixture_paths, fs=10_000_000.0)
    assert dp.block_samples > sp.MAX_BLOCK_SAMPLES
    dp_s = split_plan(dp, sp.MAX_BLOCK_SAMPLES)
    k = dp_s.n_blocks // dp.n_blocks
    golden_s = synth_superframe_precise(dp_s)
    out = np.asarray(sp.synth_blocks_pallas(
        sp.build_group_params([dp_s]), sp.pack_ca_tables([dp_s.ca2]),
        np.zeros(dp_s.n_blocks, np.int32), dp_s.block_samples,
        device=_tpu()))[:, :dp_s.block_samples]
    got = np.stack([(out & 0xFFFF).astype(np.uint16).view(np.int16),
                    (out >> 16).astype(np.int16)], axis=-1)
    _assert_tracks_precise(got, golden_s, "compiled pallas fs=10MHz split")
    golden_u = synth_superframe_precise(dp)
    re_s = got.reshape(dp.n_blocks, k * dp_s.block_samples,
                       2)[:, :dp.block_samples]
    _assert_tracks_precise(re_s, golden_u,
                           "compiled pallas fs=10MHz vs unsplit precise")


def test_compiled_production_group_rollover(fixture_paths):
    """450 s including an ephemeris rollover through the PRODUCTION
    dispatch path — the exact compiled artifact bench.py times:
    `IqStream(mode="pallas", superframes_per_dispatch=8)` with its
    ramped dispatch groups (1, 2, 4, then a full 8-superframe group),
    i.e. the multi-superframe sf_map + per-superframe C/A tables +
    gain-trunc patch slots at group scale.  (Until round 4 the long
    gate dispatched each superframe singly via synth_blocks_pallas —
    a different compiled artifact than the one whose throughput is
    the headline.)  Every 300-block superframe of every group is held
    to the compiled tiled path (== the f64 precise path bit-for-bit,
    test_soak) ON DEVICE — only 2 scalars per superframe cross the
    tunnel — and the stream must drop ZERO patch words."""
    import jax
    import jax.numpy as jnp

    from pluto_gps_sim_tpu.models.gpstime import GpsTime, inc_gps_time
    from pluto_gps_sim_tpu.ops.synth_jnp import (
        pack_plan, synth_superframe_tiled_async)
    from pluto_gps_sim_tpu.runtime.scheduler import Scheduler
    from pluto_gps_sim_tpu.runtime.stream import IqStream

    tpu = _tpu()
    rin = read_rinex2(fixture_paths["rinex2"])
    toc0 = GpsTime(int(rin.eph[0].toc_week[0]),
                   float(rin.eph[0].toc_sec[0]))
    g0 = setup_scenario(rin, inc_gps_time(toc0, 3540.0))  # rollover +90 s
    ieph = select_ephemeris_set(rin, g0)
    xyz = np.asarray(llh2xyz(TOKYO))
    fs = 2_600_000.0
    # ramp 1+2+4 then one FULL 8-superframe group: 300+600+1200+2400
    n_blocks = 4500
    stream = IqStream(rin, g0, ieph, xyz, fs=fs, mode="pallas",
                      device=tpu, superframes_per_dispatch=8)
    # independent scheduler replays the identical plans for the tiled
    # reference (deterministic control plane)
    sched = Scheduler(rin, g0, ieph, xyz, fs=fs)
    bs = sched.block_samples

    def stats(packed, tiled):
        # int16 semantics of the packed low half without leaving int32
        i16 = ((packed & 0xFFFF) ^ 0x8000) - 0x8000
        q16 = jax.lax.shift_right_logical(packed, jnp.int32(16))
        q16 = (q16 ^ 0x8000) - 0x8000
        t = tiled.astype(jnp.int32)
        di = jnp.abs(i16 - t[..., 0])
        dq = jnp.abs(q16 - t[..., 1])
        # int32 sums suffice: 2 * 300 * 260k = 156M < 2^31 per superframe
        n_bad = jnp.sum((di > 0).astype(jnp.int32)) + \
            jnp.sum((dq > 0).astype(jnp.int32))
        return n_bad, jnp.maximum(di.max(), dq.max())

    total = bad = 0
    max_err = 0
    done = 0
    with jax.enable_x64(False):
        jfn = jax.jit(stats, device=tpu)
    for packed_group in stream.superframes(n_blocks, as_device=True):
        g_blocks = packed_group.shape[0]
        off = 0
        while off < g_blocks:
            plan = sched.plan(min(300, g_blocks - off))
            dp = pack_plan(plan)
            assert dp.n_blocks == 300, "span drifted off the 300-block grid"
            tiled = synth_superframe_tiled_async(dp, device=tpu)
            with jax.enable_x64(False):
                n_bad, m = jfn(packed_group[off:off + 300, :bs], tiled)
            bad += int(np.asarray(n_bad))
            max_err = max(max_err, int(np.asarray(m)))
            total += 2 * 300 * bs
            off += plan.n_blocks
        done += g_blocks
    assert done == n_blocks
    assert stream.sched.ieph == 1 and sched.ieph == 1, \
        "scenario did not cross the rollover"
    assert stream.patch_dropped == 0, \
        f"production stream dropped {stream.patch_dropped} patch words"
    exact = 1.0 - bad / total
    print(f"compiled production-path run: {done} blocks, bit-exact "
          f"{exact:.6%}, max component err {max_err}")
    # After the round-3 gain-trunc patches and the Q24 carrier level,
    # the compiled kernel matches the tiled path to the NCOs' shared
    # quantization floor: expected disagreements ~0.03 components per
    # 990 blocks (u32 phase straddles at 2^-24, Q36 chip edges).  The
    # bound allows ~23 of 2.34G — the pre-fix mechanisms read 124
    # (carrier Q12, per 990 blocks) and ~48k (gain trunc) here and must
    # fail loudly.
    assert exact >= 1.0 - 1e-8 and max_err <= 8


def test_compiled_iq_is_receivable(fixture_paths):
    """Capstone: 40 s of IQ from the COMPILED kernel via the production
    IqStream path is *receivable* — the software GPS receiver
    (utils/receiver.py: acquisition, Costas PLL + carrier-aided DLL,
    parity-checked LNAV decode) obtains a position fix within metres of
    the simulated location using only broadcast-decoded parameters.
    The software equivalent of the reference's hardware validation
    (RF into a real receiver), run against the real Mosaic artifact."""
    from pluto_gps_sim_tpu.runtime.stream import IqStream
    from pluto_gps_sim_tpu.utils.receiver import receive_and_fix

    tpu = _tpu()
    rin = read_rinex2(fixture_paths["rinex2"])
    g0 = setup_scenario(rin, None)
    ieph = select_ephemeris_set(rin, g0)
    xyz = np.asarray(llh2xyz(TOKYO))
    fs = 2_600_000.0
    stream = IqStream(rin, g0, ieph, xyz, fs=fs, mode="pallas",
                      device=tpu, superframes_per_dispatch=2)
    iq = np.concatenate(
        [np.asarray(b) for b in stream.superframes(400)], axis=0)

    sol, tracks = receive_and_fix(iq, fs, ref_week=g0.week,
                                  measure_sample=int(round(fs)))
    err = float(np.linalg.norm(sol.xyz - xyz))
    print(f"receiver fix on compiled-kernel IQ: {err:.1f} m, "
          f"{len(sol.prns)} SVs, rms residual {sol.rms_residual:.1f} m")
    assert err < 15.0, f"fix error {err:.1f} m"
    assert len(sol.prns) >= 6
    assert all(tr.decoded for tr in tracks.values())
