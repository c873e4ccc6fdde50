"""Benchmark: composite GPS IQ synthesis throughput on one TPU chip.

Scenario: 12 active channels at fs=2.6 MHz (the reference's headline
configuration — it must sustain 2.6 Msps on one CPU core to avoid SDR
underruns; plutogpssim.c:43, 2152).  We synthesize minutes of signal per
device call with the fused Pallas kernel and report samples/s.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is the real-time multiple at 2.6 MHz (the reference's
implicit baseline is 1.0).

Notes: under the axon tunnel, block_until_ready() is a no-op and results
of identical calls may be cached, so timing rotates seven distinct
parameter sets and forces a device-to-host fetch per chain.
"""

import json
import sys
import time

import numpy as np


def main() -> None:
    sys.path.insert(0, "tests")
    import jax

    jax.config.update("jax_default_device", jax.devices("cpu")[0])

    from fixtures import ensure_fixtures
    paths = ensure_fixtures()

    from pluto_gps_sim_tpu.ingest import read_rinex2
    from pluto_gps_sim_tpu.models.geodesy import llh2xyz
    from pluto_gps_sim_tpu.ops import synth_pallas as sp
    from pluto_gps_sim_tpu.ops.synth_jnp import pack_plan
    from pluto_gps_sim_tpu.runtime import (
        select_ephemeris_set, setup_scenario)
    from pluto_gps_sim_tpu.runtime.scheduler import Scheduler

    fs = 2_600_000.0
    rin = read_rinex2(paths["rinex2"])
    g0 = setup_scenario(rin, None)
    ieph = select_ephemeris_set(rin, g0)
    llh = np.array([35.681298, 139.766247, 10.0])
    llh = llh * np.array([1 / 57.2957795131, 1 / 57.2957795131, 1.0])
    xyz = np.asarray(llh2xyz(llh))

    sched = Scheduler(rin, g0, ieph, xyz, fs=fs)

    def build_args(n_superframes: int):
        plans = [sched.plan(300) for _ in range(n_superframes)]
        dps = [pack_plan(p) for p in plans]
        pairs = [sp.build_block_params(d) for d in dps]
        prmi = np.concatenate([a for a, _ in pairs], axis=0)
        prmf = np.concatenate([b for _, b in pairs], axis=0)
        # force the full 12-channel load: clone active channels' params
        # into any inactive slots (the reference's worst case, MAX_CHAN=12)
        act = np.concatenate([d.active for d in dps], axis=0)
        n_act = act[0].sum()
        src = np.flatnonzero(act[0])
        for c in range(act.shape[1]):
            if not act[0, c]:
                s_col = int(src[c % n_act])
                for base in (0, 12, 24, 36, 48, 60, 72, 84):
                    prmi[:, 0, base + c] = prmi[:, 0, base + s_col]
                for base in (0, 12, 24):
                    prmf[:, 0, base + c] = prmf[:, 0, base + s_col]
        ca_tabs = sp.pack_ca_tables([p.ca2 for p in plans])
        sf_map = np.concatenate(
            [np.full(p.n_blocks, i, np.int32) for i, p in enumerate(plans)])
        return (prmi, prmf), ca_tabs, sf_map, dps[0].block_samples

    n_sf = 4  # 120 s of signal per call
    # 7 distinct parameter sets so no call in a timing chain repeats an
    # earlier one byte-for-byte (the axon tunnel may cache identical
    # calls, which would inflate the slope)
    raw = [build_args(n_sf) for _ in range(7)]
    tpu = jax.devices()[0]
    import jax.numpy as jnp

    # pre-stage parameters on device: they are control-plane data produced
    # at 10 Hz (a few KB/block) and amortize over minutes of signal; the
    # benchmark times the synthesis kernel, not the axon tunnel
    block_samples = raw[0][3]
    M = raw[0][2].size
    nt = -(-block_samples // sp.TILE_SAMPLES)
    fn = sp._build_fn(M, nt, n_sf, True, False)
    argsets = []
    with jax.enable_x64(False):
        for (prmi, prmf), ca_tabs, sf_map, _ in raw:
            argsets.append(tuple(
                jax.device_put(jnp.asarray(x), tpu) for x in
                (sf_map.astype(np.int32), prmi, prmf, ca_tabs,
                 sp._RAWTAB)))

    def run_chain(k, flip):
        """k chained DISTINCT kernel calls, one D2H fetch at the end."""
        with jax.enable_x64(False):
            for i in range(k):
                out = fn(*argsets[(flip + i) % len(argsets)])
        return np.asarray(out[-1, -1])

    run_chain(len(argsets), 0)  # compile + warm every argset

    # The axon tunnel adds a large flat dispatch+fetch latency per
    # Python-visible call (~40 ms) that does not exist on directly
    # attached TPUs and amortizes over streamed minutes of signal in
    # production; measure the device throughput as the SLOPE between
    # 1-call and 6-call timings so the report reflects the hardware,
    # not the tunnel.
    def timed(k):
        ts = []
        for rep in range(7):
            t0 = time.time()
            run_chain(k, rep)
            ts.append(time.time() - t0)
        return float(np.median(ts))

    t1, t6 = timed(1), timed(6)
    dt = max((t6 - t1) / 5.0, 1e-9)

    samples = M * block_samples
    msps = samples / dt / 1e6
    rt_multiple = msps * 1e6 / fs

    print(json.dumps({
        "metric": "iq_synthesis_throughput_12ch_2p6MHz",
        "value": round(msps, 1),
        "unit": "Msamples/s/chip",
        "vs_baseline": round(rt_multiple, 1),
    }))


if __name__ == "__main__":
    main()
