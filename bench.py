"""Benchmark: composite GPS IQ synthesis throughput on one TPU chip.

Scenario: 12 active channels at fs=2.6 MHz (the reference's headline
configuration — it must sustain 2.6 Msps on one CPU core to avoid SDR
underruns; plutogpssim.c:43, 2152).  We synthesize minutes of signal per
device call with the fused Pallas kernel and report samples/s.

Core measurements, one JSON line:

  value / vs_baseline   kernel throughput (timing SLOPE between a 1-call
                        and a 6-call chain of distinct parameter sets, so
                        the axon tunnel's ~40 ms flat per-call dispatch —
                        absent on directly attached TPUs — cancels out)
  e2e_device_x          full production pipeline: Scheduler.plan ->
                        pack -> build_block_params -> H2D -> kernel ->
                        on-device checksum reduction (8 B D2H/superframe).
                        Everything except bulk IQ egress.
  e2e_sustained_x       the same pipeline's MARGINAL rate between 120 s
                        and 240 s runs — the flat per-call tunnel
                        latency cancels, leaving the per-signal-second
                        cost a directly attached host would sustain.
  e2e_pipelined_x       the actual production runtime path: IqStream's
                        two-deep software pipeline (planner thread) at
                        superframes_per_dispatch=8 (one kernel call per
                        240 s of signal through the multi-superframe
                        sf_map) with a device-side consumer
                        (as_device=True) that reduces and synchronizes
                        per group — host planning of groups k+1/k+2
                        overlaps device synthesis of group k.  Measured
                        in a FRESH SUBPROCESS (_pipelined_child: the
                        tunnel client degrades with cumulative
                        in-process traffic).  May legitimately EXCEED
                        the kernel multiple: the kernel metric clones
                        params into inactive slots to time the
                        full-12-channel worst case, while the pipeline
                        synthesizes the scenario's actual visible set
                        (~7 SVs on this fixture — exactly what the
                        reference transmits too).
  e2e_delivered_x       same pipeline with the full int16 IQ fetched to
                        host NumPy (D2H enqueued at dispatch time so
                        delivery overlaps the next group's synthesis) —
                        the delivered-samples contract (c:2152).
                        Limited by this environment's tunnel D2H
                        (6-30 MB/s across captured hours, recorded in
                        the env fingerprint; a directly attached host
                        has ~3 orders more PCIe bandwidth).

Also recorded per run: host_ctrl_ms_per_sf (the host-bound pipeline's
governing quantity), patch-drop counters (hard-gated to zero),
pipelined_metric_version, and an `env` fingerprint (nproc, loadavg,
tunnel RTT, H2D/D2H MB/s, dispatch-chain rate) so a slow-tunnel hour is
distinguishable from a regression inside the artifact itself.

Before timing, the kernel output is VERIFIED elementwise against the
f64 precise path: >=99.99% of int16 components bit-exact and max
component error <=16 (the documented adjacent-LUT-pick allowance of the
kernel's u32 carrier quantization); a wrong-but-fast kernel cannot
bench.

Notes: under the axon tunnel, results of identical calls may be cached,
so timing rotates seven distinct parameter sets and forces a device
fetch per chain.
"""

import json
import os
import subprocess
import sys
import threading
import time

import numpy as np


def _probe_tpu(attempts: int = 3, probe_timeout: float = 150.0) -> bool:
    """Check device availability in a SUBPROCESS before touching jax here.

    The axon tunnel's chip is single-tenant: if another process holds it,
    jax.devices() blocks indefinitely (observed: >100 s with no progress)
    and SIGTERM doesn't interrupt a blocked dispatch.  Probing in a child
    with a timeout keeps this process killable and lets us emit a
    diagnostic JSON line instead of hanging the driver forever."""
    code = ("import jax; d = jax.devices(); "
            "import jax.numpy as jnp; "
            "jnp.ones((8, 8)).sum().block_until_ready(); print('ok')")
    for i in range(attempts):
        try:
            r = subprocess.run([sys.executable, "-c", code],
                               capture_output=True, timeout=probe_timeout)
            if r.returncode == 0 and b"ok" in r.stdout:
                return True
            print(f"WARNING: device probe attempt {i + 1} exited "
                  f"{r.returncode}", file=sys.stderr)
        except subprocess.TimeoutExpired:
            print(f"WARNING: device probe attempt {i + 1} timed out "
                  f"({probe_timeout:.0f}s) — TPU busy or tunnel wedged",
                  file=sys.stderr)
        if i + 1 < attempts:
            time.sleep(30.0)  # another tenant may be finishing
    return False


# metrics recorded as they complete, so a mid-run wedge still reports
# everything measured before the stall (main() fills this in)
_PARTIAL: dict = {}

# The pipelined figure's measurement definition, recorded in the JSON so
# cross-round comparisons know when the metric itself changed:
#   1 (rounds 1-3): in-process IqStream, async-drain consumer
#   2 (round 4+):   fresh-subprocess child, lag-1 synchronous device-side
#                   consumer (see _pipelined_child) — the in-process
#                   form conflated the figure with harness tunnel decay
#                   and allocator-stall noise
_PIPELINED_METRIC_VERSION = 2


def _env_fingerprint(tpu) -> dict:
    """Environment probe recorded alongside the results: host CPU count
    and load, tunnel round-trip latency, and H2D/D2H bandwidth with
    fixed-size probes — so a slow-tunnel hour is distinguishable from a
    real regression in the artifact itself (round-4 verdict item #1)."""
    import jax
    import jax.numpy as jnp

    fp = {"nproc": os.cpu_count(),
          "loadavg1": round(os.getloadavg()[0], 2)}
    try:
        with jax.enable_x64(False):
            # DISTINCT pre-staged arrays per rep: jax caches the host
            # copy after the first np.asarray of a given buffer (and the
            # tunnel may cache identical calls), so timing a repeated
            # fetch of one array reads ~0 ms
            tinies = [jax.device_put(jnp.full((1,), i, jnp.int32), tpu)
                      for i in range(5)]
            for t_ in tinies:
                t_.block_until_ready()
            ts = []
            for t_ in tinies:
                t0 = time.time()
                np.asarray(t_)
                ts.append(time.time() - t0)
            fp["tunnel_rtt_ms"] = round(float(np.median(ts)) * 1e3, 1)
            bufs = [np.full(16 * 1024 * 1024, i, np.int32)  # 64 MB each
                    for i in range(3)]
            ts = []
            devs = []
            for b in bufs:
                t0 = time.time()
                d = jax.device_put(b, tpu)
                d.block_until_ready()
                ts.append(time.time() - t0)
                devs.append(d)
            fp["h2d_MBps"] = round(64.0 / float(np.median(ts)), 1)
            ts = []
            for d in devs:
                t0 = time.time()
                np.asarray(d)
                ts.append(time.time() - t0)
            fp["d2h_MBps"] = round(64.0 / float(np.median(ts)), 1)
            # dispatch-chain throughput: an async chain of tiny distinct
            # kernels, one sync at the end — the tunnel dimension the
            # RTT/bandwidth probes miss (one captured hour read kernel
            # slope 3749 Msps but pipelined 1166x with healthy RTT/H2D:
            # the per-dispatch ingest rate itself had degraded)
            f = jax.jit(lambda a, b: a + b)   # runs where the inputs live
            xs = [jax.device_put(jnp.full((8,), i, jnp.int32), tpu)
                  for i in range(4)]
            f(xs[0], xs[1]).block_until_ready()
            t0 = time.time()
            acc = xs[0]
            for i in range(40):
                acc = f(acc, xs[i % 4])
            acc.block_until_ready()
            fp["dispatch_chain_per_s"] = round(40.0 / (time.time() - t0), 1)
    except Exception as e:                    # fingerprint must not kill bench
        fp["probe_error"] = str(e)
    return fp


def _arm_deadline(seconds: float) -> None:
    """Hard wall-clock ceiling on the whole bench: if anything wedges
    mid-run (tunnel stall during a dispatch), print what was measured
    plus a failure marker and exit instead of hanging past round end."""
    def _fire():
        line = {"metric": "iq_synthesis_throughput_12ch_2p6MHz",
                "value": None, "unit": "Msamples/s/chip",
                "vs_baseline": None}
        line.update(_PARTIAL)
        line["error"] = (f"bench exceeded {seconds:.0f}s deadline "
                         "(TPU tunnel stalled mid-run); fields above "
                         "were measured before the stall")
        print(json.dumps(line), flush=True)
        os._exit(2)
    t = threading.Timer(seconds, _fire)
    t.daemon = True
    t.start()


def _pipelined_child() -> None:
    """The e2e_pipelined measurement, run in a fresh process (spawned by
    main(); the parent's rig phases degrade the tunnel client's
    dispatch throughput — see the e2e_pipelined comment in main()).

    The real runtime path: IqStream.superframes() plans and dispatches
    up to two groups ahead on the planner thread while the consumer
    drains, so host control plane, device synthesis, and transport all
    overlap.  superframes_per_dispatch=8 batches 240 s of signal per
    kernel call (the multi-superframe sf_map the kernel was built for).
    The consumer reduces each group ON DEVICE and fetches the 8 B sums
    synchronously with ONE group of lag (fetch group k-1's sum after
    dispatching group k's reduction, drain fully at the end) — a
    device-resident downstream stage's natural pipelining.  The rate
    counts every group's synthesis to completion and live outputs stay
    bounded at ~4 x 2.6 GB.  Lag-0 (fetch each group before taking the
    next) serializes this harness's ~40 ms flat tunnel roundtrip into
    every group (measured -8%: 1549-1619x vs 1775-1806x; attached
    hosts have us-scale roundtrips).  An async-drain consumer (fetch
    all sums at the end) is WRONG in the other direction: dispatch
    runs decoupled from the device, dozens of 2.6 GB outputs pile into
    HBM, and the figure turns into allocator-stall noise (measured
    246-1700x on identical trees).

    Warm run: 4500 blocks = ramp groups of 1+2+4 superframes plus one
    FULL 2400-block 8-superframe group, so every compiled group shape
    (kernel n_sf 1/2/4/8 and the matching host solve grids) is built
    outside the timed reps.  Reps are 24000 blocks (2400 s of signal):
    the pipeline-fill cost — already cut ~5x by the dispatch ramp —
    amortizes over ~12 groups, so the figure is the steady-state
    production rate (the reference runs for hours, c:2655).  Each rep
    starts a different number of superframes into the scenario: same
    shapes (compile cache hits), different bytes (no tunnel-level call
    caching can inflate the timing)."""
    sys.path.insert(0, "tests")
    import jax

    jax.config.update("jax_default_device", jax.devices("cpu")[0])
    import jax.numpy as jnp

    from fixtures import ensure_fixtures
    from pluto_gps_sim_tpu.ingest import read_rinex2
    from pluto_gps_sim_tpu.models.geodesy import llh2xyz
    from pluto_gps_sim_tpu.runtime import (
        select_ephemeris_set, setup_scenario)
    from pluto_gps_sim_tpu.runtime.stream import IqStream

    paths = ensure_fixtures()
    fs = 2_600_000.0
    rin = read_rinex2(paths["rinex2"])
    g0 = setup_scenario(rin, None)
    ieph = select_ephemeris_set(rin, g0)
    llh = np.array([35.681298, 139.766247, 10.0])
    llh = llh * np.array([1 / 57.2957795131, 1 / 57.2957795131, 1.0])
    xyz = np.asarray(llh2xyz(llh))
    tpu = [d for d in jax.devices() if d.platform == "tpu"][0]
    csum = jax.jit(lambda o: jnp.sum(o), device=tpu)
    block_samples = int(round(fs / 10.0))
    k_sf = int(os.environ.get("BENCH_PIPE_K", "8"))
    dropped = 0

    def run(n_blocks, skip_sf=0):
        nonlocal dropped
        import collections
        stream = IqStream(rin, g0, ieph, xyz, fs=fs, mode="pallas",
                          device=tpu, superframes_per_dispatch=k_sf)
        if skip_sf:
            stream.fast_forward(300 * skip_sf)
        t0 = time.time()
        done = total = 0
        pending: collections.deque = collections.deque()
        for dev_out in stream.superframes(n_blocks, as_device=True):
            pending.append(csum(dev_out))
            while len(pending) > 1:              # lag-1 sync (see above)
                total += int(np.asarray(pending.popleft()))
            done += dev_out.shape[0]
        while pending:
            total += int(np.asarray(pending.popleft()))
        dt = time.time() - t0
        assert done == n_blocks and total != 0
        dropped += stream.patch_dropped
        return n_blocks * block_samples / dt / fs

    # warm every ramp shape incl. one full k_sf-superframe group
    run((2 ** (k_sf - 1).bit_length() - 1 + k_sf) * 300)
    runs = [run(24000, skip_sf=1 + r) for r in range(5)]
    print(json.dumps({"median": float(np.median(runs)),
                      "runs": [round(r, 1) for r in runs],
                      "patch_dropped": dropped}), flush=True)


def main() -> None:
    if "--pipelined-child" in sys.argv:
        _pipelined_child()
        return
    sys.path.insert(0, "tests")
    if not _probe_tpu():
        print(json.dumps({
            "metric": "iq_synthesis_throughput_12ch_2p6MHz",
            "value": None, "unit": "Msamples/s/chip", "vs_baseline": None,
            "error": "TPU unreachable: jax.devices() blocked in 3 probe "
                     "attempts (single-tenant chip held by another "
                     "process or tunnel wedged)"}), flush=True)
        sys.exit(2)
    _arm_deadline(float(os.environ.get("BENCH_DEADLINE_S", "2700")))
    import jax

    jax.config.update("jax_default_device", jax.devices("cpu")[0])

    from fixtures import ensure_fixtures
    paths = ensure_fixtures()

    import jax.numpy as jnp

    from pluto_gps_sim_tpu.ingest import read_rinex2
    from pluto_gps_sim_tpu.models.geodesy import llh2xyz
    from pluto_gps_sim_tpu.ops import synth_pallas as sp
    from pluto_gps_sim_tpu.ops.synth_jnp import (
        pack_plan, synth_superframe_precise)
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
    tpu = jax.devices()[0]

    _PARTIAL["env"] = _env_fingerprint(tpu)
    _PARTIAL["pipelined_metric_version"] = _PIPELINED_METRIC_VERSION

    # ---- correctness gate: compiled kernel vs f64 precise path -----------
    # After the round-3 gain-trunc patches and three-level carrier
    # residual, the kernel matches the f64 path to the NCOs' shared
    # ~1e-11 quantization floors (measured 100.000000% / max err 0); the
    # bound allows ~4 components of 2M, far below any real regression
    # (a gain or carrier-level regression reads 1e-4..1e-3 here).  ANY
    # chip or nav-bit flip is a full-amplitude error and fails loudly.
    # A wrong-but-fast kernel cannot bench.
    sched_v = Scheduler(rin, g0, ieph, xyz, fs=fs)
    plan_v = sched_v.plan(4)
    dp_v = pack_plan(plan_v)
    golden = synth_superframe_precise(dp_v)          # [M, N, 2] int16
    prm_v = sp.build_block_params(dp_v)
    # a dropped gain-trunc patch word on the GOLDEN scenario means the
    # 100%-exactness claims below would silently carry +-1 LSB dwell
    # errors — fail loudly (per-call accounting, BlockParams)
    if prm_v.patch_dropped != 0:
        print(json.dumps({"metric": "VERIFY_FAILED",
                          "patch_dropped": prm_v.patch_dropped}))
        sys.exit(1)
    ca_v = sp.pack_ca_tables([dp_v.ca2])
    with jax.enable_x64(False):
        out_v = np.asarray(sp.synth_blocks_pallas(
            prm_v, ca_v, np.zeros(dp_v.n_blocks, np.int32),
            dp_v.block_samples, device=tpu))[:, :dp_v.block_samples]
    got = sp.unpack_iq(out_v)
    exact = float(np.mean(got == golden))
    max_err = int(np.abs(got.astype(np.int64)
                         - golden.astype(np.int64)).max())
    if exact < 1.0 - 2e-6 or max_err > 8:
        print(json.dumps({"metric": "VERIFY_FAILED",
                          "bit_exact": exact, "max_err": max_err}))
        sys.exit(1)

    # second gate, full-superframe scale: compiled pallas vs compiled
    # tiled over 300 blocks, compared ON DEVICE so only 2 scalars cross
    # the tunnel.  (The RUN_TPU suite extends the same check to 990
    # blocks + rollover.)  The two round-3 fixes close what this gate
    # used to tolerate: gain-trunc patch words reproduce the f64 tables'
    # trunc exactly (was ~16.3k 1-LSB components/superframe on dwelling
    # channels), and the Q24 carrier level drops u32 phase straddles to
    # ~0.01/superframe (was ~40).  Bound allows ~15 of 156M components;
    # a chip/nav flip is full-amplitude and still fails max_err <= 8.
    from pluto_gps_sim_tpu.ops.synth_jnp import synth_superframe_tiled_async

    plan_g = sched_v.plan(300)
    dp_g = pack_plan(plan_g)
    tiled_g = synth_superframe_tiled_async(dp_g, device=tpu)

    def _gate_stats(packed, tiled):
        i16 = ((packed & 0xFFFF) ^ 0x8000) - 0x8000
        q16 = (jax.lax.shift_right_logical(packed, jnp.int32(16))
               ^ 0x8000) - 0x8000
        t32 = tiled.astype(jnp.int32)
        di = jnp.abs(i16 - t32[..., 0])
        dq = jnp.abs(q16 - t32[..., 1])
        return (jnp.sum((di > 0).astype(jnp.int32))
                + jnp.sum((dq > 0).astype(jnp.int32)),
                jnp.maximum(di.max(), dq.max()))

    with jax.enable_x64(False):
        packed_g = sp.synth_blocks_pallas(
            sp.build_block_params(dp_g), sp.pack_ca_tables([dp_g.ca2]),
            np.zeros(dp_g.n_blocks, np.int32), dp_g.block_samples,
            device=tpu)[:, :dp_g.block_samples]
        n_bad, m_err = jax.jit(_gate_stats, device=tpu)(packed_g, tiled_g)
    exact_g = 1.0 - int(np.asarray(n_bad)) / (2 * dp_g.n_blocks
                                              * dp_g.block_samples)
    if exact_g < 1.0 - 1e-7 or int(np.asarray(m_err)) > 8:
        print(json.dumps({"metric": "VERIFY_FAILED_300BLK",
                          "bit_exact": exact_g,
                          "max_err": int(np.asarray(m_err))}))
        sys.exit(1)

    # ---- build timing parameter sets --------------------------------------
    sched = Scheduler(rin, g0, ieph, xyz, fs=fs)

    def build_args(n_superframes: int):
        # plan_group = the production host path (one range solve per
        # eph-set run of superframes, as IqStream dispatch groups use)
        plans = sched.plan_group(n_superframes, 300)
        dps = [pack_plan(p, tables=False) for p in plans]
        # rig-attributed drop accounting: since the round-5 gain nudge,
        # drops are zero on every measured scenario — enforced below
        # after the timing phases (any drop in the artifact is a
        # regression, see the drop-budget gate in main())
        bp = sp.build_group_params(dps)
        _PARTIAL["patch_dropped_rig"] = (_PARTIAL.get("patch_dropped_rig", 0)
                                         + bp.patch_dropped)
        prmi, prmf = bp.prmi.copy(), bp.prmf.copy()
        # force the full 12-channel load: clone active channels' params
        # into any inactive slots (the reference's worst case, MAX_CHAN=12)
        act = np.concatenate([d.active for d in dps], axis=0)
        n_act = act[0].sum()
        src = np.flatnonzero(act[0])
        for c in range(act.shape[1]):
            if not act[0, c]:
                s_col = int(src[c % n_act])
                for base in (0, 12, 24, 36, 48, 60, 72, 84, 96, 108):
                    prmi[:, base + c] = prmi[:, base + s_col]
                # every per-channel float lane incl. the gain (a stale
                # base list here would leave clones zero-gain and time a
                # lighter-than-12-channel kernel)
                for base in (sp._F_SR12, sp._F_SREM, sp._F_CQ12,
                             sp._F_RRR, sp._F_GAIN):
                    prmf[:, base + c] = prmf[:, base + s_col]
        ca_tabs = sp.pack_ca_tables([p.ca2 for p in plans])
        sf_map = np.concatenate(
            [np.full(p.n_blocks, i, np.int32) for i, p in enumerate(plans)])
        return (prmi, prmf), ca_tabs, sf_map, dps[0].block_samples

    n_sf = 4  # 120 s of signal per call
    # 7 distinct parameter sets so no call in a timing chain repeats an
    # earlier one byte-for-byte (the axon tunnel may cache identical
    # calls, which would inflate the slope)
    raw = [build_args(n_sf) for _ in range(7)]

    # host control plane per 30 s superframe — exactly the production
    # stages IqStream._dispatch_group runs (plan_group -> pack ->
    # build_group_params -> C/A tables; NOT build_args, whose 12-channel
    # cloning is a bench-only worst-case rig).  The pipelined stream is
    # HOST-bound, so this number sets e2e_pipelined_x.  Settle first:
    # the verify gates' device buffers deallocate asynchronously over
    # the tunnel, and that chatter steals the 1-core host from a timing
    # pass (one captured artifact read 69.8 ms/sf for a 4.6 ms path);
    # min-of-5 then rejects residual scheduler noise.
    del packed_g, tiled_g, out_v
    time.sleep(3.0)

    def _host_pass():
        t0 = time.time()
        plans = sched.plan_group(n_sf, 300)
        dps = [pack_plan(p, tables=False) for p in plans]
        sp.build_group_params(dps)
        sp.pack_ca_tables([d.ca2 for d in dps])
        return (time.time() - t0) / len(plans)

    _PARTIAL["host_ctrl_ms_per_sf"] = round(
        min(_host_pass() for _ in range(5)) * 1000.0, 1)

    # pre-stage parameters on device: they are control-plane data produced
    # at 10 Hz (1 KB/block) and amortize over minutes of signal; this
    # section times the synthesis kernel, not the tunnel
    block_samples = raw[0][3]
    M = raw[0][2].size
    tile = sp.choose_tile(block_samples)
    nt = -(-block_samples // tile)
    fn = sp._build_fn(M, nt, n_sf, True, False, tile)
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
    _PARTIAL["value"] = round(msps, 1)
    _PARTIAL["vs_baseline"] = round(rt_multiple, 1)
    _PARTIAL["verify"] = (f"pallas tracks precise: {exact * 100:.4f}% "
                          f"exact, max err {max_err}<=8")

    def _metric(fn_):
        """Secondary metrics must not kill the bench on a transient
        tunnel failure; report null instead."""
        try:
            return fn_()
        except Exception as e:
            print(f"WARNING: secondary metric failed: {e}", file=sys.stderr)
            return None

    # ---- end-to-end pipeline (device-side consumption) --------------------
    # Full production path per 120 s of signal: host plan -> pack ->
    # build params -> H2D -> one kernel call -> on-device checksum
    # (consumes every sample) -> 8 B D2H.  Median of 3.
    csum = jax.jit(lambda o: jnp.sum(o), device=tpu)

    def e2e_device_once(k=n_sf):
        """Returns (samples, seconds) for a k-superframe pipeline run."""
        t0 = time.time()
        (prmi, prmf), ca_tabs, sf_map, bs = build_args(k)
        fnk = sp._build_fn(sf_map.size, nt, k, True, False, tile)
        with jax.enable_x64(False):
            args = tuple(jax.device_put(jnp.asarray(x), tpu) for x in
                         (sf_map.astype(np.int32), prmi, prmf, ca_tabs,
                          sp._RAWTAB))
            out = fnk(*args)
            s = int(np.asarray(csum(out)))
        dt = time.time() - t0
        assert s != 0
        return sf_map.size * bs, dt

    def _e2e_pair():
        e2e_device_once(12)   # compile-warm the 12-superframe shapes
        e2e_device_once(4)
        runs4 = [e2e_device_once(4) for _ in range(5)]
        runs12 = [e2e_device_once(12) for _ in range(5)]
        dev = float(np.median([n / t for n, t in runs4]))
        # sustained = marginal samples/s between 120 s and 360 s runs:
        # the flat per-call tunnel latency (absent on attached hosts)
        # cancels.  5 reps each and a 240-signal-second gap keep the
        # slope above tunnel noise (2 reps with a 120 s gap returned
        # null in BENCH_r02).  Guard against noise inversions: report
        # null rather than a nonsense multiple.
        d_samp = runs12[0][0] - runs4[0][0]
        t4m = float(np.median([t for _, t in runs4]))
        t12m = float(np.median([t for _, t in runs12]))
        d_t = t12m - t4m
        sus = d_samp / d_t if d_t > 0.05 * t4m else None
        if sus is not None and sus > msps * 1e6:
            # a sustained END-TO-END rate above the raw kernel rate is
            # physically impossible — the slope was noise; report null
            sus = None
        return dev, sus

    pair = _metric(_e2e_pair)
    e2e_dev, e2e_sustained = pair if pair else (None, None)
    _PARTIAL["e2e_device_x"] = round(e2e_dev / fs, 1) if e2e_dev else None
    _PARTIAL["e2e_sustained_x"] = (round(e2e_sustained / fs, 1)
                                   if e2e_sustained else None)

    # ---- end-to-end with delivered samples (tunnel-limited here) ----------
    # the real delivered path: IqStream with host fetches, where the
    # D2H of group k is enqueued at dispatch time (copy_to_host_async)
    # so delivery overlaps group k+1's synthesis.  60 s of signal
    # (~624 MB of IQ) is enough to saturate the D2H path without
    # blowing the bench's time budget on a slow tunnel.
    from pluto_gps_sim_tpu.runtime.stream import IqStream

    def e2e_delivered_once(n_blocks, skip_sf=0):
        """skip_sf offsets the scenario start by whole superframes so
        repeated timings never replay a byte-identical call sequence
        (the tunnel may cache identical calls — see the kernel-slope
        section's argset rotation)."""
        stream = IqStream(rin, g0, ieph, xyz, fs=fs, mode="pallas",
                          device=tpu)
        if skip_sf:
            stream.fast_forward(300 * skip_sf)
        t0 = time.time()
        done = 0
        for sf in stream.superframes(n_blocks):
            assert sf.dtype == np.int16 and sf.shape[1] == block_samples
            done += sf.shape[0]
        dt = time.time() - t0
        assert done == n_blocks
        _PARTIAL["patch_dropped_stream"] = (
            _PARTIAL.get("patch_dropped_stream", 0) + stream.patch_dropped)
        return n_blocks * block_samples / dt

    e2e_del = _metric(lambda: (e2e_delivered_once(300),   # compile-warm
                               e2e_delivered_once(600, skip_sf=1))[1])
    _PARTIAL["e2e_delivered_x"] = round(e2e_del / fs, 1) if e2e_del else None

    # ---- production pipelined e2e (IqStream, device-side consumer) --------
    # Measured in a FRESH SUBPROCESS (see _pipelined_child): the axon
    # tunnel client's dispatch throughput degrades with cumulative
    # in-process device traffic (measured on one chip/hour: fresh
    # process 1475-1696x; the same measurement after this bench's rig
    # phases 246-478x; an 8-minute IDLE control shows no decay, so it
    # is traffic-, not time-, keyed — a harness artifact a directly
    # attached PJRT host does not have).  Production runs one
    # long-lived stream per process, which shows no within-stream decay
    # over 200k+ blocks, so the fresh-process figure is the honest one.
    def _pipe():
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--pipelined-child"],
            capture_output=True, timeout=900, text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)))
        line = [ln for ln in out.stdout.splitlines()
                if ln.startswith("{")][-1]
        child = json.loads(line)
        _PARTIAL["e2e_pipelined_runs"] = child["runs"]
        _PARTIAL["patch_dropped_stream"] = (
            _PARTIAL.get("patch_dropped_stream", 0)
            + child["patch_dropped"])
        return child["median"] * fs

    e2e_pipe = _metric(_pipe)

    # ---- drop budget gate (round-5): the gain nudge makes patch-slot
    # overflow structurally impossible on measured scenarios — ANY drop
    # in a timing stream or the rig is a regression and must fail the
    # artifact rather than ship inside a "passing" JSON (round-4 verdict
    # item #3; round-4 measured 217/95 here, round-5 measures 0/0).
    drops = (_PARTIAL.get("patch_dropped_stream", 0) or 0) + \
        (_PARTIAL.get("patch_dropped_rig", 0) or 0)
    if drops:
        print(json.dumps({"metric": "VERIFY_FAILED_DROP_BUDGET",
                          "patch_dropped_stream":
                              _PARTIAL.get("patch_dropped_stream", 0),
                          "patch_dropped_rig":
                              _PARTIAL.get("patch_dropped_rig", 0)}))
        sys.exit(1)

    print(json.dumps({
        "metric": "iq_synthesis_throughput_12ch_2p6MHz",
        "value": round(msps, 1),
        "unit": "Msamples/s/chip",
        "vs_baseline": round(rt_multiple, 1),
        "verify": _PARTIAL["verify"],
        "e2e_device_x": round(e2e_dev / fs, 1) if e2e_dev else None,
        "e2e_sustained_x": (round(e2e_sustained / fs, 1)
                            if e2e_sustained else None),
        "e2e_pipelined_x": round(e2e_pipe / fs, 1) if e2e_pipe else None,
        "e2e_pipelined_runs": _PARTIAL.get("e2e_pipelined_runs"),
        "e2e_delivered_x": round(e2e_del / fs, 1) if e2e_del else None,
        "host_ctrl_ms_per_sf": _PARTIAL.get("host_ctrl_ms_per_sf"),
        # both drop counters are hard-gated to 0 above (gain nudge);
        # _stream counts the production IqStream timing runs, _rig the
        # 12-channel-clone worst-case rig
        "patch_dropped_stream": _PARTIAL.get("patch_dropped_stream", 0),
        "patch_dropped_rig": _PARTIAL.get("patch_dropped_rig", 0),
        "pipelined_metric_version": _PIPELINED_METRIC_VERSION,
        "env": _PARTIAL.get("env"),
    }))


if __name__ == "__main__":
    main()
