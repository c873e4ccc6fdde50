"""Captured Monte-Carlo measurement: B=256 receivers x 30 s on one chip.

BASELINE configs[4] scale check.  Prints one JSON line:
control/init/device seconds, aggregate Gsps over control+device, and
patch-drop accounting (must be 0 since the round-5 gain nudge).

Run on an OTHERWISE IDLE host (CLAUDE.md: the chip is single-tenant and
the control plane is host-bound):  python tools/mc_capture.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np  # noqa: E402


def main() -> None:
    import jax

    jax.config.update("jax_default_device", jax.devices("cpu")[0])
    import jax.numpy as jnp

    from fixtures import ensure_fixtures
    from pluto_gps_sim_tpu.ingest import read_rinex2
    from pluto_gps_sim_tpu.models.geodesy import llh2xyz
    from pluto_gps_sim_tpu.parallel.montecarlo import MonteCarloBatch
    from pluto_gps_sim_tpu.runtime import (select_ephemeris_set,
                                           setup_scenario)

    paths = ensure_fixtures()
    rin = read_rinex2(paths["rinex2"])
    g0 = setup_scenario(rin, None)
    ieph = select_ephemeris_set(rin, g0)
    llh = np.array([35.681298, 139.766247, 10.0]) / \
        np.array([57.2957795131, 57.2957795131, 1.0])
    xyz0 = np.asarray(llh2xyz(llh))
    rng = np.random.RandomState(0)
    B, n_blocks = 256, 300
    xyz = xyz0[None, :] + rng.uniform(-2000.0, 2000.0, (B, 3))
    tpu = [d for d in jax.devices() if d.platform == "tpu"][0]
    csum = jax.jit(lambda o: jnp.sum(o), device=tpu)

    def run():
        import collections
        t0 = time.time()
        mc = MonteCarloBatch(rin, g0, ieph, xyz, fs=2_600_000.0)
        t_init = time.time() - t0
        t0 = time.time()
        total = 0
        done = 0
        pending: collections.deque = collections.deque()
        # 3000-block chunks: two live on device (one-deep pipeline), so
        # ~6.3 GB of packed IQ resident — fits a 16 GB chip with room.
        # lag-1 sync consumer (bench._pipelined_child rationale): fetch
        # chunk k-1's 8 B sum after dispatching chunk k's reduction, so
        # the tunnel's ~40 ms flat roundtrip overlaps synthesis
        for off, dev in mc.superframes(n_blocks, device=tpu,
                                       chunk_blocks=3000, as_device=True):
            pending.append(csum(dev))
            while len(pending) > 1:
                total += int(np.asarray(pending.popleft()))
            done += dev.shape[0]
        while pending:
            total += int(np.asarray(pending.popleft()))
        t_dev = time.time() - t0
        assert done == B * n_blocks and total != 0
        return t_init, mc.control_seconds, t_dev, mc.patch_dropped

    run()                                   # cold: compiles + page-in
    runs = []
    for _ in range(3):
        # let the previous run's ~6 GB of device buffers deallocate and
        # the tunnel chatter drain before timing the next control phase
        # (measured: back-to-back runs inflate control 2-3x)
        time.sleep(3.0)
        runs.append(run())
    t_init = min(r[0] for r in runs)
    t_ctrl = min(r[1] for r in runs)
    t_dev = min(r[2] for r in runs)
    drops = sum(r[3] for r in runs)
    samples = B * n_blocks * 260_000
    print(json.dumps({
        "metric": "mc_b256_30s",
        "B": B, "n_blocks": n_blocks, "samples": samples,
        "init_s": round(t_init, 2),
        "control_s": round(t_ctrl, 2),
        "device_consume_s": round(t_dev, 2),
        "aggregate_gsps": round(samples / (t_ctrl + t_dev) / 1e9, 2),
        "patch_dropped": drops,
        "runs_ctrl_dev": [[round(r[1], 2), round(r[2], 2)] for r in runs],
    }), flush=True)
    if drops:
        sys.exit(1)


if __name__ == "__main__":
    main()
