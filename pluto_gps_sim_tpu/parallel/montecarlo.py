"""Batched Monte-Carlo trajectory synthesis.

Nothing like this exists in the reference — it simulates exactly one
receiver (plutogpssim.c:2203).  On TPU the marginal cost of more
receivers is tiny: every trajectory contributes an independent set of
0.1 s blocks, and blocks are the kernel's outer grid axis, so a batch of
B receivers over M blocks is ONE kernel launch over B*M blocks (and
shards over a mesh's "time"/"chan" axes like any other stream via
parallel.synth_sharded).

Control plane: one host Scheduler per trajectory (allocation, nav bits,
rollover are per-receiver state machines at 1/30 s cadence); the 10 Hz
epoch solves inside plan() are jit-cached, so the per-trajectory cost is
small and amortizes over the superframe.

Typical use — receiver swarms, coverage/DOP studies, fuzzing a receiver
against perturbed trajectories:

    mc = MonteCarloBatch(rin, g0, ieph, xyz_batch, fs=2.6e6)
    iq = mc.generate(n_blocks=300)              # [B, 300, N, 2] int16
    iq = mc.generate(n_blocks=300, mesh=mesh)   # sharded across devices
"""

from __future__ import annotations

import numpy as np

from ..ingest.rinex import RinexResult
from ..models.gpstime import GpsTime
from ..ops import synth_pallas as sp
from ..ops.synth_jnp import pack_plan
from ..runtime.scheduler import Scheduler
from .shard import pad_time_shards, shard_channel_params, synth_sharded

__all__ = ["MonteCarloBatch"]


class MonteCarloBatch:
    """B independent receivers on a shared scenario clock."""

    def __init__(self, rin: RinexResult, start: GpsTime, ieph: int,
                 xyz_batch: np.ndarray, fs: float,
                 static_mode: bool = True,
                 block_samples: int | None = None):
        xyz_batch = np.asarray(xyz_batch, dtype=np.float64)
        if xyz_batch.ndim == 2:                 # [B, 3] static receivers
            xyz_batch = xyz_batch[:, None, :]
        if xyz_batch.ndim != 3 or xyz_batch.shape[-1] != 3:
            raise ValueError("xyz_batch must be [B, 3] or [B, numd, 3]")
        self.B = xyz_batch.shape[0]
        self.scheds = [
            Scheduler(rin, start, ieph, xyz_batch[b], fs,
                      block_samples=block_samples,
                      static_mode=static_mode and xyz_batch.shape[1] == 1)
            for b in range(self.B)]
        self.block_samples = self.scheds[0].block_samples

    def plan_blocks(self, n_blocks: int):
        """Plan n_blocks for every trajectory; returns kernel-ready args.

        All trajectories share the scenario clock, so their superframe
        boundaries align and each contributes exactly n_blocks blocks.
        """
        prmi_all, prmf_all, ca_tabs, sf_map = [], [], [], []
        for b, sched in enumerate(self.scheds):
            done = 0
            while done < n_blocks:
                plan = sched.plan(n_blocks - done)
                dp = pack_plan(plan, tables=False)  # kernel builds LUTs
                prmi, prmf = sp.build_block_params(dp)
                prmi_all.append(prmi)
                prmf_all.append(prmf)
                sf_map.append(np.full(plan.n_blocks, len(ca_tabs), np.int32))
                ca_tabs.append(dp.ca2)
                done += plan.n_blocks
        prmi = np.concatenate(prmi_all, axis=0)
        prmf = np.concatenate(prmf_all, axis=0)
        sf_map = np.concatenate(sf_map)
        ca2 = sp.pack_ca_tables(ca_tabs)
        return prmi, prmf, ca2, sf_map

    def generate(self, n_blocks: int, mesh=None, device=None,
                 interpret: bool = False) -> np.ndarray:
        """Synthesize [B, n_blocks, N, 2] int16 IQ in one kernel launch
        over B*n_blocks blocks (sharded over `mesh` when given)."""
        import jax

        prmi, prmf, ca2, sf_map = self.plan_blocks(n_blocks)
        if mesh is None and device is None and not interpret:
            # compiled Pallas needs a TPU; interpret elsewhere
            tpus = [d for d in jax.devices() if d.platform == "tpu"]
            device = tpus[0] if tpus else None
            interpret = not tpus
        if mesh is not None:
            prmi, prmf, sf_map = pad_time_shards(
                prmi, prmf, sf_map, mesh.shape["time"])
            prmf_sh = shard_channel_params(prmf, mesh.shape["chan"])
            packed = np.asarray(synth_sharded(
                mesh, prmi, prmf_sh, ca2, sf_map,
                self.block_samples))[:self.B * n_blocks]
        else:
            packed = np.asarray(sp.synth_blocks_pallas(
                (prmi, prmf), ca2, sf_map, self.block_samples,
                device=device, interpret=interpret))
        n = self.block_samples
        iq16 = packed[:, :n].reshape(self.B, n_blocks, n).view(np.int16)
        return iq16.reshape(self.B, n_blocks, n, 2)
