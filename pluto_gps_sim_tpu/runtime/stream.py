"""IQ stream driver: scheduler -> device synthesis -> consumer.

Replaces the reference's mutex/condvar double-buffer handoff to the SDR
thread (plutogpssim.c:2689-2759, 2146-2158) with a pull-based generator
of superframe-sized int16 IQ arrays.  The device produces far faster
than real time; sinks (files, UDP, SDR bridges) pace themselves.

Also exposes snapshot/restore: because all per-sample state is
closed-form from (scheduler state, block index), resuming a stream is
just re-planning from the saved host state — the checkpoint is a few KB.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

from ..models.gpstime import GpsTime
from ..ingest.rinex import RinexResult
from ..ops.synth_jnp import (
    DevicePlan,
    pack_plan,
    synth_superframe_precise,
    synth_superframe_tiled,
)
from .scheduler import Scheduler

__all__ = ["IqStream"]


class IqStream:
    """Iterates int16 IQ superframes [M, N, 2] for a scenario."""

    def __init__(self, rin: RinexResult, start: GpsTime, ieph: int,
                 xyz: np.ndarray, fs: float,
                 block_samples: int | None = None,
                 static_mode: bool = True,
                 mode: str = "tiled", device=None, mesh=None):
        self.sched = Scheduler(rin, start, ieph, xyz, fs,
                               block_samples=block_samples,
                               static_mode=static_mode)
        if mode not in ("tiled", "precise", "pallas"):
            raise ValueError(f"unknown synthesis mode {mode!r}")
        if mesh is not None and mode != "pallas":
            raise ValueError("mesh sharding requires mode='pallas'")
        if mode == "pallas":
            from ..ops.synth_pallas import MAX_BLOCK_SAMPLES
            if self.sched.block_samples > MAX_BLOCK_SAMPLES:
                if mesh is not None:
                    raise ValueError(
                        f"block_samples={self.sched.block_samples} exceeds "
                        f"the fused kernel's Q24 range "
                        f"({MAX_BLOCK_SAMPLES}; fs <= 5.24 MHz at 0.1 s "
                        f"blocks) and mesh sharding has no tiled fallback")
                import warnings
                warnings.warn(
                    f"block_samples={self.sched.block_samples} exceeds the "
                    f"fused kernel's Q24 range ({MAX_BLOCK_SAMPLES}); "
                    f"using the tiled XLA path", stacklevel=2)
                mode = "tiled"
        self.mode = mode
        self.device = device
        self.mesh = mesh  # jax.sharding.Mesh("time", "chan") or None

    def superframes(self, n_blocks_total: int,
                    max_blocks: int = 300) -> Iterator[np.ndarray]:
        """Yield superframes covering n_blocks_total 0.1 s blocks."""
        remaining = n_blocks_total
        while remaining > 0:
            plan = self.sched.plan(min(remaining, max_blocks))
            if plan is None:
                return
            dp = self._pack(plan)
            yield self._synth(dp)
            remaining -= plan.n_blocks

    def generate(self, n_blocks_total: int) -> np.ndarray:
        """Generate the whole scenario into one array [blocks, N, 2]."""
        parts = list(self.superframes(n_blocks_total))
        return np.concatenate(parts, axis=0)

    def _synth(self, dp: DevicePlan) -> np.ndarray:
        if self.mode == "precise":
            return synth_superframe_precise(dp)
        if self.mode == "pallas":
            return self._synth_pallas(dp)
        return synth_superframe_tiled(dp, device=self.device)

    def _pack(self, plan) -> DevicePlan:
        return pack_plan(plan, tables=self.mode != "pallas")

    def _synth_pallas(self, dp: DevicePlan) -> np.ndarray:
        """The fused TPU kernel — single device, or sharded over a
        ("time", "chan") mesh with the channel psum riding ICI."""
        import jax

        from ..ops import synth_pallas as sp


        prmi, prmf = sp.build_block_params(dp)
        ca_tabs = sp.pack_ca_tables([dp.ca2])
        sf_map = np.zeros(dp.n_blocks, np.int32)
        if self.mesh is not None:
            from ..parallel import (pad_time_shards, shard_channel_params,
                                    synth_sharded)
            prmi, prmf, sf_map = pad_time_shards(
                prmi, prmf, sf_map, self.mesh.shape["time"])
            prmf_sh = shard_channel_params(prmf, self.mesh.shape["chan"])
            packed = np.asarray(synth_sharded(
                self.mesh, prmi, prmf_sh, ca_tabs, sf_map,
                dp.block_samples))[:dp.n_blocks]
        else:
            device = self.device
            interpret = False
            if device is None:
                tpus = [d for d in jax.devices() if d.platform == "tpu"]
                device = tpus[0] if tpus else None
                interpret = not tpus
            packed = np.asarray(sp.synth_blocks_pallas(
                (prmi, prmf), ca_tabs, sf_map, dp.block_samples,
                device=device, interpret=interpret))
        n = dp.block_samples
        iq = packed[:, :n].reshape(dp.n_blocks, n)
        return np.stack(
            [(iq & 0xFFFF).astype(np.uint16).view(np.int16),
             (iq >> 16).astype(np.int16)], axis=-1)

    # -- snapshot / resume ---------------------------------------------------

    def snapshot(self) -> dict:
        """Host state capsule; everything device-side is derived."""
        s = self.sched
        return {
            "jblk": s.jblk, "ieph": s.ieph,
            "channel_state": {k: np.copy(v) for k, v in
                              vars(s.state).items()},
        }

    def restore(self, snap: dict) -> None:
        s = self.sched
        s.jblk = snap["jblk"]
        s.ieph = snap["ieph"]
        for k, v in snap["channel_state"].items():
            setattr(s.state, k, np.copy(v))
