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
    make_synth_tiled,
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
                 mode: str = "tiled", device=None):
        self.sched = Scheduler(rin, start, ieph, xyz, fs,
                               block_samples=block_samples,
                               static_mode=static_mode)
        if mode not in ("tiled", "precise"):
            raise ValueError(f"unknown synthesis mode {mode!r}")
        self.mode = mode
        self.device = device
        self._fns = {}  # (M, N, nt) -> jitted synthesizer

    def superframes(self, n_blocks_total: int,
                    max_blocks: int = 300) -> Iterator[np.ndarray]:
        """Yield superframes covering n_blocks_total 0.1 s blocks."""
        remaining = n_blocks_total
        while remaining > 0:
            plan = self.sched.plan(min(remaining, max_blocks))
            if plan is None:
                return
            dp = pack_plan(plan)
            yield self._synth(dp)
            remaining -= plan.n_blocks

    def generate(self, n_blocks_total: int) -> np.ndarray:
        """Generate the whole scenario into one array [blocks, N, 2]."""
        parts = list(self.superframes(n_blocks_total))
        return np.concatenate(parts, axis=0)

    def _synth(self, dp: DevicePlan) -> np.ndarray:
        if self.mode == "precise":
            return synth_superframe_precise(dp)
        return synth_superframe_tiled(dp, device=self.device)

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
