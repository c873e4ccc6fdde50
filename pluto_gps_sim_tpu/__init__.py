"""pluto_gps_sim_tpu — a TPU-native GPS L1 C/A baseband signal synthesizer.

A from-scratch JAX/Pallas framework with capability parity with the
reference C simulator (Mictronics/pluto-gps-sim): RINEX v2/v3 ingest,
broadcast-ephemeris orbit propagation, LNAV message synthesis, and
real-time-scale composite IQ generation — redesigned for TPU:

  * epoch solves (Kepler, Klobuchar, pseudorange/Doppler) are jitted JAX,
    vmapped over (epoch, satellite);
  * the per-sample hot loop becomes closed-form phase ramps evaluated by a
    fused Pallas kernel over (block, time-tile) tiles;
  * satellites/channels shard across chips (psum composite), time blocks
    shard across hosts with analytic phase continuity.

The epoch/geodesy path needs float64; enable x64 before any tracing.
"""

from jax import config as _config

_config.update("jax_enable_x64", True)

__version__ = "0.1.0"
