"""Host-side (CPU backend) JAX execution helpers.

TPUs have no native float64: with x64 enabled, f64 arrays exist but the
compute units demote to f32, which is far too coarse for pseudorange math
(2e7 m ranges need mm-level precision => ~1e-11 relative).  The epoch
solve is tiny (32 satellites at 10 Hz), so the framework runs all f64
orbital/geodesy math as jitted JAX on the *CPU* backend of the same
process and ships only kernel-ready f32/int32 parameters to the TPU.
"""

from __future__ import annotations

import functools

import jax

__all__ = ["cpu_device", "cpu_jit"]


@functools.cache
def cpu_device():
    # local_devices, not devices: under jax.distributed the global list
    # starts with process 0's devices, and pinning host math to another
    # process's CPU makes every np.asarray of a solve result fail with
    # "spans non-addressable devices" on processes > 0
    return jax.local_devices(backend="cpu")[0]


def cpu_jit(fn=None, **jit_kwargs):
    """jax.jit pinned to the host CPU backend (f64-exact)."""
    def wrap(f):
        jitted = jax.jit(f, **jit_kwargs)

        @functools.wraps(f)
        def call(*args, **kwargs):
            with jax.default_device(cpu_device()):
                return jitted(*args, **kwargs)

        return call

    return wrap(fn) if fn is not None else wrap
