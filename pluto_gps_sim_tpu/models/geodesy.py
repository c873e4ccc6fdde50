"""WGS-84 geodesy: ECEF <-> LLH, local-tangent frames, az/el.

JAX (jit/vmap-safe) equivalents of the reference's leaf math
(plutogpssim.c:178-434).  All functions are pure and operate on jnp
float64 arrays; the reference's data-dependent xyz2llh `while` loop
(c:323-334) becomes a fixed-iteration Bowring-style loop (converges in
<6 iterations at its 1e-3 m tolerance; extra iterations only tighten
the estimate, keeping us within the reference's own tolerance).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..constants import PI, WGS84_ECCENTRICITY, WGS84_RADIUS

__all__ = ["xyz2llh", "llh2xyz", "ltcmat", "ecef2neu", "neu2azel"]

_XYZ2LLH_ITERS = 10


def xyz2llh(xyz: jnp.ndarray) -> jnp.ndarray:
    """ECEF [...,3] -> lat/lon/height [...,3] (rad, rad, m).

    Mirrors plutogpssim.c:296-341 including the degenerate near-origin
    branch (llh = (0, 0, -a))."""
    a = WGS84_RADIUS
    e2 = WGS84_ECCENTRICITY * WGS84_ECCENTRICITY

    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    rho2 = x * x + y * y

    def body(_, dz):
        zdz = z + dz
        nh = jnp.sqrt(rho2 + zdz * zdz)
        slat = zdz / nh
        n = a / jnp.sqrt(1.0 - e2 * slat * slat)
        return n * e2 * slat

    dz = jax.lax.fori_loop(0, _XYZ2LLH_ITERS, body, e2 * z)
    zdz = z + dz
    nh = jnp.sqrt(rho2 + zdz * zdz)
    slat = zdz / nh
    n = a / jnp.sqrt(1.0 - e2 * slat * slat)

    lat = jnp.arctan2(zdz, jnp.sqrt(rho2))
    lon = jnp.arctan2(y, x)
    hgt = nh - n

    degenerate = jnp.sqrt(rho2 + z * z) < 1.0e-3
    lat = jnp.where(degenerate, 0.0, lat)
    lon = jnp.where(degenerate, 0.0, lon)
    hgt = jnp.where(degenerate, -a, hgt)
    return jnp.stack([lat, lon, hgt], axis=-1)


def llh2xyz(llh: jnp.ndarray) -> jnp.ndarray:
    """lat/lon/height [...,3] -> ECEF [...,3] (plutogpssim.c:347-378)."""
    a = WGS84_RADIUS
    e = WGS84_ECCENTRICITY
    e2 = e * e

    clat = jnp.cos(llh[..., 0])
    slat = jnp.sin(llh[..., 0])
    clon = jnp.cos(llh[..., 1])
    slon = jnp.sin(llh[..., 1])
    d = e * slat

    n = a / jnp.sqrt(1.0 - d * d)
    nph = n + llh[..., 2]

    tmp = nph * clat
    return jnp.stack([
        tmp * clon,
        tmp * slon,
        ((1.0 - e2) * n + llh[..., 2]) * slat,
    ], axis=-1)


def ltcmat(llh: jnp.ndarray) -> jnp.ndarray:
    """Local-tangent-coordinate rotation matrix [...,3,3] (c:384-404)."""
    slat = jnp.sin(llh[..., 0])
    clat = jnp.cos(llh[..., 0])
    slon = jnp.sin(llh[..., 1])
    clon = jnp.cos(llh[..., 1])
    zeros = jnp.zeros_like(slat)
    row0 = jnp.stack([-slat * clon, -slat * slon, clat], axis=-1)
    row1 = jnp.stack([-slon, clon, zeros], axis=-1)
    row2 = jnp.stack([clat * clon, clat * slon, slat], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def ecef2neu(xyz: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Rotate an ECEF vector into North-East-Up (c:411-417)."""
    return jnp.einsum("...ij,...j->...i", t, xyz)


def neu2azel(neu: jnp.ndarray) -> jnp.ndarray:
    """NEU -> (azimuth, elevation) [rad] (c:423-434)."""
    az = jnp.arctan2(neu[..., 1], neu[..., 0])
    az = jnp.where(az < 0.0, az + 2.0 * PI, az)
    ne = jnp.sqrt(neu[..., 0] ** 2 + neu[..., 1] ** 2)
    el = jnp.arctan2(neu[..., 2], ne)
    return jnp.stack([az, el], axis=-1)
