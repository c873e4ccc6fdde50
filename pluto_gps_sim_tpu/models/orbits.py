"""Broadcast-ephemeris orbit propagation, Klobuchar iono, range model.

JAX equivalents of the reference's L4 propagation layer, vmap-friendly
over the satellite axis:

  * satpos   — Kepler solve + harmonic corrections + velocity + SV clock
               (plutogpssim.c:443-546).  The data-dependent Newton loop
               (c:483-487, tol 1e-14) becomes a fixed 12-iteration
               lax.fori_loop; Newton converges quadratically from M_k for
               GPS eccentricities (<0.03) in <6 iterations, after which the
               iterate is a fixed point to <1 ulp, so results agree with
               the reference to ~nanometers.
  * ionospheric_delay — Klobuchar with the reference's three branches
               (disabled / invalid-params fallback / full model)
               (c:1612-1683); the day-wrap while loops become exact
               floor-mod (subtracting the exactly-representable 86400.0
               is lossless either way).
  * compute_range — light-time extrapolation, Sagnac correction, az/el,
               iono (c:1691-1747).
  * check_visibility — elevation vs mask (c:1896-1916).

All functions take one SoA Ephemerides pytree and broadcast over [32].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..constants import (
    OMEGA_EARTH,
    PI,
    R2D,
    SECONDS_IN_DAY,
    SECONDS_IN_HALF_WEEK,
    SECONDS_IN_WEEK,
    SPEED_OF_LIGHT,
)
from . import geodesy
from ..types import Ephemerides, IonoUtc
from ..utils.hostjax import cpu_jit

__all__ = ["satpos", "ionospheric_delay", "compute_range",
           "check_visibility", "check_visibility_batch"]

_KEPLER_ITERS = 12


def _wrap_half_week(tk: jnp.ndarray) -> jnp.ndarray:
    tk = jnp.where(tk > SECONDS_IN_HALF_WEEK, tk - SECONDS_IN_WEEK, tk)
    tk = jnp.where(tk < -SECONDS_IN_HALF_WEEK, tk + SECONDS_IN_WEEK, tk)
    return tk


def satpos(eph: Ephemerides, g_sec: jnp.ndarray):
    """Satellite position/velocity/clock at GPS second-of-week g_sec.

    Returns (pos [.,3], vel [.,3], clk [.,2]); broadcasts over the [32]
    satellite axis of `eph` (plutogpssim.c:443-546)."""
    tk = _wrap_half_week(g_sec - eph.toe_sec)

    mk = eph.m0 + eph.n * tk

    def newton(_, ek):
        one_minus = 1.0 - eph.ecc * jnp.cos(ek)
        return ek + (mk - ek + eph.ecc * jnp.sin(ek)) / one_minus

    ek = jax.lax.fori_loop(0, _KEPLER_ITERS, newton, mk)
    one_minus_ecos_e = 1.0 - eph.ecc * jnp.cos(ek)

    sek = jnp.sin(ek)
    cek = jnp.cos(ek)
    ekdot = eph.n / one_minus_ecos_e

    relativistic = -4.442807633e-10 * eph.ecc * eph.sqrta * sek

    pk = jnp.arctan2(eph.sq1e2 * sek, cek - eph.ecc) + eph.aop
    pkdot = eph.sq1e2 * ekdot / one_minus_ecos_e

    s2pk = jnp.sin(2.0 * pk)
    c2pk = jnp.cos(2.0 * pk)

    uk = pk + eph.cus * s2pk + eph.cuc * c2pk
    suk = jnp.sin(uk)
    cuk = jnp.cos(uk)
    ukdot = pkdot * (1.0 + 2.0 * (eph.cus * c2pk - eph.cuc * s2pk))

    rk = eph.A * one_minus_ecos_e + eph.crc * c2pk + eph.crs * s2pk
    rkdot = eph.A * eph.ecc * sek * ekdot \
        + 2.0 * pkdot * (eph.crs * c2pk - eph.crc * s2pk)

    ik = eph.inc0 + eph.idot * tk + eph.cic * c2pk + eph.cis * s2pk
    sik = jnp.sin(ik)
    cik = jnp.cos(ik)
    ikdot = eph.idot + 2.0 * pkdot * (eph.cis * c2pk - eph.cic * s2pk)

    xpk = rk * cuk
    ypk = rk * suk
    xpkdot = rkdot * cuk - ypk * ukdot
    ypkdot = rkdot * suk + xpk * ukdot

    ok = eph.omg0 + tk * eph.omgkdot - OMEGA_EARTH * eph.toe_sec
    sok = jnp.sin(ok)
    cok = jnp.cos(ok)

    pos = jnp.stack([
        xpk * cok - ypk * cik * sok,
        xpk * sok + ypk * cik * cok,
        ypk * sik,
    ], axis=-1)

    tmp = ypkdot * cik - ypk * sik * ikdot
    vel = jnp.stack([
        -eph.omgkdot * pos[..., 1] + xpkdot * cok - tmp * sok,
        eph.omgkdot * pos[..., 0] + xpkdot * sok + tmp * cok,
        ypk * cik * ikdot + ypkdot * sik,
    ], axis=-1)

    tk_c = _wrap_half_week(g_sec - eph.toc_sec)
    clk0 = eph.af0 + tk_c * (eph.af1 + tk_c * eph.af2) + relativistic - eph.tgd
    clk1 = eph.af1 + 2.0 * tk_c * eph.af2
    clk = jnp.stack([clk0, clk1], axis=-1)

    return pos, vel, clk


def ionospheric_delay(ionoutc: IonoUtc, g_sec: jnp.ndarray, llh: jnp.ndarray,
                      azel: jnp.ndarray) -> jnp.ndarray:
    """Klobuchar ionospheric delay [m] (plutogpssim.c:1612-1683)."""
    E = azel[..., 1] / PI
    phi_u = llh[..., 0] / PI
    lam_u = llh[..., 1] / PI

    F = 1.0 + 16.0 * (0.53 - E) ** 3

    fallback = F * 5.0e-9 * SPEED_OF_LIGHT

    psi = 0.0137 / (E + 0.11) - 0.022
    phi_i = phi_u + psi * jnp.cos(azel[..., 0])
    phi_i = jnp.clip(phi_i, -0.416, 0.416)
    lam_i = lam_u + psi * jnp.sin(azel[..., 0]) / jnp.cos(phi_i * PI)
    phi_m = phi_i + 0.064 * jnp.cos((lam_i - 1.617) * PI)
    phi_m2 = phi_m * phi_m
    phi_m3 = phi_m2 * phi_m

    amp = ionoutc.alpha0 + ionoutc.alpha1 * phi_m \
        + ionoutc.alpha2 * phi_m2 + ionoutc.alpha3 * phi_m3
    amp = jnp.maximum(amp, 0.0)
    per = ionoutc.beta0 + ionoutc.beta1 * phi_m \
        + ionoutc.beta2 * phi_m2 + ionoutc.beta3 * phi_m3
    per = jnp.maximum(per, 72000.0)

    t = SECONDS_IN_DAY / 2.0 * lam_i + g_sec
    t = t - SECONDS_IN_DAY * jnp.floor(t / SECONDS_IN_DAY)

    x = 2.0 * PI * (t - 50400.0) / per
    x2 = x * x
    x4 = x2 * x2
    full = F * (5.0e-9 + amp * (1.0 - x2 / 2.0 + x4 / 24.0)) * SPEED_OF_LIGHT
    model = jnp.where(jnp.abs(x) < 1.57, full, fallback)

    delay = jnp.where(ionoutc.vflg, model, fallback)
    return jnp.where(ionoutc.enable, delay, 0.0)


@cpu_jit
def compute_range(eph: Ephemerides, ionoutc: IonoUtc, g_sec: jnp.ndarray,
                  xyz: jnp.ndarray):
    """Pseudorange/rate/az-el/iono at receiver ECEF `xyz` [3]
    (plutogpssim.c:1691-1747).

    Returns dict with keys: range, rate, d, azel [.,2], iono_delay,
    broadcasting over the satellite axis."""
    pos, vel, clk = satpos(eph, g_sec)

    los = pos - xyz
    tau = jnp.linalg.norm(los, axis=-1) / SPEED_OF_LIGHT

    # Extrapolate SV position back to transmission time
    pos = pos - vel * tau[..., None]

    # Earth-rotation (Sagnac) correction
    xrot = pos[..., 0] + pos[..., 1] * OMEGA_EARTH * tau
    yrot = pos[..., 1] - pos[..., 0] * OMEGA_EARTH * tau
    pos = jnp.stack([xrot, yrot, pos[..., 2]], axis=-1)

    los = pos - xyz
    d = jnp.linalg.norm(los, axis=-1)

    prange = d - SPEED_OF_LIGHT * clk[..., 0]
    rate = jnp.sum(vel * los, axis=-1) / d
    # (the reference leaves the SV clock-drift term commented out, c:1731)

    llh = geodesy.xyz2llh(xyz)
    tmat = geodesy.ltcmat(llh)
    neu = geodesy.ecef2neu(los, tmat)
    azel = geodesy.neu2azel(neu)

    iono = ionospheric_delay(ionoutc, g_sec, llh, azel)
    prange = prange + iono

    return {"range": prange, "rate": rate, "d": d, "azel": azel,
            "iono_delay": iono}


@cpu_jit
def check_visibility(eph: Ephemerides, g_sec: jnp.ndarray, xyz: jnp.ndarray,
                     elv_mask_deg: float = 0.0):
    """Visibility mask + az/el for all 32 SVs (plutogpssim.c:1896-1916).

    The reference hardcodes the mask to 0 deg at the allocateChannel call
    site (c:1930); we keep the parameter but default it identically."""
    llh = geodesy.xyz2llh(xyz)
    tmat = geodesy.ltcmat(llh)

    pos, _, _ = satpos(eph, g_sec)
    los = pos - xyz
    neu = geodesy.ecef2neu(los, tmat)
    azel = geodesy.neu2azel(neu)

    visible = (azel[..., 1] * R2D > elv_mask_deg) & eph.vflg
    return visible, azel


@cpu_jit
def check_visibility_batch(eph: Ephemerides, g_sec: jnp.ndarray,
                           xyz: jnp.ndarray, elv_mask_deg: float = 0.0):
    """check_visibility vmapped over a receiver batch: g_sec [B],
    xyz [B, 3] -> (visible [B, 32], azel [B, 32, 2])."""
    return jax.vmap(lambda g, x: check_visibility.__wrapped__(
        eph, g, x, elv_mask_deg))(g_sec, xyz)
