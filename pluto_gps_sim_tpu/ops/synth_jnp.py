"""Composite IQ sample synthesis as closed-form phase ramps (XLA path).

This replaces the reference's sequential per-sample NCO cascade
(plutogpssim.c:2690-2756) with embarrassingly parallel math over
(block, channel, sample):

  carrier   phase(n) = frac(c0 + u*n),  u = fl(f_carr*delt)
  code      P(n)     = cp0 + v*n chips, v = fl(f_code*delt)
            chip(n)  = floor(P);  wraps w = chip//1023; chip_idx = chip%1023
            bit(n)   = bits[B0 + (C0 + w)//20]       (B0 = iword*30+ibit)
  mixing    ip = s * trunc(cosTable[idx] * gain)      (s = chip_pm * bit_pm)

The C expression `(int)(dataBit*codeCA*cosTable[i]*gain)` truncates toward
zero; since s = +-1, it equals s * trunc(table*gain), so the truncated
per-channel gain tables are precomputed once per (block, channel) in f64
on the host and the device does pure integer gathers — bit-identical
mixing to the reference.

Two precision strategies:
  * precise (f64 ramps): for CPU golden runs & tests (TPU has no f64);
  * tiled   (int32 Q12 code NCO + f32 carrier, per-tile f64 anchors
    computed host-side): the TPU production path.  Code-phase precision
    ~1.2e-7 chips, carrier ~1e-6 cycles — error orders of magnitude
    below the reference's own int16 truncation noise floor.

Channel masking: inactive channels get zeroed gain tables and zeroed
parameters, so slots stay static-shape (jit-stable) and contribute 0.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import CA_SEQ_LEN, MAX_CHAN
from ..models.tables import COS_TABLE_512, SIN_TABLE_512

__all__ = ["DevicePlan", "pack_plan", "synth_superframe_precise",
           "synth_superframe_tiled", "TILE"]

TILE = 2048  # samples per tile (16 sublanes x 128 lanes at int32/f32)


@dataclass
class DevicePlan:
    """Kernel-ready arrays for one superframe (all numpy, host-built)."""

    n_blocks: int
    block_samples: int
    n_tiles: int
    # per-channel tables
    ca2: np.ndarray         # [C, 1023] int8  chips +-1
    bits: np.ndarray        # [C, 1800] int8  nav bits +-1
    # per-(block, channel)
    active: np.ndarray      # [M, C] bool
    u: np.ndarray           # [M, C] f64   carrier cycles/sample
    v: np.ndarray           # [M, C] f64   code chips/sample
    c0: np.ndarray          # [M, C] f64   carrier phase at block start
    cp0: np.ndarray         # [M, C] f64   code phase (chips) at block start
    b0: np.ndarray          # [M, C] int32 word*30+bit index
    ic0: np.ndarray         # [M, C] int32 code-period counter
    gain: np.ndarray        # [M, C] f64 signal gain (for in-kernel LUTs)
    qcos_pm: np.ndarray     # [M, C, 1024] int32  +-trunc(cos*gain)
    qsin_pm: np.ndarray     # [M, C, 1024] int32
    # tiled-path anchors
    v_q12: np.ndarray       # [M, C] int32  floor(v*4096)
    r4096: np.ndarray       # [M, C] f32    (v - v_q12/4096)*4096
    u_f32: np.ndarray       # [M, C] f32
    code_base: np.ndarray   # [M, C, nt] int32  floor(P at tile start)
    code_fq12: np.ndarray   # [M, C, nt] f32    frac(P)*4096 at tile start
    carr_base: np.ndarray   # [M, C, nt] f32    frac(carrier) at tile start


def pack_plan(plan, tile: int = TILE, tables: bool = True) -> DevicePlan:
    """Convert a runtime.scheduler.SuperframePlan into device arrays.

    tables=False skips the tiled/precise-path LUTs and per-tile anchors
    (~15 MB of f64 work per 300-block superframe); the Pallas path
    builds its gain tables in-kernel and never reads them."""
    M, C = plan.n_blocks, MAX_CHAN
    N = plan.block_samples
    act = plan.active

    u = np.where(act, plan.f_carr * plan.delt, 0.0)
    v = np.where(act, plan.f_code * plan.delt, 0.0)
    c0 = np.where(act, plan.carr_phase, 0.0)
    cp0 = np.where(act, plan.code_phase, 0.0)
    b0 = np.where(act, plan.iword * 30 + plan.ibit, 0).astype(np.int32)
    ic0 = np.where(act, plan.icode, 0).astype(np.int32)
    gain = np.where(act, plan.gain, 0.0)

    nt = -(-N // tile)
    if tables:
        # +-truncated gain LUTs, f64 exact (C's (int)(table*gain))
        qcos = np.trunc(COS_TABLE_512[None, None, :] * gain[..., None])
        qsin = np.trunc(SIN_TABLE_512[None, None, :] * gain[..., None])
        qcos_pm = np.concatenate([qcos, -qcos], axis=-1).astype(np.int32)
        qsin_pm = np.concatenate([qsin, -qsin], axis=-1).astype(np.int32)

        # per-tile anchors (f64 on host; in-tile device math f32/int32)
        tj = (np.arange(nt, dtype=np.float64) * tile)[None, None, :]
        P_t = cp0[..., None] + v[..., None] * tj
        code_base = np.floor(P_t).astype(np.int32)
        code_fq12 = ((P_t - np.floor(P_t)) * 4096.0).astype(np.float32)
        carr_t = c0[..., None] + u[..., None] * tj
        carr_base = (carr_t - np.floor(carr_t)).astype(np.float32)
    else:
        z = np.zeros((M, C, 0), np.int32)
        qcos_pm = qsin_pm = z
        code_base = z
        code_fq12 = carr_base = np.zeros((M, C, 0), np.float32)

    v_q12 = np.floor(v * 4096.0).astype(np.int32)
    r4096 = ((v - v_q12 / 4096.0) * 4096.0).astype(np.float32)

    # Q12 int32 overflow guard: chips*4096 must stay below 2^31
    assert float((cp0 + np.abs(v) * N).max(initial=0.0)) * 4096 < 2**31, \
        "block too long for Q12 code NCO (raise tile precision)"

    return DevicePlan(
        n_blocks=M, block_samples=N, n_tiles=nt,
        ca2=plan.ca2, bits=plan.bits, active=act,
        u=u, v=v, c0=c0, cp0=cp0, b0=b0, ic0=ic0, gain=gain,
        qcos_pm=qcos_pm, qsin_pm=qsin_pm,
        v_q12=v_q12, r4096=r4096, u_f32=u.astype(np.float32),
        code_base=code_base, code_fq12=code_fq12, carr_base=carr_base,
    )


def _mix_gather(s: jnp.ndarray, itab: jnp.ndarray, qcos_pm: jnp.ndarray,
                qsin_pm: jnp.ndarray):
    """Fold the +-1 spreading sign into the LUT index and gather I/Q."""
    idx = itab + jnp.where(s < 0, 512, 0)
    ival = jnp.take(qcos_pm, idx, axis=0)
    qval = jnp.take(qsin_pm, idx, axis=0)
    return ival, qval


# ---------------------------------------------------------------------------
# precise (f64) path — CPU golden reference
# ---------------------------------------------------------------------------

def _synth_block_precise(args, n, ca2, bits):
    """One block, all channels, f64 ramps.  n: [N] f64 sample index."""
    u, v, c0, cp0, b0, ic0, qcos_pm, qsin_pm = args

    def chan(u_c, v_c, c0_c, cp0_c, b0_c, ic0_c, qc, qs, ca2_c, bits_c):
        ph = c0_c + u_c * n
        ph = ph - jnp.floor(ph)
        itab = (ph * 512.0).astype(jnp.int32)

        P = cp0_c + v_c * n
        chip = jnp.floor(P).astype(jnp.int32)
        w = chip // CA_SEQ_LEN
        cidx = chip - w * CA_SEQ_LEN
        bidx = b0_c + (ic0_c + w) // 20
        s = (ca2_c[cidx] * bits_c[bidx]).astype(jnp.int32)
        return _mix_gather(s, itab, qc, qs)

    ivals, qvals = jax.vmap(chan)(u, v, c0, cp0, b0, ic0, qcos_pm, qsin_pm,
                                  ca2, bits)
    i_acc = jnp.sum(ivals, axis=0)
    q_acc = jnp.sum(qvals, axis=0)
    return jnp.stack([i_acc, q_acc], axis=-1).astype(jnp.int16)


def synth_superframe_precise(dp: DevicePlan) -> np.ndarray:
    """f64 golden synthesis -> int16 [M, N, 2].  Run on CPU only."""
    n = jnp.arange(dp.block_samples, dtype=jnp.float64)
    ca2 = jnp.asarray(dp.ca2, jnp.int32)
    bits = jnp.asarray(dp.bits, jnp.int32)

    def one(args):
        return _synth_block_precise(args, n, ca2, bits)

    args = (jnp.asarray(dp.u), jnp.asarray(dp.v), jnp.asarray(dp.c0),
            jnp.asarray(dp.cp0), jnp.asarray(dp.b0), jnp.asarray(dp.ic0),
            jnp.asarray(dp.qcos_pm), jnp.asarray(dp.qsin_pm))
    out = jax.lax.map(one, args)
    return np.asarray(out)


# ---------------------------------------------------------------------------
# tiled (f32/int32) path — TPU production XLA path
# ---------------------------------------------------------------------------

def make_synth_tiled(n_blocks: int, block_samples: int, n_tiles: int,
                     tile: int = TILE):
    """Build a jitted superframe synthesizer for fixed shapes.

    Returns fn(ca2, bits, v_q12, r4096, u_f32, b0, ic0, code_base,
               code_fq12, carr_base, qcos_pm, qsin_pm) -> int16 [M, N, 2]
    """
    jf = jnp.arange(tile, dtype=jnp.float32)
    ji = jnp.arange(tile, dtype=jnp.int32)

    def chan_tile(vq, r4, uf, b0, ic0, cbase, cfq12, carrb, ca2_c, bits_c,
                  qc, qs):
        # carrier: f32 in-tile ramp on a per-tile f64 anchor
        ph = carrb + uf * jf
        ph = ph - jnp.floor(ph)
        itab = (ph * 512.0).astype(jnp.int32)

        # code: exact Q12 integer NCO + f32 residual
        rq = cfq12 + r4 * jf                      # f32, < ~6200
        tq = cbase * 4096 + vq * ji + rq.astype(jnp.int32)
        chip = tq >> 12
        w = chip // CA_SEQ_LEN
        cidx = chip - w * CA_SEQ_LEN
        bidx = b0 + (ic0 + w) // 20
        s = (ca2_c[cidx] * bits_c[bidx]).astype(jnp.int32)
        return _mix_gather(s, itab, qc, qs)

    # vmap over tiles, then channels
    tiles_chan = jax.vmap(chan_tile,
                          in_axes=(None, None, None, None, None, 0, 0, 0,
                                   None, None, None, None))

    def block(vq, r4, uf, b0, ic0, cbase, cfq12, carrb, ca2, bits, qc, qs):
        def chan(vq_c, r4_c, uf_c, b0_c, ic0_c, cb_c, cf_c, ca_c,
                 ca2_c, bits_c, qc_c, qs_c):
            return tiles_chan(vq_c, r4_c, uf_c, b0_c, ic0_c, cb_c, cf_c,
                              ca_c, ca2_c, bits_c, qc_c, qs_c)
        ivals, qvals = jax.vmap(chan)(vq, r4, uf, b0, ic0, cbase, cfq12,
                                      carrb, ca2, bits, qc, qs)
        # [C, nt, tile] -> sum channels -> [nt*tile] -> [N]
        i_acc = jnp.sum(ivals, axis=0).reshape(-1)[:block_samples]
        q_acc = jnp.sum(qvals, axis=0).reshape(-1)[:block_samples]
        return jnp.stack([i_acc, q_acc], axis=-1).astype(jnp.int16)

    def superframe(ca2, bits, v_q12, r4096, u_f32, b0, ic0,
                   code_base, code_fq12, carr_base, qcos_pm, qsin_pm):
        def one(args):
            vq, r4, uf, b0_, ic0_, cb, cf, ca, qc, qs = args
            return block(vq, r4, uf, b0_, ic0_, cb, cf, ca, ca2, bits,
                         qc, qs)
        return jax.lax.map(one, (v_q12, r4096, u_f32, b0, ic0,
                                 code_base, code_fq12, carr_base,
                                 qcos_pm, qsin_pm))

    return jax.jit(superframe)


def synth_superframe_tiled(dp: DevicePlan, device=None) -> np.ndarray:
    """Tiled-path synthesis -> int16 [M, N, 2] (any backend)."""
    fn = make_synth_tiled(dp.n_blocks, dp.block_samples, dp.n_tiles)
    args = [jnp.asarray(dp.ca2, jnp.int32), jnp.asarray(dp.bits, jnp.int32),
            jnp.asarray(dp.v_q12), jnp.asarray(dp.r4096),
            jnp.asarray(dp.u_f32), jnp.asarray(dp.b0), jnp.asarray(dp.ic0),
            jnp.asarray(dp.code_base), jnp.asarray(dp.code_fq12),
            jnp.asarray(dp.carr_base), jnp.asarray(dp.qcos_pm),
            jnp.asarray(dp.qsin_pm)]
    if device is not None:
        args = [jax.device_put(a, device) for a in args]
    return np.asarray(fn(*args))
