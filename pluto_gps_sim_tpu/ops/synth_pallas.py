"""Fused Pallas TPU kernel for composite GPS L1 C/A IQ synthesis.

One kernel replaces the reference's entire per-sample hot loop
(plutogpssim.c:2690-2756).  Per (block, time-tile) grid cell it evaluates,
for all 12 channel slots, closed-form NCOs and mixes into packed int16 IQ:

  carrier   uint32 NCO + two-level step-quantization residual ramp:
            phase = phase0_u32 + step_u32*n
                  + ((sr12*n + trunc(srem*n)) >> 12)
            (sr12 = floor(stepres*4096), srem its remainder); LUT index
            = phase >> 23 replicates floor(carr_phase*512) (c:2697) to
            2^-12 u32 units ~ 6e-14 cycles — one f32 level (error +-1
            unit) let Doppler-resonant blocks collect ~2k adjacent-LUT
            picks; two levels remove them
  code      four-level integer NCO:
            chips*4096 = cp0_q12 + v_q12*n + ((res0_q24 + r24*n
                       + ((res0_q36 + r36*n + trunc(rrr*n)) >> 12)) >> 12)
            Q12 + Q24 + Q36 exact integer ramps + f32 fourth-level
            residual; truncation sits at 2^-36 chips = 1.5e-11, the
            f64 closed form's own rounding floor (Q24-level truncation
            at 6e-8 chips still flipped a chip-edge sample ~0.03x per
            block — a full-amplitude error worth ~30 dB on that block)
  nav bits  folded into a per-(block,channel) 32-bit mask indexed by
            q = (icode0 + code_periods)//20 — zero gathers (c:2732)
  C/A chips bit-packed: 1023 chips -> 32 uint32 words in one 128-lane
            row; one lane-gather + variable shift replaces a table walk
            (c:2737)
  mixing    ONE gather per channel per sample from a 128-entry RAW
            quadrant-0 table of biased packed pairs, raw(j) = (cos[j]
            + 512) | (sin[j]+512) << 16.  The other three quadrants
            derive with exact table identities (the reference's int
            tables satisfy cos[128+j] = 2-sin[j], sin[128+j] = cos[j],
            and half-wave x[256+i] = 2-x[i], verified exhaustively,
            with exactly one exception — cos[384] — patched by a
            compare): a halves-swap plus per-half complements around
            the 512 bias, selected by itab bits 7..8.  Gain scaling is
            per sample, iv = trunc(f32(cos)*f32(gain)) — the identical
            expression the old per-block scratch build used, so outputs
            are bit-identical, and it replaces a 4-gather select tree
            (measured 25% of kernel time).  Gain can exceed 1.0
            (path_loss = 20200000/d tops 1.0 whenever the geometric
            range is under 20,200 km, routine near zenith), so the
            accumulator bias budgets |trunc(T*g)| up to 1024 (gain <= 2,
            asserted at pack time); both halves of the re-biased pair
            live in [0, 2048] and one int32 accumulator carries the I
            sum (low 16) and Q sum (high 16) for all 12 channels
            without carries (max 12*2048 < 2^16).  The spreading sign
            (chip XOR nav bit) is one mask-and complement around the
            bias — C's `(int)(dataBit*codeCA*table*gain)` truncation is
            still reproduced exactly as sign * trunc(table*gain)
            (c:2701-2702)
  output    per-tile epilogue un-biases with the in-kernel count of
            executed channels, then packs (I & 0xffff) | (Q << 16) int32
            — memory-identical to the reference's interleaved
            little-endian int16 stream (c:2754)

All per-(block,channel) parameters are packed into two [M, 128] planes
(int32 and float32) — 1 KB/block over the host link — padded on device
to the [M, 8, 128] VMEM tile the kernel reads back as scalars with
static lane indices.  SMEM is too small for thousands of blocks of
prefetched parameters, and Mosaic has no scalar bitcast.

Channel slots are static (12), masked by zeroed gain tables, so rise/set
never changes shapes.  Multiple 30 s superframes batch into one call
(C/A tables selected per block through the prefetched block->superframe
map), amortizing dispatch overhead across minutes of signal.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import CA_SEQ_LEN, MAX_CHAN
from ..models.tables import COS_TABLE_512, SIN_TABLE_512

__all__ = ["synth_blocks_pallas", "build_block_params", "pack_ca_tables",
           "choose_tile", "TILE_SAMPLES", "MAX_BLOCK_SAMPLES"]

# Q24 code-NCO range bound: the per-sample integer residual ramp r24*n
# (r24 <= 4095) must stay inside int32, so blocks are capped at 524k
# samples — fs <= 5.24 MHz at 0.1 s blocks (the reference's RF path also
# caps at 5 MHz, c:2372-2375)
MAX_BLOCK_SAMPLES = 524_000

# Tile height is chosen per block size by choose_tile(): larger tiles
# amortize per-grid-cell scalar work (measured at fs=2.6 MHz:
# 512 -> 3.3, 1024 -> 3.9, 2048 -> 3.6 Gsps; 1024 is the sweet spot —
# beyond it the working set starts thrashing VMEM-level locality) but
# pad the last tile of each block, so the selector picks, among the
# candidates minimizing padding, the earliest in this preference order.
TILE_CANDIDATE_SUBS = (1024, 2048, 512, 256)
TILE_SAMPLES = 131072        # default: 1024 sublanes x 128 lanes of int32
_SUB = 1024
_LANES = 128
_C = MAX_CHAN

# packed-parameter column bases (x12 channels each); ints and floats in
# separate planes (Mosaic has no scalar bitcast)
_P_PHASE0, _P_STEP, _P_CP0Q, _P_VQ, _P_NBM, _P_IC0 = 0, 12, 24, 36, 48, 60
_P_RES0Q24, _P_R24 = 72, 84
_P_RES0Q36, _P_R36 = 96, 108
# carrier step residual, two levels: sr12 = floor(stepres*4096) carried
# as f32 (exact, |sr12| <= 2048) and its [0,1) remainder.  One f32 level
# (trunc(stepres*n), error up to +-1 u32 unit) was enough for SNR but
# made Doppler-resonant blocks — frac(f_carr/fs)*512 within ~1e-3 of an
# integer — collect ~2k adjacent-LUT picks per block; the Q12 level puts
# the ramp error at 2^-12 units and removes the phenomenon.
_F_SR12, _F_SREM, _F_RRR, _F_GAIN = 0, 12, 24, 36

# 1/1023 rounded UP in f32: trunc(chip * _INV1023) == chip // 1023 exactly
# for 0 <= chip < 600_000 (verified exhaustively; max chip under
# MAX_BLOCK_SAMPLES is ~537k)
_INV1023 = np.float32(np.nextafter(np.float32(1.0 / 1023.0),
                                   np.float32(np.inf)))


def _kernel(sf_map_ref, prmi_ref, prmf_ref, ca2_ref, rawtab_ref,
            *out_and_scratch, SUB=_SUB):
    out_refs = out_and_scratch[:-1]
    out_ref = out_refs[0] if len(out_refs) == 1 else list(out_refs)
    acc_scr = out_and_scratch[-1]
    t = pl.program_id(1)

    def geti(col, c):
        return prmi_ref[0, 0, col + c]

    def getf(col, c):
        return prmf_ref[0, 0, col + c]

    # --- per-sample index ramps ------------------------------------------
    sub = jax.lax.broadcasted_iota(jnp.int32, (SUB, _LANES), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (SUB, _LANES), 1)
    n = t * (SUB * _LANES) + sub * _LANES + lane
    nf = n.astype(jnp.float32)

    acc_scr[0] = jnp.zeros((SUB, _LANES), jnp.int32)

    # executed-channel count for the bias epilogue (scalar-unit ops);
    # counting in-kernel keeps channel-sharded runs exact, where other
    # shards' channels are masked to zero gain
    nact = jnp.int32(0)
    for c in range(_C):
        nact += (getf(_F_GAIN, c) != 0.0).astype(jnp.int32)

    for c in range(_C):
      # inactive channels are zero-gain; skip their work entirely
      @pl.when(getf(_F_GAIN, c) != 0.0)
      def _chan(c=c):
          # carrier NCO: u32 ramp + two-level step-quantization residual
          # (Q12 integer + f32 remainder; arithmetic >> 12 keeps floor
          # semantics for negative sr12 — ramp error <= 2^-12 units)
          sr12 = getf(_F_SR12, c).astype(jnp.int32)
          resc = (sr12 * n
                  + (getf(_F_SREM, c) * nf).astype(jnp.int32)) >> 12
          phase = geti(_P_PHASE0, c) + geti(_P_STEP, c) * n + resc
          # logical shift of the u32 phase leaves exactly 9 index bits
          itab = jax.lax.shift_right_logical(phase, jnp.int32(23))
          ihi = jax.lax.shift_right_logical(itab, jnp.int32(7))   # 0..3
          ilo = itab & jnp.int32(127)

          # code NCO: Q12 + Q24 + Q36 integer ramps + f32 fourth-level
          # residual.  Three levels are NOT enough: the Q24 truncation
          # quantizes the chip position to 2^-24 chips = 6e-8, which
          # lands a chip transition on the wrong sample ~0.03 times per
          # 300k-sample block (a full-amplitude error, ~55 dB for the
          # block); the Q36 level pushes truncation to 1.5e-11 chips,
          # at the f64 closed form's own rounding floor.
          rq36 = geti(_P_RES0Q36, c) + geti(_P_R36, c) * n \
              + (getf(_F_RRR, c) * nf).astype(jnp.int32)
          rq24 = geti(_P_RES0Q24, c) + geti(_P_R24, c) * n \
              + jax.lax.shift_right_logical(rq36, jnp.int32(12))
          tq = geti(_P_CP0Q, c) + geti(_P_VQ, c) * n \
              + jax.lax.shift_right_logical(rq24, jnp.int32(12))
          chip = jax.lax.shift_right_logical(tq, jnp.int32(12))
          # chip // 1023 via exact f32 reciprocal (chip < 600k, verified
          # exhaustively; XLA's int32 // lowers to a much longer
          # multiply-high sequence, ~14% of total kernel time)
          w = (chip.astype(jnp.float32) * _INV1023).astype(jnp.int32)
          cidx = chip - w * jnp.int32(CA_SEQ_LEN)

          # nav bit from per-block mask (0/1); // 20 via magic multiply
          # (exact for u < 4096; worst case q = (19 + 563)//20 = 29 under
          # the block-length cap — still < 32, so no & 31 needed; the
          # pack-time assert in build_block_params enforces this)
          q = jax.lax.shift_right_logical(
              (geti(_P_IC0, c) + w) * jnp.int32(3277), jnp.int32(16))
          mask = jnp.broadcast_to(geti(_P_NBM, c), q.shape)
          nbit = jax.lax.shift_right_logical(mask, q) & jnp.int32(1)

          # C/A chip sign: bit-packed word gather + variable shift
          wrow = jnp.broadcast_to(ca2_ref[0, c, 0, :], (SUB, _LANES))
          word = jnp.take_along_axis(
              wrow, jax.lax.shift_right_logical(cidx, jnp.int32(5)), axis=1)
          cbit = jax.lax.shift_right_logical(
              word, cidx & jnp.int32(31)) & jnp.int32(1)

          # one gather from the 128-entry RAW quadrant-0 pair table;
          # quadrants 1-3 derive with exact identities: q1 = swap halves
          # + complement low, q2 = complement both, q3 = swap halves +
          # complement high (complements are around 1026 = 2 + 2*512,
          # the half-wave offset plus twice the pair bias)
          rawrow = jnp.broadcast_to(rawtab_ref[0, :], (SUB, _LANES))
          praw = jnp.take_along_axis(rawrow, ilo, axis=1)
          # quadrants factor: q2 = C - q0 and q3 = C - q1 (C = 1026 per
          # half), so select q0/q1 by bit7 first, then complement both
          # halves by bit8 uniformly
          rot = jax.lax.shift_left(praw, jnp.int32(16)) | \
              jax.lax.shift_right_logical(praw, jnp.int32(16))
          rotL = rot + (jnp.int32(1026) -
              jax.lax.shift_left(rot & jnp.int32(0xFFFF), jnp.int32(1)))
          m7 = -(ihi & jnp.int32(1))
          m8 = -jax.lax.shift_right_logical(itab, jnp.int32(8))
          x = praw + ((rotL - praw) & m7)
          p = x + ((jnp.int32(1026 | (1026 << 16)) -
                    jax.lax.shift_left(x, jnp.int32(1))) & m8)
          # the reference's hand-written tables break the identities at
          # exactly one entry: cos[384] = 0, not 2 - cos[128] = 1
          p = p - (itab == jnp.int32(384)).astype(jnp.int32)

          # per-sample gain scaling, identical expression to the old
          # per-block scratch build: trunc(f32(T) * f32(gain))
          g = getf(_F_GAIN, c)
          tc = (p & jnp.int32(0xFFFF)) - jnp.int32(512)
          ts = jax.lax.shift_right_logical(p, jnp.int32(16)) - jnp.int32(512)
          iv = (tc.astype(jnp.float32) * g).astype(jnp.int32)
          qv = (ts.astype(jnp.float32) * g).astype(jnp.int32)
          u = (iv + jnp.int32(1024)) | \
              jax.lax.shift_left(qv + jnp.int32(1024), jnp.int32(16))

          # spreading sign (chip XOR nav): both biased halves negate
          # around the bias, BIAS2 - u, with no cross-half borrow
          # (halves are in [0, 2048]); mask-and form beats jnp.where
          # on the VPU (no predicate registers needed)
          m = -(cbit ^ nbit)
          acc_scr[0] += u + ((jnp.int32(2048 | (2048 << 16)) -
                              jax.lax.shift_left(u, jnp.int32(1))) & m)

    # epilogue: un-bias both halves, emit I/Q
    bias = nact * jnp.int32(1024)
    acc = acc_scr[0]
    i_val = (acc & jnp.int32(0xFFFF)) - bias
    q_val = jax.lax.shift_right_logical(acc, jnp.int32(16)) - bias
    if isinstance(out_ref, (tuple, list)):
        out_ref[0][0, 0, :, :] = i_val
        out_ref[1][0, 0, :, :] = q_val
    else:
        out_ref[0, 0, :, :] = (i_val & jnp.int32(0xFFFF)) | \
            jax.lax.shift_left(q_val, jnp.int32(16))


def choose_tile(block_samples: int) -> int:
    """Among the candidate tiles minimizing per-block padding, the
    earliest in TILE_CANDIDATE_SUBS preference order (1024 sublanes
    measured fastest; see the constant's comment)."""
    best = None
    for pref, sub in enumerate(TILE_CANDIDATE_SUBS):
        tile = sub * _LANES
        padded = -(-block_samples // tile) * tile
        if best is None or (padded, pref) < best[:2]:
            best = (padded, pref, tile)
    return best[2]


@functools.cache
def _build_fn(n_blocks: int, n_tiles: int, n_sf: int,
              packed: bool = True, interpret: bool = False,
              tile: int = TILE_SAMPLES):
    sub = tile // _LANES
    kernel = functools.partial(_kernel, SUB=sub)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # sf_map
        grid=(n_blocks, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 8, _LANES), lambda b, t, sf_map: (b, 0, 0),
                         memory_space=pltpu.VMEM),       # int params
            pl.BlockSpec((1, 8, _LANES), lambda b, t, sf_map: (b, 0, 0),
                         memory_space=pltpu.VMEM),       # float params
            pl.BlockSpec((1, _C, 1, _LANES),
                         lambda b, t, sf_map: (sf_map[b], 0, 0, 0),
                         memory_space=pltpu.VMEM),       # C/A bit tables
            pl.BlockSpec(memory_space=pltpu.VMEM),       # raw pairs [1,128]
        ],
        out_specs=(pl.BlockSpec((1, 1, sub, _LANES),
                                lambda b, t, sf_map: (b, t, 0, 0),
                                memory_space=pltpu.VMEM) if packed else
                   tuple(pl.BlockSpec((1, 1, sub, _LANES),
                                      lambda b, t, sf_map: (b, t, 0, 0),
                                      memory_space=pltpu.VMEM)
                         for _ in range(2))),
        scratch_shapes=[
            pltpu.VMEM((1, sub, _LANES), jnp.int32),
        ],
    )
    one = jax.ShapeDtypeStruct((n_blocks, n_tiles, sub, _LANES), jnp.int32)
    out_shape = one if packed else (one, one)
    call = pl.pallas_call(kernel, out_shape=out_shape,
                          grid_spec=grid_spec, interpret=interpret)

    def fn(sf_map, prmi, prmf, ca_tabs, rawtab):
        # params ship as [M, 128] (1 KB/block over the host link) and are
        # padded on device to the kernel's [M, 8, 128] VMEM tile
        pad = ((0, 0), (0, 7), (0, 0))
        return call(sf_map, jnp.pad(prmi[:, None, :], pad),
                    jnp.pad(prmf[:, None, :], pad), ca_tabs, rawtab)

    return jax.jit(fn)


def build_block_params(dp):
    """ops.synth_jnp.DevicePlan -> packed ([M,128] i32, [M,128] f32)."""
    # Q24 residual ramp bound: r24*n must stay inside int32
    assert dp.block_samples <= MAX_BLOCK_SAMPLES, \
        "block too long for the Q24 code NCO (needs <=5.24 MHz at 0.1 s blocks)"
    # in-kernel f32 reciprocal division is exact for chip < 600k
    assert float(np.max(np.abs(dp.v))) <= 1.1, \
        "code rate out of range for the kernel's chip arithmetic"
    # biased-accumulator budget: |trunc(table*gain)| <= 1024
    assert float(np.max(np.abs(dp.gain))) <= 2.0, \
        "channel gain out of range for the biased packed accumulator"
    M, C = dp.active.shape
    act = dp.active
    c0 = np.where(act, dp.c0, 0.0)
    u = np.where(act, dp.u, 0.0)
    cp0 = np.where(act, dp.cp0, 0.0)
    v = np.where(act, dp.v, 0.0)

    phase0 = np.round((c0 - np.floor(c0)) * 2.0**32).astype(np.int64)
    step_exact = (u - np.floor(u)) * 2.0**32
    step = np.round(step_exact).astype(np.int64)
    phase0_u32 = (phase0 & 0xFFFFFFFF).astype(np.uint32).view(np.int32)
    step_u32 = (step & 0xFFFFFFFF).astype(np.uint32).view(np.int32)
    # two-level carrier step residual (see _F_SR12 comment)
    sres = (step_exact - step) * 4096.0          # f64, |.| <= 2048
    sr12 = np.floor(sres)
    srem = (sres - sr12).astype(np.float32)      # [0, 1)
    sr12 = sr12.astype(np.float32)               # exact: |sr12| <= 2048

    cp0q = np.floor(cp0 * 4096.0)
    f12 = cp0 * 4096.0 - cp0q                 # q12 fraction in [0, 1)
    res0q24 = np.floor(f12 * 4096.0)
    res0q36 = np.floor((f12 * 4096.0 - res0q24) * 4096.0)
    vq = np.floor(v * 4096.0)
    r4 = v * 4096.0 - vq                      # q12 residual per sample
    r24 = np.floor(r4 * 4096.0)               # q24 integer step
    r4b = r4 * 4096.0 - r24                   # q24 fraction in [0, 1)
    r36 = np.floor(r4b * 4096.0)              # q36 integer step
    rrr = ((r4b - r36 / 4096.0) * 4096.0).astype(np.float32)  # 4th level

    # nav-bit mask: bit q = 0/1 value of nav bit at index B0 + q
    b0 = np.where(act, dp.b0, 0)
    ic0 = np.where(act, dp.ic0, 0).astype(np.int32)
    # enforce the 32-bit mask width: q = (ic0 + code_periods)//20 must
    # stay < 32 for every sample of the block (worst case today is 29)
    max_w = (cp0 + np.abs(v) * dp.block_samples) // CA_SEQ_LEN
    assert int(np.max((ic0 + max_w) // 20)) < 32, \
        "nav-bit index exceeds the 32-bit per-block mask"
    qidx = b0[..., None] + np.arange(32)[None, None, :]      # [M, C, 32]
    qidx = np.clip(qidx, 0, dp.bits.shape[1] - 1)
    bitvals = np.take_along_axis(
        np.broadcast_to(dp.bits[None], (M,) + dp.bits.shape), qidx, axis=2)
    bit01 = (1 - bitvals.astype(np.int64)) // 2              # +1->0, -1->1
    nbmask = np.zeros((M, C), dtype=np.int64)
    for qb in range(32):
        nbmask |= bit01[..., qb] << qb
    nbmask = (nbmask & 0xFFFFFFFF).astype(np.uint32).view(np.int32)

    gain = np.where(act, dp.gain, 0.0).astype(np.float32)

    prmi = np.zeros((M, _LANES), dtype=np.int32)
    prmf = np.zeros((M, _LANES), dtype=np.float32)
    prmi[:, _P_PHASE0:_P_PHASE0 + C] = phase0_u32
    prmi[:, _P_STEP:_P_STEP + C] = step_u32
    prmi[:, _P_CP0Q:_P_CP0Q + C] = cp0q.astype(np.int32)
    prmi[:, _P_VQ:_P_VQ + C] = vq.astype(np.int32)
    prmi[:, _P_NBM:_P_NBM + C] = nbmask
    prmi[:, _P_IC0:_P_IC0 + C] = ic0
    prmi[:, _P_RES0Q24:_P_RES0Q24 + C] = res0q24.astype(np.int32)
    prmi[:, _P_R24:_P_R24 + C] = r24.astype(np.int32)
    prmi[:, _P_RES0Q36:_P_RES0Q36 + C] = res0q36.astype(np.int32)
    prmi[:, _P_R36:_P_R36 + C] = r36.astype(np.int32)
    prmf[:, _F_SR12:_F_SR12 + C] = sr12
    prmf[:, _F_SREM:_F_SREM + C] = srem
    prmf[:, _F_RRR:_F_RRR + C] = rrr
    prmf[:, _F_GAIN:_F_GAIN + C] = gain
    return prmi, prmf


def pack_ca_tables(ca2_list: list[np.ndarray]) -> np.ndarray:
    """Per-superframe +-1 C/A tables -> bit-packed [NS, C, 1, 128] int32.

    Chip k lives in bit (k & 31) of word (k >> 5); bit 1 encodes chip -1
    (sign = 1 - 2*bit).  Words 32..127 are zero padding."""
    ns = len(ca2_list)
    ca2 = np.stack(ca2_list)                              # [NS, C, 1023]
    bits01 = (1 - ca2.astype(np.int64)) // 2              # -1 -> 1, +1 -> 0
    bits01 = np.concatenate(
        [bits01, np.zeros((ns, _C, 32 * 32 - CA_SEQ_LEN), np.int64)],
        axis=-1).reshape(ns, _C, 32, 32)
    words = (bits01 << np.arange(32, dtype=np.int64)).sum(axis=-1)
    out = np.zeros((ns, _C, 1, _LANES), dtype=np.int64)
    out[:, :, 0, :32] = words
    return (out & 0xFFFFFFFF).astype(np.uint32).view(np.int32)


# quadrant-0 raw pair table: (cos[j]+512) | (sin[j]+512)<<16, j in [0,128)
_RAWTAB = ((((np.asarray(COS_TABLE_512[:128], np.int64) + 512)
             | ((np.asarray(SIN_TABLE_512[:128], np.int64) + 512) << 16))
            & 0xFFFFFFFF).astype(np.uint32).view(np.int32)
           .reshape(1, _LANES))


def _check_quadrant_identities() -> None:
    """The kernel reconstructs all 512 LUT entries from the 128-entry
    quadrant-0 table via exact identities of the reference's hand-written
    int tables (cos[128+j] = 2-sin[j], sin[128+j] = cos[j], half-wave
    x[256+i] = 2-x[i]) plus the single cos[384] exception.  Assert the
    full reconstruction at import time so any table regeneration that
    breaks the identities fails loudly instead of silently degrading
    bit-exactness."""
    raw = _RAWTAB.reshape(-1).view(np.uint32).astype(np.int64)
    want = (((np.asarray(COS_TABLE_512, np.int64) + 512)
             | ((np.asarray(SIN_TABLE_512, np.int64) + 512) << 16))
            & 0xFFFFFFFF)
    got = np.empty(512, np.int64)
    for itab in range(512):
        j = itab & 127
        p = raw[j]
        if (itab >> 7) & 1:                      # swap + complement low
            rot = ((p << 16) | (p >> 16)) & 0xFFFFFFFF
            p = (rot + 1026 - 2 * (rot & 0xFFFF)) & 0xFFFFFFFF
        if itab >> 8:                            # half-wave complement
            p = ((1026 | (1026 << 16)) - p) & 0xFFFFFFFF
        if itab == 384:                          # hand-written exception
            p = (p - 1) & 0xFFFFFFFF
        got[itab] = p
    assert np.array_equal(got, want), \
        "sin/cos tables no longer satisfy the kernel's quadrant identities"


_check_quadrant_identities()


def synth_blocks_pallas(prm, ca2_tables: np.ndarray,
                        sf_map: np.ndarray, block_samples: int,
                        device=None, packed: bool = True,
                        interpret: bool = False):
    """Run the fused kernel.

    prm: build_block_params output ([M,128] int plane, [M,128] float
    plane); ca2_tables: [NS, C, 1, 128] int32; sf_map: [M] int32
    block->superframe map.
    Returns packed int32 IQ [M, n_tiles*TILE_SAMPLES]; trim each row to
    block_samples and .view(int16) for the interleaved stream."""
    prmi, prmf = prm
    M = prmi.shape[0]
    tile = choose_tile(block_samples)
    nt = -(-block_samples // tile)
    # the kernel evaluates the NCO ramps over the PADDED sample range
    # [0, nt*tile); the Q36 residual ramp res0 + r*n + trunc(rrr*n)
    # (each term <= 4095, 4095*n, n-1) stays inside int32 only for
    # n <= (2^31 - 1 - 4095)/4096 = 524287, i.e. nt*tile <= 524288
    assert nt * tile <= 524_288, \
        f"padded block ({nt * tile}) exceeds the Q24/Q36 ramp range"
    fn = _build_fn(M, nt, ca2_tables.shape[0], packed, interpret, tile)
    args = [jnp.asarray(sf_map, jnp.int32), jnp.asarray(prmi),
            jnp.asarray(prmf), jnp.asarray(ca2_tables),
            jnp.asarray(_RAWTAB)]
    if device is not None:
        args = [jax.device_put(a, device) for a in args]
    # all kernel dtypes are 32-bit; x64 (needed by the epoch path) must be
    # off during tracing or jnp.take_along_axis promotes indices to int64
    with jax.enable_x64(False):
        out = fn(*args)
    if packed:
        return out.reshape(M, nt * tile)
    return tuple(o.reshape(M, nt * tile) for o in out)
