"""Fused Pallas TPU kernel for composite GPS L1 C/A IQ synthesis.

One kernel replaces the reference's entire per-sample hot loop
(plutogpssim.c:2690-2756).  Per (block, time-tile) grid cell it evaluates,
for all 12 channel slots, closed-form NCOs and mixes into packed int16 IQ:

  carrier   floor uint32 NCO + Q12-seeded step-quantization residual:
            phase = floor_u32(phase0) + step_u32*n
                  + ((sr12*n + cq12 + trunc(srem*n)) >> 12)
            (sr12 = floor(stepres*4096), srem its remainder, cq12 the
            floored anchor's sub-unit Q12 digit); LUT index =
            phase >> 23 replicates floor(carr_phase*512) (c:2697) as an
            exact floor of the f64 phase down to the f32 trunc level
            (2^-12 u32 units, the f64 closed form's own rounding class).
            History: one f32 level (error +-1 unit) let Doppler-resonant
            blocks collect ~2k adjacent-LUT picks; a round()ed anchor
            without the cq12 seed sat up to 0.5 units off and flipped
            ~124 boundary-straddling samples per 990 blocks
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

All per-(block,channel) parameters are packed into two [M, 256] planes
(int32 and float32, 2 KB/block over the host link): row 0 holds the
per-channel params, the second half packs the gain-trunc patch slots.
On device they expand to the [M, 8, 128] VMEM tile — patch slot k's
copies of its owning channel's params land in SUBLANE row 1+k at static
lanes, so the kernel's patch fori_loop addresses slots by dynamic
sublane (lowerable) instead of dynamic lane (not lowerable).  SMEM is
too small for thousands of blocks of prefetched parameters, and Mosaic
has no scalar bitcast.

Channel slots are static (12), masked by zeroed gain tables, so rise/set
never changes shapes.  Multiple 30 s superframes batch into one call
(C/A tables selected per block through the prefetched block->superframe
map), amortizing dispatch overhead across minutes of signal.
"""

from __future__ import annotations

import sys
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import CA_SEQ_LEN, MAX_CHAN
from ..models.tables import COS_TABLE_512, SIN_TABLE_512

__all__ = ["synth_blocks_pallas", "build_block_params", "pack_ca_tables",
           "unpack_iq", "choose_tile", "BlockParams", "TILE_SAMPLES",
           "MAX_BLOCK_SAMPLES"]

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
# carrier step residual: sr12 = floor(stepres*4096) carried as f32
# (exact, |sr12| <= 2048) and its [0,1) f32 remainder.  One f32 level
# (trunc(stepres*n), error up to +-1 u32 unit) was enough for SNR but
# made Doppler-resonant blocks — frac(f_carr/fs)*512 within ~1e-3 of an
# integer — collect ~2k adjacent-LUT picks per block; the Q12 level puts
# the ramp error at 2^-12 units.  CQ12 is the sub-unit Q12 digit of the
# FLOORed phase anchor, seeding the residual cascade: a round()ed anchor
# sat up to 0.5 u32 units off the f64 phase, flipping the 9-bit LUT
# index on boundary-straddling samples (~124 components per 990-block
# run); with floor + seed the integer phase is an exact floor of the
# f64 phase down to the f32 trunc level (~0.03 per 990 blocks).
_F_SR12, _F_SREM, _F_CQ12, _F_RRR, _F_GAIN = 0, 12, 24, 36, 48
# gain-trunc patch slots: the kernel's per-sample iv = trunc(f32(T)*f32(g))
# differs from the f64 tables' trunc(T*g) by exactly +-1 on LUT entries
# whose product lands within f32 rounding of an integer (~0.02 entries
# per block, measured).  build_block_params detects every such entry
# host-side (f32 prefilter + exact f64 check over the 223 distinct
# magnitudes), first NUDGES the f32 gain lane a few ulps to clear
# same-direction bursts outright (the nudge pass; this retired slot
# overflow as a correctness hole in round 5 — drops measure 0 on the
# bench deep scenario and the hour soak), and emits one patch word per
# surviving (entry, half); the kernel applies them behind a scalar
# pl.when that is almost never taken, so the fused path reproduces the
# f64 tables bit-for-bit at ~zero cost.
# Word encoding (f32-exact integer, 0 = empty slot):
#   bits [15:6] |T| magnitude, [5:2] channel, [1] half (0=I,1=Q),
#   [0] delta sign (0 -> +1, 1 -> -1)
_N_PATCH = 7

# Patch slot k's data lives in param-plane ROW 1+k (the kernel's VMEM
# tile is 8 sublanes anyway; shipped packed in [M, 256], expanded on
# device): the owning channel's params at STATIC lanes plus the patch
# word itself.  The kernel's patch pass is ONE fori_loop whose body
# reads row 1+k at a DYNAMIC sublane (Mosaic allows dynamic sublane
# indexing — the offset is provably a lane multiple — but not dynamic
# lane indexing, and unrolled per-slot regions exploded compile time
# and cost 15% runtime as 12 separate guarded regions).
_SLOT_I = {_P_PHASE0: 0, _P_STEP: 1, _P_CP0Q: 2, _P_VQ: 3, _P_NBM: 4,
           _P_IC0: 5, _P_RES0Q24: 6, _P_R24: 7, _P_RES0Q36: 8, _P_R36: 9}
_SLOT_I_W = 10
_SLOT_F = {_F_SR12: 0, _F_SREM: 1, _F_CQ12: 2, _F_RRR: 3, _F_GAIN: 4}
_SLOT_WORD = 5            # float slot lane holding the patch word
_SLOT_F_W = 6
assert _SLOT_I_W * _N_PATCH <= _LANES and _SLOT_F_W * _N_PATCH <= _LANES


def patch_word_lane(k: int) -> int:
    """Lane of patch slot k's word in the packed [M, 256] float plane."""
    return _LANES + _SLOT_F_W * k + _SLOT_WORD

# 1/1023 rounded UP in f32: trunc(chip * _INV1023) == chip // 1023 exactly
# for 0 <= chip < 600_000 (verified exhaustively; max chip under
# MAX_BLOCK_SAMPLES is ~537k)
_INV1023 = np.float32(np.nextafter(np.float32(1.0 / 1023.0),
                                   np.float32(np.inf)))

# distinct nonzero |T| over both LUT halves, for the gain-trunc patch
# detector (see _SLOT_I): trunc is odd, so checking each magnitude once
# covers all four quadrant entries carrying +-T
_MAGS64 = np.unique(np.abs(np.concatenate(
    [np.asarray(COS_TABLE_512, np.int64),
     np.asarray(SIN_TABLE_512, np.int64)])))
_MAGS64 = _MAGS64[_MAGS64 > 0].astype(np.float64)
_MAGS32 = _MAGS64.astype(np.float32)     # exact: magnitudes are <= 512
# gain-nudge search radius, in f32 ulps of the gain (see the nudge pass
# in build_block_params): each gain ulp moves every product by ~2-4
# product-ulps, so +-4 ulps sweeps +-~8 product-ulps — far more than the
# half-ulp rounding window a mismatch sits in
_NUDGE_ULPS = 4
_MAG_IN_COS = np.isin(_MAGS64.astype(np.int64),
                      np.abs(np.asarray(COS_TABLE_512, np.int64)))
_MAG_IN_SIN = np.isin(_MAGS64.astype(np.int64),
                      np.abs(np.asarray(SIN_TABLE_512, np.int64)))


def _kernel(sf_map_ref, prmi_ref, prmf_ref, ca2_ref, rawtab_ref,
            *out_and_scratch, SUB=_SUB, PATCHES=True):
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

    def chan_vals(geti, getf, ca_row, c=None):
        # Per-sample chain for one channel.  In the main loop the
        # accessors are true scalar loads at a PYTHON channel index
        # (CSE across the unroll); in the patch regions below they are
        # broadcast lane-gathers at a TRACED channel (Mosaic cannot
        # scalar-load a dynamic lane, so the "scalars" become
        # uniform vectors there — fine, those regions run ~0.02x/block).
        # ca_row is the channel's bit-packed C/A row, [_LANES] int32.
        # Returns (tc, ts, m, u): the signed LUT pair, the spreading
        # mask, and the biased packed gain-scaled sample.
        # carrier NCO: floor u32 anchor + two-level step residual
        # seeded with the anchor's sub-unit Q12 digit (arithmetic
        # >> 12 keeps floor semantics for negative sr12 — the integer
        # phase floors the f64 phase to the f32 trunc level, 2^-12)
        sr12 = getf(_F_SR12, c).astype(jnp.int32)
        cq12c = getf(_F_CQ12, c).astype(jnp.int32)
        resc = (sr12 * n + cq12c
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
        wrow = jnp.broadcast_to(ca_row, (SUB, _LANES))
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

        # spreading sign (chip XOR nav): mask of all-ones where the
        # sample negates
        m = -(cbit ^ nbit)
        return tc, ts, m, u

    for c in range(_C):
      # inactive channels are zero-gain; skip their work entirely
      @pl.when(getf(_F_GAIN, c) != 0.0)
      def _chan(c=c):
          tc, ts, m, u = chan_vals(geti, getf, ca2_ref[0, c, 0, :], c)
          # both biased halves negate around the bias, BIAS2 - u, with
          # no cross-half borrow (halves are in [0, 2048]); mask-and
          # form beats jnp.where on the VPU (no predicate registers)
          acc_scr[0] += u + ((jnp.int32(2048 | (2048 << 16)) -
                              jax.lax.shift_left(u, jnp.int32(1))) & m)

    # gain-trunc patches (see _SLOT_I): correct the rare LUT entries
    # where f32 trunc(T*g) != the f64 tables' trunc.  A single
    # fori_loop over the occupied slots — ONE chain in the IR, a branch
    # the ~98% of blocks with no patch never take, and the body costs
    # only when a patch exists (~0.02x/block).  (Two rejected forms:
    # per-slot guarded regions referencing the main loop's live
    # tc/ts/m made Mosaic materialize those intermediates, -45%
    # throughput; 12 unrolled self-contained regions compiled 5x slower
    # and still cost -15%.)  PATCHES=False compiles the pass out
    # entirely when the caller can see there are no patch words.
    if not PATCHES:
        _emit_epilogue(acc_scr, nact, out_ref)
        return
    nmax = jnp.int32(0)
    for k in range(_N_PATCH):
        wk = prmf_ref[0, 1 + k, _SLOT_WORD]
        nmax = jnp.where(wk != 0.0, jnp.int32(k + 1), nmax)

    @pl.when(nmax > jnp.int32(0))
    def _patches():
        def slot_body(k, carry):
            row = 1 + k
            wk = prmf_ref[0, row, _SLOT_WORD].astype(jnp.int32)
            c = jax.lax.shift_right_logical(wk, jnp.int32(2)) & jnp.int32(15)
            mag = jax.lax.shift_right_logical(wk, jnp.int32(6))
            half = jax.lax.shift_right_logical(
                wk, jnp.int32(1)) & jnp.int32(1)
            neg = wk & jnp.int32(1)

            # owning channel's params at static lanes of the slot row
            def geti_slot(col, _c):
                return prmi_ref[0, row, _SLOT_I[col]]

            def getf_slot(col, _c):
                return prmf_ref[0, row, _SLOT_F[col]]

            # only the C/A row needs the runtime channel: select-sum
            # (scalar-cond vector selects, no dynamic VMEM indexing)
            ca_row = ca2_ref[0, 0, 0, :] * jnp.int32(0)
            for cc in range(_C):
                ca_row += jnp.where(c == jnp.int32(cc),
                                    ca2_ref[0, cc, 0, :], jnp.int32(0))
            tc, ts, m, _ = chan_vals(geti_slot, getf_slot, ca_row, c)
            # delta folds into the compare order: p = (t==a)-(t==b) is
            # +-1 exactly at the patched magnitude's two signed values
            # (trunc is odd, so the mirrored entry gets the mirrored
            # correction).  An EMPTY slot (wk == 0, possible mid-range
            # after channel-shard filtering) self-cancels: mag = 0
            # makes both compares identical, so p = 0.
            a = jnp.where(neg == 0, mag, -mag)
            b = jnp.where(neg == 0, -mag, mag)
            tgt = jnp.where(half == 0, tc, ts)
            p_ = (tgt == a).astype(jnp.int32) - (tgt == b).astype(jnp.int32)
            # spreading sign flips the correction like the sample
            # itself: term = p - (2p & m); shift into the Q half when
            # the patch targets the sin table
            term = p_ - (jax.lax.shift_left(p_, jnp.int32(1)) & m)
            acc_scr[0] += jax.lax.shift_left(term, half * jnp.int32(16))
            return carry

        jax.lax.fori_loop(0, nmax, slot_body, jnp.int32(0))

    _emit_epilogue(acc_scr, nact, out_ref)


def _emit_epilogue(acc_scr, nact, out_ref):
    """Un-bias both halves of the packed accumulator, emit I/Q."""
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
              tile: int = TILE_SAMPLES, patches: bool = True):
    sub = tile // _LANES
    kernel = functools.partial(_kernel, SUB=sub, PATCHES=patches)
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

    def expand(p, w):
        # [M, 256] -> [M, 8, 128]: row 0 = per-channel params; packed
        # patch slot k (width w at lanes 128 + w*k) -> row 1+k lanes
        # 0..w-1 (the kernel's fori_loop indexes slots by SUBLANE —
        # dynamic lane indexing is not lowerable).  Static slices +
        # pads; XLA fuses this into the transfer epilogue.
        if not patches:
            # patch-free dispatch (the common case since the gain
            # nudge): planes ship NARROW ([M, 128], half the H2D bytes —
            # the parameter upload is a visible cost on slow links) and
            # rows 1..7 zero-fill on device
            return jnp.pad(p[:, None, :], ((0, 0), (0, 7), (0, 0)))
        rows = [p[:, None, :_LANES]]
        for k in range(_N_PATCH):
            seg = p[:, _LANES + w * k:_LANES + w * (k + 1)]
            rows.append(jnp.pad(seg, ((0, 0), (0, _LANES - w)))[:, None, :])
        return jnp.concatenate(rows, axis=1)

    def fn(sf_map, prmi, prmf, ca_tabs, rawtab):
        # params ship as [M, 256] (2 KB/block over the host link: row 0
        # per-channel params, the rest packed patch slots; [M, 128] when
        # the dispatch is patch-free) and expand on device into the
        # kernel's [M, 8, 128] VMEM tile
        return call(sf_map, expand(prmi, _SLOT_I_W),
                    expand(prmf, _SLOT_F_W), ca_tabs, rawtab)

    return jax.jit(fn)


class BlockParams(NamedTuple):
    """build_block_params output: the two packed parameter planes plus
    per-call accounting.  patch_dropped counts gain-trunc patch words
    dropped to the per-block slot cap (_N_PATCH) — each dropped word
    leaves one LUT entry at the kernel's f32 trunc, a +-1 LSB effect on
    that block's dwell samples.  Returned (not a module global) so
    concurrent streams / Monte-Carlo batches / sharded hosts can each
    attribute their own drops (IqStream.patch_dropped aggregates)."""

    prmi: np.ndarray           # [M, 256] int32 parameter plane
    prmf: np.ndarray           # [M, 256] float32 parameter plane
    patch_dropped: int


def build_block_params(dp, nudge: bool = True) -> BlockParams:
    """ops.synth_jnp.DevicePlan -> packed ([M,256] i32, [M,256] f32)
    parameter planes + the call's dropped-patch count (BlockParams).

    nudge=True (production default) resolves gain-trunc mismatches by
    moving the f32 gain lane a few ulps (see the nudge pass below)
    before falling back to patch words; nudge=False pins the pure
    patch-word path (kept for the overflow-degradation regression
    tests)."""
    return build_group_params([dp], nudge=nudge)


def build_group_params(dps: list, nudge: bool = True) -> BlockParams:
    """build_block_params over a whole dispatch group in ONE pass.

    The per-superframe form ran ~60 numpy ops on [300, 12] arrays whose
    per-op dispatch overhead dominated on a 1-core host (~1.9 ms per
    superframe, on the pipelined stream's host-bound critical path);
    concatenating the group's plans first amortizes that overhead over
    K superframes (~4x at K=8).  Output planes are bit-identical to
    concatenating per-plan build_block_params results: every step is
    row-independent elementwise math except the nav-bit table pack,
    which stays per-superframe (each superframe has its own bits
    table), and the gain-interval patch prefilter, whose wider
    per-group intervals only admit MORE candidate pairs into the exact
    f32 trigger check (the trigger itself is unchanged)."""
    assert dps, "empty dispatch group"
    block_samples = dps[0].block_samples
    assert all(d.block_samples == block_samples for d in dps), \
        "dispatch group mixes block sizes"
    # Q24 residual ramp bound: r24*n must stay inside int32
    assert block_samples <= MAX_BLOCK_SAMPLES, \
        "block too long for the Q24 code NCO (needs <=5.24 MHz at 0.1 s blocks)"
    act = np.concatenate([d.active for d in dps], axis=0)
    gain64 = np.concatenate([d.gain for d in dps], axis=0)
    v = np.concatenate([d.v for d in dps], axis=0)
    # in-kernel f32 reciprocal division is exact for chip < 600k
    assert float(np.max(np.abs(v))) <= 1.1, \
        "code rate out of range for the kernel's chip arithmetic"
    # biased-accumulator budget: |trunc(table*gain)| <= 1024
    assert float(np.max(np.abs(gain64))) <= 2.0, \
        "channel gain out of range for the biased packed accumulator"
    M, C = act.shape
    c0 = np.where(act, np.concatenate([d.c0 for d in dps], axis=0), 0.0)
    u = np.where(act, np.concatenate([d.u for d in dps], axis=0), 0.0)
    cp0 = np.where(act, np.concatenate([d.cp0 for d in dps], axis=0), 0.0)
    v = np.where(act, v, 0.0)

    # FLOOR anchor + sub-unit Q12 digit (see _F_CQ12 comment): the f64
    # product frac(c0)*2^32 is exact (power-of-two scale), so both the
    # integer anchor and its Q12 digit are exact digit extractions
    phase0_f = (c0 - np.floor(c0)) * 2.0**32
    phase0 = np.floor(phase0_f).astype(np.int64)
    cq12 = np.floor((phase0_f - phase0) * 4096.0).astype(np.float32)
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
    b0 = np.where(act, np.concatenate([d.b0 for d in dps], axis=0), 0)
    ic0 = np.where(act, np.concatenate([d.ic0 for d in dps], axis=0),
                   0).astype(np.int32)
    # enforce the 32-bit mask width: q = (ic0 + code_periods)//20 must
    # stay < 32 for every sample of the block (worst case today is 29)
    max_w = (cp0 + np.abs(v) * block_samples) // CA_SEQ_LEN
    assert int(np.max((ic0 + max_w) // 20)) < 32, \
        "nav-bit index exceeds the 32-bit per-block mask"
    # bit q of the mask = nav bit at B0+q as 0/1 (+1 -> 0, -1 -> 1).
    # Pack each channel's 1800 bits ONCE per superframe (replicating the
    # final bit so windows straddling the end reproduce the old
    # clip-to-last-bit semantics), assemble a sliding uint64 view over
    # the packed bytes, and extract every block's 32-bit window with a
    # [M, C] gather + shift — O(C*1800) setup instead of the O(M*C*32)
    # per-bit gather + packbits this replaces (which was itself ~2x
    # cheaper than the shift-or loop before it; this is another ~10x,
    # this function sits on the host-bound pipelined critical path).
    # This stage is the one per-SUPERFRAME part of the group pass: each
    # superframe has its own bits table.
    nbmask = np.empty((M, C), np.int32)
    row = 0
    v64_cache: dict = {}   # Monte-Carlo receivers on a shared clock and
    # NavCache carry byte-identical bits tables, so the packed sliding
    # view dedups across the B x n_superframes segments (stream groups
    # have distinct tables per superframe — the cache is a no-op there)
    for d in dps:
        m_sf = d.active.shape[0]
        # the old per-bit form clipped b0+q to the table end; clamp b0
        # the same way so an out-of-range start reads the replicated
        # final bit
        b0s = np.minimum(b0[row:row + m_sf], d.bits.shape[1] - 1)
        key = d.bits.tobytes()
        v64 = v64_cache.get(key)
        if v64 is None:
            bits01 = d.bits < 0                            # [C, n_bits]
            ext = np.concatenate(
                [bits01, np.repeat(bits01[:, -1:], 39, axis=1)], axis=1)
            pb = np.packbits(ext, axis=1, bitorder="little")  # [C, /8]
            pb = np.concatenate([pb, np.zeros((C, 7), np.uint8)], axis=1)
            sw = np.lib.stride_tricks.sliding_window_view(pb, 8, axis=1)
            # explicit little-endian byte assembly (endian-neutral,
            # unlike a .view(uint64) of host-order bytes)
            v64 = (sw.astype(np.uint64)
                   << (np.uint64(8) * np.arange(8, dtype=np.uint64))).sum(
                       axis=2, dtype=np.uint64)            # [C, n_wins]
            v64_cache[key] = v64
        win = v64[np.arange(C)[None, :], b0s >> 3]         # [m_sf, C]
        nbmask[row:row + m_sf] = (
            (win >> (b0s & 7).astype(np.uint64))
            & np.uint64(0xFFFFFFFF)).astype(np.uint32).view(np.int32)
        row += m_sf
    assert row == M

    gain = np.where(act, gain64, 0.0).astype(np.float32)

    # ---- gain-trunc patch words (see _SLOT_I) -----------------------------
    # f32 prefilter: a trunc mismatch needs |T*g| within |p32 - p64| <=
    # p*2^-23.6 <= 2^-13.6 of an integer, so products whose f32 value sits
    # >= 2^-12 from every integer are provably clean; the exact f64-vs-f32
    # comparison runs only on the surviving ~1e-4 of entries.  Cost control
    # (the pipelined stream is host-bound): active pairs only, round via
    # the 1.5*2^23 magic add (exact rint for |p| < 2^22), and a per-pair
    # any() reduction before materializing candidate indices.
    patch = np.zeros((M, _N_PATCH), np.float32)
    slot_owner = []                                # (block, slot, channel)
    dropped = 0
    # Interval exoneration first (the pipelined stream is host-bound and
    # the old dense [active pairs x 223] f32 sweep was ~30% of this
    # function): over one superframe a channel's gain spans a narrow
    # interval, so T*g can only straddle an integer if that interval
    # (widened by delta = 2^-11, a strict bound on the f32 prefilter's
    # |p32 - p64| <= p*2^-23 + 2^-12 trigger window) contains one.
    # ~12x223 f64 interval tests replace ~2100x223 f32 products; the
    # dense test runs only on the surviving (channel, magnitude) pairs.
    # Intervals are taken PER SUPERFRAME segment (not over the whole
    # group): a channel's gain spans ~1e-4 over 30 s but sweeps wide
    # over a K=8 group, and group-wide intervals admitted hundreds of
    # false-positive pairs into the dense pass (measured as a 2x cost
    # regression when this function first went group-batched).
    delta = 2.0 ** -11
    cand = []                            # (m, c, j); sorted() below owns order
    magic = np.float32(12582912.0)                 # 1.5 * 2^23
    row = 0
    for d in dps:
        m_sf = d.active.shape[0]
        seg = slice(row, row + m_sf)
        acts = act[seg]
        gmin = np.min(np.where(acts, gain64[seg], np.inf), axis=0)   # [C]
        gmax = np.max(np.where(acts, gain64[seg], -np.inf), axis=0)
        plo = gmin[:, None] * _MAGS64[None, :] - delta         # [C, 223]
        phi = gmax[:, None] * _MAGS64[None, :] + delta
        has_int = (np.floor(phi) >= np.ceil(plo)) \
            & acts.any(axis=0)[:, None]
        cs, js = np.nonzero(has_int)     # surviving (channel, mag) pairs
        if cs.size:
            # one [m_sf, n_pairs] f32 pass over every surviving pair at
            # once (the f32 product expression is unchanged, so the
            # candidate set is identical to the old per-channel sweep);
            # inactive blocks have gain 0 -> frac 0, masked out by act
            p32 = gain[seg][:, cs] \
                * _MAGS64[js].astype(np.float32)[None, :]
            frac = p32 - ((p32 + magic) - magic)
            near = (np.abs(frac) < np.float32(2.0 ** -12)) & acts[:, cs]
            for mi, pi in zip(*np.nonzero(near)):
                cand.append((row + int(mi), int(cs[pi]), int(js[pi])))
        row += m_sf
    # exact f64-vs-f32 trunc check, vectorized over the few candidates
    # (a scalar-numpy loop here cost ~50 us per candidate)
    cand.sort()
    deltas = []
    if cand:
        ca_ = np.array(cand, np.int64)               # [n, 3] (m, c, j)
        gg_ = gain64[ca_[:, 0], ca_[:, 1]]
        t64 = np.trunc(_MAGS64[ca_[:, 2]] * gg_)
        t32 = np.trunc(_MAGS64[ca_[:, 2]].astype(np.float32)
                       * gg_.astype(np.float32))
        deltas = (t64 - t32.astype(np.float64)).astype(np.int64)

    # ---- gain nudging: eliminate mismatches instead of patching them ------
    # A mismatching (block, channel) almost always mismatches because its
    # gain sits within ~2^-25 of a rational p/q: every LUT magnitude that
    # is a multiple of q straddles an integer in the SAME direction, so
    # moving the f32 gain LANE a few ulps toward the f64 side clears all
    # of them at once (the kernel's product is trunc(f32(T)*f32(lane)),
    # so the lane value — not f32(g64) — is the free variable; the f64
    # target truncs trunc(T*g64) are untouched).  Each candidate lane is
    # verified host-side against ALL 223 magnitudes, and the one with the
    # fewest residual mismatches (ties: smallest |ulp| step, so behavior
    # is unchanged wherever the nudge cannot help) is kept; residuals —
    # only mixed-direction straddles, measured 0 on the bench deep
    # scenario and the hour soak — still get patch words below.  This is
    # what retired the _N_PATCH overflow as a correctness hole: the old
    # worst case (g ~ 17/31 - 3e-9, 32 same-direction words, 25 dropped)
    # nudges to zero.
    fixes: list[tuple[int, int, int, int]] = []      # (m, c, j, delta)
    if nudge:
        by_mc: dict[tuple[int, int], bool] = {}
        for (m, c, j), d in zip(cand, deltas):
            if d != 0:
                by_mc[(m, c)] = True
        for m, c in sorted(by_mc):
            g64 = gain64[m, c]
            t64_all = np.trunc(_MAGS64 * g64)
            # all 2*_NUDGE_ULPS+1 candidate lanes in one vector pass,
            # then pick by (mismatch count, |ulp| step) preference
            g0 = np.float32(g64)
            ups = [g0]
            dns = [g0]
            for _ in range(_NUDGE_ULPS):
                ups.append(np.nextafter(ups[-1], np.float32(np.inf)))
                dns.append(np.nextafter(dns[-1], np.float32(-np.inf)))
            order = [g0]
            for k in range(1, _NUDGE_ULPS + 1):
                order += [ups[k], dns[k]]
            gc_arr = np.array(order, np.float32)              # [9]
            d_all = t64_all[None, :] \
                - np.trunc(_MAGS32[None, :] * gc_arr[:, None]
                           ).astype(np.float64)               # [9, 223]
            counts = np.count_nonzero(d_all, axis=1)
            best = int(np.argmin(counts))   # argmin = first = smallest |k|
            gain[m, c] = gc_arr[best]
            for j in np.nonzero(d_all[best])[0]:
                fixes.append((m, c, int(j), int(d_all[best, j])))
    else:
        fixes = [(m, c, j, int(d))
                 for (m, c, j), d in zip(cand, deltas) if d != 0]
    # fill slots in the dense sweep's (block, channel, magnitude) order
    # so slot assignment/overflow behavior is unchanged
    fixes.sort()
    nslot = np.zeros(M, np.int32)
    for m, c, j, d in fixes:
        # truncs of two reals within 2^-12 differ by at most 1
        assert abs(d) == 1, "gain-trunc delta out of range"
        for half, member in ((0, _MAG_IN_COS[j]),
                             (1, _MAG_IN_SIN[j])):
            if not member:
                continue
            k = int(nslot[m])
            # with nudging, residual words are rare mixed-direction
            # straddles (0-2 per block); without it (nudge=False), a
            # gain within ~2^-25 of a small rational p/q flips MANY
            # multiples of q at once (measured: g ~ 17/31 - 3e-9 -> 32
            # words; q=3 could need ~148).  Overflow degrades
            # gracefully: the dropped entries keep the kernel's
            # f32 trunc, a +-1 LSB effect on one block's dwell
            # samples (~95+ dB), counted in the returned
            # BlockParams.patch_dropped.
            if k >= _N_PATCH:
                dropped += 1
                continue
            patch[m, k] = float(
                (int(_MAGS64[j]) << 6) | (c << 2)
                | (half << 1) | (1 if d < 0 else 0))
            slot_owner.append((m, k, c))
            nslot[m] = k + 1

    prmi = np.zeros((M, 2 * _LANES), dtype=np.int32)
    prmf = np.zeros((M, 2 * _LANES), dtype=np.float32)
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
    prmf[:, _F_CQ12:_F_CQ12 + C] = cq12
    prmf[:, _F_RRR:_F_RRR + C] = rrr
    prmf[:, _F_GAIN:_F_GAIN + C] = gain
    # patch slots: the word plus copies of the owning channel's params
    # at the slot's static lanes (see _SLOT_I/_SLOT_F; expanded to
    # per-slot sublane rows on device)
    for m, k, c in slot_owner:
        for base, j in _SLOT_I.items():
            prmi[m, _LANES + _SLOT_I_W * k + j] = prmi[m, base + c]
        for base, j in _SLOT_F.items():
            prmf[m, _LANES + _SLOT_F_W * k + j] = prmf[m, base + c]
        prmf[m, _LANES + _SLOT_F_W * k + _SLOT_WORD] = patch[m, k]
    return BlockParams(prmi, prmf, dropped)


def unpack_iq(packed, block_samples: int | None = None) -> np.ndarray:
    """Packed int32 IQ [..., S] -> interleaved int16 [..., S', 2].

    The kernel packs (I & 0xffff) | (Q << 16) per sample (see module
    docstring); this is the one inverse every consumer shares.
    block_samples trims each row's tile padding first.

    On little-endian hosts the packed word's bytes ARE the interleaved
    int16 pair ([I_lo, I_hi, Q_lo, Q_hi]), so the unpack is one
    contiguous copy + reinterpreting view — ~4x less memory traffic
    than the mask/shift/stack form (which remains as the big-endian
    fallback); the delivered-IQ path runs this over the full stream."""
    packed = np.asarray(packed)
    if block_samples is not None:
        packed = packed[..., :block_samples]
    if sys.byteorder == "little":
        out = np.ascontiguousarray(packed)
        return out.view(np.int16).reshape(*out.shape, 2)
    return np.stack(
        [(packed & 0xFFFF).astype(np.uint16).view(np.int16),
         (packed >> 16).astype(np.int16)], axis=-1)


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
                        interpret: bool = False,
                        force_patches: bool = False):
    """Run the fused kernel.

    prm: build_block_params output (BlockParams, or any sequence whose
    first two elements are the [M,256] int and float parameter planes);
    ca2_tables: [NS, C, 1, 128] int32; sf_map: [M] int32
    block->superframe map.
    force_patches=True keeps the patch-pass kernel variant (and the wide
    plane shape) even when this dispatch carries no patch words — a
    long-lived stream uses it to latch ONE compiled variant after its
    first patched group instead of flip-flopping shapes (a fresh variant
    is a ~20-40 s Mosaic compile mid-stream; runtime.stream.IqStream).
    Returns packed int32 IQ [M, n_tiles*TILE_SAMPLES]; trim each row to
    block_samples and .view(int16) for the interleaved stream."""
    prmi, prmf = prm[0], prm[1]
    M = prmi.shape[0]
    tile = choose_tile(block_samples)
    nt = -(-block_samples // tile)
    # the kernel evaluates the NCO ramps over the PADDED sample range
    # [0, nt*tile); the Q36 residual ramp res0 + r*n + trunc(rrr*n)
    # (each term <= 4095, 4095*n, n-1) stays inside int32 only for
    # n <= (2^31 - 1 - 4095)/4096 = 524287, i.e. nt*tile <= 524288
    assert nt * tile <= 524_288, \
        f"padded block ({nt * tile}) exceeds the Q24/Q36 ramp range"
    # compile the gain-trunc patch pass out when the (host-visible)
    # param plane provably carries no patch slots — the common case for
    # every scenario since the gain nudge, and it keeps interpret-mode
    # XLA-CPU graphs small; patch-free dispatches also ship the planes
    # NARROW (their patch half is all zero — half the H2D bytes, a
    # visible cost on slow host links)
    patches = force_patches or not (isinstance(prmf, np.ndarray)
                                    and not np.any(prmf[:, _LANES:]))
    fn = _build_fn(M, nt, ca2_tables.shape[0], packed, interpret, tile,
                   patches)
    if not patches:
        prmi = np.ascontiguousarray(np.asarray(prmi)[:, :_LANES])
        prmf = np.ascontiguousarray(prmf[:, :_LANES])
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
