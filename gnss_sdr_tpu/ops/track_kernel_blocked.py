"""Channel-blocked fused tracking kernel: all channels in one program.

The per-channel kernel (ops/track_kernel.make_fused_tracker_full) runs
one grid program per channel, so every period pays the full per-period
fixed cost (scalar discriminator chain, op-issue overhead on (rows_p,
128) shapes) once PER CHANNEL: measured ~1.16 us fixed + ~0.6 us of
lane work per channel-period at GPS L1 rates (tools/mosaic_probe.py).
This kernel stacks all C channels on the sublane axis of ONE grid
program so the fixed cost is paid once per period for the whole batch:

- sample rows for channel c live at scratch rows [c*rows_p, (c+1)*rows_p)
  (2C dynamic-slice staging copies per period, ~27 ns each);
- per-channel loop state (NCO phases, loop-filter integrators,
  accumulators) are (C, 1) vectors — the whole discriminator/filter
  section is C-way vectorized instead of per-channel scalar chains;
- (C, 1) -> (C*rows_p, 128) broadcasts and the per-channel segmented
  correlation reductions both ride the MXU as one small matmul each
  (E: [BR, C] 0/1 selection, R = E^T);
- the code replica uses 16-chip BIT-PACKED tables (all production code
  tables are +-1 chips): tbl_s[16*l + b] = code[(16*l + b + s) mod L]
  packs 16 chips per f32 lane, so one code period spans ceil(L/16)
  lanes — a SINGLE lane-gather pass for L <= 2048 (GPS/GLONASS/BeiDou
  B1I) and ceil(L/2048) passes for the long E1/E5/L5 codes. The three
  shifted tables (s = -1, 0, +1) cover every tap's (c_prev, c_cur)
  interpolation pair at ONE shared gather index, because the taps span
  <= 1 chip (VERDICT r4 #3: "gather once, shift" — this is the
  shared-gather form of it). Bit extraction is exact f32 integer
  arithmetic: 2^-j built by int bit-assembly + bitcast.

Semantics are identical to make_fused_tracker_full (same scalar slots,
same output lane layout transposed to [K, C, 128]): extended coherent
integration, pilot/secondary wipeoff + data prompt, FLL, atan2 PLL,
per-channel bandwidths, FDMA reduced carrier offset.

Reference analog: dll_pll_veml_tracking.cc general_work states 2-4
(:1898-2260) across all channels of the receiver at once — the
re-expression of GNU Radio's thread-per-channel parallelism (SURVEY.md
S2.4 P2) inside a single Mosaic program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gnss_sdr_tpu.ops.track_kernel import (
    LANE_ACC0,
    LANE_ACC_N,
    LANE_BOUND,
    LANE_DATA_BOUND,
    LANE_DATA_CNT,
    LANE_DATA_IM,
    LANE_DATA_RE,
    LANE_DCODE,
    LANE_DLL_I1,
    LANE_DLL_I2,
    LANE_DOPPLER,
    LANE_ICOUNT,
    LANE_N,
    LANE_PHASE,
    LANE_PLL_I1,
    LANE_PLL_I2,
    LANE_POS,
    LANE_PREV_IM,
    LANE_PREV_RE,
    LANE_REM,
    LANE_SEC_IDX,
    S_ACC0,
    S_ACCD_CNT,
    S_ACCD_IM,
    S_ACCD_RE,
    S_ACC_N,
    S_ATAN2,
    S_DCODE,
    S_DLL_BW,
    S_DLL_I1,
    S_DLL_I2,
    S_DOP,
    S_EN,
    S_FLL,
    S_INTEG_CNT,
    S_INTEG_LEN,
    S_PHASE,
    S_PLL_BW,
    S_PLL_I1,
    S_PLL_I2,
    S_POS,
    S_PREV_IM,
    S_PREV_RE,
    S_REM,
    S_SEC_ACT,
    S_SEC_IDX,
    _atan,
)

LANES = 128
PACK = 32                     # chips per packed int32 lane


def n_pack_rows(code_len: int) -> int:
    return (-(-code_len // PACK) + LANES - 1) // LANES


def shift_range(tap_offsets, interp_code: bool) -> tuple[int, int]:
    """Chip shifts (relative to base) the tap set needs: [s_lo, s_hi]."""
    offs = np.asarray(tap_offsets, np.float64)
    spread = float(offs.max() - offs.min())
    s_hi = int(np.ceil(spread + 1e-9))
    s_lo = -1 if interp_code else 0
    # pilot data component sits at offset 0: within [min_off, max_off]
    return s_lo, s_hi


def pack_codes_blocked(
    codes: np.ndarray,            # [C, L] +-1 chips
    rows_p: int,
    s_lo: int,
    s_hi: int,
) -> np.ndarray:
    """[C, L] -> [NS*NQ, C*rows_p, 128] expanded bit-packed int32 tables.

    Table for shift s, packed row q, expanded to channel-blocked rows:
    out[(s - s_lo)*NQ + q, c*rows_p + r, l] packs chips
    code[c, (32*(128*q + l) + b + s) mod L] at bit b (b = 0..31).
    """
    c, l = codes.shape
    bits = (codes > 0).astype(np.int64)       # +-1 -> 1/0
    nq = n_pack_rows(l)
    n_lanes = nq * LANES
    n_shift = s_hi - s_lo + 1
    out = np.zeros((n_shift * nq, c * rows_p, LANES), np.int32)
    chip_idx = (np.arange(n_lanes * PACK).reshape(n_lanes, PACK))
    weights = (1 << np.arange(PACK)).astype(np.int64)
    for si, s in enumerate(range(s_lo, s_hi + 1)):
        idx = (chip_idx + s) % l
        packed = (bits[:, idx] * weights[None, None, :]).sum(-1)  # [C, n_lanes]
        packed = packed.astype(np.int64).astype(np.uint32).view(np.int32)
        packed = packed.reshape(c, nq, LANES)
        for q in range(nq):
            rowblk = np.repeat(packed[:, q, :], rows_p, axis=0)
            out[si * nq + q] = rowblk
    return out


def make_fused_tracker_blocked(
    n_periods: int,
    n_max: int,
    code_len: int,
    num_taps: int,
    tap_offsets: np.ndarray,
    *,
    fs: float,
    code_rate_cps: float,
    carrier_freq_hz: float,
    pll_order: int = 2,
    dll_order: int = 2,
    fll_bw_hz: float = 4.0,
    interp_code: bool = True,
    track_pilot: bool = False,
    sec_len_pilot: int = 1,
    sec_len_data: int = 1,
    sec_lcm: int = 1,
    fdma: bool = False,
    interpret: bool | None = None,
):
    """Build the channel-blocked K-period tracker.

    Returns f(wr [WR,128], wi [WR,128], codes_b [NT, C*rows_p, 128],
    scalars [C, NS][, dcodes_b, sec_p [C,<=128], sec_d]) -> [C, K, 128]
    with the same scalar slots and output lanes as
    make_fused_tracker_full. ``track.pack(codes [C, L])`` builds the
    packed table input.
    """
    rows_p = (n_max + 127) // LANES + 1
    t = num_taps
    p_idx = t // 2
    offs = [float(o) for o in np.asarray(tap_offsets, np.float32)]
    min_off = min(offs)
    s_lo, s_hi = shift_range(tap_offsets, interp_code)
    n_shift = s_hi - s_lo + 1
    nq = n_pack_rows(code_len)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    ns = S_ACC0 + 2 * t + 1
    # The sample window stays in HBM; each period one block DMA pulls the
    # rows [min enabled pos .. + blk_rows) every channel touches into a
    # VMEM buffer (channels track the same stream, so their positions
    # stay within ~1 code period + differential code-Doppler drift of
    # each other — the tracker asserts this before taking the fused
    # path). Removes the whole-window VMEM cost that otherwise caps the
    # launch size at high sample rates.
    spc_rows = -(-n_max // LANES)
    blk_rows = rows_p + spc_rows + 48

    inv_fs = np.float32(1.0 / fs)
    two_pi = np.float32(2.0 * np.pi)
    nominal_step = np.float64(code_rate_cps / fs)
    aid_ratio = np.float32(code_rate_cps / carrier_freq_hz)
    w0f = np.float32(fll_bw_hz / 0.53)
    pll_div = np.float32(0.53 if pll_order == 2 else 0.7845)
    dll_div = np.float32(0.53 if dll_order == 2 else 0.7845)
    sp, sd = int(sec_len_pilot), int(sec_len_data)
    lcm = int(sec_lcm)
    spc = float(np.round(fs * code_len / code_rate_cps))
    c0 = np.float32(spc * float(nominal_step) - code_len)
    spcf = np.float32(spc)
    lf = np.float32(code_len)

    def _atan2(q, i):
        a = _atan(q / jnp.where(jnp.abs(i) < 1e-20, jnp.float32(1e-20), i))
        corr = jnp.where(q >= 0.0, jnp.float32(np.pi), jnp.float32(-np.pi))
        return jnp.where(i < 0.0, a + corr, a)

    def _sincos(ph):
        """Fused sin+cos (Cephes sinf/cosf): one shared range reduction
        to |r| <= pi/4 + quadrant swap/sign selects — about half the ops
        of Mosaic's separate sin and cos lowerings on the same input.
        Max error ~1 ulp against jnp.sin/cos for |ph| < 2^13 rad (the
        NCO phase here is pre-reduced mod 2pi)."""
        q = jnp.floor(ph * jnp.float32(2.0 / np.pi) + 0.5)
        # two-step Cody-Waite: pi/2 = hi + lo keeps the reduced argument
        # exact to f32 for |q| < 2^11
        r = ph - q * jnp.float32(1.5707964)
        r = r - q * jnp.float32(-4.3711388e-8)
        r2 = r * r
        # Cephes sinf/cosf minimax polynomials on [-pi/4, pi/4]
        ps = jnp.float32(-1.9515296e-4)
        ps = ps * r2 + jnp.float32(8.3321608e-3)
        ps = ps * r2 + jnp.float32(-1.6666654e-1)
        sin_r = r + r * r2 * ps
        pc = jnp.float32(2.443315711809948e-5)
        pc = pc * r2 + jnp.float32(-1.388731625493765e-3)
        pc = pc * r2 + jnp.float32(4.166664568298827e-2)
        cos_r = 1.0 + r2 * (r2 * pc - 0.5)
        k = q - 4.0 * jnp.floor(q * 0.25)         # quadrant mod 4
        swap = (k == 1.0) | (k == 3.0)
        s_sin = jnp.where((k == 2.0) | (k == 3.0), -1.0, 1.0)
        s_cos = jnp.where((k == 1.0) | (k == 2.0), -1.0, 1.0)
        sinv = jnp.where(swap, cos_r, sin_r) * s_sin
        cosv = jnp.where(swap, sin_r, cos_r) * s_cos
        return sinv, cosv

    def make_kernel(c: int):
        br = c * rows_p

        def kernel(*refs):
            if track_pilot:
                (scal_ref, sec_p_ref, sec_d_ref, wr_ref, wi_ref, code_ref,
                 dcode_ref, o_ref, sxr, sxi, spos, wbr, wbi,
                 sem_r, sem_i) = refs
            else:
                (scal_ref, wr_ref, wi_ref, code_ref, o_ref,
                 sxr, sxi, spos, wbr, wbi, sem_r, sem_i) = refs
                dcode_ref = code_ref
                sec_p_ref = sec_d_ref = None
            wrows_total = wr_ref.shape[0]

            lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
            # per-row sample index within the channel's period block
            row_i = jax.lax.broadcasted_iota(jnp.int32, (br, LANES), 0)
            kin = (((row_i % rows_p) * LANES
                    + jax.lax.broadcasted_iota(jnp.int32, (br, LANES), 1))
                   .astype(jnp.float32))
            # channel-selection matmuls: expand (C,1)->(BR,128 via lanes),
            # reduce (BR,*)->(C,*)
            esel = (jax.lax.broadcasted_iota(jnp.int32, (br, c), 0) // rows_p
                    == jax.lax.broadcasted_iota(jnp.int32, (br, c), 1)
                    ).astype(jnp.float32)
            rsel = (jax.lax.broadcasted_iota(jnp.int32, (c, br), 1) // rows_p
                    == jax.lax.broadcasted_iota(jnp.int32, (c, br), 0)
                    ).astype(jnp.float32)

            def expand(cols):
                """list of (C,1) -> list of (BR,1) via one MXU matmul."""
                mat = jnp.concatenate(cols, axis=1)             # [C, m]
                e = jax.lax.dot_general(
                    esel, mat, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)        # [BR, m]
                return [e[:, j:j + 1] for j in range(len(cols))]

            def reduce_cols(cols):
                """list of (BR,1) lane-sums -> list of (C,1)."""
                mat = jnp.concatenate(cols, axis=1)             # [BR, m]
                r = jax.lax.dot_general(
                    rsel, mat, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)        # [C, m]
                return [r[:, j:j + 1] for j in range(len(cols))]

            def col(slot):
                return scal_ref[:, slot:slot + 1]

            # per-launch constants
            en = col(S_EN)
            eng = en > 0.5
            integ_len = col(S_INTEG_LEN)
            sec_act = col(S_SEC_ACT)
            atan2f = col(S_ATAN2)
            fllf = col(S_FLL)
            pll_bw = col(S_PLL_BW)
            dll_bw = col(S_DLL_BW)
            w0p = pll_bw / pll_div
            w0d = dll_bw / dll_div
            w_off = col(S_ACC0 + 2 * t) if fdma else None

            def gather_tbl(tbl_ref, si, q, r):
                """Packed-int32-table gather for shift index si at lane
                index r, pass-selected by q (q/r: (BR,128))."""
                out = jnp.zeros((br, LANES), jnp.int32)
                for qq in range(nq):
                    src = tbl_ref[si * nq + qq]
                    g = jnp.take_along_axis(src, r, axis=1)
                    if nq == 1:
                        out = g
                    else:
                        out = jnp.where(q == jnp.float32(qq), g, out)
                return out

            def body(i, carry):
                (blk_base, pos, rem, dcode, phase0, doppler,
                 pll_i1, pll_i2, dll_i1, dll_i2,
                 icount, acc_n, sec_idx, prev_re, prev_im,
                 accd_re, accd_im, accd_cnt, *acc) = carry
                acc = list(acc)

                delta = dcode * inv_fs
                code_step = jnp.float32(nominal_step) + delta
                small = rem + c0 + spcf * delta
                n_f = spcf - small / code_step
                n0 = jnp.floor(n_f + jnp.float32(0.5))
                rem0 = rem + ((n0 - spcf) * code_step + c0 + spcf * delta)
                addf = (rem0 < 0.0).astype(jnp.float32)
                n = jnp.clip(n0 + addf, 1.0, jnp.float32(n_max))

                r0 = jnp.floor(pos * jnp.float32(1.0 / LANES))
                off = pos - r0 * LANES

                # ---- double-buffered window DMA (HBM -> VMEM) ------------
                # pos_new is known from the cheap (C,1) arithmetic alone,
                # so period i+1's block base is EXACT here: issue its DMA
                # into the other slot before this period's heavy compute,
                # wait for the current slot's DMA (issued one period ago),
                # and the transfer hides behind a full period of work.
                pos_nxt = jnp.where(eng, pos + n, pos)
                posm_nxt = jnp.min(jnp.where(
                    eng, jnp.floor(pos_nxt * jnp.float32(1.0 / LANES)),
                    jnp.float32(1e9)))
                spos[...] = jnp.concatenate(
                    [r0, jnp.full((c, 1), posm_nxt)], axis=1)
                nb = jnp.clip(spos[0, 1].astype(jnp.int32) - 1,
                              0, wrows_total - blk_rows)
                slot = (i % 2) * blk_rows
                nslot = ((i + 1) % 2) * blk_rows
                cp_cur_r = pltpu.make_async_copy(
                    wr_ref.at[pl.ds(blk_base, blk_rows)],
                    wbr.at[pl.ds(slot, blk_rows)], sem_r)
                cp_cur_i = pltpu.make_async_copy(
                    wi_ref.at[pl.ds(blk_base, blk_rows)],
                    wbi.at[pl.ds(slot, blk_rows)], sem_i)
                cp_cur_r.wait()
                cp_cur_i.wait()
                pltpu.make_async_copy(
                    wr_ref.at[pl.ds(nb, blk_rows)],
                    wbr.at[pl.ds(nslot, blk_rows)], sem_r).start()
                pltpu.make_async_copy(
                    wi_ref.at[pl.ds(nb, blk_rows)],
                    wbi.at[pl.ds(nslot, blk_rows)], sem_i).start()

                # ---- staging: copy each channel's rows to its block ------
                def cp(cc, a):
                    rel = slot + jnp.clip(
                        spos[cc, 0].astype(jnp.int32) - blk_base,
                        0, blk_rows - rows_p)
                    sxr[pl.ds(cc * rows_p, rows_p), :] = (
                        wbr[pl.ds(rel, rows_p), :])
                    sxi[pl.ds(cc * rows_p, rows_p), :] = (
                        wbi[pl.ds(rel, rows_p), :])
                    return a
                jax.lax.fori_loop(0, c, cp, 0, unroll=True)

                # ---- broadcasts ------------------------------------------
                if fdma:
                    dstep = (two_pi * inv_fs) * doppler + w_off
                else:
                    dstep = (two_pi * inv_fs) * doppler
                off_b, n_b, rem_b, step_b, ph0_b, dstep_b = expand(
                    [off, n, rem, code_step, phase0, dstep])

                k = kin - off_b
                mask = ((k >= 0.0) & (k < n_b)).astype(jnp.float32)

                ph = ph0_b + dstep_b * k
                if fdma:
                    ph = ph - two_pi * jnp.floor(
                        ph * jnp.float32(1.0 / (2.0 * np.pi)))
                sw, cw = _sincos(ph)
                xr = sxr[...]
                xi = sxi[...]
                wr_ = (xr * cw + xi * sw) * mask
                wi_ = (xi * cw - xr * sw) * mask

                # ---- shared-gather bit-packed replica --------------------
                # base MUST be computed with the same f32 op sequence as
                # the min-offset tap's fl (cph + f32(min_off), then +0.5)
                # so rel >= 0 holds bitwise, not just mathematically
                cph = rem_b + step_b * k
                tap_ph_min = cph + jnp.float32(min_off)
                if interp_code:
                    base = jnp.floor(tap_ph_min + 0.5)
                else:
                    base = jnp.floor(tap_ph_min)
                m_mod = base - lf * jnp.floor(base / lf)
                lane_f = jnp.floor(m_mod * jnp.float32(1.0 / PACK))
                j_i = (m_mod - jnp.float32(PACK) * lane_f).astype(jnp.int32)
                if nq == 1:
                    q = jnp.float32(0.0)
                    r = lane_f.astype(jnp.int32)
                else:
                    q = jnp.floor(lane_f * jnp.float32(1.0 / LANES))
                    r = (lane_f - q * LANES).astype(jnp.int32)

                def extract(p):
                    bit = jax.lax.shift_right_logical(p, j_i) & jnp.int32(1)
                    return bit.astype(jnp.float32) * 2.0 - 1.0

                chips = [extract(gather_tbl(code_ref, si, q, r))
                         for si in range(n_shift)]
                if track_pilot:
                    dchips = [extract(gather_tbl(dcode_ref, si, q, r))
                              for si in range(n_shift)]

                def tap_val(ch_list, off_chips):
                    # rel = fl - base is 0..s_hi by monotonicity of f32
                    # rounding (off >= min_off); the >= cascade clamps the
                    # one-ulp edge case rel = s_hi + 1 to s_hi
                    tap_ph = cph + jnp.float32(off_chips)
                    if interp_code:
                        fl = jnp.floor(tap_ph + 0.5)
                        rel = fl - base
                        cur = ch_list[-s_lo]
                        prev = ch_list[-s_lo - 1]
                        for rr in range(1, s_hi + 1):
                            ge = rel >= jnp.float32(rr)
                            cur = jnp.where(ge, ch_list[rr - s_lo], cur)
                            prev = jnp.where(
                                ge, ch_list[rr - s_lo - 1], prev)
                        d = tap_ph - fl
                        wgt = jnp.clip(d / step_b + 0.5, 0.0, 1.0)
                        return prev + (cur - prev) * wgt
                    fl = jnp.floor(tap_ph)
                    rel = fl - base
                    cur = ch_list[-s_lo]
                    for rr in range(1, s_hi + 1):
                        cur = jnp.where(rel >= jnp.float32(rr),
                                        ch_list[rr - s_lo], cur)
                    return cur

                sums = []
                for ti in range(t):
                    blk = tap_val(chips, offs[ti])
                    sums.append(jnp.sum(wr_ * blk, axis=1, keepdims=True))
                    sums.append(jnp.sum(wi_ * blk, axis=1, keepdims=True))
                if track_pilot:
                    dblk = tap_val(dchips, 0.0)
                    sums.append(jnp.sum(wr_ * dblk, axis=1, keepdims=True))
                    sums.append(jnp.sum(wi_ * dblk, axis=1, keepdims=True))
                red = reduce_cols(sums)
                taps_re = [red[2 * ti] for ti in range(t)]
                taps_im = [red[2 * ti + 1] for ti in range(t)]
                if track_pilot:
                    d_re, d_im = red[2 * t], red[2 * t + 1]
                else:
                    d_re, d_im = taps_re[p_idx], taps_im[p_idx]

                # ---- secondary-code wipeoff ------------------------------
                # Mosaic's gather lowering needs index shape == operand
                # shape: broadcast the per-channel phase across lanes and
                # keep lane 0 of the (identical) gathered row
                sec_i = sec_idx

                def _sec_chip(tbl_ref, period):
                    idx = (sec_i - jnp.float32(period)
                           * jnp.floor(sec_i / jnp.float32(period)))
                    idxb = jnp.broadcast_to(
                        idx.astype(jnp.int32), (c, LANES))
                    g = jnp.take_along_axis(tbl_ref[...], idxb, axis=1)
                    return g[:, 0:1]

                if track_pilot and sp > 1:
                    wipe_p = jnp.where(sec_act > 0.5,
                                       _sec_chip(sec_p_ref, sp),
                                       jnp.float32(1.0))
                else:
                    wipe_p = jnp.float32(1.0)
                if track_pilot and sd > 1:
                    wipe_d = jnp.where(sec_act > 0.5,
                                       _sec_chip(sec_d_ref, sd),
                                       jnp.float32(1.0))
                else:
                    wipe_d = jnp.float32(1.0)

                # ---- coherent accumulation -------------------------------
                for ti in range(t):
                    acc[2 * ti] = acc[2 * ti] + taps_re[ti] * wipe_p
                    acc[2 * ti + 1] = acc[2 * ti + 1] + taps_im[ti] * wipe_p
                acc_n_new = acc_n + n
                icount_new = jnp.where(eng, icount + 1.0, icount * 0.0)
                boundary = (icount_new >= integ_len) & eng
                bf = boundary.astype(jnp.float32)
                accd_re_new = accd_re + d_re * wipe_d
                accd_im_new = accd_im + d_im * wipe_d
                accd_cnt_new = accd_cnt + 1.0
                if sd > 1:
                    sd_pos = (sec_i - jnp.float32(sd)
                              * jnp.floor(sec_i / jnp.float32(sd)))
                    data_boundary = (sd_pos == jnp.float32(sd - 1)) & eng
                else:
                    data_boundary = eng
                dbf = data_boundary.astype(jnp.float32)
                sec_n = sec_i + 1.0
                sec_next = jnp.where(
                    eng,
                    sec_n - jnp.float32(lcm) * jnp.floor(
                        sec_n / jnp.float32(lcm)),
                    sec_idx)

                # ---- discriminators on accumulated taps ------------------
                t_int = acc_n_new * inv_fs
                p_re = acc[2 * p_idx]
                p_im = acc[2 * p_idx + 1]
                costas = _atan(p_im / jnp.where(
                    jnp.abs(p_re) < 1e-20, jnp.float32(1e-20), p_re))
                carr_err = jnp.where(
                    atan2f > 0.5, _atan2(p_im, p_re), costas) / two_pi
                cross = prev_re * p_im - prev_im * p_re
                dot = prev_re * p_re + prev_im * p_im
                freq_err = _atan(cross / jnp.where(
                    jnp.abs(dot) < 1e-20, jnp.float32(1e-20), dot)) / (
                    two_pi * jnp.maximum(t_int, jnp.float32(1e-20)))

                e_re, e_im = acc[2 * (p_idx - 1)], acc[2 * (p_idx - 1) + 1]
                l_re, l_im = acc[2 * (p_idx + 1)], acc[2 * (p_idx + 1) + 1]
                e_mag = jnp.sqrt(e_re * e_re + e_im * e_im)
                l_mag = jnp.sqrt(l_re * l_re + l_im * l_im)
                if t == 5:
                    ve = jnp.sqrt(acc[0] ** 2 + acc[1] ** 2)
                    vl = jnp.sqrt(acc[8] ** 2 + acc[9] ** 2)
                    num = (e_mag + ve) - (l_mag + vl)
                    den = (e_mag + ve) + (l_mag + vl)
                else:
                    num = e_mag - l_mag
                    den = e_mag + l_mag
                code_err = jnp.float32(0.5) * num / jnp.maximum(den, 1e-20)

                # ---- loop filters (boundary-gated) -----------------------
                pll_i1_a = pll_i1 + jnp.where(
                    boundary & (fllf > 0.5),
                    w0f * w0f * freq_err * t_int, 0.0)
                if pll_order == 1:
                    pll_i1_u, pll_i2_u = pll_i1_a, pll_i2
                    pll_out = 4.0 * pll_bw * carr_err
                elif pll_order == 2:
                    pll_i1_u = pll_i1_a + w0p * w0p * carr_err * t_int
                    pll_i2_u = pll_i2
                    pll_out = pll_i1_u + jnp.float32(1.414) * w0p * carr_err
                else:
                    pll_i2_u = pll_i2 + (w0p ** 3) * carr_err * t_int
                    pll_i1_u = pll_i1_a + t_int * (
                        pll_i2_u + jnp.float32(1.1) * w0p * w0p * carr_err)
                    pll_out = pll_i1_u + jnp.float32(2.4) * w0p * carr_err
                if dll_order == 1:
                    dll_i1_u, dll_i2_u = dll_i1, dll_i2
                    dll_out = 4.0 * dll_bw * code_err
                elif dll_order == 2:
                    dll_i1_u = dll_i1 + w0d * w0d * code_err * t_int
                    dll_i2_u = dll_i2
                    dll_out = dll_i1_u + jnp.float32(1.414) * w0d * code_err
                else:
                    dll_i2_u = dll_i2 + (w0d ** 3) * code_err * t_int
                    dll_i1_u = dll_i1 + t_int * (
                        dll_i2_u + jnp.float32(1.1) * w0d * w0d * code_err)
                    dll_out = dll_i1_u + jnp.float32(2.4) * w0d * code_err

                pll_i1_n = jnp.where(boundary, pll_i1_u, pll_i1)
                pll_i2_n = jnp.where(boundary, pll_i2_u, pll_i2)
                dll_i1_n = jnp.where(boundary, dll_i1_u, dll_i1)
                dll_i2_n = jnp.where(boundary, dll_i2_u, dll_i2)
                doppler_new = jnp.where(boundary, pll_out, doppler)
                dcode_new = jnp.where(
                    boundary, doppler_new * aid_ratio - dll_out, dcode)

                # ---- NCO advance -----------------------------------------
                if fdma:
                    dphi = ((two_pi * inv_fs) * doppler + w_off) * n
                else:
                    dphi = (two_pi * inv_fs) * doppler * n
                phase0_adv = phase0 + dphi
                phase0_adv = phase0_adv - two_pi * jnp.floor(
                    phase0_adv / two_pi)
                rem_adv = jnp.maximum(
                    rem + ((n - spcf) * code_step + c0 + spcf * delta), 0.0)
                pos_new = jnp.where(eng, pos + n, pos)
                rem_new = jnp.where(eng, rem_adv, rem)
                phase_new = jnp.where(eng, phase0_adv, phase0)
                dop_out = jnp.where(eng, doppler_new, doppler)
                dcode_out = jnp.where(eng, dcode_new, dcode)

                prev_re_n = jnp.where(boundary, p_re, prev_re)
                prev_im_n = jnp.where(boundary, p_im, prev_im)

                # ---- pack + store the period row -------------------------
                row = jnp.zeros((c, LANES), jnp.float32)
                for ti in range(t):
                    row = (row
                           + jnp.where(lane1 == 2 * ti, taps_re[ti], 0.0)
                           + jnp.where(lane1 == 2 * ti + 1,
                                       taps_im[ti], 0.0)
                           + jnp.where(lane1 == LANE_ACC0 + 2 * ti,
                                       acc[2 * ti], 0.0)
                           + jnp.where(lane1 == LANE_ACC0 + 2 * ti + 1,
                                       acc[2 * ti + 1], 0.0))
                for ln, v in (
                    (LANE_N, n), (LANE_DOPPLER, dop_out),
                    (LANE_DCODE, dcode_out), (LANE_REM, rem_new),
                    (LANE_PHASE, phase_new), (LANE_PLL_I1, pll_i1_n),
                    (LANE_DLL_I1, dll_i1_n), (LANE_POS, pos_new),
                    (LANE_PLL_I2, pll_i2_n), (LANE_DLL_I2, dll_i2_n),
                    (LANE_BOUND, bf), (LANE_ACC_N, acc_n_new),
                    (LANE_DATA_RE, accd_re_new),
                    (LANE_DATA_IM, accd_im_new),
                    (LANE_DATA_BOUND, dbf), (LANE_DATA_CNT, accd_cnt_new),
                    (LANE_SEC_IDX, sec_next),
                    (LANE_ICOUNT, jnp.where(boundary, 0.0, icount_new)),
                    (LANE_PREV_RE, prev_re_n), (LANE_PREV_IM, prev_im_n),
                ):
                    row = row + jnp.where(lane1 == ln, v, 0.0)
                o_ref[pl.ds(i * c, c), :] = row

                acc_out = [jnp.where(boundary, 0.0, a) for a in acc]
                return (nb, pos_new, rem_new, dcode_out, phase_new,
                        dop_out,
                        pll_i1_n, pll_i2_n, dll_i1_n, dll_i2_n,
                        jnp.where(boundary, 0.0, icount_new),
                        jnp.where(boundary, 0.0, acc_n_new),
                        sec_next, prev_re_n, prev_im_n,
                        jnp.where(data_boundary, 0.0, accd_re_new),
                        jnp.where(data_boundary, 0.0, accd_im_new),
                        jnp.where(data_boundary, 0.0, accd_cnt_new),
                        *acc_out)

            # prologue: issue period 0's block DMA into slot 0
            pos0 = scal_ref[:, S_POS:S_POS + 1]
            r0_0 = jnp.floor(pos0 * jnp.float32(1.0 / LANES))
            posm0 = jnp.min(jnp.where(
                scal_ref[:, S_EN:S_EN + 1] > 0.5, r0_0, jnp.float32(1e9)))
            spos[...] = jnp.concatenate(
                [r0_0, jnp.full((c, 1), posm0)], axis=1)
            base0 = jnp.clip(spos[0, 1].astype(jnp.int32) - 1,
                             0, wrows_total - blk_rows)
            pltpu.make_async_copy(
                wr_ref.at[pl.ds(base0, blk_rows)],
                wbr.at[pl.ds(0, blk_rows)], sem_r).start()
            pltpu.make_async_copy(
                wi_ref.at[pl.ds(base0, blk_rows)],
                wbi.at[pl.ds(0, blk_rows)], sem_i).start()

            init = (base0,) + tuple(
                scal_ref[:, s:s + 1] for s in (
                    S_POS, S_REM, S_DCODE, S_PHASE, S_DOP,
                    S_PLL_I1, S_PLL_I2, S_DLL_I1, S_DLL_I2,
                    S_INTEG_CNT, S_ACC_N, S_SEC_IDX,
                    S_PREV_RE, S_PREV_IM,
                    S_ACCD_RE, S_ACCD_IM, S_ACCD_CNT)
            ) + tuple(scal_ref[:, S_ACC0 + jj:S_ACC0 + jj + 1]
                      for jj in range(2 * t))
            final = jax.lax.fori_loop(0, n_periods, body, init)
            # drain the dangling DMA issued by the last period
            last_slot = (n_periods % 2) * blk_rows
            pltpu.make_async_copy(
                wr_ref.at[pl.ds(final[0], blk_rows)],
                wbr.at[pl.ds(last_slot, blk_rows)], sem_r).wait()
            pltpu.make_async_copy(
                wi_ref.at[pl.ds(final[0], blk_rows)],
                wbi.at[pl.ds(last_slot, blk_rows)], sem_i).wait()

        return kernel

    calls: dict[tuple, object] = {}

    def track(wr, wi, codes_b, scalars, dcodes_b=None, sec_p=None,
              sec_d=None):
        c_in = scalars.shape[0]
        c = -(-c_in // 8) * 8        # pad channels to a sublane multiple
        br = c * rows_p
        assert codes_b.shape[1] == br, (
            f"codes_b rows {codes_b.shape[1]} != C8*rows_p {br} "
            "(pack with track.pack)")
        if c != c_in:
            # padded channels: enabled=0, pos=0 — harmless, discarded
            scalars = jnp.pad(scalars, ((0, c - c_in), (0, 0)))
            if sec_p is not None:
                sec_p = jnp.pad(sec_p, ((0, c - c_in), (0, 0)),
                                constant_values=1.0)
                sec_d = jnp.pad(sec_d, ((0, c - c_in), (0, 0)),
                                constant_values=1.0)
        wrows = wr.shape[0]
        assert wrows >= blk_rows, (
            f"window rows {wrows} < DMA block {blk_rows}; pad the window")
        key = (c, wrows)
        if key not in calls:
            scratch = [pltpu.VMEM((br, LANES), jnp.float32),
                       pltpu.VMEM((br, LANES), jnp.float32),
                       pltpu.VMEM((c, 2), jnp.float32),
                       pltpu.VMEM((2 * blk_rows, LANES), jnp.float32),
                       pltpu.VMEM((2 * blk_rows, LANES), jnp.float32),
                       pltpu.SemaphoreType.DMA,
                       pltpu.SemaphoreType.DMA]
            in_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)]  # scalars
            if track_pilot:
                in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM),
                             pl.BlockSpec(memory_space=pltpu.VMEM)]
            in_specs += [
                pl.BlockSpec(memory_space=pl.ANY),              # wr (HBM)
                pl.BlockSpec(memory_space=pl.ANY),              # wi (HBM)
                pl.BlockSpec(memory_space=pltpu.VMEM),          # codes
            ]
            if track_pilot:
                in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
            kwargs = {}
            if not interpret:
                # the default 16 MB scoped-VMEM budget is too small for
                # long-code multi-channel plans (expanded packed tables +
                # staging + the K*C output); v5e has 128 MB physical
                kwargs["compiler_params"] = pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024)
            calls[key] = pl.pallas_call(
                make_kernel(c),
                out_shape=jax.ShapeDtypeStruct((n_periods * c, LANES),
                                               jnp.float32),
                in_specs=in_specs,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=scratch,
                interpret=interpret,
                **kwargs,
            )
        with jax.enable_x64(False):
            if track_pilot:
                # secondary tables ride as [C, 128] lane-padded rows
                def pad128(x):
                    return jnp.pad(x, ((0, 0), (0, LANES - x.shape[1])))
                out = calls[key](scalars, pad128(sec_p), pad128(sec_d),
                                 wr, wi, codes_b, dcodes_b)
            else:
                out = calls[key](scalars, wr, wi, codes_b)
        out = out.reshape(n_periods, c, LANES)
        return jnp.transpose(out, (1, 0, 2))[:c_in]

    def pack(codes: np.ndarray) -> np.ndarray:
        codes = np.asarray(codes, np.float32)
        c_in = codes.shape[0]
        c8 = -(-c_in // 8) * 8
        if c8 != c_in:
            codes = np.concatenate(
                [codes, np.ones((c8 - c_in, codes.shape[1]), np.float32)],
                axis=0)
        return pack_codes_blocked(codes, rows_p, s_lo, s_hi)

    track.rows_p = rows_p
    track.pad_rows = blk_rows + 1        # window guard the wrapper must pad
    track.blk_rows = blk_rows
    # enabled channels must fit one DMA block: max allowed spread of
    # window-relative sample positions (tracker checks before launching)
    track.max_spread_samples = (blk_rows - rows_p - 2) * LANES
    track.n_periods = n_periods
    track.num_scalars = ns
    track.replica = "blocked"
    track.pack = pack
    return track
