"""Fused multi-period tracking kernel: the whole DLL/PLL loop in Mosaic.

The per-period tracking step is tiny (32 channels x 2600 samples x 3 taps
~= 22 MFLOP) but strictly sequential — the NCO update for period i+1 needs
period i's correlations (reference dll_pll_veml_tracking.cc general_work,
one block per PRN period). Driving that loop from XLA costs a fixed
~25 us kernel-dispatch + scan-step overhead per period on this runtime,
which caps the whole receiver at ~0.6 Gsamples/s regardless of how fast
the correlator itself is.

This kernel moves the *entire* loop on-chip: one launch processes K code
periods for every channel, with the carrier/code NCOs, Costas/NELP
discriminators, and 2nd-order loop filters iterating in kernel registers
(scalar carries of a fori_loop). Sample access needs no realignment:
each period reads rows [pos//128, pos//128+ROWS) of the resident
(re, im) sample window and expresses the local sample index as
k = global_index - pos, so carrier phase (phase0 + ph_step*k) and code
phase (rem + code_step*k) stay linear in the lane coordinate, with a
0 <= k < n mask for the period boundary. The code replica uses the same
(row, lane) chip-gather decomposition as ops/correlator.py, with the
soft chip-transition ramps of dll_pll.track_block.

Scope (the steady-state hot path; everything else stays on the XLA path
of tracking/dll_pll.py): 3/5-tap CDMA tracking, Costas PLL + NELP/VEML
DLL (order 1/2/3), carrier-aided code NCO, per-period integration
(extended integration, FDMA, pilot/secondary and KF modes fall back to
track_block).

Precision: phase is kept reduced mod 2pi (f32 ~4e-7 rad resolution);
code frequency is carried as a delta from the nominal chip rate
(f32 ~2e-4 Hz); pos is an exact f32 integer (< 2^24). The f64
carrier-phase/TOW bookkeeping the observables need is reconstructed in
f64 by the XLA wrapper from the per-period outputs (n, doppler rows).

atan is the Cephes 2-stage argument reduction + degree-9 polynomial
(Mosaic has no atan2 primitive); max error ~1 ulp f32 — far below the
discriminators' thermal noise floor.

Reference analog: the one hand-written kernel that matters — the
volk_gnsssdr rotator-dot-product family plus run_dll_pll or, closer in
spirit, an FPGA tracking channel (the reference offloads exactly this
loop to hardware in its _FPGA adapters, fpga_multicorrelator.cc).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128

# output lane layout (per period row): see _pack_row below
LANE_N = 10          # samples consumed this period
LANE_DOPPLER = 11    # carrier doppler after update, Hz
LANE_DCODE = 12      # code-frequency delta from nominal, Hz
LANE_REM = 13        # remnant code phase after period, chips
LANE_PHASE = 14      # carrier phase (mod 2pi) after period, rad
LANE_PLL_I1 = 15     # PLL integrator
LANE_DLL_I1 = 16     # DLL integrator
LANE_POS = 17        # absolute sample position after period
LANE_PLL_I2 = 18     # PLL 2nd integrator (order 3)
LANE_DLL_I2 = 19     # DLL 2nd integrator (order 3)


def _pad128(n: int) -> int:
    return ((n + LANES - 1) // LANES) * LANES


def pack_code_table_ext(codes: np.ndarray, margin_chips: int = 192):
    """[C, L] chips -> [C, QE, 128] extended table with one leading guard
    row and ``margin_chips`` of wrap-around at the end, so one code
    period's chip phases index it WITHOUT a mod:
    table[i] = code[(i - 128) mod L] for i in [0, 128 + L + margin).
    """
    c, l = codes.shape
    n_ext = 128 + l + margin_chips
    idx = (np.arange(n_ext) - 128) % l
    ext = codes[:, idx].astype(np.float32)
    pad = _pad128(n_ext) - n_ext
    ext = np.pad(ext, ((0, 0), (0, pad)))
    return ext.reshape(c, -1, LANES)


def _atan(x):
    """Cephes atanf: reduce to |t| <= tan(pi/8), degree-7 poly."""
    sgn = jnp.sign(x)
    ax = jnp.abs(x)
    big = ax > 2.414213562373095
    mid = ax > 0.4142135623730950
    x1 = jnp.where(big, -1.0 / jnp.maximum(ax, 1e-30),
                   jnp.where(mid, (ax - 1.0) / (ax + 1.0), ax))
    y0 = jnp.where(big, jnp.float32(np.pi / 2),
                   jnp.where(mid, jnp.float32(np.pi / 4), jnp.float32(0.0)))
    z = x1 * x1
    p = jnp.float32(8.05374449538e-2)
    for c in (-1.38776856032e-1, 1.99777106478e-1, -3.33329491539e-1):
        p = p * z + jnp.float32(c)
    r = y0 + p * z * x1 + x1
    return sgn * r


def make_fused_tracker(
    n_periods: int,            # K code periods per launch
    n_max: int,                # max samples per period
    code_len: int,             # chips per code period
    num_taps: int,
    tap_offsets: np.ndarray,   # [T] chips
    *,
    fs: float,
    code_rate_cps: float,
    carrier_freq_hz: float,
    pll_bw_hz: float,
    dll_bw_hz: float,
    pll_order: int = 2,
    dll_order: int = 2,
    el_spacing_chips: float = 0.5,
    interp_code: bool = True,
    replica: str = "auto",
    interpret: bool | None = None,
):
    """Build the fused K-period tracker.

    Returns f(wr [WR, 128], wi [WR, 128], codes_q [C, Q, 128],
    scalars [C, 10]) -> [C, K, 128] f32 per-period lane-packed rows.

    scalars: [pos, rem_code_phase, code_freq_delta_hz, carrier_phase,
    carrier_doppler_hz, pll_i1, dll_i1, enabled, pll_i2, dll_i2] per
    channel (the i2 slots let order-3 loop filters round-trip across
    launches). Lanes of each output row: [2t, 2t+1] = tap t re/im, then
    the LANE_* fields.
    """
    rows_p = (n_max + 127) // LANES + 1      # sample rows per period
    lpad = _pad128(code_len)
    q_rows = lpad // LANES
    if replica == "auto":
        # the q-row select loop costs O(code_len/128) passes per gather
        # set — cheaper than window2's per-row staging for short codes,
        # fatal for 10230-chip L5/E5 codes
        replica = "qloop" if q_rows <= 16 else "window2"
    if replica == "window2":
        # extended no-mod table (pack_code_table_ext): guard row + wrap
        q_rows = _pad128(128 + code_len + 192) // LANES
    t = num_taps
    p_idx = t // 2
    offs = [float(o) for o in np.asarray(tap_offsets, np.float32)]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    inv_fs = np.float32(1.0 / fs)
    two_pi = np.float32(2.0 * np.pi)
    code_lenf = np.float32(code_len)
    nominal_step = np.float64(code_rate_cps / fs)   # chips/sample, f64 const
    aid_ratio = np.float32(code_rate_cps / carrier_freq_hz)
    # small-quantity code-phase bookkeeping (see make_fused_tracker_full)
    spc = float(np.round(fs * code_len / code_rate_cps))
    c0 = np.float32(spc * float(nominal_step) - code_len)
    spcf = np.float32(spc)
    # loop filter constants
    w0p = np.float32(pll_bw_hz / (0.53 if pll_order == 2 else
                                  (0.7845 if pll_order == 3 else 0.25)))
    w0d = np.float32(dll_bw_hz / (0.53 if dll_order == 2 else
                                  (0.7845 if dll_order == 3 else 0.25)))

    def _replica(code_ref, tap_ph):
        """[R, 128] chip phases -> chip values via (row, lane) gathers."""
        ph_floor = jnp.floor(tap_ph)
        lf = jnp.float32(code_len)
        idx = ph_floor - jnp.floor(ph_floor / lf) * lf
        q = jnp.floor(idx * jnp.float32(1.0 / LANES))
        r = (idx - q * LANES).astype(jnp.int32)
        out = jnp.zeros(tap_ph.shape, jnp.float32)
        for qq in range(q_rows):
            opr = jnp.broadcast_to(code_ref[0, qq, :][None, :],
                                   (tap_ph.shape[0], LANES))
            g = jnp.take_along_axis(opr, r, axis=1)
            out = out + jnp.where(q == jnp.float32(qq), g, 0.0)
        return out, ph_floor

    def kernel(s_ref, wr_ref, wi_ref, code_ref, o_ref, scr_a=None,
               scr_b=None):
        ch = pl.program_id(0)
        lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
        kin = (jax.lax.broadcasted_iota(jnp.int32, (rows_p, LANES), 0) * LANES
               + jax.lax.broadcasted_iota(jnp.int32, (rows_p, LANES), 1))

        def body(i, carry):
            (pos, rem, dcode, phase0, doppler,
             pll_i1, pll_i2, dll_i1, dll_i2) = carry
            delta = dcode * inv_fs
            code_step = jnp.float32(nominal_step) + delta
            small = rem + c0 + spcf * delta
            n_f = spcf - small / code_step
            # round + negative-remnant correction (not epsilon-ceil):
            # guarantees the post-period remnant lands in [0, code_step)
            # — see make_fused_tracker_full for the failure mode
            n0 = jnp.floor(n_f + jnp.float32(0.5))
            rem0 = rem + ((n0 - spcf) * code_step + c0 + spcf * delta)
            addf = (rem0 < 0.0).astype(jnp.float32)
            n = jnp.clip(n0 + addf, 1.0, jnp.float32(n_max))

            r0 = jnp.floor(pos * jnp.float32(1.0 / LANES))
            off = pos - r0 * LANES
            r0i = r0.astype(jnp.int32)
            xr = wr_ref[pl.ds(r0i, rows_p), :]
            xi = wi_ref[pl.ds(r0i, rows_p), :]
            k = kin.astype(jnp.float32) - off      # sample index rel. pos
            mask = ((k >= 0.0) & (k < n)).astype(jnp.float32)

            ph = phase0 + (two_pi * inv_fs) * doppler * k
            cw = jnp.cos(ph)
            sw = jnp.sin(ph)
            wr_ = (xr * cw + xi * sw) * mask
            wi_ = (xi * cw - xr * sw) * mask

            cph = rem + code_step * k              # chips (masked lanes ok)

            if replica == "window2":
                # ---- O(1)-in-code-length replica --------------------------
                # The chip index is monotonic at ~code_step chips/sample, so
                # one 128-sample row only spans ~128*code_step (+tap/interp
                # margin) < 128 chips: TWO consecutive rows of the extended
                # (guard + wrap, no-mod) code table cover every lookup of
                # the row. An assembly loop stages those rows per sample
                # row into scratch; all gathers are then single lane-wise
                # take_along_axis + A/B select — independent of code length
                # (the q-loop fallback scales O(L/128) passes, fatal for
                # L5/E5 10230-chip codes).
                def fill(r, carry):
                    k0 = jnp.float32(LANES) * r.astype(jnp.float32) - off
                    qa = jnp.floor((rem + code_step * k0
                                    + jnp.float32(126.0))
                                   * jnp.float32(1.0 / LANES))
                    qai = qa.astype(jnp.int32)
                    scr_a[pl.ds(r, 1), :] = code_ref[0, pl.ds(qai, 1), :]
                    scr_b[pl.ds(r, 1), :] = code_ref[0, pl.ds(qai + 1, 1), :]
                    return carry
                jax.lax.fori_loop(0, rows_p, fill, 0)
                qa_vec = jnp.floor((cph[:, 0:1] + jnp.float32(126.0))
                                   * jnp.float32(1.0 / LANES))
                srA = scr_a[...]
                srB = scr_b[...]
                base = jnp.float32(LANES) - qa_vec * jnp.float32(LANES)

                def gat(pos):
                    # pos: extended-table chip index rel. to scratch rowA
                    posi = pos.astype(jnp.int32)
                    in_a = posi < LANES
                    g_a = jnp.take_along_axis(
                        srA, jnp.clip(posi, 0, LANES - 1), axis=1)
                    g_b = jnp.take_along_axis(
                        srB, jnp.clip(posi - LANES, 0, LANES - 1), axis=1)
                    return jnp.where(in_a, g_a, g_b)

                taps_re = []
                taps_im = []
                for ti in range(t):
                    tap_ph = cph + jnp.float32(offs[ti])
                    if interp_code:
                        b = tap_ph + 0.5
                        fl = jnp.floor(b)
                        ext_pos = fl + base
                        c_prev = gat(ext_pos - 1.0)
                        c_cur = gat(ext_pos)
                        d = tap_ph - fl
                        wgt = jnp.clip(d / code_step + 0.5, 0.0, 1.0)
                        blk = c_prev + (c_cur - c_prev) * wgt
                    else:
                        blk = gat(jnp.floor(tap_ph) + base)
                    taps_re.append(jnp.sum(wr_ * blk))
                    taps_im.append(jnp.sum(wi_ * blk))
            else:
                # taps x interp positions stacked into one gather set
                tap_ph = jnp.concatenate(
                    [cph + jnp.float32(o) for o in offs], axis=0)
                if interp_code:
                    # 2-gather soft replica: each chip transition ramps over
                    # one sampling cell CENTERED on the chip boundary. With
                    # b = tap_ph + 0.5 and fl = floor(b), the nearest
                    # boundary is at chip fl, d = tap_ph - fl in [-0.5, 0.5):
                    #   ctap = lerp(code[fl-1], code[fl], clip(d/w + 0.5))
                    # — algebraically identical to the 3-gather
                    # ramp_in/ramp_out form in dll_pll.track_block
                    b = tap_ph + 0.5
                    big = jnp.concatenate([b - 1.0, b], axis=0)
                    vals, floors = _replica(code_ref, big)
                    m = t * rows_p
                    c_prev = vals[0:m]
                    c_cur = vals[m:2 * m]
                    d = tap_ph - (floors[0:m] + 1.0)   # tap_ph - floor(b)
                    w = jnp.clip(d / code_step + 0.5, 0.0, 1.0)
                    ctap = c_prev + (c_cur - c_prev) * w
                else:
                    ctap, _ = _replica(code_ref, tap_ph)

                taps_re = []
                taps_im = []
                for ti in range(t):
                    blk = ctap[ti * rows_p:(ti + 1) * rows_p]
                    taps_re.append(jnp.sum(wr_ * blk))
                    taps_im.append(jnp.sum(wi_ * blk))

            # ---- discriminators (discriminators.py analogs, f32) ----------
            p_re = taps_re[p_idx]
            p_im = taps_im[p_idx]
            carr_err = _atan(
                p_im / jnp.where(jnp.abs(p_re) < 1e-20, 1e-20, p_re)
            ) / two_pi                                       # cycles
            e_mag = jnp.sqrt(taps_re[p_idx - 1] ** 2
                             + taps_im[p_idx - 1] ** 2)
            l_mag = jnp.sqrt(taps_re[p_idx + 1] ** 2
                             + taps_im[p_idx + 1] ** 2)
            # normalized E-L envelope, 0.5*(E-L)/(E+L)
            # (discriminators.dll_nelp / dll_veml)
            if t == 5:
                ve = jnp.sqrt(taps_re[0] ** 2 + taps_im[0] ** 2)
                vl = jnp.sqrt(taps_re[4] ** 2 + taps_im[4] ** 2)
                num = (e_mag + ve) - (l_mag + vl)
                den = (e_mag + ve) + (l_mag + vl)
            else:
                num = e_mag - l_mag
                den = e_mag + l_mag
            code_err = jnp.float32(0.5) * num / jnp.maximum(den, 1e-20)

            # ---- loop filters (loop_filter.py loop_filter_step) -----------
            t_int = n * inv_fs
            if pll_order == 1:
                pll_out = 4.0 * jnp.float32(pll_bw_hz) * carr_err
            elif pll_order == 2:
                pll_i1 = pll_i1 + w0p * w0p * carr_err * t_int
                pll_out = pll_i1 + jnp.float32(1.414) * w0p * carr_err
            else:
                pll_i2 = pll_i2 + (w0p ** 3) * carr_err * t_int
                pll_i1 = pll_i1 + t_int * (
                    pll_i2 + jnp.float32(1.1) * w0p * w0p * carr_err)
                pll_out = pll_i1 + jnp.float32(2.4) * w0p * carr_err
            if dll_order == 1:
                dll_out = 4.0 * jnp.float32(dll_bw_hz) * code_err
            elif dll_order == 2:
                dll_i1 = dll_i1 + w0d * w0d * code_err * t_int
                dll_out = dll_i1 + jnp.float32(1.414) * w0d * code_err
            else:
                dll_i2 = dll_i2 + (w0d ** 3) * code_err * t_int
                dll_i1 = dll_i1 + t_int * (
                    dll_i2 + jnp.float32(1.1) * w0d * w0d * code_err)
                dll_out = dll_i1 + jnp.float32(2.4) * w0d * code_err

            # ---- NCO advance (track_block "advance NCO state") ------------
            # phase advances with the pre-update doppler, then the new
            # doppler takes effect next period — matching the XLA path
            dphi = (two_pi * inv_fs) * doppler * n
            phase0_new = phase0 + dphi
            phase0_new = phase0_new - two_pi * jnp.floor(
                phase0_new / two_pi)
            doppler_new = pll_out
            dcode_new = doppler_new * aid_ratio - dll_out
            rem_new = jnp.maximum(
                rem + ((n - spcf) * code_step + c0 + spcf * delta), 0.0)
            pos_new = pos + n

            # ---- pack + store the period row ------------------------------
            row = jnp.zeros((1, LANES), jnp.float32)
            for ti in range(t):
                row = (row
                       + jnp.where(lane1 == 2 * ti, taps_re[ti], 0.0)
                       + jnp.where(lane1 == 2 * ti + 1, taps_im[ti], 0.0))
            for ln, v in (
                (LANE_N, n), (LANE_DOPPLER, doppler_new),
                (LANE_DCODE, dcode_new), (LANE_REM, rem_new),
                (LANE_PHASE, phase0_new), (LANE_PLL_I1, pll_i1),
                (LANE_DLL_I1, dll_i1), (LANE_POS, pos_new),
                (LANE_PLL_I2, pll_i2), (LANE_DLL_I2, dll_i2),
            ):
                row = row + jnp.where(lane1 == ln, v, 0.0)
            o_ref[0, pl.ds(i, 1), :] = row

            return (pos_new, rem_new, dcode_new, phase0_new, doppler_new,
                    pll_i1, pll_i2, dll_i1, dll_i2)

        # carry = (pos, rem, dcode, phase0, doppler,
        #          pll_i1, pll_i2, dll_i1, dll_i2); scalar block slots are
        # [pos, rem, dcode, phase, doppler, pll_i1, dll_i1, enabled,
        #  pll_i2, dll_i2] — note pll_i2/dll_i2 ride in slots 8/9 so the
        # order-3 integrators round-trip across launches
        init = (s_ref[ch, 0], s_ref[ch, 1], s_ref[ch, 2], s_ref[ch, 3],
                s_ref[ch, 4], s_ref[ch, 5], s_ref[ch, 8], s_ref[ch, 6],
                s_ref[ch, 9])
        jax.lax.fori_loop(0, n_periods, body, init)

    calls: dict[tuple, object] = {}

    def track(wr, wi, codes_q, scalars):
        """wr/wi: [WR, 128] f32 window; codes_q: [C, Q, 128];
        scalars: [C, 10] f32 -> [C, K, 128] f32."""
        c = codes_q.shape[0]
        wrows = wr.shape[0]
        key = (c, wrows)
        if key not in calls:
            scratch = []
            if replica == "window2":
                scratch = [pltpu.VMEM((rows_p, LANES), jnp.float32),
                           pltpu.VMEM((rows_p, LANES), jnp.float32)]
            calls[key] = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((c, n_periods, LANES),
                                               jnp.float32),
                grid=(c,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),     # scalars
                    pl.BlockSpec((wrows, LANES), lambda ch: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((wrows, LANES), lambda ch: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, q_rows, LANES), lambda ch: (ch, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, n_periods, LANES),
                                       lambda ch: (ch, 0, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=scratch,
                interpret=interpret,
            )
        with jax.enable_x64(False):
            return calls[key](scalars, wr, wi, codes_q)

    track.rows_p = rows_p
    track.n_periods = n_periods
    return track


# ---------------------------------------------------------------------------
# Full receiver-semantics kernel: everything a locked channel needs on-chip
# ---------------------------------------------------------------------------
#
# The simple kernel above covers the steady-state 1-period CDMA loop; the
# full kernel below adds the remaining live-receiver semantics of
# tracking/dll_pll.py's scan step (reference dll_pll_veml_tracking.cc
# states 2-4, :1898-2260):
#   - per-channel enabled gating,
#   - extended coherent integration (integ_len periods per loop update,
#     accumulator carries, boundary-gated filter updates),
#   - pilot/secondary-code wipeoff + the data-component prompt correlator,
#   - FLL-assisted pull-in, four-quadrant atan2 PLL, per-channel
#     wide/narrow bandwidths as scalar inputs (no recompile on switch).
#
# Scalar input slots (SMEM [C, NS], NS = 24 + 2*T):
S_POS, S_REM, S_DCODE, S_PHASE, S_DOP = 0, 1, 2, 3, 4
S_PLL_I1, S_DLL_I1, S_EN, S_PLL_I2, S_DLL_I2 = 5, 6, 7, 8, 9
S_INTEG_LEN, S_INTEG_CNT, S_ACC_N, S_SEC_IDX, S_SEC_ACT = 10, 11, 12, 13, 14
S_ATAN2, S_FLL, S_PLL_BW, S_DLL_BW = 15, 16, 17, 18
S_PREV_RE, S_PREV_IM = 19, 20
S_ACCD_RE, S_ACCD_IM, S_ACCD_CNT = 21, 22, 23
S_ACC0 = 24                  # 2*T lanes: coherent tap accumulators re/im
# slot S_ACC0 + 2*T: FDMA carrier offset as REDUCED rad/sample (the
# per-channel GLONASS slot offset folded mod 2pi — MHz offsets are exact
# in this representation where raw Hz would overflow f32 phase)

# Extra output lanes (0..19 match the simple kernel's layout):
LANE_BOUND = 20              # loop updated after this period (0/1)
LANE_ACC_N = 21              # samples in the integration INCLUDING this period
LANE_ACC0 = 22               # 2*T lanes: accumulated taps re/im (pre-reset)
LANE_DATA_RE = 32            # data-component accumulator re (pre-reset)
LANE_DATA_IM = 33
LANE_DATA_BOUND = 34         # data symbol completed this period (0/1)
LANE_DATA_CNT = 35           # periods in the data accumulator (pre-reset)
LANE_SEC_IDX = 36            # secondary-phase counter AFTER this period
LANE_ICOUNT = 37             # integration counter after period (0 at boundary)
LANE_PREV_RE = 38            # FLL prev-prompt after any boundary update
LANE_PREV_IM = 39


def make_fused_tracker_full(
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
    replica: str = "auto",
    interpret: bool | None = None,
):
    """Build the full-semantics K-period tracker.

    Returns f(wr, wi, codes_q, scalars[, dcodes_q, sec_p, sec_d]) ->
    [C, K, 128] rows (lane layout above). ``scalars`` is [C, 24+2T]
    (slot constants S_*); pilot plans pass the data-code table and the
    per-channel secondary sequences ([C, sec_len_*] f32 +-1).

    Everything the XLA scan path (tracking/dll_pll.py _track_scan)
    computes per period is reproduced here in f32; the f64 carrier-phase
    bookkeeping is reconstructed by the wrapper (tracking/fused.py) from
    the per-period (n, doppler) outputs.
    """
    rows_p = (n_max + 127) // LANES + 1
    lpad = _pad128(code_len)
    q_rows = lpad // LANES
    if replica == "auto":
        replica = "qloop" if q_rows <= 16 else "window2"
    if replica == "window2":
        q_rows = _pad128(128 + code_len + 192) // LANES
    t = num_taps
    p_idx = t // 2
    offs = [float(o) for o in np.asarray(tap_offsets, np.float32)]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    ns = S_ACC0 + 2 * t + 1          # +1: FDMA reduced offset slot

    inv_fs = np.float32(1.0 / fs)
    two_pi = np.float32(2.0 * np.pi)
    code_lenf = np.float32(code_len)
    nominal_step = np.float64(code_rate_cps / fs)
    aid_ratio = np.float32(code_rate_cps / carrier_freq_hz)
    w0f = np.float32(fll_bw_hz / 0.53)
    pll_div = np.float32(0.53 if pll_order == 2 else 0.7845)
    dll_div = np.float32(0.53 if dll_order == 2 else 0.7845)
    sp, sd = int(sec_len_pilot), int(sec_len_data)
    lcm = int(sec_lcm)
    # Small-quantity code-phase bookkeeping: the naive per-period update
    # rem + n*code_step - code_len rounds f32 at magnitude ~code_len
    # (6e-5 chips/period at L=1023 — a systematic metres-per-minute
    # pseudorange drift the DLL then has to fight). Rewriting with
    # m = n - spc and the compile-time residual c0 = spc*step0 - L keeps
    # every term < O(1) chip, so rounding is ~1e-7 chips/period:
    #   n*step - L = m*step + c0 + spc*delta,  delta = dcode/fs
    spc = float(np.round(fs * code_len / code_rate_cps))
    c0 = np.float32(spc * float(nominal_step) - code_len)
    spcf = np.float32(spc)

    def _replica(code_ref, tap_ph):
        ph_floor = jnp.floor(tap_ph)
        lf = jnp.float32(code_len)
        idx = ph_floor - jnp.floor(ph_floor / lf) * lf
        q = jnp.floor(idx * jnp.float32(1.0 / LANES))
        r = (idx - q * LANES).astype(jnp.int32)
        out = jnp.zeros(tap_ph.shape, jnp.float32)
        for qq in range(q_rows):
            opr = jnp.broadcast_to(code_ref[0, qq, :][None, :],
                                   (tap_ph.shape[0], LANES))
            g = jnp.take_along_axis(opr, r, axis=1)
            out = out + jnp.where(q == jnp.float32(qq), g, 0.0)
        return out, ph_floor

    def _atan2(q, i):
        """Four-quadrant atan2(q, i) from the Cephes _atan."""
        a = _atan(q / jnp.where(jnp.abs(i) < 1e-20, jnp.float32(1e-20), i))
        corr = jnp.where(q >= 0.0, jnp.float32(np.pi), jnp.float32(-np.pi))
        return jnp.where(i < 0.0, a + corr, a)

    def kernel(s_ref, *refs):
        if track_pilot:
            (sec_p_ref, sec_d_ref, wr_ref, wi_ref, code_ref, dcode_ref,
             o_ref) = refs[:7]
            scr = refs[7:]
        else:
            wr_ref, wi_ref, code_ref, o_ref = refs[:4]
            dcode_ref = code_ref
            sec_p_ref = sec_d_ref = None
            scr = refs[4:]
        ch = pl.program_id(0)
        lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
        kin = (jax.lax.broadcasted_iota(jnp.int32, (rows_p, LANES), 0) * LANES
               + jax.lax.broadcasted_iota(jnp.int32, (rows_p, LANES), 1))

        # per-launch constants (host FSM only flips these between blocks)
        en = s_ref[ch, S_EN]
        integ_len = s_ref[ch, S_INTEG_LEN]
        sec_act = s_ref[ch, S_SEC_ACT]
        atan2f = s_ref[ch, S_ATAN2]
        fllf = s_ref[ch, S_FLL]
        pll_bw = s_ref[ch, S_PLL_BW]
        dll_bw = s_ref[ch, S_DLL_BW]
        w0p = pll_bw / pll_div
        w0d = dll_bw / dll_div
        w_off = s_ref[ch, S_ACC0 + 2 * t] if fdma else None

        def body(i, carry):
            (pos, rem, dcode, phase0, doppler,
             pll_i1, pll_i2, dll_i1, dll_i2,
             icount, acc_n, sec_idx, prev_re, prev_im,
             accd_re, accd_im, accd_cnt, *acc) = carry
            acc = list(acc)                      # [2*T] f32 scalars
            delta = dcode * inv_fs
            code_step = jnp.float32(nominal_step) + delta
            small = rem + c0 + spcf * delta      # chips past spc samples
            n_f = spcf - small / code_step
            # Pick n so the post-period remnant lands EXACTLY in
            # [0, code_step): round to the nearest sample count, compute
            # the remnant, and take one more sample if it went negative.
            # (An epsilon-guarded ceil can undershoot by 1 when n_f sits
            # just above an integer — the remnant then wraps to ~L chips
            # and the next "period" is 1 sample long, a glitch that
            # permanently slips extended-integration bit alignment.)
            n0 = jnp.floor(n_f + jnp.float32(0.5))
            rem0 = rem + ((n0 - spcf) * code_step + c0 + spcf * delta)
            addf = (rem0 < 0.0).astype(jnp.float32)
            n = jnp.clip(n0 + addf, 1.0, jnp.float32(n_max))

            r0 = jnp.floor(pos * jnp.float32(1.0 / LANES))
            off = pos - r0 * LANES
            r0i = r0.astype(jnp.int32)
            xr = wr_ref[pl.ds(r0i, rows_p), :]
            xi = wi_ref[pl.ds(r0i, rows_p), :]
            k = kin.astype(jnp.float32) - off
            mask = ((k >= 0.0) & (k < n)).astype(jnp.float32)

            if fdma:
                # slot offset rides on the Doppler as a pre-reduced
                # rad/sample step; reduce the phase mod 2pi before the
                # f32 sincos (the raw phase sweeps ~1700 rad per period)
                step_tot = (two_pi * inv_fs) * doppler + w_off
                ph = phase0 + step_tot * k
                ph = ph - two_pi * jnp.floor(ph * jnp.float32(
                    1.0 / (2.0 * np.pi)))
            else:
                ph = phase0 + (two_pi * inv_fs) * doppler * k
            cw = jnp.cos(ph)
            sw = jnp.sin(ph)
            wr_ = (xr * cw + xi * sw) * mask
            wi_ = (xi * cw - xr * sw) * mask

            cph = rem + code_step * k

            if replica == "window2":
                # O(1)-in-code-length replica; see make_fused_tracker.
                # Pilot plans stage the data-code rows in the same pass.
                scr_a, scr_b = scr[0], scr[1]
                if track_pilot:
                    scr_c, scr_d = scr[2], scr[3]

                def fill(r, carry):
                    k0 = jnp.float32(LANES) * r.astype(jnp.float32) - off
                    qa = jnp.floor((rem + code_step * k0
                                    + jnp.float32(126.0))
                                   * jnp.float32(1.0 / LANES))
                    qai = qa.astype(jnp.int32)
                    scr_a[pl.ds(r, 1), :] = code_ref[0, pl.ds(qai, 1), :]
                    scr_b[pl.ds(r, 1), :] = code_ref[0, pl.ds(qai + 1, 1), :]
                    if track_pilot:
                        scr_c[pl.ds(r, 1), :] = dcode_ref[0, pl.ds(qai, 1), :]
                        scr_d[pl.ds(r, 1), :] = dcode_ref[
                            0, pl.ds(qai + 1, 1), :]
                    return carry
                jax.lax.fori_loop(0, rows_p, fill, 0)
                qa_vec = jnp.floor((cph[:, 0:1] + jnp.float32(126.0))
                                   * jnp.float32(1.0 / LANES))
                srA = scr_a[...]
                srB = scr_b[...]
                base = jnp.float32(LANES) - qa_vec * jnp.float32(LANES)

                def gat(srA, srB, pos):
                    posi = pos.astype(jnp.int32)
                    in_a = posi < LANES
                    g_a = jnp.take_along_axis(
                        srA, jnp.clip(posi, 0, LANES - 1), axis=1)
                    g_b = jnp.take_along_axis(
                        srB, jnp.clip(posi - LANES, 0, LANES - 1), axis=1)
                    return jnp.where(in_a, g_a, g_b)

                def tap_val(srA, srB, off_chips):
                    tap_ph = cph + jnp.float32(off_chips)
                    if interp_code:
                        b = tap_ph + 0.5
                        fl = jnp.floor(b)
                        ext_pos = fl + base
                        c_prev = gat(srA, srB, ext_pos - 1.0)
                        c_cur = gat(srA, srB, ext_pos)
                        d = tap_ph - fl
                        wgt = jnp.clip(d / code_step + 0.5, 0.0, 1.0)
                        return c_prev + (c_cur - c_prev) * wgt
                    return gat(srA, srB, jnp.floor(tap_ph) + base)

                taps_re = []
                taps_im = []
                for ti in range(t):
                    blk = tap_val(srA, srB, offs[ti])
                    taps_re.append(jnp.sum(wr_ * blk))
                    taps_im.append(jnp.sum(wi_ * blk))
                if track_pilot:
                    dblk = tap_val(scr_c[...], scr_d[...], 0.0)
                    d_re = jnp.sum(wr_ * dblk)
                    d_im = jnp.sum(wi_ * dblk)
            else:
                tap_ph = jnp.concatenate(
                    [cph + jnp.float32(o) for o in offs], axis=0)
                if interp_code:
                    b = tap_ph + 0.5
                    big = jnp.concatenate([b - 1.0, b], axis=0)
                    vals, floors = _replica(code_ref, big)
                    m = t * rows_p
                    c_prev = vals[0:m]
                    c_cur = vals[m:2 * m]
                    d = tap_ph - (floors[0:m] + 1.0)
                    w = jnp.clip(d / code_step + 0.5, 0.0, 1.0)
                    ctap = c_prev + (c_cur - c_prev) * w
                else:
                    ctap, _ = _replica(code_ref, tap_ph)
                taps_re = []
                taps_im = []
                for ti in range(t):
                    blk = ctap[ti * rows_p:(ti + 1) * rows_p]
                    taps_re.append(jnp.sum(wr_ * blk))
                    taps_im.append(jnp.sum(wi_ * blk))
                if track_pilot:
                    if interp_code:
                        bp = cph + 0.5
                        bigp = jnp.concatenate([bp - 1.0, bp], axis=0)
                        valsd, floorsd = _replica(dcode_ref, bigp)
                        d_prev = valsd[0:rows_p]
                        d_cur = valsd[rows_p:2 * rows_p]
                        dd = cph - (floorsd[0:rows_p] + 1.0)
                        wd = jnp.clip(dd / code_step + 0.5, 0.0, 1.0)
                        dblk = d_prev + (d_cur - d_prev) * wd
                    else:
                        dblk, _ = _replica(dcode_ref, cph)
                    d_re = jnp.sum(wr_ * dblk)
                    d_im = jnp.sum(wi_ * dblk)
            if not track_pilot:
                d_re = taps_re[p_idx]
                d_im = taps_im[p_idx]

            # ---- secondary-code wipeoff (dll_pll.py _track_scan) ----------
            sec_i = sec_idx.astype(jnp.int32)
            if track_pilot and sp > 1:
                chip_p = sec_p_ref[ch, sec_i % sp]
                wipe_p = jnp.where(sec_act > 0.5, chip_p, jnp.float32(1.0))
            else:
                wipe_p = jnp.float32(1.0)
            if track_pilot and sd > 1:
                chip_d = sec_d_ref[ch, sec_i % sd]
                wipe_d = jnp.where(sec_act > 0.5, chip_d, jnp.float32(1.0))
            else:
                wipe_d = jnp.float32(1.0)

            # ---- coherent accumulation ------------------------------------
            for ti in range(t):
                acc[2 * ti] = acc[2 * ti] + taps_re[ti] * wipe_p
                acc[2 * ti + 1] = acc[2 * ti + 1] + taps_im[ti] * wipe_p
            acc_n_new = acc_n + n
            icount_new = jnp.where(en > 0.5, icount + 1.0, 0.0)
            boundary = (icount_new >= integ_len) & (en > 0.5)
            bf = boundary.astype(jnp.float32)
            accd_re_new = accd_re + d_re * wipe_d
            accd_im_new = accd_im + d_im * wipe_d
            accd_cnt_new = accd_cnt + 1.0
            data_boundary = ((sec_i % sd) == (sd - 1)) & (en > 0.5)
            dbf = data_boundary.astype(jnp.float32)
            sec_next = jnp.where(
                en > 0.5,
                jnp.mod(sec_i + 1, lcm).astype(jnp.float32),
                sec_idx)

            # ---- discriminators on the accumulated taps -------------------
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

            # ---- loop filters (boundary-gated, per-channel bandwidths) ----
            # FLL assist feeds the PLL integrator first (dll_pll.py:403)
            pll_i1_a = pll_i1 + jnp.where(
                boundary & (fllf > 0.5), w0f * w0f * freq_err * t_int, 0.0)
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

            # ---- NCO advance (pre-update doppler, enabled-gated) ----------
            if fdma:
                dphi = ((two_pi * inv_fs) * doppler + w_off) * n
            else:
                dphi = (two_pi * inv_fs) * doppler * n
            phase0_adv = phase0 + dphi
            phase0_adv = phase0_adv - two_pi * jnp.floor(phase0_adv / two_pi)
            # rem + n*step - L via small quantities (see c0 above); with
            # the corrected n this is in [0, code_step) by construction —
            # the max() only recovers degenerate states where the n clip
            # bound bit (never wrap by +L: that manufactures a 1-sample
            # period and slips bit alignment)
            rem_adv = jnp.maximum(
                rem + ((n - spcf) * code_step + c0 + spcf * delta), 0.0)
            eng = en > 0.5
            pos_new = jnp.where(eng, pos + n, pos)
            rem_new = jnp.where(eng, rem_adv, rem)
            phase_new = jnp.where(eng, phase0_adv, phase0)
            dop_out = jnp.where(eng, doppler_new, doppler)
            dcode_out = jnp.where(eng, dcode_new, dcode)

            prev_re_n = jnp.where(boundary, p_re, prev_re)
            prev_im_n = jnp.where(boundary, p_im, prev_im)

            # ---- pack + store the period row ------------------------------
            row = jnp.zeros((1, LANES), jnp.float32)
            for ti in range(t):
                row = (row
                       + jnp.where(lane1 == 2 * ti, taps_re[ti], 0.0)
                       + jnp.where(lane1 == 2 * ti + 1, taps_im[ti], 0.0)
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
                (LANE_DATA_RE, accd_re_new), (LANE_DATA_IM, accd_im_new),
                (LANE_DATA_BOUND, dbf), (LANE_DATA_CNT, accd_cnt_new),
                (LANE_SEC_IDX, sec_next),
                (LANE_ICOUNT, jnp.where(boundary, 0.0, icount_new)),
                (LANE_PREV_RE, prev_re_n), (LANE_PREV_IM, prev_im_n),
            ):
                row = row + jnp.where(lane1 == ln, v, 0.0)
            o_ref[0, pl.ds(i, 1), :] = row

            acc_out = [jnp.where(boundary, 0.0, a) for a in acc]
            return (pos_new, rem_new, dcode_out, phase_new, dop_out,
                    pll_i1_n, pll_i2_n, dll_i1_n, dll_i2_n,
                    jnp.where(boundary, 0.0, icount_new),
                    jnp.where(boundary, 0.0, acc_n_new),
                    sec_next, prev_re_n, prev_im_n,
                    jnp.where(data_boundary, 0.0, accd_re_new),
                    jnp.where(data_boundary, 0.0, accd_im_new),
                    jnp.where(data_boundary, 0.0, accd_cnt_new),
                    *acc_out)

        init = (s_ref[ch, S_POS], s_ref[ch, S_REM], s_ref[ch, S_DCODE],
                s_ref[ch, S_PHASE], s_ref[ch, S_DOP],
                s_ref[ch, S_PLL_I1], s_ref[ch, S_PLL_I2],
                s_ref[ch, S_DLL_I1], s_ref[ch, S_DLL_I2],
                s_ref[ch, S_INTEG_CNT], s_ref[ch, S_ACC_N],
                s_ref[ch, S_SEC_IDX],
                s_ref[ch, S_PREV_RE], s_ref[ch, S_PREV_IM],
                s_ref[ch, S_ACCD_RE], s_ref[ch, S_ACCD_IM],
                s_ref[ch, S_ACCD_CNT],
                *[s_ref[ch, S_ACC0 + j] for j in range(2 * t)])
        jax.lax.fori_loop(0, n_periods, body, init)

    calls: dict[tuple, object] = {}

    def track(wr, wi, codes_q, scalars, dcodes_q=None, sec_p=None,
              sec_d=None):
        c = codes_q.shape[0]
        wrows = wr.shape[0]
        key = (c, wrows)
        if key not in calls:
            scratch = []
            if replica == "window2":
                scratch = [pltpu.VMEM((rows_p, LANES), jnp.float32),
                           pltpu.VMEM((rows_p, LANES), jnp.float32)]
                if track_pilot:
                    scratch += [pltpu.VMEM((rows_p, LANES), jnp.float32),
                                pltpu.VMEM((rows_p, LANES), jnp.float32)]
            in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
            if track_pilot:
                in_specs += [pl.BlockSpec(memory_space=pltpu.SMEM),
                             pl.BlockSpec(memory_space=pltpu.SMEM)]
            in_specs += [
                pl.BlockSpec((wrows, LANES), lambda ch: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((wrows, LANES), lambda ch: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, q_rows, LANES), lambda ch: (ch, 0, 0),
                             memory_space=pltpu.VMEM),
            ]
            if track_pilot:
                in_specs.append(
                    pl.BlockSpec((1, q_rows, LANES), lambda ch: (ch, 0, 0),
                                 memory_space=pltpu.VMEM))
            calls[key] = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((c, n_periods, LANES),
                                               jnp.float32),
                grid=(c,),
                in_specs=in_specs,
                out_specs=pl.BlockSpec((1, n_periods, LANES),
                                       lambda ch: (ch, 0, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=scratch,
                interpret=interpret,
            )
        with jax.enable_x64(False):
            if track_pilot:
                return calls[key](scalars, sec_p, sec_d, wr, wi,
                                  codes_q, dcodes_q)
            return calls[key](scalars, wr, wi, codes_q)

    track.rows_p = rows_p
    track.n_periods = n_periods
    track.num_scalars = ns
    track.replica = replica
    return track


def fused_scalars_from_state(state, conf) -> jnp.ndarray:
    """Pack a TrackingState into the kernel's [C, 10] scalar block."""
    return jnp.stack([
        state.pos.astype(jnp.float32),
        state.rem_code_phase.astype(jnp.float32),
        (state.code_freq - conf.code_rate_cps).astype(jnp.float32),
        jnp.mod(state.carrier_phase, 2.0 * np.pi).astype(jnp.float32),
        state.carrier_doppler.astype(jnp.float32),
        state.pll_state[:, 0].astype(jnp.float32),
        state.dll_state[:, 0].astype(jnp.float32),
        state.enabled.astype(jnp.float32),
        state.pll_state[:, 1].astype(jnp.float32),
        state.dll_state[:, 1].astype(jnp.float32),
    ], axis=1)
