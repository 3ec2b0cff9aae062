"""Batched DLL/PLL(/FLL) tracking engine.

The reference's universal tracker (src/algorithms/tracking/gnuradio_blocks/
dll_pll_veml_tracking.cc) runs one GNU Radio block per channel, each thread
consuming ~one PRN period of samples per general_work() call, closing the
code/carrier loops every period (call stack in SURVEY.md §3.3).

Here all channels are one batched array program (SURVEY.md §2.4 P2):

- per-channel state lives in a `TrackingState` pytree of [C]-shaped arrays;
- one jitted call runs `steps_per_block` PRN periods via `jax.lax.scan`
  (sequential over time — the loop feedback demands it — parallel over
  channels);
- per-channel variable sample consumption (code Doppler makes PRN periods
  non-uniform) is handled with per-channel sample pointers into a shared
  overlap-save window plus masking: each step gathers `max_step_samples`
  and masks the tail beyond the true period length;
- carrier wipeoff + 3/5-tap code gather + dot products are fused by XLA into
  one pass over the samples (the volk
  32fc_32f_high_dynamic_rotator_dot_prod_32fc_xn equivalent);
- extended coherent integration (reference extend_correlation_symbols,
  states 3/4) runs on-device via per-channel accumulators; loop updates fire
  only on integration boundaries via jnp.where;
- carrier phase and code phase accumulate in float64 (the reference uses
  double accumulators; see SURVEY.md §7 risks).

Host-side control (bit sync, lock FSM, bandwidth switches) operates between
blocks on the small per-step outputs — see `tracking/tracker.py`.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gnss_sdr_tpu.tracking.conf import DllPllConf
from gnss_sdr_tpu.tracking.discriminators import (
    dll_nelp,
    dll_veml,
    fll_atan,
    pll_atan2,
    pll_costas_atan,
)
from gnss_sdr_tpu.tracking.loop_filter import loop_filter_step
from gnss_sdr_tpu.utils.cplx import dev_combine, dev_split


class TrackingState(NamedTuple):
    """Per-channel tracking state ([C]-shaped leaves).

    Complex quantities are stored as float32 [..., 2] re/im lanes: the TPU
    runtime in use cannot even *create* complex64 arrays outside a compiled
    program (see utils/cplx.py), and the host FSM mutates these leaves
    eagerly between blocks. ``track_block`` combines them to complex64 on
    entry and splits on exit.
    """

    enabled: jnp.ndarray            # bool — channel active
    pos: jnp.ndarray                # i32 — next-step start, window-relative
    rem_code_phase: jnp.ndarray     # f64 — chips into the code at `pos`
    code_freq: jnp.ndarray          # f64 — chips/s
    carrier_phase: jnp.ndarray      # f64 — accumulated rad
    carrier_doppler: jnp.ndarray    # f32 — Hz
    carrier_offset: jnp.ndarray     # f64 — Hz, per-channel FDMA offset (GLONASS)
    pll_state: jnp.ndarray          # [C,2] f32
    dll_state: jnp.ndarray          # [C,2] f32
    prev_prompt: jnp.ndarray        # [C,2] f32 ri — last boundary prompt (FLL)
    fll_active: jnp.ndarray         # bool
    narrow: jnp.ndarray             # bool — narrow-bandwidth mode
    use_atan2: jnp.ndarray          # bool — four-quadrant PLL (pilot/sec-locked)
    integ_len: jnp.ndarray          # i32 — code periods per loop update
    integ_count: jnp.ndarray        # i32
    acc_taps: jnp.ndarray           # [C,T,2] f32 ri — coherent accumulators
    acc_samples: jnp.ndarray        # i32 — samples in current integration
    # pilot/secondary-code tracking (track_pilot plans)
    sec_idx: jnp.ndarray            # i32 — code-period index in the secondary epoch
    sec_active: jnp.ndarray         # bool — secondary wipeoff engaged
    acc_data: jnp.ndarray           # [C,2] f32 ri — data-component accumulator
    acc_data_count: jnp.ndarray     # i32 — periods in the data accumulator
    # Kalman tracking mode (conf.kf; reference kf_tracking.cc analog)
    kf_x: jnp.ndarray               # [C,3] f32 — [dphase cyc, dfreq Hz, dfdot Hz/s]
    kf_P: jnp.ndarray               # [C,3,3] f32 — carrier state covariance
    kf_pc: jnp.ndarray              # f32 — code-delay error variance (chips^2)


class StepOutputs(NamedTuple):
    """Per-step, per-channel outputs ([S, C]-shaped after scan)."""

    prompt: jnp.ndarray             # c64 — this period's prompt correlation
    taps: jnp.ndarray               # [.., T] c64 — all correlator taps
    boundary: jnp.ndarray           # bool — loop updated after this step
    acc_prompt: jnp.ndarray         # c64 — integrated prompt (valid at boundary)
    acc_samples: jnp.ndarray        # i32 — samples in that integration
    carrier_doppler: jnp.ndarray    # f32 — Hz, after any update
    code_freq: jnp.ndarray          # f64 — chips/s, after any update
    carrier_phase: jnp.ndarray      # f64 — accumulated rad at period end
    rem_code_phase: jnp.ndarray     # f64 — chips at period end
    pos_end: jnp.ndarray            # i32 — window-relative end sample
    n_samples: jnp.ndarray          # i32 — samples consumed this period
    data_prompt: jnp.ndarray        # c64 — data-symbol accumulator (at boundary)
    data_boundary: jnp.ndarray      # bool — data symbol completed this period
    data_count: jnp.ndarray         # i32 — periods in that data symbol


def init_state(conf: DllPllConf) -> TrackingState:
    c = conf.max_channels
    t = conf.num_taps
    return TrackingState(
        enabled=jnp.zeros((c,), bool),
        pos=jnp.zeros((c,), jnp.int32),
        rem_code_phase=jnp.zeros((c,), jnp.float64),
        code_freq=jnp.full((c,), conf.code_rate_cps, jnp.float64),
        carrier_phase=jnp.zeros((c,), jnp.float64),
        carrier_doppler=jnp.zeros((c,), jnp.float32),
        carrier_offset=jnp.zeros((c,), jnp.float64),
        pll_state=jnp.zeros((c, 2), jnp.float32),
        dll_state=jnp.zeros((c, 2), jnp.float32),
        prev_prompt=jnp.zeros((c, 2), jnp.float32),
        fll_active=jnp.zeros((c,), bool),
        narrow=jnp.zeros((c,), bool),
        use_atan2=jnp.zeros((c,), bool),
        integ_len=jnp.ones((c,), jnp.int32),
        integ_count=jnp.zeros((c,), jnp.int32),
        acc_taps=jnp.zeros((c, t, 2), jnp.float32),
        acc_samples=jnp.zeros((c,), jnp.int32),
        sec_idx=jnp.zeros((c,), jnp.int32),
        sec_active=jnp.zeros((c,), bool),
        acc_data=jnp.zeros((c, 2), jnp.float32),
        acc_data_count=jnp.zeros((c,), jnp.int32),
        kf_x=jnp.zeros((c, 3), jnp.float32),
        kf_P=jnp.tile(
            jnp.diag(jnp.array([0.01, 2500.0, 100.0], jnp.float32)),
            (c, 1, 1)),
        kf_pc=jnp.full((c,), 0.25, jnp.float32),
    )


def tap_offsets_chips(conf: DllPllConf) -> np.ndarray:
    """Correlator tap offsets in chips, prompt in the middle."""
    d = conf.early_late_spacing_chips / 2.0
    if conf.num_taps == 5:
        v = conf.very_early_late_spacing_chips / 2.0
        return np.array([-v, -d, 0.0, d, v], dtype=np.float32)
    return np.array([-d, 0.0, d], dtype=np.float32)


@partial(jax.jit, static_argnames=("conf",))
def track_block(
    conf: DllPllConf,
    state: TrackingState,
    window: jnp.ndarray,        # [W] complex64 — shared sample window
    codes: jnp.ndarray,         # [C, L] float32 — per-channel PRN chips
                                #   (PILOT code when conf.track_pilot)
    data_codes: jnp.ndarray | None = None,   # [C, L] f32 — data code (pilot mode)
    sec_pilot: jnp.ndarray | None = None,    # [C, sec_len_pilot] f32 ±1
    sec_data: jnp.ndarray | None = None,     # [C, sec_len_data] f32 ±1
) -> tuple[TrackingState, StepOutputs]:
    """Run `conf.steps_per_block` PRN periods for all channels."""
    return _track_scan(conf, state, window, codes, data_codes,
                       sec_pilot, sec_data, None)


@partial(jax.jit, static_argnames=("conf", "pack_spec"))
def track_block_packed(
    conf: DllPllConf,
    pack_spec,                  # hostpack.PackSpec with batch_ndim=1
    state: TrackingState,
    window: jnp.ndarray,
    codes: jnp.ndarray,
    data_codes: jnp.ndarray | None = None,
    sec_pilot: jnp.ndarray | None = None,
    sec_data: jnp.ndarray | None = None,
):
    """Like track_block, but each scan step emits ONE lane-packed f32 row
    ([C, total_lanes]) instead of ~24 separate output leaves. XLA lowers
    scan output stacking as one dynamic-update-slice per leaf per step;
    on this TPU runtime those small serial updates cost more than the
    whole correlation — packing inside the step collapses 24 stacked
    buffers into 1 (measured ~3x on the end-to-end block time)."""
    return _track_scan(conf, state, window, codes, data_codes,
                       sec_pilot, sec_data, pack_spec)


def _track_scan(conf, state, window, codes, data_codes, sec_pilot,
                sec_data, pack_spec):
    n_max = conf.max_step_samples
    code_len = np.float64(conf.code_length_chips)
    fs = np.float64(conf.fs)
    two_pi = np.float32(2.0 * np.pi)
    offsets = jnp.asarray(tap_offsets_chips(conf))            # [T]
    p_idx = conf.num_taps // 2
    k = jnp.arange(n_max, dtype=jnp.float32)                  # [N]

    # Pallas fused correlator (ops/correlator.py): replaces the XLA
    # wipeoff+gather+dot section below — the take_along_axis code-replica
    # lookup is pathologically slow (~10 ns/element) on the TPU runtime
    use_pallas = (conf.pallas_correlator if conf.pallas_correlator
                  is not None else jax.default_backend() == "tpu")
    use_pallas = use_pallas and not conf.fdma
    if use_pallas:
        from gnss_sdr_tpu.ops.correlator import _pad128, make_correlator

        corr_fn = make_correlator(
            n_max, conf.code_length_chips, conf.num_taps,
            tap_offsets_chips(conf), track_pilot=conf.track_pilot,
            interp_code=conf.interp_code)
        lpad = _pad128(conf.code_length_chips)
        n_ch = codes.shape[0]

        def _pack(tbl):
            return jnp.pad(
                tbl.astype(jnp.float32),
                ((0, 0), (0, lpad - conf.code_length_chips)),
            ).reshape(n_ch, lpad // 128, 128)

        codes_q = _pack(codes)
        dcodes_q = _pack(data_codes) if conf.track_pilot else codes_q

    def step(st: TrackingState, _):
        # complex state leaves live as f32 re/im lanes (see TrackingState)
        prev_prompt_c = dev_combine(st.prev_prompt)            # [C]
        acc_taps_c = dev_combine(st.acc_taps)                  # [C, T]
        acc_data_c = dev_combine(st.acc_data)                  # [C]

        # ---- period geometry from current NCO frequencies -----------------
        code_step = st.code_freq / fs                          # f64 chips/sample
        n_f = (code_len - st.rem_code_phase) / code_step
        n = jnp.clip(jnp.ceil(n_f).astype(jnp.int32), 1, n_max)
        n = jnp.where(st.enabled, n, n_max)                   # idle chans burn max

        # ---- gather the sample block per channel --------------------------
        gather_len = corr_fn.npad if use_pallas else n_max
        x = jax.vmap(
            lambda p: jax.lax.dynamic_slice(window, (p,), (gather_len,))
        )(st.pos)                                              # [C, N]
        mask = k[None, :] < n[:, None].astype(jnp.float32)     # [C, N]

        if use_pallas:
            # ---- fused Pallas correlator (wipeoff+replica+dots) -----------
            phase0_p = jnp.mod(st.carrier_phase, 2.0 * np.pi).astype(
                jnp.float32)
            ph_step_p = (two_pi / np.float32(fs)) * st.carrier_doppler
            scalars = jnp.stack([
                st.rem_code_phase.astype(jnp.float32),
                code_step.astype(jnp.float32),
                phase0_p,
                ph_step_p,
                n.astype(jnp.float32),
                jnp.zeros_like(phase0_p),
                jnp.zeros_like(phase0_p),
                jnp.zeros_like(phase0_p),
            ], axis=1)                                         # [C, 8]
            lanes_out = corr_fn(x.real, x.imag, codes_q, dcodes_q,
                                scalars)[:, 0, :]              # [C, 128]
            t_taps = conf.num_taps
            corr = jax.lax.complex(
                lanes_out[:, 0:2 * t_taps:2],
                lanes_out[:, 1:2 * t_taps:2])                  # [C, T]
            if conf.track_pilot:
                corr_data = jax.lax.complex(
                    lanes_out[:, 2 * t_taps], lanes_out[:, 2 * t_taps + 1])
            else:
                corr_data = corr[:, p_idx]
        else:
            if conf.fdma:
                # FDMA (GLONASS): the per-channel slot offset (up to
                # +-4 MHz) rides on top of the Doppler. The per-sample
                # phase is computed in f64 and reduced mod 2*pi before the
                # f32 sincos — at 4 MHz the phase sweeps ~2.8e4 rad per
                # period, far beyond f32's absolute precision.
                k64 = jnp.arange(n_max, dtype=jnp.float64)
                freq = st.carrier_offset + st.carrier_doppler.astype(
                    jnp.float64)
                ph64 = (
                    jnp.mod(st.carrier_phase, 2.0 * np.pi)[:, None]
                    + (2.0 * np.pi / fs) * freq[:, None] * k64[None, :]
                )
                ph = jnp.mod(ph64, 2.0 * np.pi).astype(jnp.float32)
            else:
                phase0 = jnp.mod(st.carrier_phase, 2.0 * np.pi).astype(
                    jnp.float32)
                ph_step = (two_pi / np.float32(fs)) * st.carrier_doppler
                ph = phase0[:, None] + ph_step[:, None] * k[None, :]  # [C, N]
            wipe = jax.lax.complex(jnp.cos(ph), -jnp.sin(ph))
            xw = x * wipe * mask                               # [C, N]

            # ---- code replica taps (resample local code at current rate) --
            cph = (
                st.rem_code_phase[:, None].astype(jnp.float32)
                + code_step[:, None].astype(jnp.float32) * k[None, :]
            )                                                  # [C, N] chips
            tap_ph = cph[:, None, :] + offsets[None, :, None]  # [C, T, N]
            ph_floor = jnp.floor(tap_ph)
            idx = jnp.mod(ph_floor.astype(jnp.int32), conf.code_length_chips)
            c0 = jnp.take_along_axis(codes[:, None, :], idx, axis=2)
            if conf.interp_code:
                # soft replica: each chip transition ramps linearly over ONE
                # sample (width = code_step chips), i.e. the sharp code
                # convolved with the sampling cell. This removes the E-L
                # discriminator's sub-sample quantization bias (meters of
                # pseudorange at ~2.5 samples/chip; the reference's
                # nearest-sample resampler relies on long averaging instead)
                # at <0.5 dB correlation loss.
                idx_prev = jnp.mod(idx - 1, conf.code_length_chips)
                idx_next = jnp.mod(idx + 1, conf.code_length_chips)
                c_prev = jnp.take_along_axis(
                    codes[:, None, :], idx_prev, axis=2)
                c_next = jnp.take_along_axis(
                    codes[:, None, :], idx_next, axis=2)
                frac = tap_ph - ph_floor                       # [C, T, N]
                w = code_step[:, None, None].astype(jnp.float32)
                # ramps centered on the chip boundaries at frac=0 and frac=1
                ramp_in = jnp.clip(frac / w + 0.5, 0.0, 1.0)
                ramp_out = jnp.clip((frac - 1.0) / w + 0.5, 0.0, 1.0)
                ctaps = (
                    c_prev + (c0 - c_prev) * ramp_in
                    + (c_next - c0) * ramp_out
                )                                              # [C, T, N]
            else:
                ctaps = c0                                     # [C, T, N] f32

            # ---- correlate: sum_k xw[c,k] * code[c,t,k] -------------------
            corr = jnp.sum(xw[:, None, :] * ctaps, axis=-1)    # [C, T] c64

            # ---- data-component prompt correlator (pilot tracking) --------
            # reference: separate d_correlator_data_cpu on the data code at
            # the prompt offset (dll_pll_veml_tracking.cc:1248)
            if conf.track_pilot:
                sl = (slice(None), slice(p_idx, p_idx + 1), slice(None))
                d0 = jnp.take_along_axis(
                    data_codes[:, None, :], idx[sl], axis=2)
                if conf.interp_code:
                    d_prev = jnp.take_along_axis(
                        data_codes[:, None, :], idx_prev[sl], axis=2)
                    d_next = jnp.take_along_axis(
                        data_codes[:, None, :], idx_next[sl], axis=2)
                    dtap = (
                        d_prev + (d0 - d_prev) * ramp_in[sl]
                        + (d_next - d0) * ramp_out[sl]
                    )
                else:
                    dtap = d0
                corr_data = jnp.sum(
                    xw[:, None, :] * dtap, axis=-1)[:, 0]      # [C]
            else:
                corr_data = corr[:, p_idx]

        # ---- secondary-code wipeoff (once the host locks the sequence) -----
        sp = conf.sec_len_pilot
        sd = conf.sec_len_data
        if conf.track_pilot and sp > 1:
            chip_p = jnp.take_along_axis(
                sec_pilot, (st.sec_idx % sp)[:, None], axis=1)[:, 0]
            wipe_p = jnp.where(st.sec_active, chip_p, 1.0)
        else:
            wipe_p = jnp.ones_like(corr_data.real)
        if conf.track_pilot and sd > 1:
            chip_d = jnp.take_along_axis(
                sec_data, (st.sec_idx % sd)[:, None], axis=1)[:, 0]
            wipe_d = jnp.where(st.sec_active, chip_d, 1.0)
        else:
            wipe_d = jnp.ones_like(corr_data.real)

        # ---- coherent accumulation ----------------------------------------
        acc_taps = acc_taps_c + corr * wipe_p[:, None]
        acc_samples = st.acc_samples + n
        integ_count = jnp.where(st.enabled, st.integ_count + 1, 0)
        boundary = (integ_count >= st.integ_len) & st.enabled

        # data-symbol accumulation: one symbol spans sec_len_data periods,
        # completing when this period's secondary index ends a symbol
        acc_data = acc_data_c + (corr_data * wipe_d).astype(jnp.complex64)
        acc_data_count = st.acc_data_count + 1
        data_boundary = ((st.sec_idx % sd) == sd - 1) & st.enabled
        sec_idx_next = jnp.where(
            st.enabled, (st.sec_idx + 1) % conf.sec_lcm, st.sec_idx
        )

        # ---- loop update at integration boundaries ------------------------
        t_int = acc_samples.astype(jnp.float32) / np.float32(fs)
        prompt_acc = acc_taps[:, p_idx]
        e_acc = acc_taps[:, p_idx - 1]
        l_acc = acc_taps[:, p_idx + 1]

        carr_err = jnp.where(
            st.use_atan2,
            pll_atan2(prompt_acc.real, prompt_acc.imag),
            pll_costas_atan(prompt_acc.real, prompt_acc.imag),
        ) / two_pi                                             # cycles
        freq_err = fll_atan(prev_prompt_c, prompt_acc, t_int)  # Hz

        pll_bw = jnp.where(st.narrow, np.float32(conf.pll_bw_narrow_hz),
                           np.float32(conf.pll_bw_hz))
        dll_bw = jnp.where(st.narrow, np.float32(conf.dll_bw_narrow_hz),
                           np.float32(conf.dll_bw_hz))

        # FLL assist feeds the PLL integrator (only while fll_active)
        w0f = np.float32(conf.fll_bw_hz / 0.53)
        pll_st = st.pll_state.at[:, 0].add(
            jnp.where(boundary & st.fll_active, w0f * w0f * freq_err * t_int, 0.0)
        )
        pll_st_new, pll_out = loop_filter_step(
            pll_st, carr_err, pll_bw, t_int, conf.pll_filter_order
        )

        if conf.num_taps == 5:
            code_err = dll_veml(
                acc_taps[:, 0], e_acc, l_acc, acc_taps[:, 4]
            )
        else:
            code_err = dll_nelp(
                e_acc.real, e_acc.imag, l_acc.real, l_acc.imag,
                conf.early_late_spacing_chips,
            )
        dll_st_new, dll_out = loop_filter_step(
            st.dll_state, code_err, dll_bw, t_int, conf.dll_filter_order
        )

        if conf.kf:
            # ---- Kalman carrier/code update (reference kf_tracking.cc) ----
            # Error-state EKF: x = [phase err (cycles), freq err (Hz),
            # freq-rate err (Hz/s)] relative to the commanded NCO. The PLL
            # discriminator measures x0; the FLL discriminator measures x1
            # (enabled while fll_active via its R). After the update the
            # estimated phase/freq errors are transferred to the NCO
            # command (phase folded into the next interval's frequency),
            # which zeroes those error states; covariance is unchanged by
            # the deterministic transfer.
            T = jnp.maximum(t_int, np.float32(1e-6))           # [C]
            one = jnp.ones_like(T)
            zero = jnp.zeros_like(T)
            F = jnp.stack([
                jnp.stack([one, T, 0.5 * T * T], -1),
                jnp.stack([zero, one, T], -1),
                jnp.stack([zero, zero, one], -1),
            ], axis=-2)                                        # [C,3,3]
            q = np.float32(conf.kf_accel_std_hz_s2 ** 2)
            T2 = T * T
            T3 = T2 * T
            Q = q * jnp.stack([
                jnp.stack([T3 * T2 / 20, T2 * T2 / 8, T3 / 6], -1),
                jnp.stack([T2 * T2 / 8, T3 / 3, T2 / 2], -1),
                jnp.stack([T3 / 6, T2 / 2, T], -1),
            ], axis=-2)                                        # [C,3,3]
            x_pred = jnp.einsum("cij,cj->ci", F, st.kf_x)
            P_pred = jnp.einsum(
                "cij,cjk,clk->cil", F, st.kf_P, F) + Q
            # update 1: phase discriminator — gated off during FLL pull-in
            # (the Costas atan wraps every 1/4 cycle; chasing wraps while
            # the frequency error is still tens of Hz drives false locks)
            R1 = jnp.where(st.fll_active,
                           np.float32(1e9),
                           np.float32(conf.kf_meas_std_cycles ** 2))
            S1 = P_pred[:, 0, 0] + R1
            K1 = P_pred[:, :, 0] / S1[:, None]                 # [C,3]
            x_up = x_pred + K1 * (carr_err - x_pred[:, 0])[:, None]
            P_up = P_pred - K1[:, :, None] * P_pred[:, None, 0, :]
            # update 2: frequency discriminator (pull-in only)
            R2 = jnp.where(st.fll_active,
                           np.float32(conf.kf_freq_meas_std_hz ** 2),
                           np.float32(1e12))
            S2 = P_up[:, 1, 1] + R2
            K2 = P_up[:, :, 1] / S2[:, None]
            x_up = x_up + K2 * (freq_err - x_up[:, 1])[:, None]
            P_up = P_up - K2[:, :, None] * P_up[:, None, 1, :]
            # transfer the freq-error estimate to the NCO frequency; the
            # phase-error estimate corrects the NCO *phase* directly below
            # (folding it into the frequency would leave a permanent bias)
            doppler_kf = st.carrier_doppler + x_up[:, 1]
            doppler_new = jnp.where(boundary, doppler_kf, st.carrier_doppler)
            kf_phase_corr = jnp.where(
                boundary, two_pi * x_up[:, 0], 0.0).astype(jnp.float64)
            kf_x_new = jnp.where(
                boundary[:, None],
                jnp.stack([zero, zero, x_up[:, 2]], -1), st.kf_x)
            kf_P_new = jnp.where(boundary[:, None, None], P_up, st.kf_P)
            # code: scalar Kalman gain on the DLL discriminator + aiding
            qc = np.float32(conf.kf_code_process_std_chips ** 2)
            Rc = np.float32(conf.kf_code_meas_std_chips ** 2)
            pc_pred = st.kf_pc + qc
            kc = pc_pred / (pc_pred + Rc)
            aid = doppler_new.astype(jnp.float64) * (
                conf.code_rate_cps / conf.carrier_freq_hz
            )
            code_freq_new = jnp.where(
                boundary,
                np.float64(conf.code_rate_cps) + aid
                - (kc * code_err / T).astype(jnp.float64),
                st.code_freq,
            )
            kf_pc_new = jnp.where(boundary, (1.0 - kc) * pc_pred, st.kf_pc)
        else:
            doppler_new = jnp.where(boundary, pll_out, st.carrier_doppler)
            # carrier-aided code NCO (reference run_dll_pll code freq update)
            aid = doppler_new.astype(jnp.float64) * (
                conf.code_rate_cps / conf.carrier_freq_hz
            )
            code_freq_new = jnp.where(
                boundary,
                np.float64(conf.code_rate_cps) + aid - dll_out.astype(jnp.float64),
                st.code_freq,
            )
            kf_x_new, kf_P_new, kf_pc_new = st.kf_x, st.kf_P, st.kf_pc

        # ---- advance NCO state by the consumed period ---------------------
        nf64 = n.astype(jnp.float64)
        nco_freq = st.carrier_doppler.astype(jnp.float64) + (
            st.carrier_offset if conf.fdma else 0.0
        )
        carrier_phase = st.carrier_phase + (
            2.0 * np.pi / fs
        ) * nco_freq * nf64
        if conf.kf:
            carrier_phase = carrier_phase + kf_phase_corr
        rem_new = st.rem_code_phase + nf64 * code_step - code_len
        rem_new = jnp.where(rem_new < 0.0, rem_new + code_len, rem_new)

        upd = lambda new, old: jnp.where(st.enabled, new, old)
        bsel = lambda new, old: jnp.where(boundary, new, old)
        new_state = TrackingState(
            enabled=st.enabled,
            pos=upd(st.pos + n, st.pos),
            rem_code_phase=upd(rem_new, st.rem_code_phase),
            code_freq=upd(code_freq_new, st.code_freq),
            carrier_phase=upd(carrier_phase, st.carrier_phase),
            carrier_doppler=upd(doppler_new, st.carrier_doppler),
            carrier_offset=st.carrier_offset,
            pll_state=jnp.where(
                (boundary & st.enabled)[:, None], pll_st_new, st.pll_state
            ),
            dll_state=jnp.where(
                (boundary & st.enabled)[:, None], dll_st_new, st.dll_state
            ),
            prev_prompt=dev_split(bsel(prompt_acc, prev_prompt_c)),
            fll_active=st.fll_active,
            narrow=st.narrow,
            use_atan2=st.use_atan2,
            integ_len=st.integ_len,
            integ_count=jnp.where(boundary, 0, integ_count),
            acc_taps=dev_split(jnp.where(
                boundary[:, None], jnp.zeros_like(acc_taps), acc_taps
            )),
            acc_samples=jnp.where(boundary, 0, acc_samples),
            sec_idx=sec_idx_next,
            sec_active=st.sec_active,
            acc_data=dev_split(jnp.where(
                data_boundary, jnp.zeros_like(acc_data), acc_data
            )),
            acc_data_count=jnp.where(data_boundary, 0, acc_data_count),
            kf_x=kf_x_new,
            kf_P=kf_P_new,
            kf_pc=kf_pc_new,
        )
        out = StepOutputs(
            prompt=corr[:, p_idx],
            taps=corr,
            boundary=boundary,
            acc_prompt=prompt_acc,
            acc_samples=acc_samples,
            carrier_doppler=doppler_new,
            code_freq=code_freq_new,
            carrier_phase=carrier_phase,
            rem_code_phase=rem_new,
            pos_end=st.pos + n,
            n_samples=n,
            data_prompt=acc_data,
            data_boundary=data_boundary,
            data_count=acc_data_count,
        )
        if pack_spec is not None:
            from gnss_sdr_tpu.utils.hostpack import pack_tree

            return new_state, pack_tree(out._asdict(), pack_spec)
        return new_state, out

    return jax.lax.scan(step, state, None, length=conf.steps_per_block)
