"""Fused-kernel tracking engine: the live receiver's hot path.

Wraps ops/track_kernel.make_fused_tracker_full — the whole K-period
DLL/PLL loop in one Mosaic launch — behind the same (state in, packed
rows out) contract as tracking/dll_pll.track_block_packed, so
tracking/tracker.py can swap engines without touching the host FSM,
observables, or telemetry (VERDICT r4 #1: the fast kernel must BE the
receiver, not a benchmark).

Responsibilities beyond the kernel itself:

- pack TrackingState into the kernel's [C, 24+2T] scalar block (incl.
  per-channel wide/narrow bandwidths, FLL/atan2/secondary flags — all
  jit inputs, so host FSM mode switches recompile nothing);
- reshape the device-resident [L, 2] re/im stream into the kernel's
  row layout with a rows_p guard pad;
- reconstruct the f64 bookkeeping the observables engine needs
  (accumulated carrier phase via an f64 cumsum over the per-period
  (doppler, n) outputs — the kernel carries phase mod 2pi in f32; the
  recon matches it to ~1e-4 rad per block, micrometres of L1 carrier);
- re-emit the per-period outputs through utils/hostpack.pack_tree in
  the exact layout of the XLA scan path, and fold the kernel's final
  row back into a TrackingState.

Precision notes (vs the f64 XLA path): rem_code_phase rides in f32
inside the kernel — ~2.4e-4 chips resolution at E1's 4092-chip code,
~7 cm of pseudorange quantization, order of the thermal noise floor and
well inside the reference's 2 m position gate. Window-relative sample
positions must stay < 2^24 for f32 exactness; Tracker checks this per
block and falls back to the XLA path for larger windows.

Reference analog: dll_pll_veml_tracking.cc general_work states 2-4
(:1898-2260) — here one launch per ~K code periods instead of one
GNU Radio work call per period.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from gnss_sdr_tpu.ops import track_kernel as tk
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
    make_fused_tracker_full,
)
from gnss_sdr_tpu.tracking.conf import DllPllConf
from gnss_sdr_tpu.tracking.dll_pll import TrackingState, tap_offsets_chips
from gnss_sdr_tpu.utils.hostpack import pack_tree


def fused_eligible(conf: DllPllConf, mesh) -> bool:
    """Plans the full fused kernel covers; the rest keep the XLA scan.

    FDMA rides the fast path too: the per-channel slot offset enters as
    a mod-2pi-REDUCED rad/sample step (exact where raw MHz would
    overflow f32 phase). The KF mode runs 3x3 covariance algebra per
    boundary and sharded meshes would need the kernel under shard_map —
    those stay on tracking/dll_pll.py (reference analog: the FPGA
    offload in dll_pll_veml_tracking_fpga.cc has a similar scope
    split)."""
    return not conf.kf and mesh is None


def build_fused_engine(conf: DllPllConf, interpret: bool | None = None):
    """The kernel plus its code-table packers for this plan.

    Default engine: the channel-blocked kernel (all channels in one
    Mosaic program, ~2.5x the per-channel kernel's throughput — see
    ops/track_kernel_blocked.py). GNSS_SDR_TPU_FUSED=perchannel falls
    back to the per-channel kernel."""
    import os

    kw = dict(
        fs=conf.fs,
        code_rate_cps=conf.code_rate_cps,
        carrier_freq_hz=conf.carrier_freq_hz,
        pll_order=conf.pll_filter_order,
        dll_order=conf.dll_filter_order,
        fll_bw_hz=conf.fll_bw_hz,
        interp_code=conf.interp_code,
        track_pilot=conf.track_pilot,
        sec_len_pilot=conf.sec_len_pilot,
        sec_len_data=conf.sec_len_data,
        sec_lcm=conf.sec_lcm,
        fdma=conf.fdma,
        interpret=interpret,
    )
    args = (conf.steps_per_block, conf.max_step_samples,
            conf.code_length_chips, conf.num_taps,
            np.asarray(tap_offsets_chips(conf)))
    if os.environ.get("GNSS_SDR_TPU_FUSED", "blocked") != "perchannel":
        from gnss_sdr_tpu.ops.track_kernel_blocked import (
            make_fused_tracker_blocked,
        )

        kern = make_fused_tracker_blocked(*args, **kw)
        return kern, kern.pack
    kern = make_fused_tracker_full(*args, **kw)
    if kern.replica == "window2":
        pack = tk.pack_code_table_ext
    else:
        from gnss_sdr_tpu.ops.correlator import pack_code_table as pack
    return kern, pack


def _pack_scalars(conf: DllPllConf, state: TrackingState) -> jnp.ndarray:
    """TrackingState -> [C, 24+2T] f32 scalar block (jit-traceable)."""
    narrow = state.narrow
    pll_bw = jnp.where(narrow, np.float32(conf.pll_bw_narrow_hz),
                       np.float32(conf.pll_bw_hz))
    dll_bw = jnp.where(narrow, np.float32(conf.dll_bw_narrow_hz),
                       np.float32(conf.dll_bw_hz))
    cols = [
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
        state.integ_len.astype(jnp.float32),
        state.integ_count.astype(jnp.float32),
        state.acc_samples.astype(jnp.float32),
        state.sec_idx.astype(jnp.float32),
        state.sec_active.astype(jnp.float32),
        state.use_atan2.astype(jnp.float32),
        state.fll_active.astype(jnp.float32),
        pll_bw,
        dll_bw,
        state.prev_prompt[:, 0].astype(jnp.float32),
        state.prev_prompt[:, 1].astype(jnp.float32),
        state.acc_data[:, 0].astype(jnp.float32),
        state.acc_data[:, 1].astype(jnp.float32),
        state.acc_data_count.astype(jnp.float32),
    ]
    for ti in range(conf.num_taps):
        cols.append(state.acc_taps[:, ti, 0].astype(jnp.float32))
        cols.append(state.acc_taps[:, ti, 1].astype(jnp.float32))
    # FDMA slot offset, reduced to [-pi, pi) rad/sample in f64 first —
    # MHz offsets are exact in this representation
    w = 2.0 * np.pi * state.carrier_offset / np.float64(conf.fs)
    w_red = jnp.mod(w + np.pi, 2.0 * np.pi) - np.pi
    cols.append(w_red.astype(jnp.float32))
    return jnp.stack(cols, axis=1)


@partial(jax.jit, static_argnames=("conf", "pack_spec", "kern"))
def fused_track_block_packed(
    conf: DllPllConf,
    pack_spec,                  # hostpack.PackSpec, batch_ndim=2
    kern,                       # make_fused_tracker_full result (hashable fn)
    state: TrackingState,
    window_ri: jnp.ndarray,     # [L, 2] f32 re/im stream window
    codes_q: jnp.ndarray,       # [C, Q, 128] packed (pilot) code table
    dcodes_q: jnp.ndarray | None = None,
    sec_p: jnp.ndarray | None = None,
    sec_d: jnp.ndarray | None = None,
):
    """One fused block: same contract as dll_pll.track_block_packed but
    the K-period loop runs inside a single Mosaic launch."""
    t = conf.num_taps
    p_idx = t // 2
    rows_p = kern.rows_p
    length = window_ri.shape[0]
    pad = (-length) % 128 + getattr(kern, "pad_rows", rows_p) * 128
    wr = jnp.concatenate(
        [window_ri[:, 0], jnp.zeros((pad,), jnp.float32)]).reshape(-1, 128)
    wi = jnp.concatenate(
        [window_ri[:, 1], jnp.zeros((pad,), jnp.float32)]).reshape(-1, 128)

    scal = _pack_scalars(conf, state)
    if conf.track_pilot:
        rows = kern(wr, wi, codes_q, scal, dcodes_q, sec_p, sec_d)
    else:
        rows = kern(wr, wi, codes_q, scal)

    def col(ln):
        return rows[:, :, ln].T                         # [S, C]

    n = col(LANE_N)
    dop = col(LANE_DOPPLER)
    dop_pre = jnp.concatenate(
        [state.carrier_doppler[None, :].astype(jnp.float32), dop[:-1]],
        axis=0)
    # f64 accumulated carrier phase for the observables (kernel holds
    # phase mod 2pi in f32; enabled-gating happens at state fold below).
    # FDMA: the NCO frequency includes the slot offset (dll_pll.py
    # nco_freq = doppler + carrier_offset).
    nco = dop_pre.astype(jnp.float64)
    if conf.fdma:
        nco = nco + state.carrier_offset[None, :]
    dphi = (2.0 * np.pi / np.float64(conf.fs)) * nco * n.astype(jnp.float64)
    phase = state.carrier_phase[None, :] + jnp.cumsum(dphi, axis=0)

    boundary = col(LANE_BOUND) > 0.5
    data_boundary = col(LANE_DATA_BOUND) > 0.5
    outs = {
        "prompt": jax.lax.complex(col(2 * p_idx), col(2 * p_idx + 1)),
        "taps": jnp.stack(
            [jax.lax.complex(col(2 * ti), col(2 * ti + 1))
             for ti in range(t)], axis=-1),
        "boundary": boundary,
        "acc_prompt": jax.lax.complex(
            col(LANE_ACC0 + 2 * p_idx), col(LANE_ACC0 + 2 * p_idx + 1)),
        "acc_samples": col(LANE_ACC_N).astype(jnp.int32),
        "carrier_doppler": dop,
        "code_freq": np.float64(conf.code_rate_cps)
        + col(LANE_DCODE).astype(jnp.float64),
        "carrier_phase": phase,
        "rem_code_phase": col(LANE_REM).astype(jnp.float64),
        "pos_end": col(LANE_POS).astype(jnp.int32),
        "n_samples": n.astype(jnp.int32),
        "data_prompt": jax.lax.complex(
            col(LANE_DATA_RE), col(LANE_DATA_IM)),
        "data_boundary": data_boundary,
        "data_count": col(LANE_DATA_CNT).astype(jnp.int32),
    }
    packed = pack_tree(outs, pack_spec)

    # ---- fold the final row back into the TrackingState -------------------
    last = rows[:, -1, :]                               # [C, 128]
    en = state.enabled
    bf = last[:, LANE_BOUND]
    dbf = last[:, LANE_DATA_BOUND]

    def g(new, old):
        return jnp.where(en, new, old)

    def g2(new, old):
        return jnp.where(en[:, None], new, old)

    acc_taps = jnp.stack([
        jnp.stack([last[:, LANE_ACC0 + 2 * ti] * (1.0 - bf),
                   last[:, LANE_ACC0 + 2 * ti + 1] * (1.0 - bf)], axis=-1)
        for ti in range(t)], axis=1)                    # [C, T, 2]
    new_state = state._replace(
        pos=g(last[:, LANE_POS].astype(jnp.int32), state.pos),
        rem_code_phase=g(last[:, LANE_REM].astype(jnp.float64),
                         state.rem_code_phase),
        code_freq=g(np.float64(conf.code_rate_cps)
                    + last[:, LANE_DCODE].astype(jnp.float64),
                    state.code_freq),
        carrier_phase=g(phase[-1], state.carrier_phase),
        carrier_doppler=g(last[:, LANE_DOPPLER], state.carrier_doppler),
        pll_state=g2(jnp.stack([last[:, LANE_PLL_I1],
                                last[:, LANE_PLL_I2]], axis=-1),
                     state.pll_state),
        dll_state=g2(jnp.stack([last[:, LANE_DLL_I1],
                                last[:, LANE_DLL_I2]], axis=-1),
                     state.dll_state),
        prev_prompt=g2(jnp.stack([last[:, LANE_PREV_RE],
                                  last[:, LANE_PREV_IM]], axis=-1),
                       state.prev_prompt),
        integ_count=g(last[:, LANE_ICOUNT].astype(jnp.int32),
                      state.integ_count),
        acc_taps=jnp.where(en[:, None, None], acc_taps, state.acc_taps),
        acc_samples=g((last[:, LANE_ACC_N] * (1.0 - bf)).astype(jnp.int32),
                      state.acc_samples),
        sec_idx=g(last[:, LANE_SEC_IDX].astype(jnp.int32), state.sec_idx),
        acc_data=g2(jnp.stack(
            [last[:, LANE_DATA_RE] * (1.0 - dbf),
             last[:, LANE_DATA_IM] * (1.0 - dbf)], axis=-1),
            state.acc_data),
        acc_data_count=g(
            (last[:, LANE_DATA_CNT] * (1.0 - dbf)).astype(jnp.int32),
            state.acc_data_count),
    )
    return new_state, packed.ravel()
