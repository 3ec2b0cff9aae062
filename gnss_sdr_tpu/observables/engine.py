"""Observables: common-epoch pseudorange / Doppler / carrier-phase formation.

Re-expression of the reference's hybrid_observables_gs
(observables/gnuradio_blocks/hybrid_observables_gs.cc, SURVEY.md §3.4):

- Tracking emits one record per PRN period (or extended integration) with
  an exact end-of-period sample stamp. Because tracking locks the code NCO
  to the signal, one code period corresponds to exactly
  ``code_period_s`` of *satellite signal time* — so once the telemetry
  decoder anchors a (TOW, sample stamp) pair at a subframe boundary, the
  satellite transmit time at every later period stamp is
  TOW + n_periods * code_period (interp_trk_obs analog, :376-473).
- At each common receiver-clock epoch (a fixed sample-count cadence, the
  gnss_sdr_sample_counter analog), every channel's transmit time, Doppler
  and accumulated carrier phase are linearly interpolated to the epoch
  sample, and pseudorange = c * (T_rx - t_tx) (compute_pranges, :526-555).
- The receiver-clock TOW is initialized from the first anchored channel as
  max(t_tx) + a nominal 68.802 ms transit and then advances strictly by
  the sample counter; the residual bias is estimated by PVT.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field

import numpy as np

from gnss_sdr_tpu.pvt.ephemeris import C_LIGHT

NOMINAL_TRANSIT_S = 0.068802


@dataclass
class ChannelObsState:
    anchored: bool = False
    t_tx: float = 0.0                 # satellite-clock time at last stamp
    last_stamp: int = -1
    # ring of (stamp, t_tx, doppler_hz, carrier_phase_cycles)
    hist: deque = field(default_factory=lambda: deque(maxlen=64))
    prn: int = 0
    system: str = "G"
    signal: str = "1C"
    cn0_dbhz: float = 0.0
    # per-channel signal geometry (multi-constellation / multi-band: one
    # engine serves mixed channels; stamps are in the channel's own band
    # sample rate `fs`, converted to seconds for the common rx clock)
    code_period_s: float = 0.0
    code_rate_cps: float = 0.0
    wavelength_m: float = 0.0
    fs: float = 0.0
    # FDMA (GLONASS): tracking's accumulated carrier phase includes the
    # deterministic slot-offset ramp; it is removed at push time so the
    # phase observable carries Doppler only (cycle-slip + Hatch math)
    carrier_offset_hz: float = 0.0
    # carrier-smoothing (Hatch filter) state
    sm_pr: float = np.nan
    sm_phase: float = np.nan
    sm_count: int = 0
    # cycle-slip detection state (reference hybrid_observables_gs.cc:594)
    last_dop: float = np.nan
    last_epoch_t: float = np.nan


@dataclass
class EpochObservation:
    channel: int
    prn: int
    t_tx_sv: float                    # interpolated transmit time (SV clock)
    pseudorange_m: float              # raw code pseudorange
    pseudorange_smoothed_m: float     # carrier-smoothed (Hatch)
    doppler_hz: float
    carrier_phase_cycles: float
    cn0_dbhz: float
    system: str = "G"
    signal: str = "1C"


class ObservablesEngine:
    def __init__(
        self,
        fs: float,
        code_period_s: float,
        num_channels: int,
        code_rate_cps: float = 1.023e6,
        carrier_freq_hz: float = 1575.42e6,
        smoothing_epochs: int = 100,
    ) -> None:
        self.fs = fs
        self.code_period_s = code_period_s
        self.code_rate_cps = code_rate_cps
        self.wavelength_m = C_LIGHT / carrier_freq_hz
        self.smoothing_epochs = smoothing_epochs
        self.ch = [ChannelObsState() for _ in range(num_channels)]
        for st in self.ch:
            st.code_period_s = code_period_s
            st.code_rate_cps = code_rate_cps
            st.wavelength_m = self.wavelength_m
            st.fs = fs
        self.t_rx_tow: float | None = None    # receiver TOW at rx_ref_time_s
        self.rx_ref_stamp: int = 0            # in engine-fs samples
        self.rx_ref_time_s: float = 0.0

    def configure_channel(
        self,
        ch: int,
        code_period_s: float,
        code_rate_cps: float,
        carrier_freq_hz: float,
        system: str = "G",
        fs: float | None = None,
        signal: str = "1C",
        carrier_offset_hz: float = 0.0,
    ) -> None:
        """Set one channel's signal geometry (multi-constellation mixing;
        the reference's hybrid_observables reads these off each channel's
        Gnss_Synchro). `fs` is the channel's band sample rate (dual-band
        receivers run bands at different rates; stamps are band-local).
        ``carrier_freq_hz`` is the channel's ACTUAL carrier (for GLONASS,
        slot frequency = band center + k * 562.5 kHz)."""
        st = self.ch[ch]
        st.code_period_s = code_period_s
        st.code_rate_cps = code_rate_cps
        st.wavelength_m = C_LIGHT / carrier_freq_hz
        st.system = system
        st.signal = signal
        st.fs = self.fs if fs is None else fs
        st.carrier_offset_hz = carrier_offset_hz

    # ------------------------------------------------------------- anchoring
    def anchor(
        self, ch: int, prn: int, tow_s: float, stamp: int,
        rem_code_chips: float = 0.0,
    ) -> None:
        """Telemetry gave: the period boundary crossed just before `stamp`
        is satellite signal time `tow_s`; at the integer sample `stamp` the
        code has advanced `rem_code_chips` past it (sub-chip part of the
        transmit time — 1 chip is ~300 m of pseudorange)."""
        st = self.ch[ch]
        st.prn = prn
        st.anchored = True
        st.t_tx = tow_s                    # integer-boundary signal time
        st.last_stamp = stamp
        st.hist.clear()
        st.hist.append(
            (stamp, tow_s + rem_code_chips / st.code_rate_cps, np.nan, np.nan)
        )
        if self.t_rx_tow is None:
            self.t_rx_tow = tow_s + NOMINAL_TRANSIT_S
            self.rx_ref_time_s = stamp / st.fs
            self.rx_ref_stamp = int(round(self.rx_ref_time_s * self.fs))

    def deanchor(self, ch: int) -> None:
        self.ch[ch] = ChannelObsState()

    # ------------------------------------------------------ tracking updates
    def push_periods(
        self,
        ch: int,
        stamps: np.ndarray,           # [K] period-end sample stamps, ordered
        rem_code_chips: np.ndarray,   # [K] code phase past the boundary
        dopplers: np.ndarray,         # [K] Hz
        carrier_phase_rad: np.ndarray,  # [K] accumulated rad at period end
        cn0_dbhz: float = 0.0,
    ) -> None:
        st = self.ch[ch]
        st.cn0_dbhz = cn0_dbhz
        if not st.anchored:
            return
        periods_per_s = 1.0 / st.code_period_s
        for k in range(len(stamps)):
            s = int(stamps[k])
            if s <= st.last_stamp:
                continue
            # each tracked period advances satellite time by one code period
            dt = (s - st.last_stamp) / st.fs
            n = round(dt * periods_per_s)
            # TOW-consistency check (reference cross-checks interpolated TOW
            # against TOW_at_current_symbol_ms): a stamp gap that is not a
            # clean whole number of periods means periods were dropped —
            # propagating round() here would silently slip TOW by whole
            # code periods (~300 km of pseudorange per ms).  De-anchor and
            # wait for the next telemetry anchor instead.  Large n is
            # normal right after an anchor (telemetry decoders buffer
            # several seconds before the message resolves), and code
            # Doppler legitimately skews dt by ~|f_d|/f_carrier (up to
            # ~2e-5 of the gap) — the tolerance scales with the gap.
            tol = 0.05 * st.code_period_s + 2.0e-5 * dt
            if n < 1 or n > 60_000 or abs(dt - n * st.code_period_s) > tol:
                self.deanchor_keep_signal(ch)
                return
            st.t_tx += n * st.code_period_s
            st.last_stamp = s
            phase_cyc = float(carrier_phase_rad[k]) / (2.0 * np.pi)
            if st.carrier_offset_hz:
                phase_cyc -= st.carrier_offset_hz * (s / st.fs)
            st.hist.append(
                (s, st.t_tx + float(rem_code_chips[k]) / st.code_rate_cps,
                 float(dopplers[k]), phase_cyc)
            )

    def apply_clock_correction(self, delta_s: float) -> None:
        """Slew the receiver clock by -delta_s (reference
        apply_rx_clock_offset, rtklib_pvt_gs.cc:1834: PVT feeds its
        estimated bias back so pseudoranges stay near the nominal transit
        time). Hatch states shift with the clock so smoothing continuity
        is preserved."""
        if self.t_rx_tow is None:
            return
        self.t_rx_tow -= delta_s
        for st in self.ch:
            if np.isfinite(st.sm_pr):
                st.sm_pr -= C_LIGHT * delta_s

    def deanchor_keep_signal(self, ch: int) -> None:
        """Drop the TOW anchor (channel re-anchors at the next telemetry
        event) but keep the signal geometry configuration."""
        st = self.ch[ch]
        st.anchored = False
        st.last_stamp = -1
        st.hist.clear()
        st.sm_pr = np.nan
        st.sm_phase = np.nan
        st.sm_count = 0

    # ---------------------------------------------------------------- epochs
    def rx_tow_at(self, stamp: float) -> float | None:
        """Receiver TOW at an engine-fs sample stamp."""
        return self.rx_tow_at_time(stamp / self.fs)

    def rx_tow_at_time(self, t_s: float) -> float | None:
        if self.t_rx_tow is None:
            return None
        return self.t_rx_tow + (t_s - self.rx_ref_time_s)

    def epoch(self, stamp: int) -> list[EpochObservation]:
        """Interpolate all anchored channels to the given rx sample stamp
        (engine-fs units; use epoch_time for the band-agnostic form)."""
        return self.epoch_time(stamp / self.fs)

    def epoch_time(self, t_s: float) -> list[EpochObservation]:
        """Interpolate all anchored channels to receiver stream time t_s."""
        t_rx = self.rx_tow_at_time(t_s)
        if t_rx is None:
            return []
        out = []
        for ci, st in enumerate(self.ch):
            if not st.anchored or len(st.hist) < 3:
                continue
            stamp = t_s * st.fs               # band-local sample stamp
            h = list(st.hist)
            stamps = np.array([e[0] for e in h], dtype=np.float64)
            if not (stamps[0] <= stamp <= stamps[-1]):
                continue
            i = int(np.searchsorted(stamps, stamp, side="right")) - 1
            i = min(max(i, 0), len(h) - 2)
            s0, t0, d0, p0 = h[i]
            s1, t1, d1, p1 = h[i + 1]
            if s1 == s0:
                continue
            w = (stamp - s0) / (s1 - s0)
            t_tx = t0 + w * (t1 - t0)
            dop = d0 + w * (d1 - d0) if np.isfinite(d0) else d1
            phase = p0 + w * (p1 - p0) if np.isfinite(p0) else np.nan
            # week rollover (reference compute_pranges,
            # hybrid_observables_gs.cc:526-555): T_rx and t_tx may sit on
            # opposite sides of the 604800 s week boundary
            dt_wk = t_rx - t_tx
            if dt_wk > 302400.0:
                dt_wk -= 604800.0
            elif dt_wk < -302400.0:
                dt_wk += 604800.0
            pr = C_LIGHT * dt_wk

            # Cycle-slip detection (reference hybrid_observables_gs.cc:594):
            # the carrier phase accumulates integrated Doppler; a slip shows
            # as a phase step the Doppler history cannot explain.  On a slip
            # the Hatch filter restarts (a slipped phase would drag the
            # smoothed pseudorange by wavelength * slip cycles).
            slipped = False
            if (
                np.isfinite(phase) and np.isfinite(st.sm_phase)
                and np.isfinite(st.last_dop)
            ):
                dt_ep = t_s - st.last_epoch_t
                pred = st.sm_phase + 0.5 * (dop + st.last_dop) * dt_ep
                slipped = abs(phase - pred) > 5.0 + 0.02 * abs(dop) * dt_ep
            st.last_dop = dop
            st.last_epoch_t = t_s

            # Hatch carrier smoothing (reference smooth_pseudoranges,
            # hybrid_observables_gs.cc:557): range change between epochs is
            # -wavelength * delta(carrier phase); blend in the code
            # pseudorange with weight 1/N
            if np.isfinite(phase) and np.isfinite(st.sm_phase) and not slipped:
                st.sm_count = min(st.sm_count + 1, self.smoothing_epochs)
                alpha = 1.0 / st.sm_count
                propagated = st.sm_pr - st.wavelength_m * (
                    phase - st.sm_phase
                )
                st.sm_pr = alpha * pr + (1.0 - alpha) * propagated
            else:
                st.sm_pr = pr
                st.sm_count = 1
            st.sm_phase = phase

            out.append(EpochObservation(
                channel=ci,
                prn=st.prn,
                t_tx_sv=t_tx,
                pseudorange_m=pr,
                pseudorange_smoothed_m=st.sm_pr,
                doppler_hz=dop,
                carrier_phase_cycles=phase,
                cn0_dbhz=st.cn0_dbhz,
                system=st.system,
                signal=st.signal,
            ))
        return out
