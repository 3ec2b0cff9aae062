"""End-to-end GPS L1 C/A receiver: acquisition -> tracking -> telemetry ->
observables -> PVT.

Host-side orchestration playing the roles of the reference's ControlThread
event loop + GNSSFlowgraph channel management (SURVEY.md §3.1-3.4), around
the batched device engines:

- acquisition: one batched PCPS call over the PRN search list
  (flowgraph acquisition_manager analog, gnss_flowgraph.cc:1698-1781);
- tracking: Tracker blocks (all channels in one device program);
- telemetry: per-channel LnavDecoder fed with extended-integration symbol
  signs (bit-synced 20 ms prompts);
- observables: ObservablesEngine anchored by subframe TOW events;
- PVT: solve_pvt at a fixed epoch cadence.

The sample stream is host-buffered with absolute indexing; the tracker
requests [base, base+window) slices (overlap-save).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from gnss_sdr_tpu.acquisition import AcqConfig, PcpsAcquisition
from gnss_sdr_tpu.codes.gps_l1_ca import gps_l1_ca_code_table
from gnss_sdr_tpu.constants import gps_l1_ca as G
from gnss_sdr_tpu.observables.engine import ObservablesEngine
from gnss_sdr_tpu.pvt.atmosphere import KlobucharParams
from gnss_sdr_tpu.pvt.solver import ObsEpoch, PvtSolution, solve_pvt
from gnss_sdr_tpu.telemetry.lnav import GpsEphemeris, LnavDecoder
from gnss_sdr_tpu.tracking import ChannelPhase, DllPllConf, Tracker


@dataclass
class ReceiverConfig:
    fs: float = 2.6e6
    num_channels: int = 8
    search_prns: tuple = tuple(range(1, 33))
    doppler_max_hz: float = 5000.0
    doppler_step_hz: float = 250.0
    acq_dwells: int = 2
    acq_pfa: float = 1e-3
    obs_interval_ms: int = 20
    pvt_interval_ms: int = 100
    extend_correlation_symbols: int = 20
    pll_bw_hz: float = 35.0
    dll_bw_hz: float = 2.0
    pll_bw_narrow_hz: float = 7.5
    dll_bw_narrow_hz: float = 0.75
    enable_fll_pull_in: bool = True
    fll_bw_hz: float = 4.0
    pull_in_time_s: float = 0.25
    # Hatch window (in obs epochs): DLL noise decorrelates only at ~1/(2*Bn)
    # (~0.7 s at 0.75 Hz), so a multi-second window is needed to average it
    carrier_smoothing_epochs: int = 400
    apply_atmosphere: bool = False      # simulator currently emits none


@dataclass
class ReceiverStatus:
    fixes: list = field(default_factory=list)       # PvtSolution list
    ttff_s: float | None = None
    subframes: int = 0
    acquired: dict = field(default_factory=dict)    # prn -> (doppler, delay)


class Receiver:
    def __init__(self, cfg: ReceiverConfig) -> None:
        self.cfg = cfg
        self.code_table = gps_l1_ca_code_table()

        self.acq_conf = AcqConfig(
            fs=cfg.fs,
            code_length_chips=G.CODE_LENGTH_CHIPS,
            code_rate_cps=G.CODE_RATE_CPS,
            doppler_max_hz=cfg.doppler_max_hz,
            doppler_step_hz=cfg.doppler_step_hz,
            max_dwells=cfg.acq_dwells,
            pfa=cfg.acq_pfa,
        )
        self.acq = PcpsAcquisition(
            self.acq_conf, self.code_table, list(range(1, 33))
        )
        self.trk_conf = DllPllConf(
            fs=cfg.fs,
            code_length_chips=G.CODE_LENGTH_CHIPS,
            code_rate_cps=G.CODE_RATE_CPS,
            carrier_freq_hz=G.FREQ_HZ,
            pll_bw_hz=cfg.pll_bw_hz,
            dll_bw_hz=cfg.dll_bw_hz,
            pll_bw_narrow_hz=cfg.pll_bw_narrow_hz,
            dll_bw_narrow_hz=cfg.dll_bw_narrow_hz,
            enable_fll_pull_in=cfg.enable_fll_pull_in,
            fll_bw_hz=cfg.fll_bw_hz,
            pull_in_time_s=cfg.pull_in_time_s,
            extend_correlation_symbols=cfg.extend_correlation_symbols,
            max_channels=cfg.num_channels,
        )
        self.tracker = Tracker(self.trk_conf, self.code_table)
        self.obs = ObservablesEngine(
            cfg.fs, self.trk_conf.code_period_s, cfg.num_channels,
            code_rate_cps=G.CODE_RATE_CPS,
            carrier_freq_hz=G.FREQ_HZ,
            smoothing_epochs=cfg.carrier_smoothing_epochs,
        )
        self.decoders: dict[int, LnavDecoder] = {}
        self.channel_prn = [0] * cfg.num_channels
        self.ephemerides: dict[int, GpsEphemeris] = {}
        self.iono = KlobucharParams()
        self.status = ReceiverStatus()
        self._next_epoch: int | None = None
        self._recent_rem: dict = {}
        self._last_pvt_tow: float = -1e9
        self._last_fix: PvtSolution | None = None

        # sample stream buffer (absolute indexing)
        self._buf = np.zeros(0, dtype=np.complex64)
        self._buf_base = 0
        self._stream_end = 0

    # ---------------------------------------------------------------- stream
    def feed(self, chunk: np.ndarray) -> None:
        """Append samples to the stream buffer."""
        chunk = np.asarray(chunk, dtype=np.complex64)
        self._buf = np.concatenate([self._buf, chunk])
        self._stream_end += len(chunk)

    def _slice(self, start: int, n: int) -> np.ndarray | None:
        if start < self._buf_base or start + n > self._stream_end:
            return None
        off = start - self._buf_base
        return self._buf[off : off + n]

    def _trim(self, keep_from: int) -> None:
        drop = keep_from - self._buf_base
        if drop > 0:
            self._buf = self._buf[drop:]
            self._buf_base = keep_from

    # ----------------------------------------------------------- acquisition
    def acquire(self, at_sample: int | None = None) -> dict:
        """Batched PCPS over the search list; assign detections to idle
        channels and start tracking (cold-start acquisition_manager)."""
        cfg = self.cfg
        n = self.acq_conf.input_samples
        start = self._buf_base if at_sample is None else at_sample
        x = self._slice(start, n)
        if x is None:
            raise ValueError("not enough samples buffered for acquisition")

        prns = [p for p in cfg.search_prns if p not in self.channel_prn]
        xb = np.broadcast_to(x, (len(prns), n))
        res = self.acq.acquire(xb, np.array([p - 1 for p in prns]))

        order = np.argsort(-res.test_statistic)
        started = {}
        for idx in order:
            if not res.detected[idx]:
                continue
            prn = prns[idx]
            ch = self._idle_channel()
            if ch is None:
                break
            self.tracker.start_channel(
                ch, prn, prn - 1,
                acq_delay_samples=float(res.delay_samples[idx]),
                acq_doppler_hz=float(res.doppler_hz[idx]),
                acq_samplestamp=start,
                current_abs_sample=start,
            )
            self.channel_prn[ch] = prn
            self.decoders[prn] = LnavDecoder(prn)
            started[prn] = (
                float(res.doppler_hz[idx]), float(res.delay_samples[idx])
            )
        self.status.acquired.update(started)
        return started

    def _idle_channel(self) -> int | None:
        for i in range(self.cfg.num_channels):
            if self.tracker.ctl[i].phase in (ChannelPhase.IDLE, ChannelPhase.LOST):
                return i
        return None

    # ----------------------------------------------------------------- main
    def run(self, max_blocks: int | None = None) -> ReceiverStatus:
        """Process as much buffered stream as possible."""
        blocks = 0
        while max_blocks is None or blocks < max_blocks:
            if not self.tracker.active_channels():
                break
            base, w = self.tracker.window_request()
            window = self._slice(base, w)
            if window is None:
                break
            result = self.tracker.process(window, base)
            blocks += 1
            self._handle_block(result)
            self._run_epochs()
            self._trim(int(min(self.tracker.pos_abs[
                self.tracker.active_channels()])) if self.tracker.active_channels()
                else self._stream_end)
        return self.status

    # ------------------------------------------------------------- per block
    def _handle_block(self, result) -> None:
        conf = self.trk_conf
        out = result.outputs
        for ch in range(self.cfg.num_channels):
            ctl = self.tracker.ctl[ch]
            if ctl.phase not in (ChannelPhase.WIDE, ChannelPhase.NARROW):
                continue
            prn = self.channel_prn[ch]
            # observables: every period's stamp/code-phase/doppler/phase
            self.obs.push_periods(
                ch,
                result.abs_sample_end[:, ch],
                out["rem_code_phase"][:, ch],
                out["carrier_doppler"][:, ch],
                out["carrier_phase"][:, ch],
                cn0_dbhz=ctl.cn0_dbhz,
            )
            # sub-chip code phase by stamp, for anchoring telemetry TOWs
            rem_map = self._recent_rem.setdefault(ch, {})
            for k in range(result.abs_sample_end.shape[0]):
                rem_map[int(result.abs_sample_end[k, ch])] = float(
                    out["rem_code_phase"][k, ch]
                )
            if len(rem_map) > 200:
                for s in sorted(rem_map)[:-100]:
                    del rem_map[s]
            # telemetry: full extended symbols only (bit-aligned prompts)
            if ctl.phase == ChannelPhase.NARROW and prn in self.decoders:
                b = out["boundary"][:, ch]
                n_acc = out["acc_samples"][:, ch]
                full = b & (
                    n_acc > conf.samples_per_code
                    * (self.cfg.extend_correlation_symbols - 0.5)
                )
                if full.any():
                    signs = np.sign(out["acc_prompt"][full, ch].real)
                    stamps = result.abs_sample_end[full, ch]
                    events = self.decoders[prn].push_bits(signs, stamps)
                    for ev in events:
                        self.status.subframes += 1
                        rem = self._recent_rem.get(ch, {}).get(
                            int(ev["sample_stamp"]), 0.0
                        )
                        self.obs.anchor(
                            ch, prn, ev["tow_s"], ev["sample_stamp"],
                            rem_code_chips=rem,
                        )
                        if ev["ephemeris_complete"]:
                            self.ephemerides[prn] = self.decoders[prn].eph

    # --------------------------------------------------------------- epochs
    def _run_epochs(self) -> None:
        cfg = self.cfg
        if self.obs.t_rx_tow is None:
            return
        interval = int(round(cfg.fs * cfg.obs_interval_ms / 1000.0))
        if self._next_epoch is None:
            self._next_epoch = (
                (self.obs.rx_ref_stamp // interval) + 2
            ) * interval
        # epochs must stay within all channels' pushed history
        act = self.tracker.active_channels()
        if not act:
            return
        horizon = int(min(self.tracker.pos_abs[act]))
        while self._next_epoch + interval < horizon:
            stamp = self._next_epoch
            self._next_epoch += interval
            epoch_obs = self.obs.epoch(stamp)
            usable = [o for o in epoch_obs if o.prn in self.ephemerides]
            t_rx = self.obs.rx_tow_at(stamp)
            if len(usable) >= 4 and (
                t_rx - self._last_pvt_tow >= cfg.pvt_interval_ms / 1000.0 - 1e-9
            ):
                self._last_pvt_tow = t_rx
                obs_list = [
                    ObsEpoch(
                        prn=o.prn,
                        pseudorange_m=o.pseudorange_smoothed_m,
                        doppler_hz=o.doppler_hz,
                        carrier_phase_cycles=o.carrier_phase_cycles,
                        cn0_dbhz=o.cn0_dbhz,
                    )
                    for o in usable
                ]
                x0 = (
                    self._last_fix.pos_ecef if self._last_fix is not None
                    else None
                )
                sol = solve_pvt(
                    obs_list, self.ephemerides, t_rx,
                    iono=self.iono if self.cfg.apply_atmosphere else None,
                    x0=x0,
                    apply_atmosphere=self.cfg.apply_atmosphere,
                )
                if sol.valid:
                    self._last_fix = sol
                    self.status.fixes.append(sol)
                    if self.status.ttff_s is None:
                        self.status.ttff_s = stamp / cfg.fs
