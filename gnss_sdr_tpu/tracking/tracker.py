"""Host-side tracking controller around the batched device engine.

Plays the role of the reference's per-channel state machine (states 0-4 of
dll_pll_veml_tracking.cc general_work, :1898-2260) and the channel FSM's
tracking side (src/algorithms/channel/libs/channel_fsm.cc), re-expressed as
block-wise control: the device advances all channels `steps_per_block` PRN
periods per call; between calls the host

- pulls the per-period outputs (one small d2h per block),
- runs bit synchronization (histogram of prompt sign flips, the reference's
  libs/bit_synchronizer.cc approach),
- estimates C/N0 + carrier lock and counts lock failures
  (cn0_and_tracking_lock_status, dll_pll_veml_tracking.cc:1167-1230),
- switches channels to narrow-bandwidth extended integration after sync
  (extend_correlation_symbols), or flags loss of lock for the flowgraph.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import IntEnum

import jax
import jax.numpy as jnp
import numpy as np

from gnss_sdr_tpu.tracking.conf import DllPllConf
from gnss_sdr_tpu.tracking.dll_pll import TrackingState, init_state, track_block
from gnss_sdr_tpu.tracking.lock_detectors import carrier_lock_detector, cn0_svn_estimator
from gnss_sdr_tpu.utils.cplx import dev_combine, host_to_ri
from gnss_sdr_tpu.utils.hostpack import make_spec, pack_tree, unpack_tree
from gnss_sdr_tpu.utils.transfer import fetch


class ChannelPhase(IntEnum):
    IDLE = 0
    WIDE = 1        # 1-period integration, wide bandwidths (+ optional FLL)
    NARROW = 2      # bit-synced, extended integration, narrow bandwidths
    LOST = 3        # loss of lock flagged; awaiting flowgraph action


@dataclass
class ChannelControl:
    phase: ChannelPhase = ChannelPhase.IDLE
    prn: int = 0
    total_periods: int = 0           # code periods processed since start
    bit_hist: np.ndarray = field(
        default_factory=lambda: np.zeros(0, dtype=np.int64))
    transitions: int = 0
    last_sign: float = 0.0
    bit_phase: int = -1              # period index (mod codes_per_bit) of bit edge
    prompt_hist: list = field(default_factory=list)
    hist_n: int = 0                  # samples per prompt in the history
    cn0_dbhz: float = 0.0
    carrier_lock: float = 0.0
    lock_fail_blocks: int = 0
    # pilot secondary-code sync (reference acquire_secondary)
    sec_hist: list = field(default_factory=list)   # per-period prompt signs
    sec_hist_start: int = 0          # period index of sec_hist[0]
    sec_locked: bool = False
    # no loss-of-lock verdicts before this period index: mode switches
    # (engage extended/secondary) restart the transient clock — the narrow
    # loop needs ~1/w0 seconds to unwind the phase error it inherits
    # (reference resets its fail counters on state transitions)
    warmup_until_period: int = 0
    # TOW-aided tracking (reference telemetry_to_trk message path,
    # dll_pll_veml_tracking.cc:757 msg_handler_telemetry_to_trk +
    # :1921-1937): last TOW received from the telemetry decoder and its
    # projection to the channel's current sample
    tow_ms_received: float = -1.0
    tow_wn_received: int = 0
    tow_sample_stamp: int = 0
    tow_from_telemetry_ms: float = -1.0
    wn_from_telemetry: int = 0
    # telemetry fault (tlm_event == 1): force loss-of-lock next block
    telemetry_fault: bool = False


@dataclass
class BlockResult:
    """Host copies of one block's outputs plus bookkeeping."""

    outputs: dict                    # str -> np.ndarray [S, C]
    abs_sample_end: np.ndarray       # [S, C] i64 absolute sample stamps
    events: list                     # (channel, "loss_of_lock" | "bit_sync")


class Tracker:
    """Batched multi-channel tracker with host FSM."""

    def __init__(
        self,
        conf: DllPllConf,
        code_table: np.ndarray,
        data_code_table: np.ndarray | None = None,
        sec_pilot_table: np.ndarray | None = None,
        sec_data_levels: np.ndarray | None = None,
        mesh=None,
    ) -> None:
        """code_table: [P, L] PRN chip levels (the PILOT component when
        conf.track_pilot). Pilot plans additionally provide the data-code
        table, the per-PRN pilot secondary table [P, sec_len_pilot], and the
        shared data secondary [sec_len_data].

        `mesh`: optional jax.sharding.Mesh with a "ch" axis — channel-axis
        state/codes shard across devices, the sample window replicates, and
        the packed per-period outputs gather on fetch (SURVEY.md §2.4
        P2/P10). conf.max_channels must divide evenly."""
        self.conf = conf
        self.code_table = np.asarray(code_table, dtype=np.float32)
        # materialize the initial state inside a compiled program so its
        # complex64/f64 leaves are born on device (no host->device transfer
        # of unsupported dtypes; see utils/cplx.py)
        self.state: TrackingState = jax.jit(lambda: init_state(conf))()
        c = conf.max_channels
        self.codes = np.zeros((c, code_table.shape[1]), dtype=np.float32)
        self._codes_dev = None         # device cache of code/sec tables
        self.pos_abs = np.zeros(c, dtype=np.int64)    # absolute next sample
        self.ctl = [ChannelControl() for _ in range(c)]
        for ch in self.ctl:
            ch.bit_hist = np.zeros(conf.codes_per_bit, dtype=np.int64)

        if conf.track_pilot:
            assert data_code_table is not None and sec_pilot_table is not None
            self.data_code_table = np.asarray(data_code_table, np.float32)
            self.sec_pilot_table = np.asarray(sec_pilot_table, np.float32)
            self.data_codes = np.zeros_like(self.codes)
            self.sec_pilot = np.ones((c, conf.sec_len_pilot), np.float32)
            self.sec_data = np.ones((c, conf.sec_len_data), np.float32)
            if sec_data_levels is not None:
                self.sec_data[:] = np.asarray(sec_data_levels, np.float32)
            self._sec_data_base = self.sec_data[0].copy()
        else:
            self.data_code_table = None
            self.data_codes = None
            self.sec_pilot = None
            self.sec_data = None

        # Block outputs leave the device as ONE packed f32 tensor per call
        # (single d2h round trip; some TPU runtimes cannot transfer
        # complex64/bool buffers at all — see utils/hostpack.py).
        t = conf.num_taps
        shapes = {
            "prompt": ((), np.complex64),
            "taps": ((t,), np.complex64),
            "boundary": ((), np.bool_),
            "acc_prompt": ((), np.complex64),
            "acc_samples": ((), np.int32),
            "carrier_doppler": ((), np.float32),
            "code_freq": ((), np.float64),
            "carrier_phase": ((), np.float64),
            "rem_code_phase": ((), np.float64),
            "pos_end": ((), np.int32),
            "n_samples": ((), np.int32),
            "data_prompt": ((), np.complex64),
            "data_boundary": ((), np.bool_),
            "data_count": ((), np.int32),
        }
        self._spec = make_spec(
            {k: np.empty((1, 1) + tr, dt) for k, (tr, dt) in shapes.items()},
            batch_ndim=2,
        )
        spec = self._spec

        # per-step pack spec ([C]-batch): packing inside the scan step
        # collapses ~24 stacked output buffers into one (same sorted-key
        # lane layout as the [S, C]-batch spec used to unpack on host)
        step_spec = make_spec(
            {k: np.empty((1,) + tr, dt) for k, (tr, dt) in shapes.items()},
            batch_ndim=1,
        )

        def _track_packed(state, window_ri, codes, data_codes, sec_p, sec_d):
            from gnss_sdr_tpu.tracking.dll_pll import track_block_packed

            new_state, packed = track_block_packed(
                conf, step_spec, state, dev_combine(window_ri), codes,
                data_codes, sec_p, sec_d
            )
            # raveled so the output buffer has a trivial layout (some remote
            # runtimes cannot transfer non-default-layout buffers)
            return new_state, packed.ravel()

        # Fused on-chip engine (tracking/fused.py): default on TPU for
        # eligible plans — the XLA scan stays as the fallback for FDMA/KF/
        # sharded meshes and oversized windows (f32 sample positions must
        # stay exact, < 2^24)
        from gnss_sdr_tpu.tracking.fused import (
            build_fused_engine,
            fused_eligible,
        )

        want_fused = (conf.fused_tracker if conf.fused_tracker is not None
                      else jax.default_backend() == "tpu")
        self._use_fused = bool(want_fused) and fused_eligible(conf, mesh)
        if self._use_fused:
            self._fused_kern, self._fused_pack = build_fused_engine(conf)

        self.mesh = mesh
        if mesh is None:
            self._track_packed = jax.jit(_track_packed)
        else:
            from gnss_sdr_tpu.parallel.sharding import (
                CHANNEL_AXIS,
                state_shardings,
            )
            from jax.sharding import NamedSharding, PartitionSpec as P

            if conf.max_channels % mesh.devices.size:
                raise ValueError(
                    f"{conf.max_channels} channels do not divide over "
                    f"{mesh.devices.size} devices"
                )
            row2 = NamedSharding(mesh, P(CHANNEL_AXIS, None))
            rep = NamedSharding(mesh, P())
            self._track_packed = jax.jit(
                _track_packed,
                in_shardings=(
                    state_shardings(mesh), rep, row2,
                    row2 if conf.track_pilot else None,
                    row2 if conf.track_pilot else None,
                    row2 if conf.track_pilot else None,
                ),
                # packed output raveled [S*C*lanes]: gather to host layout
                out_shardings=(state_shardings(mesh), rep),
            )

    # ----------------------------------------------------------------- setup
    def start_channel(
        self,
        ch: int,
        prn: int,
        code_row: int,
        acq_delay_samples: float,
        acq_doppler_hz: float,
        acq_samplestamp: int,
        current_abs_sample: int,
        carrier_offset_hz: float = 0.0,
    ) -> None:
        """Pull-in: align to the first code boundary at/after the stream head
        (reference state 1, dll_pll_veml_tracking.cc:1949-1982).

        The projection uses the Doppler-corrected code period: projecting
        far ahead (e.g. to a device-stream buffer base) with the nominal
        period accumulates code-Doppler slip (~4 samples per second at
        5 kHz Doppler) and hands tracking a dead code phase."""
        conf = self.conf
        fd0 = float(acq_doppler_hz)
        period = conf.samples_per_code / (1.0 + fd0 / conf.carrier_freq_hz)
        boundary = acq_samplestamp + acq_delay_samples
        if boundary < current_abs_sample:
            k = int(np.ceil((current_abs_sample - boundary) / period))
            boundary += k * period
        # first integer sample at/after the code boundary; the sub-sample
        # remainder becomes the initial code phase in chips
        start = int(np.ceil(boundary))
        rem0 = (start - boundary) * conf.code_rate_cps / conf.fs

        self.codes[ch] = self.code_table[code_row]
        self._codes_dev = None         # code tables changed
        if conf.track_pilot:
            self.data_codes[ch] = self.data_code_table[code_row]
            self.sec_pilot[ch] = self.sec_pilot_table[code_row]
            self.sec_data[ch] = self._sec_data_base
        self.pos_abs[ch] = start
        self.ctl[ch] = ChannelControl(phase=ChannelPhase.WIDE, prn=prn)
        self.ctl[ch].bit_hist = np.zeros(conf.codes_per_bit, dtype=np.int64)
        self.ctl[ch].warmup_until_period = int(
            conf.lock_warmup_s / conf.code_period_s
        )

        fd = float(acq_doppler_hz)
        code_freq = conf.code_rate_cps * (1.0 + fd / conf.carrier_freq_hz)
        s = self.state
        self.state = s._replace(
            enabled=s.enabled.at[ch].set(True),
            pos=s.pos.at[ch].set(0),
            rem_code_phase=s.rem_code_phase.at[ch].set(rem0),
            code_freq=s.code_freq.at[ch].set(code_freq),
            carrier_phase=s.carrier_phase.at[ch].set(0.0),
            carrier_doppler=s.carrier_doppler.at[ch].set(fd),
            carrier_offset=s.carrier_offset.at[ch].set(
                float(carrier_offset_hz)
            ),
            pll_state=s.pll_state.at[ch].set(
                jnp.array([fd, 0.0], dtype=jnp.float32)
                if self.conf.pll_filter_order >= 2
                else jnp.zeros(2, jnp.float32)
            ),
            dll_state=s.dll_state.at[ch].set(jnp.zeros(2, jnp.float32)),
            prev_prompt=s.prev_prompt.at[ch].set(0.0),
            fll_active=s.fll_active.at[ch].set(bool(conf.enable_fll_pull_in)),
            narrow=s.narrow.at[ch].set(False),
            use_atan2=s.use_atan2.at[ch].set(False),
            integ_len=s.integ_len.at[ch].set(1),
            integ_count=s.integ_count.at[ch].set(0),
            acc_taps=s.acc_taps.at[ch].set(0.0),
            acc_samples=s.acc_samples.at[ch].set(0),
            sec_idx=s.sec_idx.at[ch].set(0),
            sec_active=s.sec_active.at[ch].set(False),
            acc_data=s.acc_data.at[ch].set(0.0),
            acc_data_count=s.acc_data_count.at[ch].set(0),
            kf_x=s.kf_x.at[ch].set(0.0),
            kf_P=s.kf_P.at[ch].set(jnp.diag(
                jnp.array([0.01, 2500.0, 100.0], jnp.float32))),
            kf_pc=s.kf_pc.at[ch].set(0.25),
        )

    def stop_channel(self, ch: int) -> None:
        self.state = self.state._replace(
            enabled=self.state.enabled.at[ch].set(False)
        )
        self.ctl[ch].phase = ChannelPhase.IDLE

    def active_channels(self) -> list[int]:
        return [i for i, c in enumerate(self.ctl)
                if c.phase in (ChannelPhase.WIDE, ChannelPhase.NARROW)]

    # --------------------------------------------------------------- windows
    def window_request(self) -> tuple[int, int]:
        """(absolute start sample, length) of the next window to feed."""
        act = self.active_channels()
        base = int(min(self.pos_abs[i] for i in act)) if act else 0
        return base, self.conf.window_samples

    # --------------------------------------------------------------- process
    def process(self, window: np.ndarray, abs_base: int) -> BlockResult:
        """Advance all active channels one block through the given host
        window (uploads it; prefer process_device for streaming use)."""
        return self._process(
            jnp.asarray(host_to_ri(np.asarray(window, np.complex64))),
            abs_base, len(window),
        )

    def process_device(self, window_ri, abs_base: int,
                       window_len: int) -> BlockResult:
        """Advance one block against a device-resident sample buffer
        (f32 [L, 2] re/im lanes). The buffer stays on device between
        blocks — the receiver uploads each chunk once instead of
        re-uploading overlapping windows (the dominant cost on a remote
        TPU link)."""
        return self._process(window_ri, abs_base, window_len)

    def _process(self, window_ri, abs_base: int,
                 window_len: int) -> BlockResult:
        conf = self.conf
        act = self.active_channels()
        rel = self.pos_abs - abs_base
        if act:
            if int(rel[act].min()) < 0:
                raise ValueError(
                    "window too short: channel behind the buffer base "
                    f"(rel {int(rel[act].min())})"
                )
            spread = int(rel[act].max())
            need = spread + conf.steps_per_block * conf.max_step_samples
            if need > window_len:
                raise ValueError(
                    f"window too short: need {need}, got {window_len} "
                    f"(channel spread {spread})"
                )
        st = self.state._replace(
            pos=jnp.asarray(np.maximum(rel, 0).astype(np.int32))
        )
        # per-channel code/secondary tables live on device, re-uploaded
        # only when start_channel rewrites rows — on a remote TPU link
        # every host->device transfer costs a round trip
        if self._codes_dev is None:
            self._codes_dev = (
                jnp.asarray(self.codes),
                jnp.asarray(self.data_codes) if conf.track_pilot else None,
                jnp.asarray(self.sec_pilot) if conf.track_pilot else None,
                jnp.asarray(self.sec_data) if conf.track_pilot else None,
            )
            if self._use_fused:
                self._codes_dev_fused = (
                    jnp.asarray(self._fused_pack(self.codes)),
                    jnp.asarray(self._fused_pack(self.data_codes))
                    if conf.track_pilot else None,
                )
        # the fused kernel carries sample positions as exact f32 integers
        fused_ok = self._use_fused and (
            window_len + conf.steps_per_block * conf.max_step_samples
            + 2 * self._fused_kern.rows_p * 128 < 2 ** 24
        )
        # the blocked kernel's per-period window DMA covers one block of
        # rows for ALL enabled channels; a pathological position spread
        # (a laggard channel) falls back to the XLA scan for this block
        if fused_ok and act:
            max_spread = getattr(
                self._fused_kern, "max_spread_samples", None)
            if max_spread is not None:
                start_spread = int(rel[act].max() - rel[act].min())
                drift = conf.steps_per_block * 4    # differential n bound
                fused_ok = start_spread + drift < max_spread
        if fused_ok:
            from gnss_sdr_tpu.tracking.fused import fused_track_block_packed

            new_state, packed = fused_track_block_packed(
                conf, self._spec, self._fused_kern, st, window_ri,
                self._codes_dev_fused[0], self._codes_dev_fused[1],
                self._codes_dev[2], self._codes_dev[3],
            )
        else:
            new_state, packed = self._track_packed(
                st, window_ri, *self._codes_dev
            )
        self.state = new_state
        flat = fetch(packed)
        host = unpack_tree(
            flat.reshape(
                conf.steps_per_block, conf.max_channels, self._spec.total_lanes
            ),
            self._spec,
        )
        abs_end = host["pos_end"].astype(np.int64) + abs_base
        for i in act:
            self.pos_abs[i] = abs_end[-1, i]

        events = []
        for i in act:
            evs = self._update_channel_control(i, host)
            events.extend((i, e) for e in evs)
        return BlockResult(outputs=host, abs_sample_end=abs_end, events=events)

    # ------------------------------------------------- telemetry_to_trk
    def set_tow_from_telemetry(self, ch: int, tow_ms: float, wn: int,
                               sample_stamp: int) -> None:
        """Async TOW from the telemetry decoder (reference TOW_to_trk
        message, dll_pll_veml_tracking.cc:771-777)."""
        ctl = self.ctl[ch]
        ctl.tow_ms_received = float(tow_ms)
        ctl.tow_wn_received = int(wn)
        ctl.tow_sample_stamp = int(sample_stamp)

    def notify_telemetry_fault(self, ch: int) -> None:
        """Telemetry fault (tlm_event == 1): force loss-of-lock
        (reference sets d_carrier_lock_fail_counter = 200000)."""
        self.ctl[ch].telemetry_fault = True

    def _project_tow(self, ch: int) -> None:
        """Project the received TOW to the channel's current sample
        (reference dll_pll_veml_tracking.cc:1921-1937)."""
        conf = self.conf
        ctl = self.ctl[ch]
        if ctl.tow_ms_received < 0:
            return
        diff_ms = float(
            (int(self.pos_abs[ch]) - ctl.tow_sample_stamp)
            * 1000.0 / conf.fs)
        tow = (ctl.tow_ms_received + diff_ms) % 604800000.0
        ctl.wn_from_telemetry = ctl.tow_wn_received + (
            1 if tow < ctl.tow_ms_received else 0)
        ctl.tow_from_telemetry_ms = tow

    # ------------------------------------------------------------------- fsm
    def _update_channel_control(self, ch: int, host: dict) -> list[str]:
        conf = self.conf
        ctl = self.ctl[ch]
        events: list[str] = []
        if ctl.telemetry_fault:
            ctl.telemetry_fault = False
            ctl.phase = ChannelPhase.LOST
            self.stop_channel(ch)
            self.ctl[ch].phase = ChannelPhase.LOST
            return ["loss_of_lock"]
        self._project_tow(ch)
        prompts = host["prompt"][:, ch]                    # [S] per-period
        signs = np.sign(prompts.real)
        first_period = ctl.total_periods
        ctl.total_periods += len(signs)

        # FLL assist only during pull-in (reference pull_in_time_s), then
        # pure PLL to avoid FLL/PLL steady-state contention
        if conf.enable_fll_pull_in and ctl.phase == ChannelPhase.WIDE:
            pull_in_periods = conf.pull_in_time_s / conf.code_period_s
            if first_period < pull_in_periods <= ctl.total_periods:
                self.state = self.state._replace(
                    fll_active=self.state.fll_active.at[ch].set(False)
                )

        # Pilot plans: acquire the secondary code from per-period prompt
        # signs (reference acquire_secondary, dll_pll_veml_tracking.cc:1120)
        # wait for the Costas loop to settle after the FLL hands over
        # (engaging the narrow loop mid-pull-in hands it a large phase
        # error it takes ~1/w0 seconds to unwind)
        sec_start_s = conf.pull_in_time_s + 0.15
        if (
            conf.track_pilot
            and conf.sec_len_pilot > 1
            and ctl.phase == ChannelPhase.WIDE
            and not ctl.sec_locked
            and ctl.total_periods * conf.code_period_s > sec_start_s
        ):
            if not ctl.sec_hist:
                ctl.sec_hist_start = first_period
            ctl.sec_hist.extend(signs.tolist())
            sp = conf.sec_len_pilot
            if len(ctl.sec_hist) >= sp:
                w = np.asarray(ctl.sec_hist[-sp:], dtype=np.float64)
                p0 = ctl.sec_hist_start + len(ctl.sec_hist) - sp
                sec = self.sec_pilot[ch].astype(np.float64)
                # cyclic correlation of the sign window against the sequence
                shifts = np.array([
                    np.dot(w, np.roll(sec, -k)) for k in range(sp)
                ])
                k0 = int(np.argmax(np.abs(shifts)))
                if abs(shifts[k0]) == sp:          # perfect match required
                    polarity = 1.0 if shifts[k0] > 0 else -1.0
                    self._engage_secondary(ch, p0, k0, polarity)
                    events.append("secondary_sync")
                elif len(ctl.sec_hist) > 4 * sp:
                    ctl.sec_hist = ctl.sec_hist[-sp:]
                    ctl.sec_hist_start = p0

        # Symbol-rate signals (one telemetry symbol per code period, e.g.
        # Galileo E1-B) cannot extend integration across symbols without the
        # pilot; narrow the loops on a timer instead of on bit sync
        # (reference: VEML tracking stays at 4 ms and drops to
        # pll_bw_narrow after pull-in).
        if (
            not conf.track_pilot
            and ctl.phase == ChannelPhase.WIDE
            and conf.extend_correlation_symbols == 1
            and ctl.total_periods * conf.code_period_s
            > conf.pull_in_time_s + 0.5
        ):
            ctl.phase = ChannelPhase.NARROW
            ctl.prompt_hist = []
            ctl.warmup_until_period = ctl.total_periods + int(
                max(conf.lock_warmup_s, 8.0 / conf.pll_bw_narrow_hz)
                / conf.code_period_s
            )
            s = self.state
            self.state = s._replace(
                narrow=s.narrow.at[ch].set(True),
                fll_active=s.fll_active.at[ch].set(False),
            )
            events.append("bit_sync")

        if (not conf.track_pilot and ctl.phase == ChannelPhase.WIDE
                and conf.extend_correlation_symbols > 1
                and ctl.total_periods * conf.code_period_s
                > conf.pull_in_time_s + conf.bit_sync_delay_s):
            for s_i in range(len(signs)):
                period = first_period + s_i
                if ctl.last_sign != 0.0 and signs[s_i] != ctl.last_sign:
                    ctl.bit_hist[period % conf.codes_per_bit] += 1
                    ctl.transitions += 1
                ctl.last_sign = signs[s_i]
            if ctl.transitions >= conf.bit_sync_transitions:
                top = int(ctl.bit_hist.argmax())
                if ctl.bit_hist[top] >= 0.8 * ctl.transitions:
                    ctl.bit_phase = top
                    self._engage_extended(ch)
                    events.append("bit_sync")
                else:
                    # ambiguous histogram: restart the vote
                    ctl.bit_hist[:] = 0
                    ctl.transitions = 0

        # C/N0 + carrier lock from boundary prompts of this block.  The
        # history only ever holds prompts of one coherent length: when the
        # integration length changes (extended mode engaged) the estimate
        # restarts, as the reference does on state transitions.
        b = host["boundary"][:, ch]
        if b.any():
            acc = host["acc_prompt"][b, ch]
            n_acc = host["acc_samples"][b, ch]
            t_coh = float(n_acc[-1]) / conf.fs
            keep = n_acc > 0.9 * n_acc[-1]
            if ctl.hist_n and abs(ctl.hist_n - int(n_acc[-1])) > 0.1 * ctl.hist_n:
                ctl.prompt_hist = []
            ctl.hist_n = int(n_acc[-1])
            ctl.prompt_hist.extend(acc[keep].tolist())
            max_hist = conf.cn0_estimation_blocks
            if len(ctl.prompt_hist) > max_hist:
                ctl.prompt_hist = ctl.prompt_hist[-max_hist:]
            if len(ctl.prompt_hist) >= max_hist:
                ph = np.asarray(ctl.prompt_hist)
                ctl.cn0_dbhz = cn0_svn_estimator(ph, t_coh)
                ctl.carrier_lock = carrier_lock_detector(ph)
                bad = (
                    ctl.cn0_dbhz < conf.cn0_min_dbhz
                    or ctl.carrier_lock < conf.carrier_lock_threshold
                )
                in_warmup = ctl.total_periods < ctl.warmup_until_period
                ctl.lock_fail_blocks = (
                    0 if (in_warmup or not bad) else ctl.lock_fail_blocks + 1
                )
                if ctl.lock_fail_blocks >= conf.max_lock_fail_blocks:
                    ctl.phase = ChannelPhase.LOST
                    self.stop_channel(ch)
                    self.ctl[ch].phase = ChannelPhase.LOST
                    events.append("loss_of_lock")
        return events

    def _engage_secondary(
        self, ch: int, p0: int, k0: int, polarity: float
    ) -> None:
        """Secondary sequence locked: the prompt of period p0+i matched
        secondary chip (i+k0) mod sp with the given polarity. Engage
        on-device wipeoff for both components, switch the PLL to
        four-quadrant atan2, and extend coherent integration (reference
        post-acquire_secondary state switch)."""
        conf = self.conf
        ctl = self.ctl[ch]
        sp = conf.sec_len_pilot
        # fold the Costas half-cycle ambiguity into the wipe sequences so
        # the wiped pilot prompt comes out real-positive (both components
        # flip together under a pi carrier rotation)
        self.sec_pilot[ch] = self.sec_pilot[ch] * polarity
        self.sec_data[ch] = self._sec_data_base * polarity
        self._codes_dev = None         # secondary tables changed
        # secondary chip index of the NEXT period (device applies it at the
        # start of the next block, which begins at period ctl.total_periods)
        idx_next = (ctl.total_periods - p0 + k0) % sp
        ctl.phase = ChannelPhase.NARROW
        ctl.sec_locked = True
        ctl.sec_hist = []
        ctl.prompt_hist = []
        ctl.warmup_until_period = ctl.total_periods + int(
            max(conf.lock_warmup_s, 8.0 / conf.pll_bw_narrow_hz)
            / conf.code_period_s
        )
        s = self.state
        # align integration boundaries with the secondary epoch: with the
        # data-channel secondary (B1I D1) a misaligned window straddles nav
        # bit flips; for pilots the alignment is merely tidy
        integ_len = int(conf.extend_correlation_symbols)
        self.state = s._replace(
            sec_idx=s.sec_idx.at[ch].set(int(idx_next)),
            sec_active=s.sec_active.at[ch].set(True),
            use_atan2=s.use_atan2.at[ch].set(bool(conf.pilot_pll_atan2)),
            narrow=s.narrow.at[ch].set(True),
            fll_active=s.fll_active.at[ch].set(False),
            # zero the frequency-rate integrator as in _engage_extended
            pll_state=s.pll_state.at[ch, 1].set(0.0),
            integ_len=s.integ_len.at[ch].set(integ_len),
            integ_count=s.integ_count.at[ch].set(
                int(idx_next) % integ_len
            ),
            acc_taps=s.acc_taps.at[ch].set(0.0),
            acc_samples=s.acc_samples.at[ch].set(0),
            acc_data=s.acc_data.at[ch].set(0.0),
            acc_data_count=s.acc_data_count.at[ch].set(0),
        )

    def _engage_extended(self, ch: int) -> None:
        """Switch to narrow-band extended integration aligned to bit edges."""
        conf = self.conf
        ctl = self.ctl[ch]
        ctl.phase = ChannelPhase.NARROW
        # the C/N0 history holds 1-period prompts; the coherent length is
        # about to change, so restart the estimate on extended prompts only
        ctl.prompt_hist = []
        ctl.warmup_until_period = ctl.total_periods + int(
            max(conf.lock_warmup_s, 8.0 / conf.pll_bw_narrow_hz)
            / conf.code_period_s
        )
        # periods since the last bit edge, counted at the *next* period
        since_edge = (ctl.total_periods - ctl.bit_phase) % conf.codes_per_bit
        s = self.state
        # keep the PLL's frequency state (i1 = Doppler estimate) but zero the
        # frequency-rate integrator: its wide-band 1 ms random walk (tens of
        # Hz/s) would otherwise ride into the narrow loop as a Doppler ramp
        # it cannot unwind before the Costas loop slips
        pll_reset = s.pll_state.at[ch, 1].set(0.0)
        self.state = s._replace(
            pll_state=pll_reset,
            narrow=s.narrow.at[ch].set(True),
            fll_active=s.fll_active.at[ch].set(False),
            integ_len=s.integ_len.at[ch].set(
                int(conf.extend_correlation_symbols)
            ),
            integ_count=s.integ_count.at[ch].set(
                since_edge % int(conf.extend_correlation_symbols)
            ),
            acc_taps=s.acc_taps.at[ch].set(0.0),
            acc_samples=s.acc_samples.at[ch].set(0),
        )
