"""Tracking configuration (reference: src/algorithms/tracking/libs/dll_pll_conf.h:36-88).

One config struct parameterizes the universal DLL/PLL(/FLL) engine for all
constellations, as `Dll_Pll_Conf` does for `dll_pll_veml_tracking`.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class DllPllConf:
    fs: float
    code_length_chips: int
    code_rate_cps: float
    carrier_freq_hz: float

    # FDMA (GLONASS): per-channel carrier offsets ride in
    # TrackingState.carrier_offset; the wipeoff phase is computed in f64
    # (offsets reach MHz — far beyond f32 phase precision over a period)
    fdma: bool = False

    # Correlator geometry
    early_late_spacing_chips: float = 0.5
    very_early_late_spacing_chips: float = 0.0   # > 0 enables VEML (5 taps, BOC)
    interp_code: bool = True                     # linear-interp code replica
    # Pallas fused correlator (ops/correlator.py): None = auto (on for the
    # TPU backend, off elsewhere — the XLA gather that it replaces is
    # ~1000x slower on this TPU runtime but fine on CPU); FDMA plans keep
    # the XLA path (f64 per-sample wipeoff phase)
    pallas_correlator: bool | None = None
    # Fused on-chip tracking loop (ops/track_kernel.py via tracking/fused.py):
    # the whole K-period DLL/PLL iteration in one Mosaic launch instead of
    # one XLA scan step per period. None = auto (on for the TPU backend
    # when the plan is eligible — see tracking/fused.fused_eligible);
    # True forces it (interpret-mode on CPU, for tests).
    fused_tracker: bool | None = None

    # Loop bandwidths / orders (wide = before bit sync, narrow = after)
    pll_bw_hz: float = 35.0
    dll_bw_hz: float = 2.0
    pll_bw_narrow_hz: float = 5.0
    dll_bw_narrow_hz: float = 0.75
    pll_filter_order: int = 3
    dll_filter_order: int = 2

    # FLL pull-in (reference enable_fll_pull_in / fll_bw_hz)
    enable_fll_pull_in: bool = False
    # TOW-aided tracking: receiver forwards decoder TOW events to the
    # tracker (reference GNSS-SDR.tow_to_trk, dll_pll_conf.cc:151)
    tow_to_trk: bool = False
    # 1 ms frequency measurements are noisy (~25 Hz sigma at 45 dB-Hz); the
    # assist gain w0f^2*T must stay well under 1 or the Doppler state random
    # walks — keep the FLL band narrow and hand over to the PLL quickly
    fll_bw_hz: float = 4.0
    pull_in_time_s: float = 0.5

    # Extended coherent integration after bit/secondary-code sync
    extend_correlation_symbols: int = 1          # in code periods
    codes_per_bit: int = 20                      # data-bit length in code periods

    # Pilot tracking with secondary-code wipeoff (reference track_pilot,
    # dll_pll_conf.h:81 + acquire_secondary, dll_pll_veml_tracking.cc:1120).
    # When enabled the correlator taps run on the PILOT code (codes arg) and
    # one extra prompt correlator runs on the DATA code; after the host
    # locks the pilot secondary sequence the engine wipes both components'
    # secondary chips on-device, the PLL switches to four-quadrant atan2,
    # and coherent integration may extend past data-symbol boundaries.
    track_pilot: bool = False
    sec_len_pilot: int = 1      # pilot secondary length in code periods
    sec_len_data: int = 1       # data secondary/symbol length in code periods
    # Four-quadrant PLL after secondary lock. True for real pilot channels
    # (no data modulation once the secondary is wiped). False for
    # data-channel secondary codes (BeiDou B1I D1: nav bits still flip the
    # carrier every sec epoch, so the loop must stay Costas and coherent
    # integration must align to — and not exceed — the secondary epoch).
    pilot_pll_atan2: bool = True
    # True when the data component is in phase quadrature to the pilot
    # (GPS L5 / Galileo E5a QPSK: data symbols appear on the imaginary axis
    # once the pilot PLL locks, reference Prompt_Q symbol extraction)
    data_on_quadrature: bool = False
    # histogram votes needed to declare bit sync (per-period prompt signs
    # are near-error-free above ~35 dB-Hz, so few clean votes suffice)
    bit_sync_transitions: int = 8
    # earliest time bit-sync may ENGAGE extended integration: switching to
    # T-long loop updates narrows the Costas pull range to +-1/(4T) Hz, so
    # the 1-ms loop must first shrink the residual well inside that.
    # Signals whose bits are short relative to the loop transient (GLONASS
    # meander: transitions every 10-20 ms, sync fires in ~0.1 s) need this
    # guard; GPS's 20 ms histogram takes seconds anyway.
    bit_sync_delay_s: float = 0.5

    # Kalman tracking mode (reference kf_tracking.cc / kf_conf.h,
    # GPS_L1_CA_KF_Tracking): at integration boundaries the carrier loop
    # runs a 3-state error-EKF [phase_cycles, freq_hz, freq_rate_hz_s] on
    # the PLL (and, while fll_active, FLL) discriminators instead of the
    # loop filters; the code loop uses a Kalman-scalar gain on the DLL
    # discriminator plus carrier aiding.
    kf: bool = False
    kf_meas_std_cycles: float = 0.02      # PLL discriminator noise sigma
    kf_freq_meas_std_hz: float = 25.0     # FLL discriminator noise sigma (1 ms)
    kf_code_meas_std_chips: float = 0.02  # DLL discriminator noise sigma
    kf_accel_std_hz_s2: float = 5.0       # carrier jerk process noise
    kf_code_process_std_chips: float = 1e-3

    # Lock detection (reference cn0_* / max_*_lock_fail knobs)
    cn0_estimation_blocks: int = 20
    cn0_min_dbhz: float = 25.0
    # NBD/NBP estimates SNR/(SNR+2): 0.75 <=> ~6 dB coherent SNR; pure
    # noise sits near 0 (the SVN C/N0 estimator alone floors at ~27 dB-Hz
    # on noise and cannot flag it)
    carrier_lock_threshold: float = 0.75
    max_lock_fail_blocks: int = 5
    # no loss-of-lock verdicts while the loops settle after pull-in
    lock_warmup_s: float = 1.0

    # Batch geometry
    max_channels: int = 12
    steps_per_block: int = 20                    # code periods per device call

    @property
    def sec_lcm(self) -> int:
        """Secondary-phase counter modulus (both sequences stay aligned)."""
        import math

        return math.lcm(self.sec_len_pilot, self.sec_len_data)

    @property
    def samples_per_code(self) -> int:
        return int(round(self.fs * self.code_length_chips / self.code_rate_cps))

    @property
    def code_period_s(self) -> float:
        return self.code_length_chips / self.code_rate_cps

    @property
    def num_taps(self) -> int:
        return 5 if self.very_early_late_spacing_chips > 0 else 3

    @property
    def max_step_samples(self) -> int:
        """Upper bound on samples consumed in one code period (with Doppler)."""
        return self.samples_per_code + 2

    @property
    def window_samples(self) -> int:
        """Input window length needed for one block of steps."""
        return self.steps_per_block * self.max_step_samples + self.samples_per_code
