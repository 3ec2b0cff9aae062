"""Signal plans: everything the receiver needs to run one signal type.

A SignalPlan bundles the per-signal pieces the reference spreads across an
adapter triple (Acq/Trk/Tlm, SURVEY.md §2.2) plus the code tables: the
batched engines are built per plan, channels within a plan are one device
program. BOC signals use subcarrier-expanded code tables (table units =
sub-chips) — all tracking code-phase quantities are then in table units,
and `table_rate_cps` converts them to seconds for the observables.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

import numpy as np

from gnss_sdr_tpu.acquisition import AcqConfig
from gnss_sdr_tpu.codes.galileo_e1 import (
    SINBOC_TABLE_LENGTH,
    SINBOC_TABLE_RATE_CPS,
    galileo_e1b_sinboc_table,
)
from gnss_sdr_tpu.codes.gps_l1_ca import gps_l1_ca_code_table
from gnss_sdr_tpu.constants import galileo_e1 as GAL
from gnss_sdr_tpu.constants import gps_l1_ca as GPS
from gnss_sdr_tpu.telemetry.inav import InavDecoder
from gnss_sdr_tpu.telemetry.lnav import LnavDecoder
from gnss_sdr_tpu.tracking import DllPllConf


@dataclass
class SignalPlan:
    name: str                      # reference signal id: "1C", "1B", ...
    system: str                    # 'G', 'E'
    num_channels: int
    code_table: np.ndarray         # [P, table_length] (PILOT code if pilot plan)
    table_rate_cps: float          # table units per second
    carrier_freq_hz: float
    code_period_s: float
    acq_conf: AcqConfig
    trk_conf: DllPllConf
    make_decoder: Callable[[int], object]
    search_prns: tuple = ()
    prn_row: Callable[[int], int] = lambda prn: prn - 1
    # band key: plans sharing a band consume the same sample stream (the
    # reference's per-RF-channel SignalSource; L1 and E1 share a front-end)
    band: str = "L1"
    # pilot-tracking plans (track_pilot): data-component code + secondaries
    data_code_table: np.ndarray | None = None   # [P, table_length]
    sec_pilot_table: np.ndarray | None = None   # [P, sec_len_pilot] +-1
    sec_data_levels: np.ndarray | None = None   # [sec_len_data] +-1
    # acquisition searches this table (pilot plans may acquire on the data
    # code: same chip boundaries, no secondary ambiguity inside one period)
    acq_code_table: np.ndarray | None = None
    # per-block binary dumps (reference dump/dump_filename per block)
    dump_filename: str | None = None
    acq_dump_filename: str | None = None
    # FDMA (GLONASS): per-PRN-row carrier offsets from band center; the
    # acquisition grid and tracking NCO add offset(prn), and the channel's
    # true carrier is carrier_freq_hz + offset(prn)
    freq_offset_table: np.ndarray | None = None      # [P] Hz
    # acquisition engine variant: "pcps" (default), "fine_doppler", "tong",
    # "quicksync", "cccwsr" (acquisition/engines.py); extra ctor kwargs in
    # acq_engine_params (e.g. tong_max, folding_factor, chips_table)
    acq_engine: str = "pcps"
    acq_engine_params: dict = field(default_factory=dict)
    # tracking loop-closure variant: "dll_pll" (default; includes the kf
    # mode flag on trk_conf), "gaussian" (CKF/UKF carrier loop,
    # GPS_L1_CA_Gaussian_Tracking), or "tcp" (external peer closes the
    # loops, *_TCP_CONNECTOR_Tracking); ctor kwargs in trk_engine_params
    trk_engine: str = "dll_pll"
    trk_engine_params: dict = field(default_factory=dict)

    def carrier_offset_hz(self, prn: int) -> float:
        if self.freq_offset_table is None:
            return 0.0
        return float(self.freq_offset_table[self.prn_row(prn)])

    @property
    def fs(self) -> float:
        return self.acq_conf.fs

    @property
    def table_length(self) -> int:
        return self.code_table.shape[1]


def gps_l1ca_plan(
    fs: float,
    num_channels: int = 8,
    doppler_max_hz: float = 5000.0,
    doppler_step_hz: float = 250.0,
    acq_dwells: int = 2,
    acq_pfa: float = 1e-3,
    pll_bw_hz: float = 35.0,
    dll_bw_hz: float = 2.0,
    pll_bw_narrow_hz: float = 7.5,
    dll_bw_narrow_hz: float = 0.75,
    enable_fll_pull_in: bool = True,
    fll_bw_hz: float = 4.0,
    pull_in_time_s: float = 0.25,
    extend_correlation_symbols: int = 20,
    search_prns: tuple = tuple(range(1, 33)),
    steps_per_block: int = 20,
) -> SignalPlan:
    """GPS L1 C/A (reference adapters GPS_L1_CA_PCPS_Acquisition /
    GPS_L1_CA_DLL_PLL_Tracking / GPS_L1_CA_Telemetry_Decoder).

    ``steps_per_block``: code periods per device call — remote TPU links
    are round-trip-bound, so larger blocks trade control-loop reaction
    latency for throughput."""
    return SignalPlan(
        name="1C",
        system="G",
        num_channels=num_channels,
        code_table=gps_l1_ca_code_table(),
        table_rate_cps=GPS.CODE_RATE_CPS,
        carrier_freq_hz=GPS.FREQ_HZ,
        code_period_s=GPS.CODE_PERIOD_S,
        acq_conf=AcqConfig(
            fs=fs,
            code_length_chips=GPS.CODE_LENGTH_CHIPS,
            code_rate_cps=GPS.CODE_RATE_CPS,
            doppler_max_hz=doppler_max_hz,
            doppler_step_hz=doppler_step_hz,
            max_dwells=acq_dwells,
            pfa=acq_pfa,
        ),
        trk_conf=DllPllConf(
            fs=fs,
            code_length_chips=GPS.CODE_LENGTH_CHIPS,
            code_rate_cps=GPS.CODE_RATE_CPS,
            carrier_freq_hz=GPS.FREQ_HZ,
            pll_bw_hz=pll_bw_hz,
            dll_bw_hz=dll_bw_hz,
            pll_bw_narrow_hz=pll_bw_narrow_hz,
            dll_bw_narrow_hz=dll_bw_narrow_hz,
            enable_fll_pull_in=enable_fll_pull_in,
            fll_bw_hz=fll_bw_hz,
            pull_in_time_s=pull_in_time_s,
            extend_correlation_symbols=extend_correlation_symbols,
            codes_per_bit=GPS.CODES_PER_BIT,
            max_channels=num_channels,
            steps_per_block=steps_per_block,
        ),
        make_decoder=LnavDecoder,
        search_prns=search_prns,
    )


def _rs_inav(prn: int):
    """InavDecoder with FEC2 CED assembly enabled (reference
    TelemetryDecoder_1B.enable_reed_solomon)."""
    d = InavDecoder(prn)
    d.enable_reed_solomon()
    return d


def galileo_e1b_plan(
    fs: float,
    num_channels: int = 8,
    doppler_max_hz: float = 5000.0,
    doppler_step_hz: float = 125.0,
    acq_pfa: float = 1e-3,
    pll_bw_hz: float = 15.0,
    dll_bw_hz: float = 2.0,
    pll_bw_narrow_hz: float = 7.5,
    dll_bw_narrow_hz: float = 0.5,
    enable_fll_pull_in: bool = True,
    fll_bw_hz: float = 4.0,
    pull_in_time_s: float = 0.5,
    early_late_space_chips: float = 0.25,
    search_prns: tuple = tuple(range(1, 37)),
    enable_reed_solomon: bool = False,
    steps_per_block: int | None = None,
) -> SignalPlan:
    """Galileo E1-B data channel with a sinBOC(1,1) replica
    (reference adapters Galileo_E1_PCPS_Ambiguous_Acquisition /
    Galileo_E1_DLL_PLL_VEML_Tracking / Galileo_E1B_Telemetry_Decoder).

    Table units are sinBOC sub-chips (2 per primary chip, 2.046 Mcps):
    spacing/code-phase parameters are converted here so plan users think in
    primary chips. The 4 ms symbol equals one code period, so tracking runs
    with extend_correlation_symbols=1 and telemetry consumes every period's
    prompt sign (250 sym/s).
    """
    table = galileo_e1b_sinboc_table()
    # BOC(1,1) has a sharp triangular peak of +-0.5 primary chips; VEML adds
    # the very-early/late taps that disambiguate its side peaks
    el_sub = 2.0 * early_late_space_chips
    vel_sub = 2.0 * 0.6
    return SignalPlan(
        name="1B",
        system="E",
        num_channels=num_channels,
        code_table=table,
        table_rate_cps=SINBOC_TABLE_RATE_CPS,
        carrier_freq_hz=GAL.FREQ_HZ,
        code_period_s=GAL.CODE_PERIOD_S,
        acq_conf=AcqConfig(
            fs=fs,
            code_length_chips=SINBOC_TABLE_LENGTH,
            code_rate_cps=SINBOC_TABLE_RATE_CPS,
            doppler_max_hz=doppler_max_hz,
            doppler_step_hz=doppler_step_hz,
            max_dwells=1,
            # the 4 ms symbol can flip mid-window; double-length FFT
            # (reference bit_transition_flag for E1) keeps one clean period
            bit_transition_flag=True,
            pfa=acq_pfa,
        ),
        trk_conf=DllPllConf(
            fs=fs,
            code_length_chips=SINBOC_TABLE_LENGTH,
            code_rate_cps=SINBOC_TABLE_RATE_CPS,
            carrier_freq_hz=GAL.FREQ_HZ,
            early_late_spacing_chips=el_sub,
            very_early_late_spacing_chips=vel_sub,
            pll_bw_hz=pll_bw_hz,
            dll_bw_hz=dll_bw_hz,
            pll_bw_narrow_hz=pll_bw_narrow_hz,
            dll_bw_narrow_hz=dll_bw_narrow_hz,
            enable_fll_pull_in=enable_fll_pull_in,
            fll_bw_hz=fll_bw_hz,
            pull_in_time_s=pull_in_time_s,
            extend_correlation_symbols=1,
            codes_per_bit=1,
            steps_per_block=steps_per_block or 8,          # 8 x 4 ms = 32 ms per device call
            max_channels=num_channels,
        ),
        make_decoder=(
            (lambda prn: _rs_inav(prn)) if enable_reed_solomon
            else InavDecoder),
        search_prns=search_prns,
    )


def gps_l5_plan(
    fs: float,
    num_channels: int = 8,
    doppler_max_hz: float = 4000.0,
    doppler_step_hz: float = 250.0,
    acq_dwells: int = 2,
    acq_pfa: float = 1e-3,
    pll_bw_hz: float = 30.0,
    dll_bw_hz: float = 2.0,
    pll_bw_narrow_hz: float = 5.0,
    dll_bw_narrow_hz: float = 0.5,
    enable_fll_pull_in: bool = True,
    fll_bw_hz: float = 4.0,
    pull_in_time_s: float = 0.25,
    extend_correlation_symbols: int = 20,
    search_prns: tuple = tuple(range(1, 33)),
    steps_per_block: int | None = None,
) -> SignalPlan:
    """GPS L5: pilot (Q, NH20) tracking with data (I, NH10 x CNAV) symbol
    extraction (reference adapters GPS_L5i_PCPS_Acquisition /
    GPS_L5_DLL_PLL_Tracking / GPS_L5_Telemetry_Decoder; signal model
    gps_l5_signal_replica.cc, track_pilot dll_pll_conf.h:81).

    Acquisition runs on the data (L5I) code with the double-length FFT:
    NH chips flip the sign at any code boundary inside the window, and the
    zero-padded-code FFT guarantees one cleanly correlated period
    (pcps_acquisition.cc bit_transition_flag)."""
    from gnss_sdr_tpu.codes.gps_l5 import (
        gps_l5i_code_table,
        gps_l5q_code_table,
        nh10_levels,
        nh20_levels,
    )
    from gnss_sdr_tpu.constants import gps_l5 as L5
    from gnss_sdr_tpu.telemetry.cnav import CnavDecoder

    pilot_table = gps_l5q_code_table()
    data_table = gps_l5i_code_table()
    return SignalPlan(
        name="L5",
        system="G",
        band="L5",
        num_channels=num_channels,
        code_table=pilot_table,
        table_rate_cps=L5.CODE_RATE_CPS,
        carrier_freq_hz=L5.FREQ_HZ,
        code_period_s=L5.CODE_PERIOD_S,
        acq_conf=AcqConfig(
            fs=fs,
            code_length_chips=L5.CODE_LENGTH_CHIPS,
            code_rate_cps=L5.CODE_RATE_CPS,
            doppler_max_hz=doppler_max_hz,
            doppler_step_hz=doppler_step_hz,
            max_dwells=acq_dwells,
            bit_transition_flag=True,
            pfa=acq_pfa,
        ),
        trk_conf=DllPllConf(
            fs=fs,
            code_length_chips=L5.CODE_LENGTH_CHIPS,
            code_rate_cps=L5.CODE_RATE_CPS,
            carrier_freq_hz=L5.FREQ_HZ,
            pll_bw_hz=pll_bw_hz,
            dll_bw_hz=dll_bw_hz,
            pll_bw_narrow_hz=pll_bw_narrow_hz,
            dll_bw_narrow_hz=dll_bw_narrow_hz,
            enable_fll_pull_in=enable_fll_pull_in,
            fll_bw_hz=fll_bw_hz,
            pull_in_time_s=pull_in_time_s,
            extend_correlation_symbols=extend_correlation_symbols,
            codes_per_bit=L5.CODES_PER_SYMBOL,
            track_pilot=True,
            sec_len_pilot=20,
            sec_len_data=10,
            data_on_quadrature=True,
            steps_per_block=steps_per_block or 20,
            max_channels=num_channels,
        ),
        make_decoder=CnavDecoder,
        search_prns=search_prns,
        data_code_table=data_table,
        sec_pilot_table=np.tile(nh20_levels(), (pilot_table.shape[0], 1)),
        sec_data_levels=nh10_levels(),
        acq_code_table=data_table,
    )


def qzss_l5_plan(
    fs: float,
    num_channels: int = 4,
    doppler_max_hz: float = 4000.0,
    doppler_step_hz: float = 250.0,
    acq_dwells: int = 2,
    acq_pfa: float = 1e-3,
    pll_bw_hz: float = 30.0,
    dll_bw_hz: float = 2.0,
    pll_bw_narrow_hz: float = 5.0,
    dll_bw_narrow_hz: float = 0.5,
    enable_fll_pull_in: bool = True,
    fll_bw_hz: float = 4.0,
    pull_in_time_s: float = 0.25,
    extend_correlation_symbols: int = 20,
    search_prns: tuple = tuple(range(193, 203)),
    steps_per_block: int | None = None,
) -> SignalPlan:
    """QZSS L5 (PRN 193-202): identical signal structure to GPS L5
    (IS-QZSS-PNT follows IS-GPS-705 — NH20 pilot / NH10 x CNAV data),
    with the QZSS XB-initial-state codes (reference
    qzss_l5_signal_replica.cc, QZSS_L5i_PCPS_Acquisition /
    QZSS_L5i_DLL_PLL_Tracking adapters)."""
    from gnss_sdr_tpu.codes.gps_l5 import (
        nh10_levels,
        nh20_levels,
        qzss_l5i_code,
        qzss_l5q_code,
    )
    from gnss_sdr_tpu.constants import gps_l5 as L5
    from gnss_sdr_tpu.telemetry.cnav import CnavDecoder

    prns = list(search_prns)
    pilot_table = np.stack([qzss_l5q_code(p) for p in prns]).astype(np.float32)
    data_table = np.stack([qzss_l5i_code(p) for p in prns]).astype(np.float32)
    return SignalPlan(
        name="J5",
        system="J",
        band="L5",
        num_channels=num_channels,
        code_table=pilot_table,
        table_rate_cps=L5.CODE_RATE_CPS,
        carrier_freq_hz=L5.FREQ_HZ,
        code_period_s=L5.CODE_PERIOD_S,
        acq_conf=AcqConfig(
            fs=fs,
            code_length_chips=L5.CODE_LENGTH_CHIPS,
            code_rate_cps=L5.CODE_RATE_CPS,
            doppler_max_hz=doppler_max_hz,
            doppler_step_hz=doppler_step_hz,
            max_dwells=acq_dwells,
            bit_transition_flag=True,
            pfa=acq_pfa,
        ),
        trk_conf=DllPllConf(
            fs=fs,
            code_length_chips=L5.CODE_LENGTH_CHIPS,
            code_rate_cps=L5.CODE_RATE_CPS,
            carrier_freq_hz=L5.FREQ_HZ,
            pll_bw_hz=pll_bw_hz,
            dll_bw_hz=dll_bw_hz,
            pll_bw_narrow_hz=pll_bw_narrow_hz,
            dll_bw_narrow_hz=dll_bw_narrow_hz,
            enable_fll_pull_in=enable_fll_pull_in,
            fll_bw_hz=fll_bw_hz,
            pull_in_time_s=pull_in_time_s,
            extend_correlation_symbols=extend_correlation_symbols,
            codes_per_bit=L5.CODES_PER_SYMBOL,
            track_pilot=True,
            sec_len_pilot=20,
            sec_len_data=10,
            data_on_quadrature=True,
            steps_per_block=steps_per_block or 20,
            max_channels=num_channels,
        ),
        make_decoder=CnavDecoder,
        search_prns=tuple(prns),
        prn_row=lambda prn: prn - 193,
        data_code_table=data_table,
        sec_pilot_table=np.tile(nh20_levels(), (pilot_table.shape[0], 1)),
        sec_data_levels=nh10_levels(),
        acq_code_table=data_table,
    )


def galileo_e5a_plan(
    fs: float,
    num_channels: int = 8,
    doppler_max_hz: float = 4000.0,
    doppler_step_hz: float = 250.0,
    acq_dwells: int = 2,
    acq_pfa: float = 1e-3,
    pll_bw_hz: float = 20.0,
    dll_bw_hz: float = 2.0,
    pll_bw_narrow_hz: float = 5.0,
    dll_bw_narrow_hz: float = 0.5,
    enable_fll_pull_in: bool = True,
    fll_bw_hz: float = 4.0,
    pull_in_time_s: float = 0.25,
    extend_correlation_symbols: int = 20,
    search_prns: tuple = tuple(range(1, 37)),
    steps_per_block: int | None = None,
) -> SignalPlan:
    """Galileo E5a: pilot (Q, CS100) tracking with data (I, CS20 x FNAV)
    symbol extraction (reference adapters Galileo_E5a_Pcps_Acquisition /
    Galileo_E5a_DLL_PLL_Tracking / Galileo_E5a_Telemetry_Decoder; codes
    galileo_e5_signal_replica.cc, FNAV galileo_fnav_message.cc)."""
    from gnss_sdr_tpu.codes.galileo_e5a import (
        e5ai_secondary_levels,
        e5aq_secondary_levels,
        galileo_e5ai_code_table,
        galileo_e5aq_code_table,
    )
    from gnss_sdr_tpu.constants import galileo_e5a as E5A
    from gnss_sdr_tpu.telemetry.fnav import FnavDecoder

    # code tables carry 50 PRN rows but CS100 assignments exist for 1..47
    # (Galileo OS SIS ICD Table 19); search lists stay within 1..36
    pilot_table = galileo_e5aq_code_table()[:47]
    data_table = galileo_e5ai_code_table()[:47]
    sec_pilot = np.stack([
        e5aq_secondary_levels(p + 1) for p in range(pilot_table.shape[0])
    ])
    return SignalPlan(
        name="5X",
        system="E",
        band="L5",                   # E5a shares the 1176.45 MHz band
        num_channels=num_channels,
        code_table=pilot_table,
        table_rate_cps=E5A.CODE_RATE_CPS,
        carrier_freq_hz=E5A.FREQ_HZ,
        code_period_s=E5A.CODE_PERIOD_S,
        acq_conf=AcqConfig(
            fs=fs,
            code_length_chips=E5A.CODE_LENGTH_CHIPS,
            code_rate_cps=E5A.CODE_RATE_CPS,
            doppler_max_hz=doppler_max_hz,
            doppler_step_hz=doppler_step_hz,
            max_dwells=acq_dwells,
            bit_transition_flag=True,
            pfa=acq_pfa,
        ),
        trk_conf=DllPllConf(
            fs=fs,
            code_length_chips=E5A.CODE_LENGTH_CHIPS,
            code_rate_cps=E5A.CODE_RATE_CPS,
            carrier_freq_hz=E5A.FREQ_HZ,
            pll_bw_hz=pll_bw_hz,
            dll_bw_hz=dll_bw_hz,
            pll_bw_narrow_hz=pll_bw_narrow_hz,
            dll_bw_narrow_hz=dll_bw_narrow_hz,
            enable_fll_pull_in=enable_fll_pull_in,
            fll_bw_hz=fll_bw_hz,
            pull_in_time_s=pull_in_time_s,
            extend_correlation_symbols=extend_correlation_symbols,
            codes_per_bit=E5A.CODES_PER_SYMBOL,
            track_pilot=True,
            sec_len_pilot=100,
            sec_len_data=20,
            data_on_quadrature=True,
            steps_per_block=steps_per_block or 20,
            max_channels=num_channels,
        ),
        make_decoder=FnavDecoder,
        search_prns=search_prns,
        data_code_table=data_table,
        sec_pilot_table=sec_pilot,
        sec_data_levels=e5ai_secondary_levels(),
        acq_code_table=data_table,
    )


def beidou_b1i_plan(
    fs: float,
    num_channels: int = 8,
    doppler_max_hz: float = 5000.0,
    doppler_step_hz: float = 250.0,
    acq_dwells: int = 2,
    acq_pfa: float = 1e-3,
    pll_bw_hz: float = 30.0,
    dll_bw_hz: float = 2.0,
    pll_bw_narrow_hz: float = 5.0,
    dll_bw_narrow_hz: float = 0.5,
    enable_fll_pull_in: bool = True,
    fll_bw_hz: float = 4.0,
    pull_in_time_s: float = 0.25,
    extend_correlation_symbols: int = 20,
    search_prns: tuple = tuple(range(6, 30)),
    steps_per_block: int | None = None,
) -> SignalPlan:
    """BeiDou B1I MEO/IGSO (D1 NAV, NH20 secondary on the data channel;
    reference adapters BEIDOU_B1I_PCPS_Acquisition /
    BEIDOU_B1I_DLL_PLL_Tracking / BEIDOU_B1I_Telemetry_Decoder, codes
    beidou_b1i_signal_replica.cc).

    The NH(20) secondary rides the single data component, so the engine's
    secondary machinery runs with pilot == data code, Costas PLL retained
    after lock (pilot_pll_atan2=False: nav bits still flip the carrier),
    and coherent integration aligned to - and capped at - one 20 ms bit."""
    from gnss_sdr_tpu.codes.beidou_b1i import beidou_b1i_code_table, nh20_levels
    from gnss_sdr_tpu.constants import beidou_b1i as BDS
    from gnss_sdr_tpu.telemetry.dnav import D1Decoder

    table = beidou_b1i_code_table()
    nh = np.tile(nh20_levels(), (table.shape[0], 1))
    extend = min(extend_correlation_symbols, BDS.CODES_PER_BIT)
    return SignalPlan(
        name="B1",
        system="C",
        band="B1",
        num_channels=num_channels,
        code_table=table,
        table_rate_cps=BDS.CODE_RATE_CPS,
        carrier_freq_hz=BDS.FREQ_HZ,
        code_period_s=BDS.CODE_PERIOD_S,
        acq_conf=AcqConfig(
            fs=fs,
            code_length_chips=BDS.CODE_LENGTH_CHIPS,
            code_rate_cps=BDS.CODE_RATE_CPS,
            doppler_max_hz=doppler_max_hz,
            doppler_step_hz=doppler_step_hz,
            max_dwells=acq_dwells,
            # NH chips flip the sign at any code boundary inside the
            # window; the double-length FFT keeps one clean period
            bit_transition_flag=True,
            pfa=acq_pfa,
        ),
        trk_conf=DllPllConf(
            fs=fs,
            code_length_chips=BDS.CODE_LENGTH_CHIPS,
            code_rate_cps=BDS.CODE_RATE_CPS,
            carrier_freq_hz=BDS.FREQ_HZ,
            pll_bw_hz=pll_bw_hz,
            dll_bw_hz=dll_bw_hz,
            pll_bw_narrow_hz=pll_bw_narrow_hz,
            dll_bw_narrow_hz=dll_bw_narrow_hz,
            enable_fll_pull_in=enable_fll_pull_in,
            fll_bw_hz=fll_bw_hz,
            pull_in_time_s=pull_in_time_s,
            extend_correlation_symbols=extend,
            codes_per_bit=BDS.CODES_PER_BIT,
            track_pilot=True,
            sec_len_pilot=20,
            sec_len_data=20,
            pilot_pll_atan2=False,
            data_on_quadrature=False,
            steps_per_block=steps_per_block or 20,
            max_channels=num_channels,
        ),
        make_decoder=D1Decoder,
        search_prns=search_prns,
        data_code_table=table,
        sec_pilot_table=nh,
        sec_data_levels=nh20_levels(),
        acq_code_table=table,
    )


def beidou_b1i_geo_plan(
    fs: float,
    num_channels: int = 4,
    doppler_max_hz: float = 3000.0,
    doppler_step_hz: float = 125.0,
    acq_dwells: int = 2,
    acq_pfa: float = 1e-3,
    pll_bw_hz: float = 25.0,
    dll_bw_hz: float = 2.0,
    pll_bw_narrow_hz: float = 5.0,
    dll_bw_narrow_hz: float = 0.5,
    enable_fll_pull_in: bool = True,
    fll_bw_hz: float = 4.0,
    pull_in_time_s: float = 0.25,
    search_prns: tuple = (1, 2, 3, 4, 5),
    steps_per_block: int | None = None,
) -> SignalPlan:
    """BeiDou B1I GEO (D2 NAV at 500 bps; PRNs 1-5/59-63).

    GEO B1I carries NO NH secondary code and 2 ms data bits
    (beidou_b1i_telemetry_decoder_gs.cc GEO branch): plain Costas tracking
    with codes_per_bit=2, bit-synced 2-period extended integration, and
    the D2 paged decoder. GEO Doppler is small (nearly stationary
    satellites) — the default search grid is narrow."""
    from gnss_sdr_tpu.codes.beidou_b1i import beidou_b1i_code_table
    from gnss_sdr_tpu.constants import beidou_b1i as BDS
    from gnss_sdr_tpu.telemetry.dnav_d2 import D2Decoder

    table = beidou_b1i_code_table()
    return SignalPlan(
        name="B1G",
        system="C",
        band="B1",
        num_channels=num_channels,
        code_table=table,
        table_rate_cps=BDS.CODE_RATE_CPS,
        carrier_freq_hz=BDS.FREQ_HZ,
        code_period_s=BDS.CODE_PERIOD_S,
        acq_conf=AcqConfig(
            fs=fs,
            code_length_chips=BDS.CODE_LENGTH_CHIPS,
            code_rate_cps=BDS.CODE_RATE_CPS,
            doppler_max_hz=doppler_max_hz,
            doppler_step_hz=doppler_step_hz,
            max_dwells=acq_dwells,
            # 500 bps: a bit edge can flip inside any 1 ms window
            bit_transition_flag=True,
            pfa=acq_pfa,
        ),
        trk_conf=DllPllConf(
            fs=fs,
            code_length_chips=BDS.CODE_LENGTH_CHIPS,
            code_rate_cps=BDS.CODE_RATE_CPS,
            carrier_freq_hz=BDS.FREQ_HZ,
            pll_bw_hz=pll_bw_hz,
            dll_bw_hz=dll_bw_hz,
            pll_bw_narrow_hz=pll_bw_narrow_hz,
            dll_bw_narrow_hz=dll_bw_narrow_hz,
            enable_fll_pull_in=enable_fll_pull_in,
            fll_bw_hz=fll_bw_hz,
            pull_in_time_s=pull_in_time_s,
            extend_correlation_symbols=2,
            codes_per_bit=2,
            bit_sync_delay_s=0.3,
            steps_per_block=steps_per_block or 20,
            max_channels=num_channels,
        ),
        make_decoder=D2Decoder,
        search_prns=search_prns,
        acq_code_table=table,
    )


def galileo_e5b_plan(
    fs: float,
    num_channels: int = 8,
    doppler_max_hz: float = 4000.0,
    doppler_step_hz: float = 250.0,
    acq_dwells: int = 2,
    acq_pfa: float = 1e-3,
    pll_bw_hz: float = 20.0,
    dll_bw_hz: float = 2.0,
    pll_bw_narrow_hz: float = 5.0,
    dll_bw_narrow_hz: float = 0.5,
    enable_fll_pull_in: bool = True,
    fll_bw_hz: float = 4.0,
    pull_in_time_s: float = 0.25,
    extend_correlation_symbols: int = 4,
    search_prns: tuple = tuple(range(1, 37)),
    steps_per_block: int | None = None,
) -> SignalPlan:
    """Galileo E5b: pilot (Q, CS100) tracking with data (I, CS4 x I/NAV)
    symbol extraction (reference adapters Galileo_E5b_PCPS_Acquisition /
    Galileo_E5b_DLL_PLL_Tracking / Galileo_E5b_Telemetry_Decoder; codes
    galileo_e5_signal_replica.cc, I/NAV galileo_navigation_message.cc).

    The E5b-I stream carries the same I/NAV structure as E1-B at
    250 sym/s, so the existing InavDecoder consumes the data symbols; the
    CS4 data secondary spans one 4 ms symbol."""
    from gnss_sdr_tpu.codes.galileo_e5b import (
        e5bi_secondary_levels,
        e5bq_secondary_levels,
        galileo_e5bi_code_table,
        galileo_e5bq_code_table,
    )
    from gnss_sdr_tpu.constants import galileo_e5b as E5B

    pilot_table = galileo_e5bq_code_table()
    data_table = galileo_e5bi_code_table()
    sec_pilot = np.stack([
        e5bq_secondary_levels(p + 1) for p in range(pilot_table.shape[0])
    ])
    extend = max(extend_correlation_symbols, 1) * E5B.CODES_PER_SYMBOL
    return SignalPlan(
        name="7X",
        system="E",
        band="E5b",
        num_channels=num_channels,
        code_table=pilot_table,
        table_rate_cps=E5B.CODE_RATE_CPS,
        carrier_freq_hz=E5B.FREQ_HZ,
        code_period_s=E5B.CODE_PERIOD_S,
        acq_conf=AcqConfig(
            fs=fs,
            code_length_chips=E5B.CODE_LENGTH_CHIPS,
            code_rate_cps=E5B.CODE_RATE_CPS,
            doppler_max_hz=doppler_max_hz,
            doppler_step_hz=doppler_step_hz,
            max_dwells=acq_dwells,
            bit_transition_flag=True,
            pfa=acq_pfa,
        ),
        trk_conf=DllPllConf(
            fs=fs,
            code_length_chips=E5B.CODE_LENGTH_CHIPS,
            code_rate_cps=E5B.CODE_RATE_CPS,
            carrier_freq_hz=E5B.FREQ_HZ,
            pll_bw_hz=pll_bw_hz,
            dll_bw_hz=dll_bw_hz,
            pll_bw_narrow_hz=pll_bw_narrow_hz,
            dll_bw_narrow_hz=dll_bw_narrow_hz,
            enable_fll_pull_in=enable_fll_pull_in,
            fll_bw_hz=fll_bw_hz,
            pull_in_time_s=pull_in_time_s,
            extend_correlation_symbols=extend,
            codes_per_bit=E5B.CODES_PER_SYMBOL,
            track_pilot=True,
            sec_len_pilot=100,
            sec_len_data=4,
            data_on_quadrature=True,
            steps_per_block=steps_per_block or 20,
            max_channels=num_channels,
        ),
        make_decoder=InavDecoder,
        search_prns=search_prns,
        data_code_table=data_table,
        sec_pilot_table=sec_pilot,
        sec_data_levels=e5bi_secondary_levels(),
        acq_code_table=data_table,
    )


def gps_l2c_plan(
    fs: float,
    num_channels: int = 8,
    doppler_max_hz: float = 4000.0,
    doppler_step_hz: float = 60.0,
    acq_dwells: int = 1,
    acq_pfa: float = 1e-3,
    pll_bw_hz: float = 2.0,
    dll_bw_hz: float = 0.5,
    pll_bw_narrow_hz: float = 1.5,
    dll_bw_narrow_hz: float = 0.25,
    enable_fll_pull_in: bool = True,
    fll_bw_hz: float = 2.0,
    pull_in_time_s: float = 1.0,
    extend_correlation_symbols: int = 1,   # CNAV flips every CM period
    search_prns: tuple = tuple(range(1, 33)),
    steps_per_block: int | None = None,
) -> SignalPlan:
    """GPS L2C, CM-only replica (reference adapters
    GPS_L2_M_PCPS_Acquisition / GPS_L2_M_DLL_PLL_Tracking /
    GPS_L2C_Telemetry_Decoder; code gps_l2c_signal_replica.cc).

    The 20 ms CM period equals one 50 sym/s CNAV symbol, so tracking runs
    extend_correlation_symbols=1 (symbol sign flips at every period
    boundary) and telemetry consumes every period's prompt sign. The long
    period narrows the Doppler bin spacing: step <= 1/(2T) = 25 Hz per bin
    at full sensitivity; 60 Hz with the double-length FFT's relaxed
    scalloping matches the reference adapter's default."""
    from gnss_sdr_tpu.codes.gps_l2c import gps_l2cm_code_table
    from gnss_sdr_tpu.constants import gps_l2c as L2C
    from gnss_sdr_tpu.telemetry.cnav import CnavDecoder

    return SignalPlan(
        name="2S",
        system="G",
        band="L2",
        num_channels=num_channels,
        code_table=gps_l2cm_code_table(),
        table_rate_cps=L2C.CODE_RATE_CPS,
        carrier_freq_hz=L2C.FREQ_HZ,
        code_period_s=L2C.CODE_PERIOD_S,
        acq_conf=AcqConfig(
            fs=fs,
            code_length_chips=L2C.CODE_LENGTH_CHIPS,
            code_rate_cps=L2C.CODE_RATE_CPS,
            doppler_max_hz=doppler_max_hz,
            doppler_step_hz=doppler_step_hz,
            max_dwells=acq_dwells,
            bit_transition_flag=True,
            pfa=acq_pfa,
            # data-only BPSK at 50 sym/s has stable FLL/Costas false
            # locks every 25 Hz; the two-step zoom hands tracking a
            # Doppler inside the +-12.5 Hz true basin (reference
            # make_2_steps / num_doppler_bins_step2)
            make_two_steps=True,
            doppler_step2_hz=8.0,
            num_doppler_bins_step2=6,
        ),
        trk_conf=DllPllConf(
            fs=fs,
            code_length_chips=L2C.CODE_LENGTH_CHIPS,
            code_rate_cps=L2C.CODE_RATE_CPS,
            carrier_freq_hz=L2C.FREQ_HZ,
            pll_bw_hz=pll_bw_hz,
            dll_bw_hz=dll_bw_hz,
            pll_bw_narrow_hz=pll_bw_narrow_hz,
            dll_bw_narrow_hz=dll_bw_narrow_hz,
            enable_fll_pull_in=enable_fll_pull_in,
            fll_bw_hz=fll_bw_hz,
            pull_in_time_s=pull_in_time_s,
            extend_correlation_symbols=1,
            codes_per_bit=L2C.CODES_PER_SYMBOL,
            steps_per_block=steps_per_block or 4,          # 4 x 20 ms = 80 ms per device call
            max_channels=num_channels,
        ),
        make_decoder=CnavDecoder,
        search_prns=search_prns,
    )


def beidou_b3i_geo_plan(
    fs: float,
    num_channels: int = 4,
    doppler_max_hz: float = 3000.0,
    doppler_step_hz: float = 125.0,
    acq_dwells: int = 2,
    acq_pfa: float = 1e-3,
    pll_bw_hz: float = 25.0,
    dll_bw_hz: float = 2.0,
    pll_bw_narrow_hz: float = 5.0,
    dll_bw_narrow_hz: float = 0.5,
    enable_fll_pull_in: bool = True,
    fll_bw_hz: float = 4.0,
    pull_in_time_s: float = 0.25,
    search_prns: tuple = (1, 2, 3, 4, 5),
    steps_per_block: int | None = None,
) -> SignalPlan:
    """BeiDou B3I GEO (D2 NAV at 500 bps, no NH secondary) — the B3-band
    twin of beidou_b1i_geo_plan (beidou_b3i_telemetry_decoder_gs GEO
    branch)."""
    from gnss_sdr_tpu.codes.beidou_b3i import beidou_b3i_code_table
    from gnss_sdr_tpu.constants import beidou_b3i as B3
    from gnss_sdr_tpu.telemetry.dnav_d2 import D2Decoder

    table = beidou_b3i_code_table()
    return SignalPlan(
        name="B3G",
        system="C",
        band="B3",
        num_channels=num_channels,
        code_table=table,
        table_rate_cps=B3.CODE_RATE_CPS,
        carrier_freq_hz=B3.FREQ_HZ,
        code_period_s=B3.CODE_PERIOD_S,
        acq_conf=AcqConfig(
            fs=fs,
            code_length_chips=B3.CODE_LENGTH_CHIPS,
            code_rate_cps=B3.CODE_RATE_CPS,
            doppler_max_hz=doppler_max_hz,
            doppler_step_hz=doppler_step_hz,
            max_dwells=acq_dwells,
            bit_transition_flag=True,
            pfa=acq_pfa,
        ),
        trk_conf=DllPllConf(
            fs=fs,
            code_length_chips=B3.CODE_LENGTH_CHIPS,
            code_rate_cps=B3.CODE_RATE_CPS,
            carrier_freq_hz=B3.FREQ_HZ,
            pll_bw_hz=pll_bw_hz,
            dll_bw_hz=dll_bw_hz,
            pll_bw_narrow_hz=pll_bw_narrow_hz,
            dll_bw_narrow_hz=dll_bw_narrow_hz,
            enable_fll_pull_in=enable_fll_pull_in,
            fll_bw_hz=fll_bw_hz,
            pull_in_time_s=pull_in_time_s,
            extend_correlation_symbols=2,
            codes_per_bit=2,
            bit_sync_delay_s=0.3,
            steps_per_block=steps_per_block or 20,
            max_channels=num_channels,
        ),
        make_decoder=D2Decoder,
        search_prns=search_prns,
        acq_code_table=table,
    )


def beidou_b3i_plan(
    fs: float,
    num_channels: int = 8,
    doppler_max_hz: float = 5000.0,
    doppler_step_hz: float = 250.0,
    acq_dwells: int = 2,
    acq_pfa: float = 1e-3,
    pll_bw_hz: float = 30.0,
    dll_bw_hz: float = 2.0,
    pll_bw_narrow_hz: float = 5.0,
    dll_bw_narrow_hz: float = 0.5,
    enable_fll_pull_in: bool = True,
    fll_bw_hz: float = 4.0,
    pull_in_time_s: float = 0.25,
    extend_correlation_symbols: int = 20,
    search_prns: tuple = tuple(range(6, 30)),
    steps_per_block: int | None = None,
) -> SignalPlan:
    """BeiDou B3I MEO/IGSO (D1 NAV + NH20, same framing as B1I but the
    13-stage-LFSR wideband code at 10.23 Mcps; reference adapters
    BEIDOU_B3I_PCPS_Acquisition / BEIDOU_B3I_DLL_PLL_Tracking /
    BEIDOU_B3I_Telemetry_Decoder, codes beidou_b3i_signal_replica.cc)."""
    from gnss_sdr_tpu.codes.beidou_b1i import nh20_levels
    from gnss_sdr_tpu.codes.beidou_b3i import beidou_b3i_code_table
    from gnss_sdr_tpu.constants import beidou_b3i as B3
    from gnss_sdr_tpu.telemetry.dnav import D1Decoder

    table = beidou_b3i_code_table()
    nh = np.tile(nh20_levels(), (table.shape[0], 1))
    extend = min(extend_correlation_symbols, B3.CODES_PER_BIT)
    return SignalPlan(
        name="B3",
        system="C",
        band="B3",
        num_channels=num_channels,
        code_table=table,
        table_rate_cps=B3.CODE_RATE_CPS,
        carrier_freq_hz=B3.FREQ_HZ,
        code_period_s=B3.CODE_PERIOD_S,
        acq_conf=AcqConfig(
            fs=fs,
            code_length_chips=B3.CODE_LENGTH_CHIPS,
            code_rate_cps=B3.CODE_RATE_CPS,
            doppler_max_hz=doppler_max_hz,
            doppler_step_hz=doppler_step_hz,
            max_dwells=acq_dwells,
            bit_transition_flag=True,
            pfa=acq_pfa,
        ),
        trk_conf=DllPllConf(
            fs=fs,
            code_length_chips=B3.CODE_LENGTH_CHIPS,
            code_rate_cps=B3.CODE_RATE_CPS,
            carrier_freq_hz=B3.FREQ_HZ,
            pll_bw_hz=pll_bw_hz,
            dll_bw_hz=dll_bw_hz,
            pll_bw_narrow_hz=pll_bw_narrow_hz,
            dll_bw_narrow_hz=dll_bw_narrow_hz,
            enable_fll_pull_in=enable_fll_pull_in,
            fll_bw_hz=fll_bw_hz,
            pull_in_time_s=pull_in_time_s,
            extend_correlation_symbols=extend,
            codes_per_bit=B3.CODES_PER_BIT,
            track_pilot=True,
            sec_len_pilot=20,
            sec_len_data=20,
            pilot_pll_atan2=False,
            data_on_quadrature=False,
            steps_per_block=steps_per_block or 20,
            max_channels=num_channels,
        ),
        make_decoder=D1Decoder,
        search_prns=search_prns,
        data_code_table=table,
        sec_pilot_table=nh,
        sec_data_levels=nh20_levels(),
        acq_code_table=table,
    )


def glonass_l1_ca_plan(
    fs: float,
    num_channels: int = 6,
    doppler_max_hz: float = 5000.0,
    doppler_step_hz: float = 250.0,
    acq_dwells: int = 2,
    acq_pfa: float = 1e-3,
    pll_bw_hz: float = 30.0,
    dll_bw_hz: float = 2.0,
    pll_bw_narrow_hz: float = 6.0,
    dll_bw_narrow_hz: float = 0.75,
    enable_fll_pull_in: bool = True,
    fll_bw_hz: float = 4.0,
    pull_in_time_s: float = 0.25,
    search_prns: tuple = tuple(range(1, 25)),
    steps_per_block: int | None = None,
) -> SignalPlan:
    """GLONASS L1 C/A (FDMA; reference adapters
    GLONASS_L1_CA_PCPS_Acquisition / GLONASS_L1_CA_DLL_PLL_Tracking /
    GLONASS_L1_CA_Telemetry_Decoder, code glonass_l1_signal_replica.cc).

    "PRN" = orbital slot 1..24; all slots share one 511-chip code and are
    separated by the FDMA carrier offset k(slot) * 562.5 kHz, carried in
    the plan's freq_offset_table and in TrackingState.carrier_offset
    (conf.fdma). Telemetry: GNAV at 10 ms symbols (bit sync at
    codes_per_bit=10, then 10-period extended integration)."""
    from gnss_sdr_tpu.codes.glonass_ca import (
        glonass_ca_code_table,
        slot_freq_offsets_hz,
    )
    from gnss_sdr_tpu.constants import glonass_l1 as GLO
    from gnss_sdr_tpu.telemetry.gnav import GnavDecoder

    table = glonass_ca_code_table()
    return SignalPlan(
        name="1G",
        system="R",
        band="G1",
        num_channels=num_channels,
        code_table=table,
        table_rate_cps=GLO.CODE_RATE_CPS,
        carrier_freq_hz=GLO.FREQ_HZ,
        code_period_s=GLO.CODE_PERIOD_S,
        acq_conf=AcqConfig(
            fs=fs,
            code_length_chips=GLO.CODE_LENGTH_CHIPS,
            code_rate_cps=GLO.CODE_RATE_CPS,
            doppler_max_hz=doppler_max_hz,
            doppler_step_hz=doppler_step_hz,
            max_dwells=acq_dwells,
            pfa=acq_pfa,
        ),
        trk_conf=DllPllConf(
            fs=fs,
            code_length_chips=GLO.CODE_LENGTH_CHIPS,
            code_rate_cps=GLO.CODE_RATE_CPS,
            carrier_freq_hz=GLO.FREQ_HZ,
            fdma=True,
            pll_bw_hz=pll_bw_hz,
            dll_bw_hz=dll_bw_hz,
            pll_bw_narrow_hz=pll_bw_narrow_hz,
            dll_bw_narrow_hz=dll_bw_narrow_hz,
            enable_fll_pull_in=enable_fll_pull_in,
            fll_bw_hz=fll_bw_hz,
            pull_in_time_s=pull_in_time_s,
            extend_correlation_symbols=GLO.CODES_PER_SYMBOL,
            codes_per_bit=GLO.CODES_PER_SYMBOL,
            steps_per_block=steps_per_block or 20,
            max_channels=num_channels,
        ),
        make_decoder=GnavDecoder,
        search_prns=search_prns,
        freq_offset_table=slot_freq_offsets_hz(),
    )


def qzss_l1_ca_plan(
    fs: float,
    num_channels: int = 4,
    doppler_max_hz: float = 5000.0,
    doppler_step_hz: float = 250.0,
    acq_dwells: int = 2,
    acq_pfa: float = 1e-3,
    pll_bw_hz: float = 35.0,
    dll_bw_hz: float = 2.0,
    pll_bw_narrow_hz: float = 7.5,
    dll_bw_narrow_hz: float = 0.75,
    enable_fll_pull_in: bool = True,
    fll_bw_hz: float = 4.0,
    pull_in_time_s: float = 0.25,
    extend_correlation_symbols: int = 20,
    search_prns: tuple = tuple(range(193, 203)),
) -> SignalPlan:
    """QZSS L1 C/A (reference adapters QZSS_L1_PCPS_Acquisition /
    QZSS_L1_DLL_PLL_Tracking; codes qzss_signal_replica.cc). QZSS L1 C/A
    is GPS-interoperable: same chip rate, LNAV-compatible message — the
    GPS plan with the QZSS PRN rows (193..202)."""
    from gnss_sdr_tpu.codes.gps_l1_ca import gps_l1_ca_code

    table = np.stack(
        [gps_l1_ca_code(p) for p in range(193, 203)]
    ).astype(np.float32)
    base = gps_l1ca_plan(
        fs=fs, num_channels=num_channels, doppler_max_hz=doppler_max_hz,
        doppler_step_hz=doppler_step_hz, acq_dwells=acq_dwells,
        acq_pfa=acq_pfa, pll_bw_hz=pll_bw_hz, dll_bw_hz=dll_bw_hz,
        pll_bw_narrow_hz=pll_bw_narrow_hz,
        dll_bw_narrow_hz=dll_bw_narrow_hz,
        enable_fll_pull_in=enable_fll_pull_in, fll_bw_hz=fll_bw_hz,
        pull_in_time_s=pull_in_time_s,
        extend_correlation_symbols=extend_correlation_symbols,
        search_prns=search_prns,
    )
    base.name = "J1"
    base.system = "J"
    base.code_table = table
    base.prn_row = lambda prn: prn - 193
    return base


def sbas_l1_plan(
    fs: float,
    num_channels: int = 2,
    doppler_max_hz: float = 5000.0,
    doppler_step_hz: float = 250.0,
    acq_dwells: int = 2,
    acq_pfa: float = 1e-3,
    pll_bw_hz: float = 30.0,
    dll_bw_hz: float = 2.0,
    pll_bw_narrow_hz: float = 7.5,
    dll_bw_narrow_hz: float = 0.75,
    enable_fll_pull_in: bool = True,
    fll_bw_hz: float = 4.0,
    pull_in_time_s: float = 0.25,
    search_prns: tuple = tuple(range(120, 139)),
    steps_per_block: int | None = None,
) -> SignalPlan:
    """SBAS L1 (reference adapters SBAS_L1_..._Telemetry_Decoder;
    sbas_l1_telemetry_decoder_gs.cc): C/A-family codes PRN 120-138, 500
    sps symbols = 2 code periods, 250 bps FEC-coded messages. GEO
    satellites are near-zero Doppler; the telemetry events carry
    integrity/correction messages, not PVT ephemerides."""
    from gnss_sdr_tpu.codes.gps_l1_ca import gps_l1_ca_code
    from gnss_sdr_tpu.constants import gps_l1_ca as GPS
    from gnss_sdr_tpu.telemetry.sbas import SbasDecoder

    table = np.stack(
        [gps_l1_ca_code(p) for p in range(120, 139)]
    ).astype(np.float32)
    return SignalPlan(
        name="1S",
        system="S",
        band="L1",
        num_channels=num_channels,
        code_table=table,
        table_rate_cps=GPS.CODE_RATE_CPS,
        carrier_freq_hz=GPS.FREQ_HZ,
        code_period_s=GPS.CODE_PERIOD_S,
        acq_conf=AcqConfig(
            fs=fs,
            code_length_chips=GPS.CODE_LENGTH_CHIPS,
            code_rate_cps=GPS.CODE_RATE_CPS,
            doppler_max_hz=doppler_max_hz,
            doppler_step_hz=doppler_step_hz,
            max_dwells=acq_dwells,
            # symbols flip every 2 ms: keep one clean period per FFT
            bit_transition_flag=True,
            pfa=acq_pfa,
        ),
        trk_conf=DllPllConf(
            fs=fs,
            code_length_chips=GPS.CODE_LENGTH_CHIPS,
            code_rate_cps=GPS.CODE_RATE_CPS,
            carrier_freq_hz=GPS.FREQ_HZ,
            pll_bw_hz=pll_bw_hz,
            dll_bw_hz=dll_bw_hz,
            pll_bw_narrow_hz=pll_bw_narrow_hz,
            dll_bw_narrow_hz=dll_bw_narrow_hz,
            enable_fll_pull_in=enable_fll_pull_in,
            fll_bw_hz=fll_bw_hz,
            pull_in_time_s=pull_in_time_s,
            extend_correlation_symbols=2,    # one 2 ms symbol
            codes_per_bit=2,
            steps_per_block=steps_per_block or 20,
            max_channels=num_channels,
        ),
        make_decoder=SbasDecoder,
        search_prns=search_prns,
        prn_row=lambda prn: prn - 120,
    )


def galileo_e6b_plan(
    fs: float,
    num_channels: int = 4,
    doppler_max_hz: float = 5000.0,
    doppler_step_hz: float = 250.0,
    acq_pfa: float = 1e-3,
    pll_bw_hz: float = 20.0,
    dll_bw_hz: float = 2.0,
    pll_bw_narrow_hz: float = 7.5,
    dll_bw_narrow_hz: float = 0.75,
    enable_fll_pull_in: bool = True,
    fll_bw_hz: float = 4.0,
    pull_in_time_s: float = 0.25,
    search_prns: tuple = tuple(range(1, 37)),
    steps_per_block: int | None = None,
) -> SignalPlan:
    """Galileo E6-B data channel (HAS/CNAV; reference adapters
    Galileo_E6_PCPS_Acquisition / Galileo_E6_DLL_PLL_Tracking /
    Galileo_E6_Telemetry_Decoder). BPSK(5) at 5.115 Mcps, one 1 ms code
    period per 1000 sps CNAV symbol — symbol-rate handling like E1-B
    (extend_correlation_symbols=1, timer-based narrow switch)."""
    from gnss_sdr_tpu.codes.galileo_e6 import galileo_e6b_code_table
    from gnss_sdr_tpu.constants import galileo_e6 as E6
    from gnss_sdr_tpu.telemetry.hascnav import CnavStreamDecoder

    return SignalPlan(
        name="E6",
        system="E",
        band="E6",
        num_channels=num_channels,
        code_table=galileo_e6b_code_table(),
        table_rate_cps=E6.CODE_RATE_CPS,
        carrier_freq_hz=E6.FREQ_HZ,
        code_period_s=E6.CODE_PERIOD_S,
        acq_conf=AcqConfig(
            fs=fs,
            code_length_chips=E6.CODE_LENGTH_CHIPS,
            code_rate_cps=E6.CODE_RATE_CPS,
            doppler_max_hz=doppler_max_hz,
            doppler_step_hz=doppler_step_hz,
            max_dwells=1,
            # CNAV symbols flip every period
            bit_transition_flag=True,
            pfa=acq_pfa,
        ),
        trk_conf=DllPllConf(
            fs=fs,
            code_length_chips=E6.CODE_LENGTH_CHIPS,
            code_rate_cps=E6.CODE_RATE_CPS,
            carrier_freq_hz=E6.FREQ_HZ,
            pll_bw_hz=pll_bw_hz,
            dll_bw_hz=dll_bw_hz,
            pll_bw_narrow_hz=pll_bw_narrow_hz,
            dll_bw_narrow_hz=dll_bw_narrow_hz,
            enable_fll_pull_in=enable_fll_pull_in,
            fll_bw_hz=fll_bw_hz,
            pull_in_time_s=pull_in_time_s,
            extend_correlation_symbols=1,
            codes_per_bit=1,
            steps_per_block=steps_per_block or 20,
            max_channels=num_channels,
        ),
        make_decoder=CnavStreamDecoder,
        search_prns=search_prns,
    )


def glonass_l2_ca_plan(
    fs: float,
    num_channels: int = 6,
    doppler_max_hz: float = 4000.0,
    doppler_step_hz: float = 250.0,
    acq_dwells: int = 2,
    acq_pfa: float = 1e-3,
    search_prns: tuple = tuple(range(1, 25)),
    **loop_kwargs,
) -> SignalPlan:
    """GLONASS L2 C/A (reference GLONASS_L2_CA_* adapters): identical code
    and GNAV message as L1, at 1246 MHz + k * 437.5 kHz."""
    plan = glonass_l1_ca_plan(
        fs=fs, num_channels=num_channels, doppler_max_hz=doppler_max_hz,
        doppler_step_hz=doppler_step_hz, acq_dwells=acq_dwells,
        acq_pfa=acq_pfa, search_prns=search_prns, **loop_kwargs,
    )
    from gnss_sdr_tpu.constants.glonass_l1 import SLOT_TO_K

    plan.name = "2G"
    plan.band = "G2"
    plan.carrier_freq_hz = 1.246e9
    plan.freq_offset_table = np.array(
        [SLOT_TO_K[s] * 437500.0 for s in range(1, 25)], dtype=np.float64
    )
    # rebuild the tracking conf with the L2 carrier (frozen dataclass)
    from dataclasses import replace

    plan.trk_conf = replace(plan.trk_conf, carrier_freq_hz=1.246e9)
    return plan


def galileo_e1bc_plan(
    fs: float,
    num_channels: int = 8,
    doppler_max_hz: float = 5000.0,
    doppler_step_hz: float = 125.0,
    acq_pfa: float = 1e-3,
    pll_bw_hz: float = 15.0,
    dll_bw_hz: float = 2.0,
    pll_bw_narrow_hz: float = 2.5,
    dll_bw_narrow_hz: float = 0.35,
    enable_fll_pull_in: bool = True,
    fll_bw_hz: float = 4.0,
    pull_in_time_s: float = 0.5,
    early_late_space_chips: float = 0.25,
    extend_correlation_symbols: int = 5,
    search_prns: tuple = tuple(range(1, 37)),
    enable_reed_solomon: bool = False,
    steps_per_block: int | None = None,
) -> SignalPlan:
    """Galileo E1 B+C with PILOT tracking (the reference's default E1
    configuration: Galileo_E1_DLL_PLL_VEML_Tracking with track_pilot=true,
    dll_pll_conf.h:81): VEML taps run on the E1-C pilot, the CS25
    secondary is wiped on-device after host sync, the PLL goes
    four-quadrant, and coherent integration extends past the 4 ms
    data-symbol ceiling (default 20 ms; up to the 100 ms secondary epoch —
    each T of coherent extension narrows the Costas pull range to
    +-1/(4T), so very long T needs a correspondingly settled loop). A
    separate prompt correlator on E1-B feeds the I/NAV decoder."""
    from gnss_sdr_tpu.codes.galileo_e1 import (
        e1c_secondary_chips,
        galileo_e1b_sinboc_table,
        galileo_e1c_sinboc_table,
    )

    pilot_table = galileo_e1c_sinboc_table()
    data_table = galileo_e1b_sinboc_table()
    cs25 = e1c_secondary_chips().astype(np.float32)
    sec_pilot = np.tile(cs25, (pilot_table.shape[0], 1))
    el_sub = 2.0 * early_late_space_chips
    vel_sub = 2.0 * 0.6
    extend = min(extend_correlation_symbols, 25)
    return SignalPlan(
        name="1B",
        system="E",
        num_channels=num_channels,
        code_table=pilot_table,
        table_rate_cps=SINBOC_TABLE_RATE_CPS,
        carrier_freq_hz=GAL.FREQ_HZ,
        code_period_s=GAL.CODE_PERIOD_S,
        acq_conf=AcqConfig(
            fs=fs,
            code_length_chips=SINBOC_TABLE_LENGTH,
            code_rate_cps=SINBOC_TABLE_RATE_CPS,
            doppler_max_hz=doppler_max_hz,
            doppler_step_hz=doppler_step_hz,
            max_dwells=1,
            bit_transition_flag=True,
            pfa=acq_pfa,
            # two-step Doppler zoom: with 4 ms coherent periods the FLL's
            # false-lock lines sit at +-125 Hz, and a 125 Hz primary grid
            # leaves up to 62.5 Hz of error — exactly the watershed. The
            # fine pass hands tracking a <16 Hz seed (reference E1 confs
            # use make_two_steps for the same reason).
            make_two_steps=True,
            doppler_step2_hz=31.25,
            num_doppler_bins_step2=4,
        ),
        trk_conf=DllPllConf(
            fs=fs,
            code_length_chips=SINBOC_TABLE_LENGTH,
            code_rate_cps=SINBOC_TABLE_RATE_CPS,
            carrier_freq_hz=GAL.FREQ_HZ,
            early_late_spacing_chips=el_sub,
            very_early_late_spacing_chips=vel_sub,
            pll_bw_hz=pll_bw_hz,
            dll_bw_hz=dll_bw_hz,
            pll_bw_narrow_hz=pll_bw_narrow_hz,
            dll_bw_narrow_hz=dll_bw_narrow_hz,
            enable_fll_pull_in=enable_fll_pull_in,
            fll_bw_hz=fll_bw_hz,
            pull_in_time_s=pull_in_time_s,
            extend_correlation_symbols=extend,
            codes_per_bit=1,
            track_pilot=True,
            sec_len_pilot=25,
            sec_len_data=1,
            pilot_pll_atan2=True,
            data_on_quadrature=False,
            steps_per_block=steps_per_block or 20,
            max_channels=num_channels,
        ),
        make_decoder=(
            (lambda prn: _rs_inav(prn)) if enable_reed_solomon
            else InavDecoder),
        search_prns=search_prns,
        data_code_table=data_table,
        sec_pilot_table=sec_pilot,
        sec_data_levels=np.ones(1, dtype=np.float32),
        acq_code_table=data_table,
    )
