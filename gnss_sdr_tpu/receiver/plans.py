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
    code_table: np.ndarray         # [P, table_length]
    table_rate_cps: float          # table units per second
    carrier_freq_hz: float
    code_period_s: float
    acq_conf: AcqConfig
    trk_conf: DllPllConf
    make_decoder: Callable[[int], object]
    search_prns: tuple = ()
    prn_row: Callable[[int], int] = lambda prn: prn - 1

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
) -> SignalPlan:
    """GPS L1 C/A (reference adapters GPS_L1_CA_PCPS_Acquisition /
    GPS_L1_CA_DLL_PLL_Tracking / GPS_L1_CA_Telemetry_Decoder)."""
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
        ),
        make_decoder=LnavDecoder,
        search_prns=search_prns,
    )


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
            steps_per_block=8,          # 8 x 4 ms = 32 ms per device call
            max_channels=num_channels,
        ),
        make_decoder=InavDecoder,
        search_prns=search_prns,
    )
