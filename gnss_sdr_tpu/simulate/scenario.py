"""Geometry-consistent GPS L1 C/A scenario simulator.

Synthesizes a baseband IF capture for a receiver at a known position from a
(synthetic or real) broadcast-ephemeris constellation, with per-satellite:

- light-time-iterated delay (Sagnac-consistent with the PVT truth model in
  simulate/constellation.py),
- code phase and LNAV data bits driven by the satellite-clock transmit time
  (code Doppler automatically coherent with carrier Doppler),
- carrier phase -2*pi*f_L1*(t_rx - t_tx_sv), so measured pseudorange,
  carrier phase, and Doppler are mutually consistent,
- calibrated C/N0 against unit-variance complex AWGN.

This plays the role of the external gnss-sim simulator that the reference's
system tests rely on for truth (SURVEY.md §4; position_test.cc), one level
up from the per-signal SignalGenerator block (simulate/generator.py).

The satellite-clock transmit time t_tx_sv(t) is evaluated exactly on a
coarse grid (light-time iteration every `grid_step_s`) and linearly
interpolated per sample: the light-time acceleration (<2e-9 s/s^2) bounds
the interpolation error below 1e-12 s (0.3 mm) for 20 ms grids.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from gnss_sdr_tpu.codes.gps_l1_ca import gps_l1_ca_code
from gnss_sdr_tpu.constants import gps_l1_ca as G
from gnss_sdr_tpu.simulate.constellation import (
    GPS_L1_HZ,
    make_constellation,
    truth_measurement,
    visible_sats,
)
from gnss_sdr_tpu.telemetry.lnav import GpsEphemeris
from gnss_sdr_tpu.telemetry.lnav_encode import LnavEncoder


@dataclass
class ScenarioConfig:
    fs: float = 2.6e6
    tow_start_s: float = 7320.0          # receiver-clock TOW at sample 0
    duration_s: float = 40.0
    cn0_dbhz: float = 45.0
    rx_lat_deg: float = 41.275
    rx_lon_deg: float = 1.9876
    rx_height_m: float = 80.0
    rx_clock_bias_s: float = 0.0
    rx_clock_drift_ss: float = 0.0
    min_elevation_deg: float = 15.0
    max_sats: int = 8
    noise: bool = True
    seed: int = 0
    grid_step_s: float = 0.02


class GpsScenario:
    """Multi-satellite scenario with truth accessors."""

    def __init__(
        self,
        cfg: ScenarioConfig,
        ephemerides: dict[int, GpsEphemeris] | None = None,
    ) -> None:
        from gnss_sdr_tpu.pvt.coords import llh_to_ecef

        self.cfg = cfg
        self.ephs = ephemerides if ephemerides is not None else make_constellation(
            seed=cfg.seed
        )
        self.rx_ecef = llh_to_ecef(
            np.deg2rad(cfg.rx_lat_deg), np.deg2rad(cfg.rx_lon_deg),
            cfg.rx_height_m,
        )
        vis = visible_sats(
            self.ephs, self.rx_ecef, cfg.tow_start_s,
            np.deg2rad(cfg.min_elevation_deg),
        )
        self.prns = vis[: cfg.max_sats]
        self.encoders = {p: LnavEncoder(self.ephs[p]) for p in self.prns}
        self._grids: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        self._build_grids()

    # ------------------------------------------------------------------ truth
    def rx_clock_tow(self, sample: float) -> float:
        """Receiver-clock TOW at a sample index."""
        t = sample / self.cfg.fs
        return self.cfg.tow_start_s + t

    def rx_bias_at(self, sample: float) -> float:
        t = sample / self.cfg.fs
        return self.cfg.rx_clock_bias_s + self.cfg.rx_clock_drift_ss * t

    def truth_at(self, prn: int, sample: float) -> dict:
        """Geometry truth for one satellite at a receiver sample index."""
        return truth_measurement(
            self.ephs[prn], self.rx_ecef, self.rx_clock_tow(sample),
            rx_clock_bias_s=self.rx_bias_at(sample),
        )

    # ------------------------------------------------------------- grid setup
    def _build_grids(self) -> None:
        cfg = self.cfg
        n_grid = int(np.ceil(cfg.duration_s / cfg.grid_step_s)) + 3
        t_grid = np.arange(n_grid) * cfg.grid_step_s
        for prn in self.prns:
            ttx = np.empty(n_grid)
            for i, tg in enumerate(t_grid):
                tr = truth_measurement(
                    self.ephs[prn], self.rx_ecef,
                    cfg.tow_start_s + tg,
                    rx_clock_bias_s=cfg.rx_clock_bias_s
                    + cfg.rx_clock_drift_ss * tg,
                )
                # the broadcast L1 signal leaves the satellite TGD late
                # relative to the SV clock (that is what TGD *is*); the
                # receiver's code measurement therefore rides the timeline
                # t_tx_sv - tgd, and the solver subtracts TGD to undo it
                ttx[i] = tr["t_tx_sv"] - self.ephs[prn].tgd
            self._grids[prn] = (t_grid, ttx)

    # --------------------------------------------------------------- generate
    def generate(self, start_sample: int, num_samples: int) -> np.ndarray:
        """Complex64 baseband chunk for samples [start, start+num)."""
        cfg = self.cfg
        t = (start_sample + np.arange(num_samples, dtype=np.float64)) / cfg.fs
        acc = np.zeros(num_samples, dtype=np.complex128)
        amp = np.sqrt(10.0 ** (cfg.cn0_dbhz / 10.0) / cfg.fs)
        for prn in self.prns:
            tg, ttxg = self._grids[prn]
            ttx = np.interp(t, tg, ttxg)
            # code chips from satellite-clock time
            chip = np.floor(ttx * G.CODE_RATE_CPS).astype(np.int64)
            code = gps_l1_ca_code(prn).astype(np.float64)[chip % G.CODE_LENGTH_CHIPS]
            # LNAV bits (50 bps of satellite time)
            bit_idx = np.floor(ttx * 50.0).astype(np.int64)
            uniq, inv = np.unique(bit_idx, return_inverse=True)
            signs = self.encoders[prn].bits_at(uniq)[inv]
            # carrier: -2*pi*f*(t_rx - t_tx_sv) (mod applied in f64 cycles)
            cycles = -GPS_L1_HZ * (t - ttx)
            phase = 2.0 * np.pi * np.mod(cycles, 1.0)
            acc += amp * code * signs * np.exp(1j * phase)
        if cfg.noise:
            rng = np.random.default_rng(
                (cfg.seed * 0x9E3779B1 + start_sample) & 0x7FFFFFFF
            )
            acc += rng.normal(scale=np.sqrt(0.5), size=num_samples)
            acc += 1j * rng.normal(scale=np.sqrt(0.5), size=num_samples)
        return acc.astype(np.complex64)

    @property
    def total_samples(self) -> int:
        return int(self.cfg.duration_s * self.cfg.fs)
