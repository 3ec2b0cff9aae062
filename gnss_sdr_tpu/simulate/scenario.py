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
from gnss_sdr_tpu.pvt.atmosphere import KlobucharParams, klobuchar_delay, tropo_delay
from gnss_sdr_tpu.pvt.coords import az_el
from gnss_sdr_tpu.pvt.ephemeris import C_LIGHT
from gnss_sdr_tpu.simulate.constellation import (
    GPS_L1_HZ,
    make_constellation,
    truth_measurement,
    visible_sats,
)
from gnss_sdr_tpu.telemetry.lnav import GpsAlmanac, GpsEphemeris, GpsIonoUtc
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
    # constant receiver velocity in local ENU (dynamic scenarios; the
    # reference's dynamic position_test uses an external motion file)
    rx_vel_enu_mps: tuple = (0.0, 0.0, 0.0)
    min_elevation_deg: float = 15.0
    max_sats: int = 8
    noise: bool = True
    seed: int = 0
    grid_step_s: float = 0.02
    # atmosphere: when iono_utc is given, Klobuchar group delay/phase
    # advance is simulated on every signal and its parameters are broadcast
    # in subframe 4 page 18 (every frame — real pages recur every 12.5 min,
    # longer than a test capture); tropo (Saastamoinen) is simulated
    # unconditionally when `tropo` is set.
    iono_utc: GpsIonoUtc | None = None
    tropo: bool = True
    broadcast_almanac: bool = True


def almanac_from_ephemeris(eph: GpsEphemeris) -> GpsAlmanac:
    """Coarse almanac derived from a full ephemeris (what the operational
    segment broadcasts: same orbit, truncated precision)."""
    return GpsAlmanac(
        prn=eph.prn,
        ecc=eph.ecc,
        toa=eph.toe,
        delta_i=eph.i0 - 0.30 * PI_ICD,
        omega_dot=eph.omega_dot,
        sv_health=eph.sv_health,
        sqrt_a=eph.sqrt_a,
        omega0=eph.omega0,
        omega=eph.omega,
        m0=eph.m0,
        af0=eph.af0,
        af1=eph.af1,
    )


PI_ICD = 3.1415926535898


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
        from gnss_sdr_tpu.pvt.coords import enu_matrix

        e_mat = enu_matrix(np.deg2rad(cfg.rx_lat_deg),
                           np.deg2rad(cfg.rx_lon_deg))
        self.rx_vel_ecef = e_mat.T @ np.asarray(cfg.rx_vel_enu_mps,
                                                dtype=np.float64)
        vis = visible_sats(
            self.ephs, self.rx_ecef, cfg.tow_start_s,
            np.deg2rad(cfg.min_elevation_deg),
        )
        self.prns = vis[: cfg.max_sats]
        almanacs = {}
        if cfg.broadcast_almanac:
            almanacs = {p: almanac_from_ephemeris(self.ephs[p])
                        for p in self.ephs}
        self.encoders = {
            p: LnavEncoder(
                self.ephs[p], iono_utc=cfg.iono_utc, almanacs=almanacs,
                sf4_page18_every_frame=cfg.iono_utc is not None,
            )
            for p in self.prns
        }
        # per-PRN grids: code timeline (group delays) + phase timeline
        # (iono advances the carrier, Hatch-filter divergence physics)
        self._grids: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        self._grids_phase: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        # band-reusable raw pieces: geometric SV timeline + delays in meters
        self._geo: dict[int, dict] = {}
        self._build_grids()

    # ------------------------------------------------------------------ truth
    def rx_clock_tow(self, sample: float) -> float:
        """Receiver-clock TOW at a sample index."""
        t = sample / self.cfg.fs
        return self.cfg.tow_start_s + t

    def rx_bias_at(self, sample: float) -> float:
        t = sample / self.cfg.fs
        return self.cfg.rx_clock_bias_s + self.cfg.rx_clock_drift_ss * t

    def rx_ecef_at(self, t_s: float) -> np.ndarray:
        return self.rx_ecef + self.rx_vel_ecef * t_s

    def truth_at(self, prn: int, sample: float) -> dict:
        """Geometry truth for one satellite at a receiver sample index."""
        t = sample / self.cfg.fs
        return truth_measurement(
            self.ephs[prn], self.rx_ecef_at(t), self.rx_clock_tow(sample),
            rx_clock_bias_s=self.rx_bias_at(sample),
            rx_vel_ecef=self.rx_vel_ecef,
        )

    # ------------------------------------------------------------- grid setup
    def _build_grids(self) -> None:
        from gnss_sdr_tpu.pvt.coords import ecef_to_llh

        cfg = self.cfg
        lat, lon, hgt = ecef_to_llh(self.rx_ecef)
        iono_params = (
            KlobucharParams(alpha=cfg.iono_utc.alpha, beta=cfg.iono_utc.beta)
            if cfg.iono_utc is not None else None
        )
        n_grid = int(np.ceil(cfg.duration_s / cfg.grid_step_s)) + 3
        t_grid = np.arange(n_grid) * cfg.grid_step_s
        for prn in self.prns:
            ttx_sv = np.empty(n_grid)
            iono_m = np.zeros(n_grid)
            tropo_m = np.zeros(n_grid)
            for i, tg in enumerate(t_grid):
                rx_pos = self.rx_ecef_at(tg)
                tr = truth_measurement(
                    self.ephs[prn], rx_pos,
                    cfg.tow_start_s + tg,
                    rx_clock_bias_s=cfg.rx_clock_bias_s
                    + cfg.rx_clock_drift_ss * tg,
                )
                ttx_sv[i] = tr["t_tx_sv"]
                if cfg.tropo or iono_params is not None:
                    az, el = az_el(rx_pos, tr["sat_pos_rx_frame"])
                    if cfg.tropo:
                        tropo_m[i] = tropo_delay(el, hgt)
                    if iono_params is not None:
                        iono_m[i] = klobuchar_delay(
                            iono_params, lat, lon, az, el,
                            cfg.tow_start_s + tg,
                        )
            self._geo[prn] = {
                "t": t_grid, "ttx_sv": ttx_sv,
                "iono_m": iono_m, "tropo_m": tropo_m,
            }
            # the broadcast L1 signal leaves the satellite TGD late
            # relative to the SV clock (that is what TGD *is*); the
            # receiver's code measurement therefore rides the timeline
            # t_tx_sv - tgd, delayed further by the tropo + iono group
            # delays; the carrier phase sees iono as an *advance*
            tgd = self.ephs[prn].tgd
            self._grids[prn] = (
                t_grid, ttx_sv - tgd - (tropo_m + iono_m) / C_LIGHT
            )
            self._grids_phase[prn] = (
                t_grid, ttx_sv - tgd - (tropo_m - iono_m) / C_LIGHT
            )

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
            # carrier: -2*pi*f*(t_rx - t_tx_phase) (mod in f64 cycles); the
            # phase timeline differs from the code timeline by twice the
            # iono delay (group delay vs phase advance)
            ttx_ph = np.interp(t, *self._grids_phase[prn])
            cycles = -GPS_L1_HZ * (t - ttx_ph)
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
