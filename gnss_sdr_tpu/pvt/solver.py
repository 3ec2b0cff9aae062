"""Single-point PVT solver: iterated least squares on pseudoranges +
range-rate LS for velocity (host-side, NumPy f64).

Equivalent in behavior to rtklib's pntpos single-point path
(rtklib_pntpos.cc estpos/estvel, called from Rtklib_Solver::get_PVT,
rtklib_solver.cc:1336): satellite position/clock from broadcast ephemeris
at corrected transmit time, Sagnac (earth-rotation) correction, elevation
masking, Klobuchar iono + Saastamoinen tropo, clock-bias state, DOPs.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from gnss_sdr_tpu.pvt.atmosphere import KlobucharParams, klobuchar_delay, tropo_delay
from gnss_sdr_tpu.pvt.coords import az_el, ecef_to_llh, enu_matrix
from gnss_sdr_tpu.pvt.ephemeris import C_LIGHT, OMEGA_E, eph_to_pos_vel_clock
from gnss_sdr_tpu.telemetry.lnav import GpsEphemeris


@dataclass
class ObsEpoch:
    """One satellite's measurements at a common receiver epoch."""

    prn: int
    pseudorange_m: float
    doppler_hz: float = np.nan            # carrier Doppler (Hz, positive closing)
    carrier_phase_cycles: float = np.nan
    cn0_dbhz: float = 0.0
    carrier_freq_hz: float = 1575.42e6
    system: str = "G"                     # 'G' GPS, 'E' Galileo, ...
    signal: str = "1C"                    # reference signal id ("1C","L5","5X",…)

    @property
    def tgd_gamma(self) -> float:
        """Group-delay scale: broadcast TGD/BGD is defined for the L1/E1
        band; band f gets gamma = (f_L1/f)^2 of it (IS-GPS-200 20.3.3.3.3.2,
        Galileo ICD 5.1.5; rtklib_pntpos.cc prange() gamma factor)."""
        return (1575.42e6 / self.carrier_freq_hz) ** 2


@dataclass
class PvtSolution:
    valid: bool
    pos_ecef: np.ndarray
    vel_ecef: np.ndarray
    clock_bias_s: float
    clock_drift_ss: float
    lat_rad: float = 0.0
    lon_rad: float = 0.0
    height_m: float = 0.0
    gdop: float = 0.0
    pdop: float = 0.0
    hdop: float = 0.0
    vdop: float = 0.0
    num_sats: int = 0
    residuals_m: np.ndarray = field(default_factory=lambda: np.zeros(0))
    tow_s: float = 0.0
    # inter-system clock biases [m] vs the reference system (GGTO analog;
    # rtklib estimates these as extra states in estpos)
    isb_m: dict = field(default_factory=dict)
    # (system, prn, signal) of each row of residuals_m
    used: list = field(default_factory=list)
    # (system, prn, signal) rejected by RAIM
    raim_rejected: list = field(default_factory=list)


def solve_pvt(
    obs: list[ObsEpoch],
    ephemerides: dict[int, GpsEphemeris],
    rx_tow_s: float,
    iono: KlobucharParams | None = None,
    x0: np.ndarray | None = None,
    elevation_mask_rad: float = np.deg2rad(5.0),
    apply_atmosphere: bool = True,
    max_iter: int = 10,
    raim_threshold_m: float = 30.0,
    raim_max_reject: int = 2,
    sbas=None,
) -> PvtSolution:
    """Single-point LS solve with residual-based RAIM/outlier rejection
    (reference rtklib_pntpos.cc estpos + raim_fde): if the worst post-fit
    residual exceeds `raim_threshold_m` and redundancy allows, the worst
    observation is excluded and the solve repeats.  Set
    raim_threshold_m <= 0 to disable.

    ``sbas``: optional pvt.sbas_corr.SbasCorrections — applies fast PRC,
    long-term range corrections, and grid iono (replacing Klobuchar for
    covered pierce points) before the final solve, SBAS-aided single
    point mode (rtklib pntpos with opt->sateph == EPHOPT_SBAS)."""
    current = list(obs)
    rejected: list = []
    if sbas is not None:
        current, iono = _apply_sbas(
            current, ephemerides, rx_tow_s, sbas, iono, x0,
            elevation_mask_rad, max_iter)
    while True:
        sol = _solve_core(
            current, ephemerides, rx_tow_s, iono=iono, x0=x0,
            elevation_mask_rad=elevation_mask_rad,
            apply_atmosphere=apply_atmosphere, max_iter=max_iter,
        )
        sol.raim_rejected = list(rejected)
        if (
            not sol.valid
            or raim_threshold_m <= 0
            or len(rejected) >= raim_max_reject
            or sol.num_sats <= 5
            or len(sol.residuals_m) == 0
        ):
            return sol
        worst = int(np.argmax(np.abs(sol.residuals_m)))
        if abs(sol.residuals_m[worst]) <= raim_threshold_m:
            return sol
        key = sol.used[worst]
        rejected.append(key)
        current = [o for o in current
                   if (o.system, o.prn, o.signal) != key]


def _apply_sbas(obs, ephemerides, rx_tow_s, sbas, iono, x0,
                elevation_mask_rad, max_iter):
    """Correct pseudoranges with SBAS fast/long-term/iono-grid terms
    using a rough position from an uncorrected solve; returns
    (corrected_obs, iono) where iono is None when the grid covered every
    used pierce point (grid replaces Klobuchar)."""
    from dataclasses import replace as _dc_replace

    from gnss_sdr_tpu.pvt.sbas_corr import pierce_point

    base = _solve_core(obs, ephemerides, rx_tow_s, iono=None, x0=x0,
                       elevation_mask_rad=elevation_mask_rad,
                       apply_atmosphere=False, max_iter=max_iter)
    if not base.valid:
        return obs, iono

    def _eph_for(o):
        return ephemerides.get((o.system, o.prn)) or ephemerides.get(o.prn)

    out = []
    all_covered = True
    for o in obs:
        eph = _eph_for(o)
        if eph is None:
            out.append(o)
            continue
        t_tx = rx_tow_s - o.pseudorange_m / C_LIGHT
        p, _, _, _ = eph_to_pos_vel_clock(eph, t_tx)
        rho = np.linalg.norm(p - base.pos_ecef)
        los = (p - base.pos_ecef) / rho
        pr = (o.pseudorange_m + sbas.fast_correction(o.prn)
              + sbas.long_term_range_correction(o.prn, los))
        az, el = az_el(base.pos_ecef, p)
        lat_pp, lon_pp = pierce_point(base.lat_rad, base.lon_rad, az, el)
        di = sbas.iono_delay_m(lat_pp, lon_pp, el)
        if di is not None:
            pr -= o.tgd_gamma * di
        else:
            all_covered = False
        out.append(_dc_replace(o, pseudorange_m=pr))
    return out, (None if all_covered else iono)


def _solve_core(
    obs: list[ObsEpoch],
    ephemerides: dict[int, GpsEphemeris],
    rx_tow_s: float,
    iono: KlobucharParams | None = None,
    x0: np.ndarray | None = None,
    elevation_mask_rad: float = np.deg2rad(5.0),
    apply_atmosphere: bool = True,
    max_iter: int = 10,
) -> PvtSolution:
    """Iterated least squares; rx_tow_s is the receiver-clock TOW of the
    epoch (its bias is estimated). Multi-constellation epochs (mixed
    ``ObsEpoch.system``) estimate one inter-system bias per extra system
    (rtklib estpos's GLO/GAL time-offset states).

    ``ephemerides`` may be keyed by bare PRN (single-system) or by
    (system, prn) tuples.
    """
    def _eph_for(o):
        return ephemerides.get((o.system, o.prn)) or ephemerides.get(o.prn)

    usable = [o for o in obs if _eph_for(o) is not None
              and np.isfinite(o.pseudorange_m)]
    no_fix = PvtSolution(False, np.zeros(3), np.zeros(3), 0.0, 0.0)
    if len(usable) < 4:
        return no_fix

    systems = sorted({o.system for o in usable})
    extra = systems[1:]                    # ISB states vs systems[0]
    isb_col = {s: 4 + k for k, s in enumerate(extra)}
    n_par = 4 + len(extra)

    x = np.zeros(n_par)
    if x0 is not None:
        x[:3] = x0

    sat_pos = np.zeros((len(usable), 3))
    sat_vel = np.zeros((len(usable), 3))
    sat_clk = np.zeros(len(usable))
    sat_clk_dot = np.zeros(len(usable))

    for it in range(max_iter):
        h_rows, resid = [], []
        mask = np.ones(len(usable), bool)
        for i, o in enumerate(usable):
            eph = _eph_for(o)
            # transmit time from pseudorange, then satellite clock correction
            t_tx = rx_tow_s - o.pseudorange_m / C_LIGHT
            p, v, dts, dts_dot = eph_to_pos_vel_clock(eph, t_tx)
            p, v, dts, dts_dot = eph_to_pos_vel_clock(eph, t_tx - dts)
            # Sagnac: rotate satellite into the ECEF frame at reception,
            # using the *geometric* light time (converges with the position
            # iteration; the pseudorange holds clock errors that would bias
            # the rotation angle)
            tau = np.linalg.norm(p - x[:3]) / C_LIGHT
            theta = OMEGA_E * tau
            rot = np.array([
                [np.cos(theta), np.sin(theta), 0.0],
                [-np.sin(theta), np.cos(theta), 0.0],
                [0.0, 0.0, 1.0],
            ])
            p = rot @ p
            v = rot @ v
            sat_pos[i], sat_vel[i] = p, v
            sat_clk[i], sat_clk_dot[i] = dts, dts_dot
            # group delay: gamma-scaled TGD/BGD for the observation's band.
            # Galileo E5a pairs with BGD(E1,E5a); everything else rides the
            # ephemeris' primary TGD (GPS TGD / Galileo BGD(E1,E5b)).
            if o.system == "E" and o.signal == "5X":
                gd = o.tgd_gamma * getattr(eph, "bgd_e1e5a", eph.tgd)
            elif o.system == "C":
                # BeiDou TGD1 is defined at B1I itself (BDS-SIS-ICD
                # 5.2.4.10) — no frequency scaling
                gd = eph.tgd
            else:
                gd = o.tgd_gamma * eph.tgd
            clk_corr = dts - gd

            rho = np.linalg.norm(p - x[:3])
            los = (p - x[:3]) / rho

            atmo = 0.0
            if it >= 2:
                az, el = az_el(x[:3], p)
                if el < elevation_mask_rad:
                    mask[i] = False
                if apply_atmosphere:
                    lat, lon, h = ecef_to_llh(x[:3])
                    atmo = tropo_delay(el, h)
                    if iono is not None:
                        # Klobuchar is an L1 vertical delay model; iono is
                        # dispersive so band f sees gamma x the L1 delay
                        atmo += o.tgd_gamma * klobuchar_delay(
                            iono, lat, lon, az, el, rx_tow_s
                        )

            pred = rho + x[3] - C_LIGHT * clk_corr + atmo
            row = np.zeros(n_par)
            row[:3] = -los
            row[3] = 1.0
            if o.system in isb_col:
                pred += x[isb_col[o.system]]
                row[isb_col[o.system]] = 1.0
            resid.append(o.pseudorange_m - pred)
            h_rows.append(row)

        h_mat = np.asarray(h_rows)[mask]
        r_vec = np.asarray(resid)[mask]
        if h_mat.shape[0] < n_par:
            return no_fix
        dx, *_ = np.linalg.lstsq(h_mat, r_vec, rcond=None)
        x = x + dx
        if np.linalg.norm(dx[:3]) < 1e-4 and it >= 3:
            break
    else:
        if np.linalg.norm(dx[:3]) > 100.0:
            return no_fix

    # ---- velocity from Doppler ---------------------------------------------
    vel = np.zeros(3)
    drift = 0.0
    dop_rows, dop_res = [], []
    for i, o in enumerate(usable):
        if not mask[i] or not np.isfinite(o.doppler_hz):
            continue
        lam = C_LIGHT / o.carrier_freq_hz
        rho = np.linalg.norm(sat_pos[i] - x[:3])
        los = (sat_pos[i] - x[:3]) / rho
        # measured range rate (positive Doppler = closing range shrinking)
        rr_meas = -lam * o.doppler_hz + C_LIGHT * sat_clk_dot[i]
        rr_sat = float(sat_vel[i] @ los)
        dop_res.append(rr_meas - rr_sat)
        dop_rows.append(np.array([-los[0], -los[1], -los[2], 1.0]))
    if len(dop_rows) >= 4:
        hm = np.asarray(dop_rows)
        rv = np.asarray(dop_res)
        sol, *_ = np.linalg.lstsq(hm, rv, rcond=None)
        vel, drift = sol[:3], sol[3] / C_LIGHT

    # ---- DOPs ---------------------------------------------------------------
    lat, lon, h = ecef_to_llh(x[:3])
    q = np.linalg.inv(h_mat.T @ h_mat)
    gdop = float(np.sqrt(np.trace(q[:4, :4])))
    pdop = float(np.sqrt(np.trace(q[:3, :3])))
    e_mat = enu_matrix(lat, lon)
    q_enu = e_mat @ q[:3, :3] @ e_mat.T
    hdop = float(np.sqrt(q_enu[0, 0] + q_enu[1, 1]))
    vdop = float(np.sqrt(q_enu[2, 2]))

    return PvtSolution(
        valid=True,
        pos_ecef=x[:3].copy(),
        vel_ecef=vel,
        clock_bias_s=float(x[3] / C_LIGHT),
        clock_drift_ss=float(drift),
        lat_rad=lat, lon_rad=lon, height_m=h,
        gdop=gdop, pdop=pdop, hdop=hdop, vdop=vdop,
        num_sats=int(mask.sum()),
        residuals_m=r_vec - h_mat @ dx,
        tow_s=rx_tow_s,
        isb_m={s: float(x[c]) for s, c in isb_col.items()},
        used=[(o.system, o.prn, o.signal)
              for i, o in enumerate(usable) if mask[i]],
    )
