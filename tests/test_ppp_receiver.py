"""Receiver-level PPP positioning mode (PVT.positioning_mode=PPP_*).

Exercises Receiver._refine_ppp: pairing dual-band observables per
satellite into iono-free combinations and refining the LS fix with the
float PPP filter (reference rtklib_pvt.cc PMODE_PPP_* dispatch +
rtklib_ppp.cc pppos).
"""

import numpy as np

from gnss_sdr_tpu.observables.engine import EpochObservation
from gnss_sdr_tpu.pvt.coords import llh_to_ecef
from gnss_sdr_tpu.pvt.ephemeris import C_LIGHT, OMEGA_E, eph_to_pos_vel_clock
from gnss_sdr_tpu.pvt.solver import PvtSolution
from gnss_sdr_tpu.receiver.receiver import Receiver, ReceiverConfig
from gnss_sdr_tpu.simulate.constellation import make_constellation, visible_sats

F1, F2 = 1575.42e6, 1176.45e6
L1, L5 = C_LIGHT / F1, C_LIGHT / F2


def _rows_at(ephs, vis, rx, t, rng, clock_m=12.0):
    """Dual-band EpochObservation rows, Sagnac-consistent with the
    engine's earth-rotation model; channel i = L1, i+8 = L5."""
    rows = []
    for i, prn in enumerate(vis):
        tau = 0.075
        for _ in range(3):
            sp, _, dts, _ = eph_to_pos_vel_clock(ephs[prn], t - tau)
            th = OMEGA_E * tau
            rot = np.array([[np.cos(th), np.sin(th), 0.0],
                            [-np.sin(th), np.cos(th), 0.0],
                            [0.0, 0.0, 1.0]])
            sp_r = rot @ sp
            tau = np.linalg.norm(sp_r - rx) / C_LIGHT
        rho = float(np.linalg.norm(sp_r - rx))
        base = rho + clock_m - C_LIGHT * dts
        for ch, (f, lam, sig) in (
            (i, (F1, L1, "1C")), (i + 8, (F2, L5, "L5"))
        ):
            pr = base + rng.normal(scale=0.3)
            ph = (-(base + rng.normal(scale=0.003)) / lam
                  + (17 * prn + ch) % 23)
            rows.append(EpochObservation(
                channel=ch, prn=prn, t_tx_sv=t - tau,
                pseudorange_m=pr, pseudorange_smoothed_m=pr,
                doppler_hz=0.0, carrier_phase_cycles=ph,
                cn0_dbhz=45.0, system="G", signal=sig))
    return rows


def test_receiver_ppp_refines_ls_fix():
    ephs = make_constellation(seed=3)
    rx_pos = llh_to_ecef(np.deg2rad(41.275), np.deg2rad(1.9876), 80.0)
    tow = 7350.0
    vis = visible_sats(ephs, rx_pos, tow)[:8]
    assert len(vis) >= 6

    rx = Receiver(ReceiverConfig(
        fs=2.6e6, num_channels=8, positioning_mode="PPP_Static",
        earth_tide=1, phwindup=True))
    assert rx.ppp is not None and rx.ppp.tide_correction
    # the default receiver has only 8 obs channels; widen for the L5 rows
    from gnss_sdr_tpu.observables.engine import ChannelObsState

    while len(rx.obs.ch) < 16:
        rx.obs.ch.append(ChannelObsState())
    for i in range(len(vis)):
        rx.obs.configure_channel(i, 1e-3, 1.023e6, F1)
        rx.obs.configure_channel(i + 8, 1e-3, 1.023e6, F2, signal="L5")
    rx.ephemerides = {("G", p): ephs[p] for p in vis}

    rng = np.random.default_rng(9)
    x0_err = np.array([4.0, -3.0, 5.0])
    sol = None
    for k in range(40):
        t = tow + k
        rows = _rows_at(ephs, vis, rx_pos, t, rng)
        sol = PvtSolution(
            valid=True, pos_ecef=rx_pos + x0_err, vel_ecef=np.zeros(3),
            clock_bias_s=12.0 / C_LIGHT, clock_drift_ss=0.0,
            num_sats=len(vis))
        rx._refine_ppp(sol, rows, t + 12.0 / C_LIGHT)
    # PPP refinement replaced the (deliberately offset) LS position and
    # converged near the truth, well inside the 4-7 m LS offset
    err = np.linalg.norm(sol.pos_ecef - rx_pos)
    assert err < 1.0, err
    assert abs(sol.lat_rad - np.deg2rad(41.275)) < 1e-4


def test_single_mode_has_no_ppp():
    rx = Receiver(ReceiverConfig(fs=2.6e6, num_channels=4))
    assert rx.ppp is None


def test_ppp_requires_dual_band_rows():
    """With single-frequency rows the PPP hook leaves the fix alone."""
    ephs = make_constellation(seed=3)
    rx_pos = llh_to_ecef(np.deg2rad(41.275), np.deg2rad(1.9876), 80.0)
    vis = visible_sats(ephs, rx_pos, 7350.0)[:6]
    rx = Receiver(ReceiverConfig(
        fs=2.6e6, num_channels=8, positioning_mode="PPP_Kinematic"))
    assert rx.ppp is not None and rx.ppp.mode == "kinematic"
    rx.ephemerides = {("G", p): ephs[p] for p in vis}
    rng = np.random.default_rng(1)
    rows = [r for r in _rows_at(ephs, vis, rx_pos, 7350.0, rng)
            if r.channel < 8]                  # L1-only
    p0 = rx_pos + 3.0
    sol = PvtSolution(valid=True, pos_ecef=p0.copy(), vel_ecef=np.zeros(3),
                      clock_bias_s=0.0, clock_drift_ss=0.0)
    rx._refine_ppp(sol, rows, 7350.0)
    assert np.allclose(sol.pos_ecef, p0)
