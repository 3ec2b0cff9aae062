"""Atmosphere end-to-end: Klobuchar iono + Saastamoinen tropo simulated on
the signal, Klobuchar parameters decoded from LNAV subframe 4 page 18, and
the solver's corrections bringing the fix back inside the reference gates
(position_test_flags.h:39-40 with iono/tropo enabled)."""

import numpy as np
import pytest

from gnss_sdr_tpu.pvt.coords import ecef_to_enu
from gnss_sdr_tpu.receiver.receiver import Receiver, ReceiverConfig
from gnss_sdr_tpu.simulate.scenario import GpsScenario, ScenarioConfig
from gnss_sdr_tpu.telemetry.lnav import GpsIonoUtc

FS = 2.6e6

# representative broadcast values (quantized at ICD scalings on encode)
IONO_UTC = GpsIonoUtc(
    alpha0=1.1176e-08, alpha1=1.4901e-08, alpha2=-5.96e-08, alpha3=-1.19e-07,
    beta0=96256.0, beta1=81920.0, beta2=-196608.0, beta3=-393216.0,
    a0=4.65e-09, a1=1.33e-14, tot=147456.0, wn_t=61,
    delta_t_ls=18, wn_lsf=137, dn=7, delta_t_lsf=18,
)


@pytest.fixture(scope="module")
def atmo_receiver():
    scen = GpsScenario(ScenarioConfig(
        fs=FS,
        # subframe-5 boundary; the next SF5 (almanac page) spans t=30-36 s
        tow_start_s=7314.0,
        duration_s=38.0,
        cn0_dbhz=46.0,
        rx_clock_bias_s=2.1e-4,
        max_sats=6,
        min_elevation_deg=15.0,
        seed=1,
        iono_utc=IONO_UTC,
        tropo=True,
    ))
    assert len(scen.prns) >= 5, scen.prns
    rx = Receiver(ReceiverConfig(fs=FS, num_channels=6))
    chunk = int(FS)
    total = scen.total_samples
    fed = 0
    acquired = False
    while fed < total:
        n = min(chunk, total - fed)
        rx.feed(scen.generate(fed, n))
        fed += n
        if not acquired:
            got = rx.acquire()
            acquired = len(got) >= 4
        rx.run()
    return scen, rx


def test_klobuchar_decoded_from_signal(atmo_receiver):
    scen, rx = atmo_receiver
    assert rx.iono.valid, "no Klobuchar parameters decoded"
    # decoded values match the broadcast within one quantization LSB
    assert abs(rx.iono.alpha[0] - IONO_UTC.alpha0) <= 2.0**-30
    assert abs(rx.iono.beta[0] - IONO_UTC.beta0) <= 2.0**11
    iu = rx.status.iono_utc
    assert iu.delta_t_ls == 18 and iu.has_utc


def test_position_gates_with_atmosphere(atmo_receiver):
    scen, rx = atmo_receiver
    fixes = rx.status.fixes
    assert len(fixes) >= 8, f"only {len(fixes)} fixes"
    truth = scen.rx_ecef
    lat = np.deg2rad(scen.cfg.rx_lat_deg)
    lon = np.deg2rad(scen.cfg.rx_lon_deg)
    errs_enu = np.array([
        ecef_to_enu(f.pos_ecef - truth, lat, lon) for f in fixes[3:]
    ])
    err_2d = np.hypot(errs_enu[:, 0], errs_enu[:, 1])
    err_3d = np.linalg.norm(errs_enu, axis=1)
    assert np.mean(err_2d) < 2.0, f"mean 2D error {np.mean(err_2d):.2f} m"
    assert np.mean(err_3d) < 5.0, f"mean 3D error {np.mean(err_3d):.2f} m"


def test_almanac_decoded(atmo_receiver):
    """SF5 almanac pages decode (one page per 30 s frame: at least one
    entry lands in the capture)."""
    scen, rx = atmo_receiver
    alls = {}
    for g in rx.groups:
        for d in g.decoders.values():
            alls.update(getattr(d, "almanacs", {}))
    assert alls, "no almanac pages decoded"
    for sv, alm in alls.items():
        true_eph = scen.ephs[sv]
        assert abs(alm.sqrt_a - true_eph.sqrt_a) <= 2.0**-11 + 1e-9
