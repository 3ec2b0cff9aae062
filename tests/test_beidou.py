"""BeiDou B1I system tests: D1 codec round trip, and a GPS L1 + BDS B1I
dual-constellation fix with the inter-system bias estimated (the reference's
Channels_1C + Channels_B1 configuration; BDT->GPST handled in telemetry)."""

import numpy as np
import pytest

from gnss_sdr_tpu.pvt.coords import ecef_to_enu
from gnss_sdr_tpu.receiver.plans import beidou_b1i_plan, gps_l1ca_plan
from gnss_sdr_tpu.receiver.receiver import Receiver, ReceiverConfig
from gnss_sdr_tpu.simulate.beidou import BeidouScenario, BeidouScenarioConfig
from gnss_sdr_tpu.simulate.scenario import GpsScenario, ScenarioConfig

FS = 2.6e6


def test_d1_codec_round_trip():
    from gnss_sdr_tpu.simulate.beidou import make_beidou_constellation
    from gnss_sdr_tpu.telemetry.dnav import D1Decoder, D1Encoder

    eph = make_beidou_constellation(seed=3)[8]
    enc = D1Encoder(eph)
    start_bit = int(7200.0 * 50) + 97
    bits = enc.bits_at(np.arange(start_bit, start_bit + 2400))
    dec = D1Decoder(8)
    stamps = np.arange(2400) * 1000
    events = []
    for i in range(0, 2400, 41):
        events += dec.push_symbols(-bits[i:i + 41], stamps[i:i + 41])
    assert dec.subframes_ok >= 6
    assert dec.eph.complete
    for f in ("sqrt_a", "m0", "omega0", "i0", "toe", "af0"):
        a, b = getattr(eph, f), getattr(dec.eph, f)
        assert abs(a - b) < max(1e-6 * abs(a), 1e-7) + 1e-9, (f, a, b)
    # TOW events on the GPS timescale (BDT + 14 s), at subframe ends
    assert all(abs((e["tow_s"] - 14.0) % 6.0) < 1e-9 for e in events)


@pytest.fixture(scope="module")
def gps_bds_receiver():
    # BDT = GPST - 14 s phases the D1 frame so SF2 (the last ephemeris
    # piece here) completes at t=32: tow_start 7314 puts GPS SF1-3 at
    # t=6..24 and BDS SF3/SF1/SF2 at t=2..8/20..26/26..32
    common = dict(
        fs=FS, duration_s=35.0, rx_clock_bias_s=1.2e-4,
        min_elevation_deg=15.0, max_sats=4,
    )
    gps = GpsScenario(ScenarioConfig(
        tow_start_s=7314.0, cn0_dbhz=46.0, seed=1, **common))
    bds = BeidouScenario(BeidouScenarioConfig(
        tow_start_s=7314.0, cn0_dbhz=46.0, seed=1, **common))
    assert len(gps.prns) >= 4 and len(bds.prns) >= 4

    plans = [
        gps_l1ca_plan(fs=FS, num_channels=4, search_prns=tuple(gps.prns)),
        beidou_b1i_plan(fs=FS, num_channels=4, search_prns=tuple(bds.prns)),
    ]
    rx = Receiver(ReceiverConfig(fs=FS, num_channels=8), plans=plans)
    chunk = int(FS)
    acquired = False
    for i in range(35):
        rx.feed(gps.generate(i * chunk, chunk), band="L1")
        rx.feed(bds.generate(i * chunk, chunk), band="B1")
        if not acquired:
            got = rx.acquire()
            acquired = (
                len([k for k in got if k[0] == "G"]) >= 3
                and len([k for k in got if k[0] == "C"]) >= 3
            )
        rx.run()
    return gps, bds, rx


def test_bds_tracking_and_telemetry(gps_bds_receiver):
    gps, bds, rx = gps_bds_receiver
    gb = next(g for g in rx.groups if g.plan.system == "C")
    locked = [ch for ch in range(gb.plan.num_channels)
              if gb.tracker.ctl[ch].sec_locked]
    assert len(locked) >= 3, "NH20 lock on too few B1I channels"
    ok = sum(d.subframes_ok for d in gb.decoders.values())
    assert ok >= 6, f"only {ok} D1 subframes"
    bds_eph = {k: v for k, v in rx.ephemerides.items() if k[0] == "C"}
    assert len(bds_eph) >= 3, "too few BDS ephemerides decoded"
    for (_, prn), eph in bds_eph.items():
        true_eph = bds.ephs[prn]
        assert abs(eph.sqrt_a - true_eph.sqrt_a) <= 2.0**-19 + 1e-10
        assert abs(eph.toe - true_eph.toe) < 1e-9


def test_gps_bds_dual_fix(gps_bds_receiver):
    gps, bds, rx = gps_bds_receiver
    fixes = rx.status.fixes
    assert len(fixes) >= 5, f"only {len(fixes)} fixes"
    last = fixes[-1]
    used_sys = {k[0] for k in last.used}
    assert used_sys == {"G", "C"}, last.used
    assert last.isb_m, "no inter-system bias state"

    truth = gps.rx_ecef
    lat = np.deg2rad(gps.cfg.rx_lat_deg)
    lon = np.deg2rad(gps.cfg.rx_lon_deg)
    errs = np.array([
        ecef_to_enu(f.pos_ecef - truth, lat, lon) for f in fixes[3:]
    ])
    err_2d = np.hypot(errs[:, 0], errs[:, 1])
    err_3d = np.linalg.norm(errs, axis=1)
    assert np.mean(err_2d) < 2.0, f"mean 2D error {np.mean(err_2d):.2f} m"
    assert np.mean(err_3d) < 5.0, f"mean 3D error {np.mean(err_3d):.2f} m"
