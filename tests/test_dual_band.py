"""Dual-band end-to-end tests: pilot/secondary-code tracking feeding real
fixes.

- GPS L1 C/A + L5: cold start; LNAV (L1) delivers ephemeris, CNAV (L5)
  anchors the L5 channels' TOW; the fix fuses both bands with
  gamma-scaled TGD. Mirrors the reference's dual-frequency merge
  (rtklib_solver.cc:830-1300) + track_pilot (dll_pll_conf.h:81).
- Galileo E5a: assisted (hot) start with injected ephemerides; FNAV anchors
  the E5a-only fix through the BGD(E1,E5a) group-delay path.
"""

import numpy as np
import pytest

from gnss_sdr_tpu.pvt.coords import ecef_to_enu
from gnss_sdr_tpu.receiver.plans import galileo_e5a_plan, gps_l1ca_plan, gps_l5_plan
from gnss_sdr_tpu.receiver.receiver import Receiver, ReceiverConfig
from gnss_sdr_tpu.simulate.galileo import GalileoScenario, GalileoScenarioConfig
from gnss_sdr_tpu.simulate.multiband import GalileoE5aBand, GpsL5Band
from gnss_sdr_tpu.simulate.scenario import GpsScenario, ScenarioConfig
FS_L1 = 2.6e6
FS_L5 = 10.4e6


@pytest.fixture(scope="module")
def dual_band_rx():
    cfg = ScenarioConfig(
        fs=FS_L1,
        tow_start_s=7314.0,        # subframe-5 boundary: SF1-3 by t=24 s
        duration_s=32.0,
        cn0_dbhz=46.0,
        rx_clock_bias_s=1.3e-4,
        max_sats=5,
        min_elevation_deg=15.0,
        seed=4,
    )
    scen = GpsScenario(cfg)
    assert len(scen.prns) >= 5, scen.prns
    l5 = GpsL5Band(scen, fs=FS_L5, cn0_dbhz=47.0)

    plans = [
        gps_l1ca_plan(fs=FS_L1, num_channels=5,
                      search_prns=tuple(scen.prns)),
        gps_l5_plan(fs=FS_L5, num_channels=4,
                    search_prns=tuple(scen.prns[:4])),
    ]
    rx = Receiver(ReceiverConfig(fs=FS_L1, num_channels=5), plans=plans)

    c1, c5 = int(FS_L1), int(FS_L5)
    acquired = False
    for i in range(int(cfg.duration_s)):
        rx.feed(scen.generate(i * c1, c1), band="L1")
        rx.feed(l5.generate(i * c5, c5), band="L5")
        if not acquired:
            got = rx.acquire()
            acquired = (
                len([k for k in rx.status.acquired if k[0] == "G"]) >= 4
                and any(g.plan.name == "L5"
                        and len(g.active_channels()) >= 3
                        for g in rx.groups)
            )
        rx.run()
    return scen, l5, rx


def test_l5_pilot_tracking_engaged(dual_band_rx):
    scen, l5, rx = dual_band_rx
    g5 = next(g for g in rx.groups if g.plan.name == "L5")
    locked = [ch for ch in range(g5.plan.num_channels)
              if g5.tracker.ctl[ch].sec_locked]
    assert len(locked) >= 3, "NH20 secondary sync on too few L5 channels"
    # four-quadrant PLL engaged on-device
    atan2 = np.asarray(g5.tracker.state.use_atan2)
    assert all(atan2[ch] for ch in locked)
    # extended integration past one symbol (20 ms > 10 ms NH10 symbol)
    integ = np.asarray(g5.tracker.state.integ_len)
    assert all(integ[ch] == 20 for ch in locked)


def test_cnav_decoded_and_anchored(dual_band_rx):
    scen, l5, rx = dual_band_rx
    g5 = next(g for g in rx.groups if g.plan.name == "L5")
    ok = [d for d in g5.decoders.values() if d.msgs_ok > 0]
    assert len(ok) >= 3, "CNAV messages decoded on too few channels"
    anchored = [
        st for st in rx.obs.ch[g5.offset:g5.offset + g5.plan.num_channels]
        if st.anchored
    ]
    assert len(anchored) >= 3


def test_dual_band_fix_uses_l5(dual_band_rx):
    scen, l5, rx = dual_band_rx
    fixes = rx.status.fixes
    assert len(fixes) >= 5, f"only {len(fixes)} fixes"
    l5_rows = [k for k in fixes[-1].used if k[2] == "L5"]
    assert len(l5_rows) >= 2, f"last fix used no L5 obs: {fixes[-1].used}"

    truth = scen.rx_ecef
    lat = np.deg2rad(scen.cfg.rx_lat_deg)
    lon = np.deg2rad(scen.cfg.rx_lon_deg)
    errs_enu = np.array([
        ecef_to_enu(f.pos_ecef - truth, lat, lon) for f in fixes[3:]
    ])
    err_2d = np.hypot(errs_enu[:, 0], errs_enu[:, 1])
    err_3d = np.linalg.norm(errs_enu, axis=1)
    # reference static accuracy gates (position_test_flags.h:39-40)
    assert np.mean(err_2d) < 2.0, f"mean 2D error {np.mean(err_2d):.2f} m"
    assert np.mean(err_3d) < 5.0, f"mean 3D error {np.mean(err_3d):.2f} m"


FS_E5A = 10.4e6


@pytest.fixture(scope="module")
def e5a_rx():
    cfg = GalileoScenarioConfig(
        fs=FS_L1,
        tow_start_s=7312.0,
        duration_s=20.0,
        cn0_dbhz=47.0,
        rx_clock_bias_s=0.9e-4,
        max_sats=5,
        min_elevation_deg=15.0,
        seed=4,
    )
    scen = GalileoScenario(cfg)
    assert len(scen.prns) >= 5, scen.prns
    e5a = GalileoE5aBand(scen, fs=FS_E5A, cn0_dbhz=47.0)

    plan = galileo_e5a_plan(fs=FS_E5A, num_channels=5,
                            search_prns=tuple(scen.prns))
    rx = Receiver(ReceiverConfig(fs=FS_E5A, num_channels=5), plans=[plan])
    # assisted start: ephemerides injected (reference warm start via
    # XML assistance, control_thread.cc:515); FNAV still provides TOW
    for p in scen.prns:
        rx.ephemerides[("E", p)] = scen.ephs[p]

    c = int(FS_E5A)
    acquired = False
    for i in range(int(cfg.duration_s)):
        rx.feed(e5a.generate(i * c, c), band="L5")
        if not acquired:
            got = rx.acquire()
            acquired = len(got) >= 4
        rx.run()
    return scen, e5a, rx


def test_e5a_secondary_cs100_locks(e5a_rx):
    scen, e5a, rx = e5a_rx
    g = rx.groups[0]
    locked = [ch for ch in range(g.plan.num_channels)
              if g.tracker.ctl[ch].sec_locked]
    assert len(locked) >= 4, "CS100 secondary sync on too few E5a channels"


def test_e5a_fnav_pages_decoded(e5a_rx):
    scen, e5a, rx = e5a_rx
    g = rx.groups[0]
    ok = sum(d.pages_ok for d in g.decoders.values())
    bad = sum(d.pages_bad for d in g.decoders.values())
    assert ok >= 3, f"FNAV pages ok={ok} bad={bad}"


def test_e5a_assisted_fix(e5a_rx):
    scen, e5a, rx = e5a_rx
    fixes = rx.status.fixes
    assert len(fixes) >= 3, f"only {len(fixes)} fixes"
    truth = scen.rx_ecef
    lat = np.deg2rad(scen.cfg.rx_lat_deg)
    lon = np.deg2rad(scen.cfg.rx_lon_deg)
    errs_enu = np.array([
        ecef_to_enu(f.pos_ecef - truth, lat, lon) for f in fixes[2:]
    ])
    err_3d = np.linalg.norm(errs_enu, axis=1)
    assert np.mean(err_3d) < 5.0, f"mean 3D error {np.mean(err_3d):.2f} m"


def test_project_doppler_assists_secondary_band():
    """GNSSFlowgraph::project_doppler analog: a satellite tracked on L1
    seeds the L5 group's acquisition with Doppler scaled by f_L5/f_L1 and
    a narrow assisted grid."""
    import numpy as np

    from gnss_sdr_tpu.receiver.plans import gps_l1ca_plan, gps_l5_plan
    from gnss_sdr_tpu.receiver.receiver import Receiver, ReceiverConfig
    from gnss_sdr_tpu.tracking import ChannelPhase

    plans = [
        gps_l1ca_plan(fs=2.6e6, num_channels=2, search_prns=(7, 8)),
        gps_l5_plan(fs=12.0e6, num_channels=2, search_prns=(7, 8)),
    ]
    rx = Receiver(ReceiverConfig(fs=2.6e6), plans=plans)
    g1, g5 = rx.groups

    # L1 channel 0 tracks PRN 7 at +1000 Hz
    g1.channel_prn[0] = 7
    g1.tracker.ctl[0].phase = ChannelPhase.WIDE
    import jax.numpy as jnp
    st = g1.tracker.state
    g1.tracker.state = st._replace(
        carrier_doppler=st.carrier_doppler.at[0].set(1000.0))

    proj = rx._project_doppler(g5)
    f_ratio = g5.plan.carrier_freq_hz / g1.plan.carrier_freq_hz
    assert set(proj) == {7}
    assert proj[7] == pytest.approx(1000.0 * f_ratio, rel=1e-6)

    # assisted engine: narrow grid, offsets land on the projected rows
    eng = rx._assisted_engine(g5, proj)
    assert len(eng.inner.conf.doppler_grid_hz()) < 12
    assert eng._offsets_np[g5.plan.prn_row(7)] == pytest.approx(proj[7])
    assert eng._offsets_np[g5.plan.prn_row(8)] == 0.0
    # cached: same object on the next call, offsets refreshed
    eng2 = rx._assisted_engine(g5, {7: 500.0})
    assert eng2 is eng
    assert eng._offsets_np[g5.plan.prn_row(7)] == pytest.approx(500.0)

    # no projection for same-band groups or untracked satellites
    assert rx._project_doppler(g1) == {}
