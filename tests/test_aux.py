"""Aux subsystems: assistance persistence, telecommand server, dumps, RAIM,
PVT Kalman filter unit behavior."""

import socket
import time

import numpy as np
import pytest

from gnss_sdr_tpu.pvt.kf import PvtKalmanFilter
from gnss_sdr_tpu.receiver.assistance import load_assistance, save_assistance
from gnss_sdr_tpu.simulate.constellation import make_constellation
from gnss_sdr_tpu.telemetry.lnav import GpsIonoUtc


def test_assistance_round_trip(tmp_path):
    ephs = make_constellation(seed=2)
    store = {("G", p): e for p, e in list(ephs.items())[:6]}
    iu = GpsIonoUtc(alpha0=1e-8, beta0=96256.0, delta_t_ls=18,
                    has_iono=True, has_utc=True)
    path = tmp_path / "assist.xml"
    save_assistance(path, store, iono_utc=iu)
    data = load_assistance(path)
    assert set(data["ephemerides"]) == set(store)
    for k, eph in store.items():
        got = data["ephemerides"][k]
        assert got.sqrt_a == eph.sqrt_a
        assert got.m0 == eph.m0
        assert got.af0 == eph.af0
        assert got.toe == eph.toe
    assert data["iono_utc"].delta_t_ls == 18
    assert data["iono_utc"].has_iono


def test_assistance_galileo_round_trip(tmp_path):
    from gnss_sdr_tpu.simulate.galileo import make_galileo_constellation

    ephs = make_galileo_constellation(seed=2)
    store = {("E", p): e for p, e in list(ephs.items())[:3]}
    path = tmp_path / "assist.xml"
    save_assistance(path, store)
    data = load_assistance(path)
    got = data["ephemerides"][("E", list(ephs)[0])]
    assert got.system == "E"
    assert got.sqrt_a == store[("E", list(ephs)[0])].sqrt_a


def test_telecommand_server():
    from gnss_sdr_tpu.receiver.receiver import Receiver, ReceiverConfig
    from gnss_sdr_tpu.receiver.telecommand import TcpCmdServer

    rx = Receiver(ReceiverConfig(fs=2.6e6, num_channels=2))
    srv = TcpCmdServer(rx, port=0)
    try:
        with socket.create_connection(("127.0.0.1", srv.port), timeout=5) as c:
            c.recv(128)                       # banner
            c.sendall(b"status\n")
            time.sleep(0.1)
            reply = c.recv(4096).decode()
            assert "channel" in reply and "fix: none" in reply
            c.sendall(b"coldstart\n")
            time.sleep(0.1)
            assert b"OK" in c.recv(128)
            c.sendall(b"bogus\n")
            time.sleep(0.1)
            assert b"ERROR" in c.recv(128)
        applied = srv.apply_pending()
        assert applied == ["coldstart"]
    finally:
        srv.close()


def test_tracking_dump_written(tmp_path):
    from gnss_sdr_tpu.codes.gps_l1_ca import gps_l1_ca_code_table
    from gnss_sdr_tpu.monitor.dumps import TrackingDumper
    from gnss_sdr_tpu.tracking import Tracker
    from gnss_sdr_tpu.tracking.conf import DllPllConf

    conf = DllPllConf(
        fs=2.6e6, code_length_chips=1023, code_rate_cps=1.023e6,
        carrier_freq_hz=1575.42e6, max_channels=2, steps_per_block=5,
    )
    trk = Tracker(conf, gps_l1_ca_code_table())
    trk.start_channel(0, 1, 0, 0.0, 0.0, 0, 0)
    rng = np.random.default_rng(0)
    window = (rng.normal(size=conf.window_samples)
              + 1j * rng.normal(size=conf.window_samples)).astype(np.complex64)
    dump = TrackingDumper(str(tmp_path / "trk.npz"))
    res = trk.process(window, 0)
    dump.push(res)
    dump.close()
    data = np.load(tmp_path / "trk.npz")
    assert data["prompt"].shape == (5, 2)
    assert data["abs_sample_end"].shape == (5, 2)
    assert np.all(np.diff(data["abs_sample_end"][:, 0]) > 0)


def test_raim_rejects_outlier():
    """A 500 m pseudorange fault on one satellite must be excluded and the
    solution restored (reference rtklib raim_fde)."""
    from gnss_sdr_tpu.pvt.coords import llh_to_ecef
    from gnss_sdr_tpu.pvt.solver import ObsEpoch, solve_pvt
    from gnss_sdr_tpu.simulate.constellation import truth_measurement, visible_sats

    ephs = make_constellation(seed=0)
    rx = llh_to_ecef(np.deg2rad(41.275), np.deg2rad(1.9876), 80.0)
    tow = 7320.0
    prns = visible_sats(ephs, rx, tow, np.deg2rad(10.0))[:7]
    assert len(prns) >= 6
    obs = []
    for i, p in enumerate(prns):
        tr = truth_measurement(ephs[p], rx, tow)
        pr = tr["pseudorange_m"] + (500.0 if i == 0 else 0.0)
        obs.append(ObsEpoch(prn=p, pseudorange_m=pr,
                            doppler_hz=tr["doppler_hz"]))
    sol = solve_pvt(obs, ephs, tow, apply_atmosphere=False)
    assert sol.valid
    assert sol.raim_rejected == [("G", prns[0], "1C")], sol.raim_rejected
    assert np.linalg.norm(sol.pos_ecef - rx) < 2.0, (
        f"{np.linalg.norm(sol.pos_ecef - rx):.1f} m after RAIM"
    )
    # without RAIM the fault corrupts the fix
    sol_off = solve_pvt(obs, ephs, tow, apply_atmosphere=False,
                        raim_threshold_m=0.0)
    assert np.linalg.norm(sol_off.pos_ecef - rx) > 20.0


def test_pvt_kf_smooths_and_resets():
    kf = PvtKalmanFilter()
    rng = np.random.default_rng(0)
    pos0 = np.array([6378137.0, 0.0, 0.0])
    vel = np.array([10.0, 0.0, 0.0])
    errs_raw, errs_kf = [], []
    for k in range(100):
        t = 0.1 * k
        truth = pos0 + vel * t
        meas = truth + rng.normal(scale=2.0, size=3)
        p, v = kf.update(t, meas, vel + rng.normal(scale=0.3, size=3))
        if k > 20:
            errs_raw.append(np.linalg.norm(meas - truth))
            errs_kf.append(np.linalg.norm(p - truth))
    assert np.mean(errs_kf) < 0.5 * np.mean(errs_raw)
    # a 1 km jump (receiver restarted elsewhere) resets rather than drags
    p, v = kf.update(10.1, pos0 + 1000.0, None)
    assert np.linalg.norm(p - (pos0 + 1000.0)) < 1.0


def test_front_end_cal_estimates_lo_offset():
    """front-end-cal analog (utils/front-end-cal/main.cc): a deliberate LO
    error shows up as a common Doppler offset across satellites and is
    recovered by the calibration fit."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    import numpy as np

    from front_end_cal import calibrate
    from gnss_sdr_tpu.simulate.scenario import GpsScenario, ScenarioConfig

    fs = 2.6e6
    scen = GpsScenario(ScenarioConfig(
        fs=fs, tow_start_s=7314.0, duration_s=0.2, cn0_dbhz=46.0,
        max_sats=8, seed=2,
    ))
    x = scen.generate(0, int(0.12 * fs))
    lo_err = 3210.0                       # Hz of front-end LO error
    t = np.arange(len(x)) / fs
    x = (x * np.exp(2j * np.pi * lo_err * t)).astype(np.complex64)
    out = calibrate(x, fs, scen.ephs, scen.rx_ecef, 7314.0)
    assert out["ok"], out
    assert abs(out["f_offset_hz"] - lo_err) < 60.0, out["f_offset_hz"]
    assert out["resid_rms_hz"] < 60.0


def test_agnss_server_round_trip(tmp_path):
    """A-GNSS assistance over the network (SUPL re-expression,
    receiver/agnss.py): server serves the assistance XML, client fetch
    yields the same ephemerides a warm start needs."""
    from gnss_sdr_tpu.receiver.agnss import AgnssServer, fetch_assistance
    from gnss_sdr_tpu.receiver.assistance import save_assistance
    from gnss_sdr_tpu.simulate.constellation import make_constellation

    ephs = make_constellation(seed=5)
    path = tmp_path / "assist.xml"
    save_assistance(path, {("G", p): e for p, e in ephs.items()})
    srv = AgnssServer(port=0)
    srv.set_assistance_file(path)
    data = fetch_assistance("127.0.0.1", srv.port)
    srv.close()
    got = data["ephemerides"]
    assert len(got) == len(ephs)
    assert abs(got[("G", 7)].sqrt_a - ephs[7].sqrt_a) < 1e-9
    assert abs(got[("G", 7)].m0 - ephs[7].m0) < 1e-12


def test_channel_status_display(capsys):
    """channel_status_msg_receiver analog: per-channel console table with
    signal, PRN, FSM state, C/N0 and Doppler."""
    from gnss_sdr_tpu.monitor.status import (
        ChannelStatusDisplay,
        render_channel_status,
    )
    from gnss_sdr_tpu.receiver.receiver import Receiver, ReceiverConfig

    rx = Receiver(ReceiverConfig(fs=2.6e6, num_channels=2))
    rx.groups[0].channel_prn[0] = 7
    rx.groups[0].tracker.ctl[0].cn0_dbhz = 43.2
    text = render_channel_status(rx)
    assert "PRN" in text and "GPS_L1_CA" in text.replace(" ", "_") or "1C" in text
    assert "43.2" in text
    assert "IDLE" in text

    disp = ChannelStatusDisplay(rate_s=1.0)
    disp.tick(rx, 0.5)            # before first deadline: nothing
    assert capsys.readouterr().out == ""
    disp.tick(rx, 1.5)
    out = capsys.readouterr().out
    assert "channel status" in out and "43.2" in out
    disp.tick(rx, 1.6)            # inside holdoff: nothing
    assert capsys.readouterr().out == ""


def test_gnss_synchro_map_xml_round_trip(tmp_path):
    """rtklib_pvt_gs.cc:1716,1758 analog: can an observables epoch to XML
    and reload it bit-for-bit (within float repr) for offline solver runs."""
    from gnss_sdr_tpu.monitor.synchro import GnssSynchro
    from gnss_sdr_tpu.receiver.assistance import (
        load_gnss_synchro_map_xml,
        save_gnss_synchro_map_xml,
    )

    m = {
        0: GnssSynchro(system="G", signal="1C", prn=12, channel_id=0,
                       pseudorange_m=21_234_567.89, cn0_db_hz=44.5,
                       carrier_doppler_hz=-1234.5, flag_valid_pseudorange=True,
                       tow_at_current_symbol_ms=345_600_000),
        3: GnssSynchro(system="E", signal="1B", prn=5, channel_id=3,
                       pseudorange_m=24_111_222.33, rx_time_s=12.34),
    }
    p = tmp_path / "epoch.xml"
    save_gnss_synchro_map_xml(p, m)
    back = load_gnss_synchro_map_xml(p)
    assert set(back) == {0, 3}
    assert back[0].prn == 12 and back[0].flag_valid_pseudorange is True
    assert back[0].pseudorange_m == pytest.approx(21_234_567.89)
    assert back[3].system == "E" and back[3].signal == "1B"
    assert back[3].rx_time_s == pytest.approx(12.34)


def test_skyplot_tool(tmp_path, capsys):
    """utils/skyplot analog: az/el from propagated ephemerides rendered as
    ASCII + SVG skyplot."""
    import sys
    sys.path.insert(0, ".")
    from tools.skyplot import main as skyplot_main

    ephs = make_constellation(seed=2)
    store = {("G", p): e for p, e in list(ephs.items())[:8]}
    path = tmp_path / "assist.xml"
    save_assistance(path, store)
    svg = tmp_path / "sky.svg"
    rc = skyplot_main([
        "--assistance", str(path), "--lat", "41.27", "--lon", "1.99",
        "--h", "80", "--tow", "7314", "--out", str(svg),
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "az" in out and "el" in out
    text = svg.read_text()
    assert text.startswith("<svg") and "circle" in text
    # at least one satellite of 8 random-plane ephemerides is visible
    assert any(f"G{p:02d}" in text for p in list(ephs)[:8])


def test_fifo_command_reader(tmp_path):
    """Named-FIFO command channel (the ControlThread message-queue
    listener analog, control_thread.cc:428-431): commands written by an
    external process land in the host loop's dispatch."""
    import os
    import time

    from gnss_sdr_tpu.receiver.telecommand import FifoCmdReader

    class _Rx:          # dispatch only touches groups/obs/ephemerides
        groups = ()
        ephemerides = {}

    path = str(tmp_path / "cmd.fifo")
    rd = FifoCmdReader(_Rx(), path)
    try:
        assert os.path.exists(path)
        fd = os.open(path, os.O_WRONLY)
        os.write(fd, b"coldstart\nbogus\nstatus\n")
        os.close(fd)
        deadline = time.time() + 5.0
        applied = []
        while time.time() < deadline and len(applied) < 2:
            applied += rd.apply_pending()
            time.sleep(0.02)
        assert applied == ["coldstart", "status"]
    finally:
        rd.close()
    assert not os.path.exists(path)
