"""Warm-start TTFF (reference ttff.cc analog, warm path): with assistance
ephemerides preloaded, the first fix needs only acquisition + track settle
+ one telemetry TOW anchor — an order faster than the cold start's full
ephemeris decode (test_position.py asserts the cold TTFF window)."""

import numpy as np

from gnss_sdr_tpu.receiver.receiver import Receiver, ReceiverConfig
from gnss_sdr_tpu.simulate.scenario import GpsScenario, ScenarioConfig

FS = 2.6e6


def test_warm_start_ttff_fast():
    scen = GpsScenario(ScenarioConfig(
        fs=FS, tow_start_s=7314.0, duration_s=17.0, cn0_dbhz=46.0,
        max_sats=6, seed=1,
    ))
    rx = Receiver(ReceiverConfig(fs=FS, num_channels=6))
    # warm start: assistance provides the ephemerides (assistance XML /
    # previous session; reference read_assistance_from_XML)
    for prn in scen.prns:
        rx.ephemerides[("G", prn)] = scen.ephs[prn]
    sec = int(FS)
    rx.feed(scen.generate(0, 2 * sec))
    rx.acquire()
    rx.run()
    for i in range(2, 17):
        rx.feed(scen.generate(i * sec, sec))
        rx.run()
    st = rx.status
    assert st.ttff_s is not None, "warm start produced no fix in 17 s"
    # cold start needs subframes 1-3 (>= ~18-24 s; test_position asserts
    # 10-32 s); warm start anchors on the FIRST subframe
    assert st.ttff_s < 17.0, st.ttff_s
    err = np.linalg.norm(st.fixes[-1].pos_ecef - scen.rx_ecef)
    assert err < 5.0, err
