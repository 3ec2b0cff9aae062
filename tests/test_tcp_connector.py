"""TCP-connector tracking (external loop closure): the batched tracker's
correlator taps stream to a TCP peer running the loop filters; the peer's
NCO commands drive the device state (reference
gps_l1_ca_tcp_connector_tracking_cc + tcp_communication.cc analog).
"""

import numpy as np

from gnss_sdr_tpu.codes.gps_l1_ca import gps_l1_ca_code_table
from gnss_sdr_tpu.constants import gps_l1_ca as G
from gnss_sdr_tpu.simulate import SatelliteSignalParams, generate_baseband
from gnss_sdr_tpu.tracking import DllPllConf, Tracker
from gnss_sdr_tpu.tracking.tcp_connector import (
    SimpleLoopServer,
    TcpConnectorTracking,
    TcpLoopClient,
)

FS = 2.6e6
SPS = FS / G.CODE_RATE_CPS


def test_external_loop_closes_tracking():
    true_dop = 640.0
    sat = SatelliteSignalParams(prn=9, cn0_dbhz=48.0, doppler_hz=true_dop,
                                delay_chips=120.0)
    x = generate_baseband([sat], FS, int(FS * 1.5), seed=9)

    # neutralize the internal loops: near-zero bandwidths mean the device
    # NCO only moves when the TCP peer commands it
    conf = DllPllConf(
        fs=FS, code_length_chips=G.CODE_LENGTH_CHIPS,
        code_rate_cps=G.CODE_RATE_CPS, carrier_freq_hz=G.FREQ_HZ,
        pll_bw_hz=1e-4, dll_bw_hz=1e-5, enable_fll_pull_in=False,
        max_channels=2, steps_per_block=10,
    )
    srv = SimpleLoopServer(pll_bw_hz=8.0, code_rate_cps=G.CODE_RATE_CPS,
                           carrier_freq_hz=G.FREQ_HZ)
    tracker = Tracker(conf, gps_l1_ca_code_table())
    tracker.start_channel(ch=0, prn=9, code_row=8,
                          acq_delay_samples=120.0 * SPS,
                          acq_doppler_hz=true_dop - 4.0,
                          acq_samplestamp=0, current_abs_sample=0)
    tcp = TcpConnectorTracking(tracker, TcpLoopClient(port=srv.port), [0])

    dops = []
    while True:
        base, w = tracker.window_request()
        if base + w > len(x):
            break
        r = tcp.process(x[base:base + w], base)
        dops.append(r.outputs["carrier_doppler"][-1, 0])

    assert srv.records_seen > 30
    # the EXTERNAL loop pulled the 4 Hz initial error in (the demo
    # peer's capture range is ~+-5 Hz: Costas atan at 100 Hz updates)
    assert abs(dops[-1] - true_dop) < 2.0, dops[-1]
    # and it was really the peer: the internal (dead) loops alone would
    # have left the initial offset in place
    assert abs(dops[0] - dops[-1]) > 2.0
    tcp.client.close()
    srv.close()
