"""Galileo E1 B+C PILOT tracking end-to-end (the reference's default E1
mode: Galileo_E1_DLL_PLL_VEML_Tracking track_pilot=true).

Validates: CS25 secondary sync on the pilot, four-quadrant PLL, coherent
integration extended past the 4 ms data-symbol ceiling, I/NAV decoded off
the data-component prompt, and a position fix inside the reference gates
from an ICD-composite (data - pilot)/sqrt(2) capture."""

import numpy as np
import pytest

from gnss_sdr_tpu.receiver.plans import galileo_e1bc_plan
from gnss_sdr_tpu.receiver.receiver import Receiver, ReceiverConfig
from gnss_sdr_tpu.simulate.galileo import (
    GalileoScenario,
    GalileoScenarioConfig,
)
from gnss_sdr_tpu.tracking import ChannelPhase

# 4.0 Msps, NOT 4.092: at exactly 2 samples per sinBOC sub-chip the
# sampling grid is commensurate with the waveform — every chip's
# transition samples share one sub-sample phase, so the correlation
# amplitude coherently modulates (~30%) at ~2 Hz as code Doppler slides
# the grid, which variance-based C/N0 estimators read as ~8 dB of fake
# noise. An incommensurate rate spreads the phase across chips and the
# amplitude averages flat (the reference's E1 captures use 4.0 Msps for
# the same reason).
FS = 4.0e6


@pytest.fixture(scope="module")
def running_pilot_receiver():
    scen = GalileoScenario(GalileoScenarioConfig(
        fs=FS,
        tow_start_s=7310.0,
        duration_s=20.0,
        cn0_dbhz=48.0,              # total power, split B/C
        rx_clock_bias_s=1.1e-4,
        max_sats=6,
        min_elevation_deg=15.0,
        seed=3,
        emit_pilot=True,
    ))
    assert len(scen.prns) >= 5, scen.prns
    plan = galileo_e1bc_plan(fs=FS, num_channels=6)
    rx = Receiver(ReceiverConfig(fs=FS, num_channels=6), plans=[plan])
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


def test_pilot_secondary_locks_and_extends(running_pilot_receiver):
    scen, rx = running_pilot_receiver
    g = rx.groups[0]
    locked = [ch for ch in range(6)
              if g.tracker.ctl[ch].sec_locked
              and g.tracker.ctl[ch].phase == ChannelPhase.NARROW]
    assert len(locked) >= 4, [
        (c.phase.name, c.sec_locked, c.cn0_dbhz) for c in g.tracker.ctl]
    # integration length on-device exceeds one 4 ms code period
    integ = np.asarray(g.tracker.state.integ_len)
    for ch in locked:
        assert int(integ[ch]) == 5           # 20 ms > the 4 ms symbol
        # total C/N0 splits between data and pilot (-3 dB on the tracked
        # component)
        assert g.tracker.ctl[ch].cn0_dbhz > 35.0


def test_pilot_inav_decoded(running_pilot_receiver):
    scen, rx = running_pilot_receiver
    assert len(rx.ephemerides) >= 4, rx.ephemerides.keys()


def test_pilot_position_fix(running_pilot_receiver):
    scen, rx = running_pilot_receiver
    fixes = rx.status.fixes
    assert fixes, f"no fix (subframes={rx.status.subframes})"
    err = np.linalg.norm(fixes[-1].pos_ecef - scen.rx_ecef)
    assert err < 5.0, f"3D error {err:.2f} m"
