"""obsdiff tool: RINEX obs reader + single/double differences
(utils/rinex-tools/obsdiff.cc analog)."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from gnss_sdr_tpu.outputs.rinex import RinexObsWriter
from tools.obsdiff import (
    coderate_phaserate_check,
    double_diff,
    main,
    read_rinex_obs,
    single_diff,
)

WEEK = 2150
L1_LAM = 299792458.0 / 1575.42e6


def _write_obs(path, clock_m=0.0, noise=0.0, seed=0, n_ep=120):
    """Synthetic 4-sat obs file: ranges with known rates, shared
    receiver clock offset, optional per-obs noise."""
    rng = np.random.default_rng(seed)
    w = RinexObsWriter(str(path), WEEK)
    rates = {1: 120.0, 7: -340.0, 13: 25.0, 21: 410.0}
    r0 = {1: 21.3e6, 7: 22.9e6, 13: 20.4e6, 21: 24.1e6}
    for k in range(n_ep):
        t = 7200.0 + 1.0 * k
        obs = []
        for prn, rate in rates.items():
            rho = r0[prn] + rate * k
            obs.append({
                "prn": prn,
                "pseudorange_m": rho + clock_m + rng.normal(0, noise),
                "carrier_phase_cycles": -(rho + clock_m) / L1_LAM
                + rng.normal(0, noise / L1_LAM),
                "doppler_hz": -rate / L1_LAM,
                "cn0_dbhz": 45.0,
            })
        w.write_epoch(t, obs)
    w.close()


def test_read_rinex_obs_roundtrip(tmp_path):
    p = tmp_path / "a.obs"
    _write_obs(p)
    data = read_rinex_obs(p, "G", "1C")
    assert set(data) == {1, 7, 13, 21}
    s = data[7]
    assert s.shape == (120, 5)
    # pseudorange series has the written rate
    rate = (s[-1, 1] - s[0, 1]) / (s[-1, 0] - s[0, 0])
    assert abs(rate - (-340.0)) < 1e-6
    assert abs(s[0, 4] - 45.0) < 1e-9           # C/N0 column


def test_double_diff_cancels_clock(tmp_path):
    a, b = tmp_path / "base.obs", tmp_path / "rover.obs"
    _write_obs(a, clock_m=0.0, noise=0.2, seed=1)
    _write_obs(b, clock_m=57.0, noise=0.2, seed=2)   # rover clock 57 m off
    base = read_rinex_obs(a)
    rover = read_rinex_obs(b)
    dd = double_diff(base, rover, 1)
    pivot = dd.pop("pivot")
    assert pivot in {1, 7, 13, 21}
    for prn, st in dd.items():
        # the 57 m shared clock cancels; residual is noise-level
        assert abs(st["mean"]) < 0.2, (prn, st)
        assert st["rmse"] < 1.0
    sd = single_diff(base, rover, 1)
    for st in sd.values():
        assert abs(st["mean"] - 57.0) < 0.2      # single diff keeps clock


def test_coderate_phaserate_consistency(tmp_path):
    p = tmp_path / "a.obs"
    _write_obs(p, noise=0.0)
    rover = read_rinex_obs(p)
    chk = coderate_phaserate_check(rover, L1_LAM)
    for prn, st in chk.items():
        assert st["n"] > 100
        # consistent up to the RINEX 1 mm field quantization
        assert abs(st["mean"]) < 1e-2, (prn, st)
        assert st["rmse"] < 1e-2


def test_cli_runs(tmp_path, capsys):
    a, b = tmp_path / "base.obs", tmp_path / "rover.obs"
    _write_obs(a, noise=0.1, seed=3)
    _write_obs(b, clock_m=10.0, noise=0.1, seed=4)
    rc = main(["--base_rinex_obs", str(a), "--rover_rinex_obs", str(b),
               "--single_diffs", "--skip_obs_transitory_s", "5",
               "--skip_obs_ends_s", "2"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Double diff pseudorange" in out and "PRN" in out
    rc = main(["--rover_rinex_obs", str(b), "--single_diff"])
    assert rc == 0
    assert "consistency" in capsys.readouterr().out
