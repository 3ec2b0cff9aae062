"""obsdiff: single/double differences between RINEX observation files.

Reference analog: utils/rinex-tools/obsdiff.cc — compares a test
("rover") RINEX obs file against a reference ("base") file recorded
from the same antenna, reporting per-observable error statistics:

- double differences (satellite pairs vs a pivot satellite) cancel the
  receiver clocks, isolating observable noise/bias:
  code_pseudorange_double_diff / carrier_phase_double_diff /
  carrier_doppler_double_diff (obsdiff.cc:347-861);
- single differences (rover - base per satellite) need LO-synchronized
  receivers (--single_diffs, obsdiff.cc:463-908);
- a single-receiver consistency check: code rate (dPR/dt) vs carrier
  Doppler (coderate_phaserate_consistence, obsdiff.cc:950).

Usage:
  python tools/obsdiff.py --base_rinex_obs base.obs \
      --rover_rinex_obs rover.obs --system G --signal 1C
  python tools/obsdiff.py --rover_rinex_obs rover.obs --single_diff
"""

from __future__ import annotations

import argparse
import sys
from datetime import datetime, timezone
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def read_rinex_obs(path, system: str = "G", signal: str = "1C"):
    """Parse one system/signal's observables from a RINEX 3 obs file.

    Returns {prn: ndarray [N, 5]} with columns
    [t_s, pseudorange_m, carrier_cycles, doppler_hz, cn0_dbhz]
    (NaN where the field is absent). t_s is seconds since the first
    epoch of the file (common axis for same-session comparisons).
    (obsdiff.cc ReadRinexObs analog, gnsstk replaced by a direct
    RINEX 3.02+ parser.)
    """
    want = [f"{k}{signal}" for k in "CLDS"]
    cols: dict[str, int] = {}
    data: dict[int, list] = {}
    t0 = None
    with open(path, encoding="utf-8") as f:
        # ---- header: find the obs-type column order for `system`
        sys_types: list[str] = []
        pending_sys = None
        for line in f:
            label = line[60:].strip()
            if label == "SYS / # / OBS TYPES":
                if line[0] != " ":          # first card of a system
                    pending_sys = line[0]
                    types = line[7:60].split()
                    if pending_sys == system:
                        sys_types = types
                elif pending_sys == system:  # continuation card
                    sys_types += line[7:60].split()
            elif label == "END OF HEADER":
                break
        for i, t in enumerate(sys_types):
            cols[t] = i
        idx = [cols.get(w, -1) for w in want]
        if idx[0] < 0:
            raise ValueError(
                f"{path}: no C{signal} observable for system {system} "
                f"(header types: {sys_types})")

        # ---- epochs
        for line in f:
            if not line.startswith(">"):
                continue
            p = line.split()
            # RINEX epochs are GPS time; anchor as UTC so the axis is
            # machine-timezone/DST independent
            t = datetime(int(p[1]), int(p[2]), int(p[3]), int(p[4]),
                         int(p[5]), 0,
                         tzinfo=timezone.utc).timestamp() + float(p[6])
            if t0 is None:
                t0 = t
            nsat = int(p[8])
            for _ in range(nsat):
                ln = f.readline()
                if not ln:
                    break
                if ln[0] != system:
                    continue
                prn = int(ln[1:3])
                row = [t - t0, np.nan, np.nan, np.nan, np.nan]
                for k, ci in enumerate(idx):
                    if ci < 0:
                        continue
                    field = ln[3 + 16 * ci: 3 + 16 * ci + 14].strip()
                    if field:
                        try:
                            row[1 + k] = float(field)
                        except ValueError:
                            pass
                data.setdefault(prn, []).append(row)
    return {prn: np.asarray(rows) for prn, rows in data.items()}


def _trim(series: dict, skip_start: float, skip_end: float) -> dict:
    t_max = max((s[-1, 0] for s in series.values() if len(s)), default=0.0)
    out = {}
    for prn, s in series.items():
        m = (s[:, 0] >= skip_start) & (s[:, 0] <= t_max - skip_end)
        if np.any(m):
            out[prn] = s[m]
    return out


def _match_epochs(a: np.ndarray, b: np.ndarray, tol: float = 0.02):
    """Rows of a and b with common epoch times (within tol)."""
    ia = {round(t / tol): i for i, t in enumerate(a[:, 0])}
    rows_a, rows_b = [], []
    for j, t in enumerate(b[:, 0]):
        i = ia.get(round(t / tol))
        if i is not None:
            rows_a.append(i)
            rows_b.append(j)
    return a[rows_a], b[rows_b]


def _stats(err: np.ndarray) -> dict:
    err = err[np.isfinite(err)]
    if len(err) == 0:
        return {"n": 0}
    # detrend the constant part like the reference's error = diff - mean
    return {
        "n": int(len(err)),
        "mean": float(np.mean(err)),
        "stdev": float(np.std(err)),
        "rmse": float(np.sqrt(np.mean((err - np.mean(err)) ** 2))),
        "max_err": float(np.max(np.abs(err - np.mean(err)))),
    }


def single_diff(base: dict, rover: dict, col: int) -> dict:
    """Per-satellite (rover - base) differences of column `col`
    (1=code, 2=phase cycles, 3=doppler)."""
    out = {}
    for prn in sorted(set(base) & set(rover)):
        a, b = _match_epochs(base[prn], rover[prn])
        if len(a):
            out[prn] = _stats(b[:, col] - a[:, col])
    return out


def double_diff(base: dict, rover: dict, col: int) -> dict:
    """Satellite-pair double differences vs the pivot satellite (the one
    with the most epochs): cancels both receiver clocks
    (obsdiff.cc *_double_diff)."""
    common = sorted(set(base) & set(rover))
    if len(common) < 2:
        return {}
    pivot = max(common, key=lambda p: len(base[p]))
    bp, rp = _match_epochs(base[pivot], rover[pivot])
    tp = {round(t / 0.02): i for i, t in enumerate(bp[:, 0])}
    out = {}
    for prn in common:
        if prn == pivot:
            continue
        a, b = _match_epochs(base[prn], rover[prn])
        errs = []
        for i, t in enumerate(a[:, 0]):
            j = tp.get(round(t / 0.02))
            if j is None:
                continue
            sd_sat = b[i, col] - a[i, col]
            sd_piv = rp[j, col] - bp[j, col]
            errs.append(sd_sat - sd_piv)
        if errs:
            out[prn] = _stats(np.asarray(errs))
    out["pivot"] = pivot
    return out


def coderate_phaserate_check(rover: dict, wavelength_m: float) -> dict:
    """Single-receiver consistency: code rate dPR/dt vs carrier Doppler
    (-doppler*lambda), per satellite (obsdiff.cc
    coderate_phaserate_consistence)."""
    out = {}
    for prn, s in rover.items():
        if len(s) < 3:
            continue
        dt = np.diff(s[:, 0])
        ok = dt > 1e-6
        code_rate = np.diff(s[:, 1])[ok] / dt[ok]
        dop_mid = 0.5 * (s[1:, 3] + s[:-1, 3])[ok]
        err = code_rate - (-dop_mid * wavelength_m)
        out[prn] = _stats(err)
    return out


def _report(title: str, unit: str, stats: dict) -> None:
    pivot = stats.pop("pivot", None)
    head = f"{title}" + (f" (pivot G{pivot:02d})" if pivot else "")
    print(head)
    for prn in sorted(k for k in stats if isinstance(k, int)):
        st = stats[prn]
        if st.get("n", 0) == 0:
            continue
        print(f"  PRN {prn:02d}: n={st['n']:5d}  mean={st['mean']:+.4f} "
              f"rmse={st['rmse']:.4f} max={st['max_err']:.4f} [{unit}]")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--base_rinex_obs")
    ap.add_argument("--rover_rinex_obs", required=True)
    ap.add_argument("--system", default="G")
    ap.add_argument("--signal", default="1C")
    ap.add_argument("--skip_obs_transitory_s", type=float, default=30.0)
    ap.add_argument("--skip_obs_ends_s", type=float, default=5.0)
    ap.add_argument("--single_diffs", action="store_true",
                    help="also report rover-base single differences "
                         "(requires LO-synchronized receivers)")
    ap.add_argument("--single_diff", action="store_true",
                    help="single-receiver mode: code-rate vs carrier "
                         "Doppler consistency of the rover file only")
    args = ap.parse_args(argv)

    rover = _trim(read_rinex_obs(args.rover_rinex_obs, args.system,
                                 args.signal),
                  args.skip_obs_transitory_s, args.skip_obs_ends_s)
    freq = {("G", "1C"): 1575.42e6, ("G", "2S"): 1227.60e6,
            ("G", "L5"): 1176.45e6, ("E", "1B"): 1575.42e6,
            ("E", "5X"): 1191.795e6, ("E", "7X"): 1207.14e6}.get(
        (args.system, args.signal), 1575.42e6)
    lam = 299792458.0 / freq

    if args.single_diff or not args.base_rinex_obs:
        _report("Code rate / phase rate consistency", "m/s",
                coderate_phaserate_check(rover, lam))
        return 0

    base = _trim(read_rinex_obs(args.base_rinex_obs, args.system,
                                args.signal),
                 args.skip_obs_transitory_s, args.skip_obs_ends_s)
    _report("Double diff pseudorange", "m", double_diff(base, rover, 1))
    _report("Double diff carrier phase", "cycles",
            double_diff(base, rover, 2))
    _report("Double diff carrier Doppler", "Hz",
            double_diff(base, rover, 3))
    if args.single_diffs:
        _report("Single diff pseudorange", "m", single_diff(base, rover, 1))
        _report("Single diff carrier phase", "cycles",
                single_diff(base, rover, 2))
        _report("Single diff carrier Doppler", "Hz",
                single_diff(base, rover, 3))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
