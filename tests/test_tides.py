"""Earth tides, phase windup and their PPP wiring (pvt/tides.py).

Reference analogs: rtklib_tides.cc (tidedisp/tide_solid/tide_oload/
tide_pole), rtklib_rtkcmn.cc windupcorr/sunmoonpos.
"""

from datetime import datetime

import numpy as np

from gnss_sdr_tpu.pvt import tides

_GPS0 = datetime(1980, 1, 6)


def _gps_s(dt_utc: datetime, leap: float = 18.0) -> float:
    """UTC datetime -> GPS seconds since the GPS epoch."""
    return (dt_utc - _GPS0).total_seconds() + leap


def test_gmst_j2000():
    # GMST at J2000.0 (2000-01-01 12:00 UT) is 280.4606 deg
    tu = (datetime(2000, 1, 1, 12) - _GPS0).total_seconds()
    g = np.degrees(tides.gmst_rad(tu))
    assert abs(g - 280.4606) < 0.01


def test_sun_moon_geometry():
    # June solstice: sun declination ~ +23.44 deg, distance ~1.016 AU
    t = _gps_s(datetime(2021, 6, 21, 12))
    rsun, rmoon, gmst = tides.sun_moon_ecef(t)
    dsun = np.linalg.norm(rsun)
    assert 0.98 * 1.496e11 < dsun < 1.03 * 1.496e11
    decl = np.degrees(np.arcsin(rsun[2] / dsun))
    assert abs(decl - 23.44) < 0.3
    dmoon = np.linalg.norm(rmoon)
    assert 3.5e8 < dmoon < 4.1e8
    assert 0.0 <= gmst < 2 * np.pi
    # January: sun declination ~ -23 deg
    rsun2, _, _ = tides.sun_moon_ecef(_gps_s(datetime(2021, 12, 21, 12)))
    assert np.degrees(np.arcsin(rsun2[2] / np.linalg.norm(rsun2))) < -23.0


def test_solid_tide_magnitude_and_variation():
    # mid-latitude site: solid tide displacement is cm-dm level,
    # dominated by the radial component, and varies semi-diurnally
    rr = np.array([4075580.0, 931854.0, 4801568.0])   # ~Wettzell
    t0 = _gps_s(datetime(2021, 3, 1))
    mags, ups = [], []
    up = rr / np.linalg.norm(rr)
    for k in range(25):
        dr = tides.tidedisp(t0 + 3600.0 * k, rr)
        mags.append(np.linalg.norm(dr))
        ups.append(float(dr @ up))
    mags = np.array(mags)
    ups = np.array(ups)
    assert mags.max() < 0.6 and mags.max() > 0.03
    # radial dominates the peak displacement
    k = int(np.argmax(mags))
    assert abs(ups[k]) > 0.6 * mags[k]
    # it moves: semi-diurnal swing of at least a few cm over the day
    assert ups.max() - ups.min() > 0.05


def test_ocean_loading_single_constituent():
    # M2-only table: radial amplitude 10 mm, phase 0 -> up component
    # oscillates with the M2 period (12.42 h), bounded by the amplitude
    od = np.zeros((11, 6))
    od[0, 0] = 0.010
    t0 = (datetime(2021, 3, 1) - _GPS0).total_seconds()
    vals = np.array([tides.tide_oload(t0 + 600.0 * k, od)[2]
                     for k in range(80)])           # 13.3 h
    assert np.all(np.abs(vals) <= 0.010 + 1e-12)
    assert vals.max() > 0.009 and vals.min() < -0.009
    # half an M2 period later the displacement is (roughly) negated
    half = 0.5 * 2 * np.pi / 1.40519e-4
    a = tides.tide_oload(t0, od)[2]
    b = tides.tide_oload(t0 + half, od)[2]
    assert abs(a + b) < 2e-3


def test_pole_tide_small():
    tu = (datetime(2021, 3, 1) - _GPS0).total_seconds()
    denu = tides.tide_pole(tu, np.radians(49.0), np.radians(12.0))
    assert np.linalg.norm(denu) < 0.03


def test_read_blq(tmp_path):
    blq = """$$ Ocean loading displacement
$$ COMMENT
  WTZR
$$ M2 S2 N2 K2 K1 O1 P1 Q1 MF MM SSA
  .00325 .00112 .00069 .00031 .00117 .00087 .00039 .00017 .00009 .00005 .00004
  .00103 .00036 .00023 .00010 .00026 .00013 .00009 .00003 .00002 .00001 .00001
  .00049 .00017 .00011 .00005 .00052 .00039 .00017 .00008 .00003 .00002 .00001
   -54.3  -27.9  -74.0  -25.5  -58.9  -96.0  -60.8 -131.0    6.1    3.4    1.9
    72.5  105.1   52.1  106.5   43.0   27.0   41.7   17.9 -170.8 -176.3 -179.4
    88.0  118.8   68.7  119.5  -27.4  -54.1  -29.0  -79.7    6.6    1.7    0.8
"""
    p = tmp_path / "test.blq"
    p.write_text(blq)
    od = tides.read_blq(p, "WTZR")
    assert od is not None and od.shape == (11, 6)
    assert od[0, 0] == 0.00325          # M2 radial amplitude
    assert od[1, 3] == -27.9            # S2 radial phase
    assert od[4, 1] == 0.00026          # K1 west amplitude
    assert tides.read_blq(p, "NOPE") is None
    # table drives a bounded up-displacement
    tu = (datetime(2021, 3, 1) - _GPS0).total_seconds()
    denu = tides.tide_oload(tu, od)
    assert np.linalg.norm(denu) < 0.02


def test_erp_read_and_interpolate(tmp_path):
    # IGS ERP ver.2 layout: MJD Xpole Ypole UT1-UTC LOD ... (units 1e-6
    # as / 1e-7 s), header lines without >=5 numeric fields are skipped
    erp_txt = """version 2
EOP  SOLUTION
  MJD         X        Y     UT1-UTC    LOD   Xsig  Ysig  UTsig LODsig  Nr Nf Nt    Xrt    Yrt  Xrtsig Yrtsig
               10**-6as             10**-7s           10**-6as    10**-7s                 10**-6as/d
59275.00   55123   348672   -1753212   6311     18     15      8     41  23 12  9    812   -2310     42     51
59276.00   55310   348412   -1759523   6290     18     15      8     41  23 12  9    805   -2295     42     51
"""
    p = tmp_path / "igu.erp"
    p.write_text(erp_txt)
    erp = tides.read_erp(p)
    assert erp.shape == (2, 7)
    assert abs(erp[0, 0] - 59275.0) < 1e-9
    # units: 55123e-6 as -> rad
    assert abs(erp[0, 1] - 55123e-6 * np.pi / 180 / 3600) < 1e-15
    assert abs(erp[0, 3] - (-0.1753212)) < 1e-9       # UT1-UTC seconds
    # midday between the two rows: linear interpolation
    t_mid = ((59275.5 - 44244.0) * 86400.0) + 18.0    # GPS time at MJD .5
    v = tides.get_erp(erp, t_mid)
    assert abs(v[0] - 0.5 * (erp[0, 1] + erp[1, 1])) < 1e-15
    assert abs(v[2] - 0.5 * (erp[0, 3] + erp[1, 3])) < 1e-9
    # extrapolation before the table uses the rate columns
    t_before = ((59274.0 - 44244.0) * 86400.0) + 18.0
    vb = tides.get_erp(erp, t_before)
    assert abs(vb[0] - (erp[0, 1] - erp[0, 5])) < 1e-15
    # pole tide sees the observed pole through tidedisp(erp=...)
    rr = np.array([4075580.0, 931854.0, 4801568.0])
    d_obs = tides.tidedisp(t_mid, rr, pole=True, erp=erp)
    d_zero = tides.tidedisp(t_mid, rr, pole=True)
    assert np.linalg.norm(d_obs - d_zero) > 1e-5      # xp/yp changed it


def test_phase_windup_continuity_and_rotation():
    rr = np.array([4075580.0, 931854.0, 4801568.0])
    t = _gps_s(datetime(2021, 3, 1, 6))
    rsun, _, _ = tides.sun_moon_ecef(t)
    # satellite sweeping along an orbit: windup evolves smoothly
    prev = 0.0
    vals = []
    for k in range(20):
        th = 0.02 * k
        rs = 26560e3 * np.array([
            np.cos(th) * 0.8, np.sin(th) * 0.8, 0.6])
        prev = tides.phase_windup(rs, rr, rsun, prev)
        vals.append(prev)
    d = np.abs(np.diff(vals))
    assert np.all(d < 0.1)              # no cycle jumps
    # continuity anchor: result stays within half a cycle of prev
    ph2 = tides.phase_windup(rs, rr, rsun, prev + 3.0)
    assert abs(ph2 - (prev + 3.0)) < 0.5
    assert abs((ph2 - vals[-1]) - round(ph2 - vals[-1])) < 1e-9


def test_in_eclipse_geometry():
    rsun = np.array([1.496e11, 0.0, 0.0])
    # satellite on the anti-sun side inside the shadow cylinder
    assert tides.in_eclipse(np.array([-26560e3, 2.0e6, 1.0e6]), rsun)
    # same side as the sun: never eclipsed
    assert not tides.in_eclipse(np.array([26560e3, 0.0, 0.0]), rsun)
    # anti-sun but far off-axis (> 1 earth radius)
    assert not tides.in_eclipse(np.array([-20.0e6, 17.0e6, 0.0]), rsun)


def test_ppp_excludes_eclipsed_satellite():
    """An eclipsed satellite's rows are dropped from the PPP update
    (rtklib testeclipse analog)."""
    from gnss_sdr_tpu.pvt.ephemeris import C_LIGHT
    from gnss_sdr_tpu.pvt.ppp import DualFreqObs, PppEngine

    week = 2150
    t = 1000.0
    t_abs = week * 604800.0 + t
    rsun, _, _ = tides.sun_moon_ecef(t_abs)
    esun = rsun / np.linalg.norm(rsun)
    rr = np.array([4075580.0, 931854.0, 4801568.0])
    # 5 healthy satellites + 1 deep in the shadow cylinder
    sats = []
    for k in range(5):
        th = 2 * np.pi * k / 5
        z = 0.4 + 0.1 * k
        sats.append(26560e3 * np.array([
            np.sqrt(1 - z * z) * np.cos(th),
            np.sqrt(1 - z * z) * np.sin(th), z]))
    perp = np.cross(esun, [0.0, 0.0, 1.0])
    perp /= np.linalg.norm(perp)
    sats.append(-26560e3 * esun + 2.0e6 * perp)
    assert tides.in_eclipse(sats[-1], rsun)

    f1, f2 = 1575.42e6, 1176.45e6
    eng = PppEngine(gps_week=week, exclude_eclipse=True)

    class _Prec:
        def __init__(self, table):
            self.table = table

        def sat_pos_clock(self, system, prn, tt):
            return self.table[(system, prn)], 0.0

    prec = _Prec({("G", k + 1): sats[k] for k in range(6)})
    obs = []
    for k in range(6):
        rho = np.linalg.norm(sats[k] - rr)
        obs.append(DualFreqObs(
            "G", k + 1, rho, rho,
            -rho / (C_LIGHT / f1), -rho / (C_LIGHT / f2), f1, f2))
    sol = eng.process_epoch(t, obs, {}, x0=rr, precise=prec)
    assert sol.valid
    assert sol.num_sats == 5          # the eclipsed satellite was dropped


def test_ppp_with_tides_converges():
    """PppEngine with tide+windup corrections still locks cm-level on a
    synthetic truth that includes the modeled tide displacement."""
    from gnss_sdr_tpu.pvt.ephemeris import C_LIGHT
    from gnss_sdr_tpu.pvt.ppp import DualFreqObs, PppEngine

    rng = np.random.default_rng(7)
    rr0 = np.array([4075580.0, 931854.0, 4801568.0])
    week = 2150
    f1, f2 = 1575.42e6, 1176.45e6
    lam1, lam2 = C_LIGHT / f1, C_LIGHT / f2
    sats = []
    for k in range(8):
        th = 2 * np.pi * k / 8
        z = 0.35 + 0.08 * k                       # spread elevations
        rho_xy = np.sqrt(1.0 - z * z)
        sats.append(26560e3 * np.array([
            rho_xy * np.cos(th), rho_xy * np.sin(th), z]))
    n_amb = rng.integers(-50, 50, size=(8, 2))

    eng = PppEngine(mode="static", code_sigma_m=0.5, phase_sigma_m=0.005,
                    gps_week=week, tide_correction=True, phase_windup=True)
    ephs = {}

    class _FakePrec:
        """Minimal precise-ephemeris stand-in: fixed satellite
        positions, zero clock."""

        def __init__(self, table):
            self.table = table

        def sat_pos_clock(self, system, prn, t):
            return self.table[(system, prn)], 0.0

    table = {("G", k + 1): sats[k] for k in range(8)}
    prec = _FakePrec(table)

    sol = None
    phw_truth = {k: 0.0 for k in range(8)}
    for i in range(40):
        t = 1000.0 + 30.0 * i
        t_abs = week * 604800.0 + t
        disp = tides.tidedisp(t_abs, rr0)
        rr = rr0 + disp                          # truth includes the tide
        rsun, _, _ = tides.sun_moon_ecef(t_abs)
        obs = []
        for k in range(8):
            # engine models earth rotation during propagation
            # (rot(OMEGA_E*tau) @ sat); generate consistently
            from gnss_sdr_tpu.pvt.ephemeris import OMEGA_E

            rho = np.linalg.norm(sats[k] - rr)
            for _ in range(2):
                th_e = OMEGA_E * rho / C_LIGHT
                rot = np.array([
                    [np.cos(th_e), np.sin(th_e), 0.0],
                    [-np.sin(th_e), np.cos(th_e), 0.0],
                    [0.0, 0.0, 1.0]])
                rho = np.linalg.norm(rot @ sats[k] - rr)
            phw_truth[k] = tides.phase_windup(sats[k], rr, rsun,
                                              phw_truth[k])
            p1 = rho + rng.normal(0, 0.3)
            p2 = rho + rng.normal(0, 0.3)
            # range-like phase includes +lam*phw (IGS windup model);
            # with the phi ~ -range/lam convention that is -phw cycles
            phi1 = (-(rho + rng.normal(0, 0.002)) / lam1
                    + n_amb[k, 0] - phw_truth[k])
            phi2 = (-(rho + rng.normal(0, 0.002)) / lam2
                    + n_amb[k, 1] - phw_truth[k])
            obs.append(DualFreqObs("G", k + 1, p1, p2, phi1, phi2, f1, f2))
        sol = eng.process_epoch(t, obs, ephs, x0=rr0 + 5.0, precise=prec)
    assert sol is not None and sol.valid
    # estimated marker position converges to the un-displaced truth
    assert np.linalg.norm(sol.pos_ecef - rr0) < 0.35
