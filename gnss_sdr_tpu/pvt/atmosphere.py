"""Ionosphere / troposphere delay models (host-side, NumPy f64).

- Klobuchar broadcast iono model (IS-GPS-200 §20.3.3.5.2.5), the model
  rtklib's pntpos applies as ionmodel (rtklib_pntpos.cc).
- Simple Saastamoinen-style troposphere (rtklib tropmodel equivalent:
  standard atmosphere, no met data).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from gnss_sdr_tpu.pvt.ephemeris import C_LIGHT

_PI = np.pi


@dataclass
class KlobucharParams:
    """Broadcast alpha/beta coefficients (subframe 4 page 18)."""

    alpha: np.ndarray = field(default_factory=lambda: np.zeros(4))
    beta: np.ndarray = field(default_factory=lambda: np.zeros(4))

    @property
    def valid(self) -> bool:
        return bool(np.any(self.alpha != 0.0) or np.any(self.beta != 0.0))


def klobuchar_delay(
    iono: KlobucharParams,
    lat_rad: float, lon_rad: float,
    az_rad: float, el_rad: float,
    tow_s: float,
) -> float:
    """L1 ionospheric group delay in meters."""
    if not iono.valid:
        return 0.0
    psi = 0.0137 / (el_rad / _PI + 0.11) - 0.022          # semicircles
    phi_i = lat_rad / _PI + psi * np.cos(az_rad)
    phi_i = np.clip(phi_i, -0.416, 0.416)
    lam_i = lon_rad / _PI + psi * np.sin(az_rad) / np.cos(phi_i * _PI)
    phi_m = phi_i + 0.064 * np.cos((lam_i - 1.617) * _PI)
    t = 43200.0 * lam_i + tow_s
    t = t % 86400.0
    f = 1.0 + 16.0 * (0.53 - el_rad / _PI) ** 3            # slant factor
    amp = float(np.polyval(iono.alpha[::-1], phi_m))
    per = float(np.polyval(iono.beta[::-1], phi_m))
    amp = max(amp, 0.0)
    per = max(per, 72000.0)
    x = 2.0 * _PI * (t - 50400.0) / per
    if abs(x) < 1.57:
        delay = 5e-9 + amp * (1.0 - x * x / 2.0 + x**4 / 24.0)
    else:
        delay = 5e-9
    return float(C_LIGHT * f * delay)


def tropo_delay(el_rad: float, h_m: float, humidity: float = 0.7) -> float:
    """Tropospheric delay in meters (standard-atmosphere Saastamoinen,
    rtklib tropmodel equivalent)."""
    if el_rad <= 0.0:
        return 0.0
    h = max(min(h_m, 11000.0), 0.0)
    pres = 1013.25 * (1.0 - 2.2557e-5 * h) ** 5.2568
    temp = 15.0 - 6.5e-3 * h + 273.16
    e = 6.108 * humidity * np.exp((17.15 * temp - 4684.0) / (temp - 38.45))
    z = _PI / 2.0 - el_rad
    trph = 0.0022768 * pres / (
        1.0 - 0.00266 * np.cos(2.0 * 0.0) - 0.00028 * h / 1e3
    ) / np.cos(z)
    trpw = 0.002277 * (1255.0 / temp + 0.05) * e / np.cos(z)
    return float(trph + trpw)
