"""Physical and per-constellation constants (reference: src/core/system_parameters/)."""

from gnss_sdr_tpu.constants.general import SPEED_OF_LIGHT_M_S, GPS_WEEK_SECONDS
from gnss_sdr_tpu.constants import gps_l1_ca
from gnss_sdr_tpu.constants import galileo_e1

__all__ = [
    "SPEED_OF_LIGHT_M_S",
    "GPS_WEEK_SECONDS",
    "gps_l1_ca",
    "galileo_e1",
]
