"""PRN spreading-code generators (reference: src/algorithms/libs/*_signal_replica.*)."""

from gnss_sdr_tpu.codes.gps_l1_ca import gps_l1_ca_code, gps_l1_ca_code_sampled
from gnss_sdr_tpu.codes.resample import resample_code

__all__ = ["gps_l1_ca_code", "gps_l1_ca_code_sampled", "resample_code"]
