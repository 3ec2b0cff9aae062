"""Acquisition engines (reference: src/algorithms/acquisition/)."""

from gnss_sdr_tpu.acquisition.pcps import AcqConfig, AcqResults, PcpsAcquisition

__all__ = ["AcqConfig", "AcqResults", "PcpsAcquisition"]
