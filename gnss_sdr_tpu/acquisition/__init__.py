"""Acquisition engines (reference: src/algorithms/acquisition/)."""

from gnss_sdr_tpu.acquisition.pcps import AcqConfig, AcqResults, PcpsAcquisition
from gnss_sdr_tpu.acquisition.engines import (
    AssistedAcquisition,
    CccwsrAcquisition,
    FineDopplerAcquisition,
    NoncoherentIQAcquisition,
    QuickSyncAcquisition,
    TongAcquisition,
)

__all__ = [
    "AcqConfig",
    "AcqResults",
    "PcpsAcquisition",
    "AssistedAcquisition",
    "CccwsrAcquisition",
    "FineDopplerAcquisition",
    "NoncoherentIQAcquisition",
    "QuickSyncAcquisition",
    "TongAcquisition",
]
