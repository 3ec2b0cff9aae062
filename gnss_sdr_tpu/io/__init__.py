"""Signal sources and sample-format ingest (reference signal_source role)."""

from gnss_sdr_tpu.io.formats import (
    bytes_per_sample,
    decode_samples,
    encode_samples,
    item_format_names,
)
from gnss_sdr_tpu.io.sources import (
    ArraySignalSource,
    FifoSignalSource,
    FileMeta,
    FileSignalSource,
    MultichannelFileSignalSource,
    SignalSource,
    UdpSignalSource,
    Valve,
)

__all__ = [
    "ArraySignalSource",
    "FifoSignalSource",
    "FileMeta",
    "FileSignalSource",
    "MultichannelFileSignalSource",
    "SignalSource",
    "UdpSignalSource",
    "Valve",
    "bytes_per_sample",
    "decode_samples",
    "encode_samples",
    "item_format_names",
]
