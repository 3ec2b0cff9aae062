"""PVT output writers (reference: src/algorithms/PVT/libs/*printer*)."""

from gnss_sdr_tpu.outputs.geohash import geohash_encode
from gnss_sdr_tpu.outputs.geojson import GeoJsonPrinter
from gnss_sdr_tpu.outputs.gpx import GpxPrinter
from gnss_sdr_tpu.outputs.kml import KmlPrinter
from gnss_sdr_tpu.outputs.nmea import NmeaPrinter
from gnss_sdr_tpu.outputs.rinex import RinexNavWriter, RinexObsWriter

__all__ = [
    "GeoJsonPrinter",
    "GpxPrinter",
    "KmlPrinter",
    "NmeaPrinter",
    "RinexNavWriter",
    "RinexObsWriter",
    "geohash_encode",
]
