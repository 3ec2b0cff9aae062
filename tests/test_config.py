"""Configuration tests (reference: tests/unit-tests/control-plane/
{file_configuration_test,in_memory_configuration_test}.cc)."""

import pytest

from gnss_sdr_tpu.config import FileConfiguration, InMemoryConfiguration


def test_in_memory_typed_properties():
    cfg = InMemoryConfiguration()
    cfg.set_property("GNSS-SDR.internal_fs_sps", "2000000")
    cfg.set_property("Acquisition_1C.doppler_max", "5000")
    cfg.set_property("Acquisition_1C.pfa", "0.01")
    cfg.set_property("Tracking_1C.dump", "true")
    cfg.set_property("SignalSource.implementation", "File_Signal_Source")

    assert cfg.property("GNSS-SDR.internal_fs_sps", 0) == 2_000_000
    assert cfg.property("Acquisition_1C.doppler_max", 0) == 5000
    assert cfg.property("Acquisition_1C.pfa", 0.0) == pytest.approx(0.01)
    assert cfg.property("Tracking_1C.dump", False) is True
    assert cfg.property("SignalSource.implementation", "") == "File_Signal_Source"
    # default fallback
    assert cfg.property("Missing.key", 42) == 42
    assert cfg.property("Missing.key", "d") == "d"


def test_file_configuration_reference_dialect(tmp_path):
    conf = tmp_path / "rx.conf"
    conf.write_text(
        """\
; GNSS-SDR configuration (reference dialect)
[GNSS-SDR]
GNSS-SDR.internal_fs_sps=2000000
SignalSource.implementation=File_Signal_Source
SignalSource.filename=/tmp/capture.dat   ; inline comment
SignalSource.item_type=ibyte
Channels_1C.count=8
Channel.signal=1C
# hash comment
Acquisition_1C.doppler_step=250
PVT.output_rate_ms=100
Tracking_1C.enable_fll_pull_in=false
"""
    )
    cfg = FileConfiguration(conf)
    assert cfg.property("GNSS-SDR.internal_fs_sps", 0) == 2_000_000
    assert cfg.property("SignalSource.filename", "") == "/tmp/capture.dat"
    assert cfg.property("Channels_1C.count", 0) == 8
    assert cfg.property("Acquisition_1C.doppler_step", 0) == 250
    assert cfg.property("Tracking_1C.enable_fll_pull_in", True) is False


def test_bool_parsing_variants():
    cfg = InMemoryConfiguration({"a": "1", "b": "off", "c": "Yes"})
    assert cfg.property("a", False) is True
    assert cfg.property("b", True) is False
    assert cfg.property("c", False) is True


def test_numeric_prefix_parse_matches_stof_stoi(tmp_path):
    """std::stof/stoi semantics: the longest valid numeric prefix parses,
    trailing junk is ignored (reference confs carry values like
    '0.0000008; 0.0000008' — File_input/MultiCons/gnss-sdr_Hybrid_ishort
    .conf:99 — and 'dump=false;')."""
    p = tmp_path / "t.conf"
    p.write_text(
        "Acquisition_1B.pfa=0.0000008; 0.0000008\n"
        "Tracking_1C.order=3;\n"
        "Foo.n=8; 8\n"
        "Foo.hex=0x10\n"
        "Foo.neg=-2.5e-3junk\n"
    )
    cfg = FileConfiguration(str(p))
    assert cfg.property("Acquisition_1B.pfa", 0.0) == 8e-7
    assert cfg.property("Tracking_1C.order", 0) == 3
    assert cfg.property("Foo.n", 0) == 8
    assert cfg.property("Foo.hex", 0) == 16
    assert cfg.property("Foo.neg", 0.0) == -2.5e-3
    with pytest.raises(ValueError):
        cfg2 = FileConfiguration(str(p))
        cfg2.set_property("Foo.bad", "abc")
        cfg2.property("Foo.bad", 0.0)
