"""Extract the Galileo E5a primary/secondary code tables (Galileo OS SIS
ICD Annex C memory-code values) into codes/data/galileo_e5a_codes.npz.

The ICD publishes the E5a-I/E5a-Q primary codes as hex tables; the
reference carries the same published constants in
src/core/system_parameters/Galileo_E5a.h, which this script parses (the
values are standard ICD data, not reference code). Hex convention: each
char is 4 chips MSB-first, bit 0 <-> level +1 (reference
gnss_signal_replica.cc hex_to_binary_converter); the 2558-char strings
carry 2557*4 + 2 = 10230 chips.

Run once from the repo root:  python tools/extract_e5a_codes.py
"""

from __future__ import annotations

import re
from pathlib import Path

import numpy as np

HDR = Path("/root/reference/src/core/system_parameters/Galileo_E5a.h")
OUT = Path(__file__).resolve().parent.parent / (
    "gnss_sdr_tpu/codes/data/galileo_e5a_codes.npz"
)

CODE_LEN = 10230
NUM = 50


def parse_string_array(text: str, name: str, count: int) -> list[str]:
    m = re.search(rf"{name}\s*\[[^]]*\]\s*\[[^]]*\]\s*=\s*\{{(.*?)\}};",
                  text, re.S)
    assert m, f"{name} not found"
    # elements are comma-separated; each may be several adjacent C string
    # literals ("ABC" "DEF") that concatenate
    strings = [
        "".join(re.findall(r'"([0-9A-Fa-f]*)"', elem))
        for elem in m.group(1).split(",")
        if '"' in elem
    ]
    assert len(strings) == count, (name, len(strings))
    return strings


def hex_to_bits(s: str, nbits: int) -> np.ndarray:
    nibbles = np.array([int(c, 16) for c in s], dtype=np.uint8)
    bits = np.unpackbits(nibbles[:, None], axis=1)[:, 4:].reshape(-1)
    assert len(bits) >= nbits
    return bits[:nbits]


def main() -> None:
    text = HDR.read_text()
    e5ai = parse_string_array(text, "GALILEO_E5A_I_PRIMARY_CODE", NUM)
    e5aq = parse_string_array(text, "GALILEO_E5A_Q_PRIMARY_CODE", NUM)
    # the published table defines 47 CS100 sequences (PRNs 48-50 are not
    # assigned E5a-Q secondaries in the reference header); pad with zeros
    sec_q = parse_string_array(text, "GALILEO_E5A_Q_SECONDARY_CODE", 47)
    sec_q = sec_q + ["0" * 100] * (NUM - len(sec_q))

    i_bits = np.stack([hex_to_bits(s, CODE_LEN) for s in e5ai])
    q_bits = np.stack([hex_to_bits(s, CODE_LEN) for s in e5aq])
    sq = np.stack(
        [np.array([int(c) for c in s], dtype=np.uint8) for s in sec_q]
    )
    assert sq.shape == (NUM, 100)

    np.savez_compressed(
        OUT,
        e5ai=np.packbits(i_bits, axis=1),
        e5aq=np.packbits(q_bits, axis=1),
        sec_q=sq,
    )
    print(f"wrote {OUT} ({OUT.stat().st_size} bytes)")


if __name__ == "__main__":
    main()
