"""Extract the Galileo E6-B/E6-C primary + E6-C secondary code tables
(Galileo HAS SIS ICD Annex memory-code values) into
codes/data/galileo_e6_codes.npz.

The ICD publishes these codes as hex tables; the reference carries the
same published constants in src/core/system_parameters/Galileo_E6.h,
which this script parses (standard ICD data, not reference code). Hex
convention: each char is 4 chips MSB-first, bit 0 <-> level +1; the
1279-char strings carry 1278*4 + 3 = 5115 chips.

Run once from the repo root:  python tools/extract_e6_codes.py
"""

from __future__ import annotations

import re
from pathlib import Path

import numpy as np

HDR = Path("/root/reference/src/core/system_parameters/Galileo_E6.h")
OUT = Path(__file__).resolve().parent.parent / (
    "gnss_sdr_tpu/codes/data/galileo_e6_codes.npz"
)

CODE_LEN = 5115
SEC_LEN = 100
NUM = 50


def parse_string_array(text: str, name: str, count: int) -> list[str]:
    m = re.search(rf"{name}\s*\[[^]]*\]\s*\[[^]]*\]\s*=\s*\{{(.*?)\}};",
                  text, re.S)
    assert m, f"{name} not found"
    strings = [
        "".join(re.findall(r'"([0-9A-Fa-f]*)"', elem))
        for elem in m.group(1).split(",")
        if '"' in elem
    ]
    assert len(strings) == count, (name, len(strings))
    return strings


def hex_to_bits(s: str, n: int) -> np.ndarray:
    bits = np.zeros(len(s) * 4, dtype=np.uint8)
    for i, ch in enumerate(s):
        v = int(ch, 16)
        for b in range(4):
            bits[4 * i + b] = (v >> (3 - b)) & 1
    return bits[:n]


def main() -> None:
    text = HDR.read_text()
    out = {}
    for key, name, ln in (
        ("e6b", "GALILEO_E6_B_PRIMARY_CODE", CODE_LEN),
        ("e6c", "GALILEO_E6_C_PRIMARY_CODE", CODE_LEN),
        ("e6c_sec", "GALILEO_E6_C_SECONDARY_CODE", SEC_LEN),
    ):
        rows = parse_string_array(text, name, NUM)
        bits = np.stack([hex_to_bits(r, ln) for r in rows])
        out[key] = np.packbits(bits, axis=1)
    OUT.parent.mkdir(exist_ok=True)
    np.savez_compressed(OUT, **out)
    print("wrote", OUT, {k: v.shape for k, v in out.items()})


if __name__ == "__main__":
    main()
