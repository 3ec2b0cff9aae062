"""Extract the Galileo E5b primary/secondary code tables (Galileo OS SIS
ICD Annex C memory-code values) into codes/data/galileo_e5b_codes.npz.

Same provenance as tools/extract_e5a_codes.py: the ICD publishes the
E5b-I/E5b-Q primary codes as hex tables; the reference carries the same
published constants in src/core/system_parameters/Galileo_E5b.h, which
this script parses (standard ICD data, not reference code).

Run once from the repo root:  python tools/extract_e5b_codes.py
"""

from __future__ import annotations

import re
from pathlib import Path

import numpy as np

HDR = Path("/root/reference/src/core/system_parameters/Galileo_E5b.h")
OUT = Path(__file__).resolve().parent.parent / (
    "gnss_sdr_tpu/codes/data/galileo_e5b_codes.npz"
)

CODE_LEN = 10230
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


def hex_to_bits(s: str, nbits: int) -> np.ndarray:
    nibbles = np.array([int(c, 16) for c in s], dtype=np.uint8)
    bits = np.unpackbits(nibbles[:, None], axis=1)[:, 4:].reshape(-1)
    assert len(bits) >= nbits
    return bits[:nbits]


def main() -> None:
    text = HDR.read_text()
    e5bi = parse_string_array(text, "GALILEO_E5B_I_PRIMARY_CODE", NUM)
    e5bq = parse_string_array(text, "GALILEO_E5B_Q_PRIMARY_CODE", NUM)
    sec_q = parse_string_array(text, "GALILEO_E5B_Q_SECONDARY_CODE", NUM)

    i_bits = np.stack([hex_to_bits(s, CODE_LEN) for s in e5bi])
    q_bits = np.stack([hex_to_bits(s, CODE_LEN) for s in e5bq])
    sq = np.stack(
        [np.array([int(c) for c in s], dtype=np.uint8) for s in sec_q]
    )
    assert sq.shape == (NUM, 100)

    np.savez_compressed(
        OUT,
        e5bi=np.packbits(i_bits, axis=1),
        e5bq=np.packbits(q_bits, axis=1),
        sec_q=sq,
    )
    print(f"wrote {OUT} ({OUT.stat().st_size} bytes)")


if __name__ == "__main__":
    main()
