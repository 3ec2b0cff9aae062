"""Extract the GPS L2 CM initial register states (IS-GPS-200 Table 3-IIa)
and the BeiDou B3I G2 initial phases (BDS-SIS-ICD-B3I Table 5-5) into
codes/data/l2c_b3i_tables.npz.

Both tables are published ICD constants; the reference embeds the same
values in src/core/system_parameters/GPS_L2C.h (octal init registers) and
src/algorithms/libs/beidou_b3i_signal_replica.cc (13-bit register states).

Run once from the repo root:  python tools/extract_l2c_b3i_tables.py
"""

from __future__ import annotations

import re
from pathlib import Path

import numpy as np

L2C_HDR = Path("/root/reference/src/core/system_parameters/GPS_L2C.h")
B3I_CC = Path(
    "/root/reference/src/algorithms/libs/beidou_b3i_signal_replica.cc"
)
OUT = Path(__file__).resolve().parent.parent / (
    "gnss_sdr_tpu/codes/data/l2c_b3i_tables.npz"
)


def main() -> None:
    text = L2C_HDR.read_text()
    m = re.search(r"GPS_L2C_M_INIT_REG\s*\[[^]]*\]\s*=\s*\{(.*?)\};",
                  text, re.S)
    assert m
    cm_init = [int(tok, 8) for tok in re.findall(r"\b0[0-7]+\b", m.group(1))]
    assert len(cm_init) >= 50, len(cm_init)

    text = B3I_CC.read_text()
    m = re.search(r"G2_register_shifted\s*=\s*\{(.*?)\};", text, re.S)
    assert m
    g2 = re.findall(r'"([01]{13})"', m.group(1))
    assert len(g2) == 63, len(g2)
    # bitset<13>("b12..b0"): leftmost char is bit 12; store as integers
    g2_init = [int(s, 2) for s in g2]

    np.savez_compressed(
        OUT,
        l2cm_init=np.asarray(cm_init, dtype=np.uint32),
        b3i_g2_init=np.asarray(g2_init, dtype=np.uint16),
    )
    print(f"wrote {OUT} ({OUT.stat().st_size} bytes)")


if __name__ == "__main__":
    main()
