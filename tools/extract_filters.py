#!/usr/bin/env python
"""Extract the AV1 subpel interpolation filter tables from libdav1d.

The spec's Subpel_Filters[6][16][8] (REGULAR, SMOOTH, SHARP, then the 4-tap
REGULAR/SMOOTH variants and BILINEAR; every row sums to 128) are stored in
dav1d's .rodata halved (int8 rows summing to 64 — every AV1 MC coefficient
is even, so this is lossless).  We locate the table by the known REGULAR
subpel-1 row, validate structure (90 rows of sum 64), double the values and
prepend each set's identity row (subpel 0).

Appends mc_filters[6][16][8] int32 to rav1e_tpu/ops/av1_tables.npz.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

DAV1D = "/usr/lib/x86_64-linux-gnu/libdav1d.so.6"
OUT = Path(__file__).resolve().parent.parent / "rav1e_tpu" / "ops" / "av1_tables.npz"

REGULAR_SP1_HALF = np.array([0, 1, -3, 63, 4, -1, 0, 0], np.int8)


def main() -> None:
    b = np.frombuffer(Path(DAV1D).read_bytes(), dtype=np.int8)
    hits = [
        int(i)
        for i in np.where(b == 0)[0]
        if np.array_equal(b[i : i + 8], REGULAR_SP1_HALF)
    ]
    assert hits, "regular subpel filter row not found"
    base = hits[0]
    raw = b[base : base + 6 * 15 * 8].astype(np.int32).reshape(6, 15, 8)
    for s in range(6):
        for r in range(15):
            assert raw[s, r].sum() == 64, (s, r, raw[s, r])
    full = np.zeros((6, 16, 8), np.int32)
    full[:, 0, 3] = 128  # subpel 0: identity
    full[:, 1:, :] = raw * 2
    # sanity: set order REGULAR, SMOOTH, SHARP, 4-tap variants/bilinear
    assert full[0, 1].tolist() == [0, 2, -6, 126, 8, -2, 0, 0]
    assert full[1, 1, 2] > 0  # smooth: positive inner taps
    bilinear = [s for s in range(6) if np.count_nonzero(full[s, 8]) == 2]
    print("bilinear set index:", bilinear)
    with np.load(OUT) as z:
        tables = {k: z[k] for k in z.files}
    tables["mc_filters"] = full
    np.savez_compressed(OUT, **tables)
    for s in range(6):
        print(f"set {s}: sp1={full[s,1].tolist()} sp8={full[s,8].tolist()}")
    print(f"wrote mc_filters[6][16][8] to {OUT}")


if __name__ == "__main__":
    main()
