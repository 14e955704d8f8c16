"""Runtime CDF context: the adaptive symbol-probability state.

Reference analog: src/context/cdf_context.rs (CDFContext + default tables).
The normative default tables are loaded from default_cdfs.npz, which
tools/extract_cdfs.py recovers from the system AV1 codec binaries and
cross-validates (the values are AV1-spec constants, identical in every
conformant implementation).

Table shapes (trailing dim = nsymbs+1, last slot is the adaptation counter):
  coeff_base      [q_ctx 4][tx_size 5][plane_type 2][ctx 42][5]
  coeff_base_eob  [4][5][2][4][4]
  coeff_br        [4][5][2][21][5]
  txb_skip        [4][5][13][3]
  eob_extra       [4][5][2][9][3]
  eob_pt_N        [4][2][2][ns+1]     N in 16..1024
  dc_sign         [4][2][3][3]
  kf_y_mode       [5][5][14]
  uv_mode         [2][13][15]         (nocfl rows: 13 syms; cfl rows: 14)
  partition       [20][11]            (4x 8x8 ctx: 4 syms; 12: 10; 4x 128: 8)
  skip            [3][3]
  angle_delta     [8][8]
  tx_size         [3][3][4]
  delta_q         [1][5]
  ...
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

_NPZ = Path(__file__).parent / "default_cdfs.npz"
_defaults: dict[str, np.ndarray] | None = None


def default_tables() -> dict[str, np.ndarray]:
    global _defaults
    if _defaults is None:
        with np.load(_NPZ) as z:
            _defaults = {k: z[k] for k in z.files}
    return _defaults


class CdfContext:
    """Mutable per-frame CDF state.  Attribute per table, numpy uint16.

    For q-context dependent coefficient tables, the attribute holds the
    slice for this frame's base_q_idx (the spec binds q_ctx at frame init).
    """

    COEF_TABLES = (
        "txb_skip",
        "eob_extra",
        "dc_sign",
        "coeff_br",
        "coeff_base",
        "coeff_base_eob",
        "eob_pt_16",
        "eob_pt_32",
        "eob_pt_64",
        "eob_pt_128",
        "eob_pt_256",
        "eob_pt_512",
        "eob_pt_1024",
    )

    def __init__(self, base_q_idx: int):
        d = default_tables()
        q_ctx = self.q_context(base_q_idx)
        for name, table in d.items():
            if name in self.COEF_TABLES:
                arr = table[q_ctx].copy()
            else:
                arr = table.copy()
            setattr(self, name, arr)

    def copy(self, reset_counters: bool = False) -> "CdfContext":
        """Deep copy of the adaptive state (for primary_ref_frame
        inheritance and for RD checkpointing).  reset_counters mirrors the
        decoder's frame-end CDF save, which zeroes every row's adaptation
        counter (the slot after the terminating 0) while keeping the
        probabilities."""
        new = object.__new__(CdfContext)
        for k, v in self.__dict__.items():
            if not isinstance(v, np.ndarray):
                new.__dict__[k] = v
                continue
            c = v.copy()
            if reset_counters and c.ndim >= 1 and c.shape[-1] >= 2:
                flat = c.reshape(-1, c.shape[-1])
                first_zero = (flat == 0).argmax(axis=1)
                cols = np.arange(flat.shape[1])[None, :]
                flat[cols > first_zero[:, None]] = 0
            new.__dict__[k] = c
        return new

    def restore_from(self, other: "CdfContext") -> None:
        """In-place restore of every table from `other`, preserving array
        object identity (recorded symbol ops hold row views into these
        arrays across tile replays)."""
        for k, v in self.__dict__.items():
            if isinstance(v, np.ndarray):
                v[...] = other.__dict__[k]

    @staticmethod
    def q_context(base_q_idx: int) -> int:
        """spec: coefficient CDF selection by quantizer (get_q_ctx)."""
        if base_q_idx <= 20:
            return 0
        if base_q_idx <= 60:
            return 1
        if base_q_idx <= 120:
            return 2
        return 3
