"""HLL++ estimator constants: alpha_m, LC/HLL selection thresholds, and the
empirical bias-correction tables.

Semantics follow the HyperLogLog++ paper (Heule, Nunkesser, Hall, EDBT 2013)
as realized by the reference:
- alpha_m: /root/reference/HyperLogLog/Utils.cs:180-193
- thresholds: /root/reference/HyperLogLog/Utils.cs:214-250 (Heule et al.
  supplementary material)
- bias tables: /root/reference/HyperLogLog/BiasCorrection.cs:98-841 (same
  published supplementary data), stored here as hllpp_bias_tables.npz
  (see scripts/extract_bias_tables.py for provenance).
"""

from __future__ import annotations

import functools
from importlib import resources

import numpy as np

# LinearCounting-vs-HLL selection thresholds per precision (Heule et al.).
THRESHOLD = {
    4: 10.0,
    5: 20.0,
    6: 40.0,
    7: 80.0,
    8: 220.0,
    9: 400.0,
    10: 900.0,
    11: 1800.0,
    12: 3100.0,
    13: 6500.0,
    14: 11500.0,
    15: 20000.0,
    16: 50000.0,
    17: 120000.0,
    18: 350000.0,
}


def alpha_m(m: int) -> float:
    """Flajolet bias constant alpha_m."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


@functools.lru_cache(maxsize=1)
def _tables() -> dict[int, tuple[np.ndarray, np.ndarray]]:
    ref = resources.files("hyperloglog_spark.sketch") / "hllpp_bias_tables.npz"
    with ref.open("rb") as f:
        npz = np.load(f)
        return {
            p: (npz[f"raw_{p}"], npz[f"bias_{p}"]) for p in range(4, 19)
        }


def correct_bias(raw_estimate: float, p: int) -> float:
    """Subtract the interpolated empirical bias; clamp at 0.

    Binary-search + linear interpolation with end clamping, matching
    /root/reference/HyperLogLog/BiasCorrection.cs:42-93.
    """
    raw_tbl, bias_tbl = _tables()[p]
    idx = int(np.searchsorted(raw_tbl, raw_estimate, side="left"))
    if idx < len(raw_tbl) and raw_tbl[idx] == raw_estimate:
        bias = float(bias_tbl[idx])
    elif idx >= len(raw_tbl):
        bias = float(bias_tbl[-1])
    elif idx <= 0:
        bias = float(bias_tbl[0])
    else:
        lo, hi = float(raw_tbl[idx - 1]), float(raw_tbl[idx])
        frac = (raw_estimate - lo) / (hi - lo)
        bias = float(bias_tbl[idx - 1]) + frac * (
            float(bias_tbl[idx]) - float(bias_tbl[idx - 1])
        )
    return max(raw_estimate - bias, 0.0)
