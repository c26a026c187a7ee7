"""KLL quantile sketch kernel (Karnin, Lang, Liberty, FOCS 2016).

Mergeable rank/quantile sketch over float64 values. Not present in the
reference — added per BASELINE.json north_star, sharing the BinaryType
two-phase skeleton (SURVEY.md §2.4).

Design choices for distributed determinism (SURVEY.md §7.3):
- compaction offsets are a pure function of (level, total items seen), not an
  RNG stream, so re-running a partition reproduces identical bytes
  (checkpoint/resume byte-equality);
- ``merge_many`` is a *multiset* merge: all inputs' levels are concatenated
  and sorted before compaction, making the result independent of merge order
  (shuffled-merge property tests pass byte-identically).

Rank error is O(1/k) with the geometric capacity schedule cap(h) =
max(ceil(k * (2/3)^(H-1-h)), 8); k=200 gives ~1.3-1.65% rank error whp.

Codec: header(4) | k(u16) | n(u64) | min(f64) | max(f64) | H(u8) |
       sizes u32[H] | items f64[] (levels ascending, each level sorted;
       level h items carry weight 2^h)
"""

from __future__ import annotations

import math
import struct

import numpy as np

from .codec import KIND_KLL, check_header, pack_header

DEFAULT_K = 200
_MIN_CAP = 8
_C = 2.0 / 3.0

_HDR = struct.Struct("<HQddB")
_PHI = np.uint64(0x9E3779B97F4A7C15)


def _cap(k: int, h: int, n_levels: int) -> int:
    return max(int(math.ceil(k * _C ** (n_levels - 1 - h))), _MIN_CAP)


def _offset(level: int, n: int) -> int:
    """Deterministic pseudo-random compaction offset in {0, 1}."""
    with np.errstate(over="ignore"):
        x = (np.uint64(n) * _PHI) ^ (
            np.uint64(level + 1) * np.uint64(0xBF58476D1CE4E5B9)
        )
        x ^= x >> np.uint64(31)
    return int(x & np.uint64(1))


class _State:
    __slots__ = ("k", "n", "vmin", "vmax", "levels")

    def __init__(self, k: int, n: int, vmin: float, vmax: float,
                 levels: list[np.ndarray]):
        self.k, self.n, self.vmin, self.vmax, self.levels = k, n, vmin, vmax, levels


def _compact(st: _State) -> None:
    """Compact over-full levels bottom-up until all within capacity."""
    while True:
        n_levels = len(st.levels)
        for h in range(n_levels):
            if len(st.levels[h]) > _cap(st.k, h, n_levels):
                buf = np.sort(st.levels[h])
                off = _offset(h, st.n)
                promoted = buf[off::2]
                st.levels[h] = np.empty(0, dtype=np.float64)
                if h + 1 == n_levels:
                    st.levels.append(promoted)
                else:
                    st.levels[h + 1] = np.concatenate(
                        [st.levels[h + 1], promoted]
                    )
                break
        else:
            return


def _serialize(st: _State) -> bytes:
    for h in range(len(st.levels)):
        st.levels[h] = np.sort(st.levels[h])
    sizes = np.array([len(lv) for lv in st.levels], dtype="<u4")
    items = (np.concatenate(st.levels) if st.levels
             else np.empty(0, dtype=np.float64)).astype("<f8")
    return (
        pack_header(KIND_KLL)
        + _HDR.pack(st.k, st.n, st.vmin, st.vmax, len(st.levels))
        + sizes.tobytes()
        + items.tobytes()
    )


def _deserialize(sketch: bytes) -> _State:
    body = check_header(sketch, KIND_KLL)
    k, n, vmin, vmax, n_levels = _HDR.unpack_from(body, 0)
    off = _HDR.size
    sizes = np.frombuffer(body[off: off + 4 * n_levels], dtype="<u4")
    off += 4 * n_levels
    items = np.frombuffer(body[off:], dtype="<f8")
    levels, pos = [], 0
    for s in sizes:
        levels.append(items[pos: pos + s].astype(np.float64))
        pos += int(s)
    if pos != len(items):
        raise ValueError("kll payload length mismatch")
    return _State(k, n, vmin, vmax, levels)


def empty(k: int = DEFAULT_K) -> bytes:
    if not 8 <= k <= 65535:
        raise ValueError(f"k must be in [8, 65535], got {k}")
    return _serialize(_State(k, 0, math.inf, -math.inf, []))


def from_values(values: np.ndarray, k: int = DEFAULT_K) -> bytes:
    return update(empty(k), values)


def update(sketch: bytes, values: np.ndarray) -> bytes:
    st = _deserialize(sketch)
    vals = np.asarray(values, dtype=np.float64)
    vals = vals[~np.isnan(vals)]
    if len(vals) == 0:
        return bytes(sketch)
    st.vmin = min(st.vmin, float(vals.min()))
    st.vmax = max(st.vmax, float(vals.max()))
    if not st.levels:
        st.levels = [np.empty(0, dtype=np.float64)]
    # feed in large chunks: level 0 over-fills transiently and the compact
    # cascade restores every capacity. Error guarantees are per-compaction
    # (offset-sampled halving), so bigger batches cost nothing in accuracy
    # and drop the per-chunk Python overhead ~300x vs capacity-sized feeds.
    chunk = max(_cap(st.k, 0, len(st.levels)), 1 << 16)
    for i in range(0, len(vals), chunk):
        part = vals[i: i + chunk]
        st.levels[0] = np.concatenate([st.levels[0], part])
        st.n += len(part)
        _compact(st)
    return _serialize(st)


def from_weighted(values: np.ndarray, weights: np.ndarray,
                  k: int = DEFAULT_K) -> bytes:
    return update_weighted(empty(k), values, weights)


def update_weighted(sketch: bytes, values: np.ndarray,
                    weights: np.ndarray) -> bytes:
    """Weighted ingest: each value carries an INTEGER copy count ``w >= 1``
    (the dedup-pipeline form: quantiles of the original corpus from its
    deduplicated representatives and their n_copies, without re-exploding).

    Placement is the binary decomposition of w: a level-h item carries
    weight 2^h by the KLL invariant, so inserting the value once into every
    level h with bit h set in w adds EXACTLY w units of mass — no sampling
    error is introduced by the weighting itself (unlike a compaction, which
    halves a sorted buffer). Rows with NaN values or non-finite/non-positive
    weights are dropped (mirrors the weighted t-digest); non-integral
    weights and weights >= 2^62 (int64-cast overflow) raise. All-ones
    weights produce bytes IDENTICAL to ``update``:
    the level-0 feed, n accounting, and compaction offsets coincide."""
    st = _deserialize(sketch)
    vals = np.asarray(values, dtype=np.float64)
    ws = np.asarray(weights, dtype=np.float64)
    if len(ws) != len(vals):
        raise ValueError("values and weights must align")
    keep = ~np.isnan(vals) & np.isfinite(ws) & (ws > 0)
    vals, ws = vals[keep], ws[keep]
    if np.any(ws != np.floor(ws)) or np.any(ws >= 2.0**62):
        raise ValueError("kll weights must be positive integers < 2^62")
    w64 = ws.astype(np.int64)
    if len(vals) == 0:
        return bytes(sketch)
    st.vmin = min(st.vmin, float(vals.min()))
    st.vmax = max(st.vmax, float(vals.max()))
    if not st.levels:
        st.levels = [np.empty(0, dtype=np.float64)]
    chunk = max(_cap(st.k, 0, len(st.levels)), 1 << 16)
    for i in range(0, len(vals), chunk):
        pv, pw = vals[i: i + chunk], w64[i: i + chunk]
        top = int(pw.max()).bit_length()
        while len(st.levels) < top:
            st.levels.append(np.empty(0, dtype=np.float64))
        for h in range(top):
            sel = pv[(pw >> h) & 1 == 1]
            if len(sel):
                st.levels[h] = np.concatenate([st.levels[h], sel])
        st.n += int(pw.sum())
        _compact(st)
    return _serialize(st)


def merge_many(sketches) -> bytes:
    """Multiset merge: order-independent by construction."""
    sketches = [s for s in sketches if s is not None]
    if not sketches:
        raise ValueError("merge_many needs at least one sketch")
    states = [_deserialize(s) for s in sketches]
    k = states[0].k
    for st in states[1:]:
        if st.k != k:
            raise ValueError(f"cannot merge KLL of different k: {k} vs {st.k}")
    n_levels = max((len(st.levels) for st in states), default=0)
    levels = []
    for h in range(n_levels):
        parts = [st.levels[h] for st in states if h < len(st.levels)]
        levels.append(np.sort(np.concatenate(parts)) if parts
                      else np.empty(0, dtype=np.float64))
    out = _State(
        k,
        sum(st.n for st in states),
        min((st.vmin for st in states), default=math.inf),
        max((st.vmax for st in states), default=-math.inf),
        levels,
    )
    _compact(out)
    return _serialize(out)


def merge(a: bytes, b: bytes) -> bytes:
    return merge_many([a, b])


def _weighted_items(st: _State) -> tuple[np.ndarray, np.ndarray]:
    if not st.levels:
        return np.empty(0), np.empty(0)
    items = np.concatenate(st.levels)
    weights = np.concatenate(
        [np.full(len(lv), 1 << h, dtype=np.int64)
         for h, lv in enumerate(st.levels)]
    )
    order = np.argsort(items, kind="stable")
    return items[order], weights[order]


def quantiles(sketch: bytes, qs) -> np.ndarray:
    """Estimated values at normalized ranks ``qs`` (inclusive rank rule:
    the smallest retained item whose cumulative weight >= q * n; q=0 ->
    exact min, q=1 -> exact max)."""
    st = _deserialize(sketch)
    qs = np.atleast_1d(np.asarray(qs, dtype=np.float64))
    if np.any((qs < 0) | (qs > 1)):
        raise ValueError("quantile ranks must be in [0, 1]")
    if st.n == 0:
        return np.full(len(qs), np.nan)
    items, weights = _weighted_items(st)
    cum = np.cumsum(weights)
    total = cum[-1]
    targets = qs * total
    pos = np.searchsorted(cum, targets, side="left")
    pos = np.clip(pos, 0, len(items) - 1)
    out = items[pos]
    out[qs <= 0] = st.vmin
    out[qs >= 1] = st.vmax
    return out


def trimmed_mean(sketch: bytes, q0: float, q1: float) -> float:
    """Mean of the values with normalized rank in (q0, q1] — the robust
    ("trimmed") mean, computed by interval overlap: retained item i with
    weight w_i occupies the rank interval (cum_{i-1}, cum_i] of the total
    mass W; its contribution is the length of the overlap with
    (q0*W, q1*W]. In the no-compaction regime (unit weights) this is
    EXACTLY the fractional-overlap order-statistic rule, which is one SQL
    expression — the hash-exact oracle mode; beyond, boundary items carry
    the KLL rank error."""
    if not 0 <= q0 < q1 <= 1:
        raise ValueError(f"need 0 <= q0 < q1 <= 1, got ({q0}, {q1})")
    st = _deserialize(sketch)
    if st.n == 0:
        return math.nan
    items, weights = _weighted_items(st)
    cum = np.cumsum(weights.astype(np.float64))
    total = cum[-1]
    lo, hi = q0 * total, q1 * total
    prev = cum - weights
    overlap = np.clip(np.minimum(cum, hi) - np.maximum(prev, lo), 0, None)
    mass = overlap.sum()
    if mass <= 0:
        return math.nan
    return float((items * overlap).sum() / mass)


def rank(sketch: bytes, values) -> np.ndarray:
    """Estimated normalized rank (fraction of items <= value)."""
    st = _deserialize(sketch)
    vals = np.atleast_1d(np.asarray(values, dtype=np.float64))
    if st.n == 0:
        return np.full(len(vals), np.nan)
    items, weights = _weighted_items(st)
    cum = np.concatenate(([0], np.cumsum(weights)))
    pos = np.searchsorted(items, vals, side="right")
    return cum[pos] / cum[-1]


def n_items(sketch: bytes) -> int:
    return _deserialize(sketch).n


def min_max(sketch: bytes) -> tuple[float, float]:
    st = _deserialize(sketch)
    return st.vmin, st.vmax
