"""Count sketch kernel: signed counters for unbiased frequency and F2.

Count sketch (Charikar, Chen & Farach-Colton 2002) keeps ``d`` rows of ``w``
SIGNED counters; each value lands in one bucket per row with a ±1 sign.
Unlike count-min it is unbiased (collisions cancel in expectation instead of
only inflating), which buys two extra queries CMS cannot answer:

* an unbiased point estimate (median over rows of sign * counter) with
  |error| <= sqrt(F2 / w) per row w.p. >= 2/3, amplified by the median;
* the second frequency moment F2 = sum_v count(v)^2 — the SELF-JOIN SIZE —
  as the median over rows of sum_b counter[b]^2 (the AMS / tug-of-war
  estimator realised over buckets), with relative error O(1/sqrt(w)) per
  row.  F2 is the quantity a distributed planner needs to size a self-join
  or detect key skew without scanning twice.

Not present in the reference (its scope is HLL only,
/root/reference/HyperLogLog/HyperLogLog.cs); added per BASELINE.json
north_star as another mergeable BinaryType aggregator on the shared
two-phase skeleton (SURVEY.md §2.4).

Determinism contract (the oracle hook): position and sign per row ``j``
derive from the 64-bit value hash ``h`` with pure integer ops —

    h1 = h;  h2 = (h >> 32) | 1          # double hashing, h2 odd
    g_j  = h1 + j * h2   (mod 2^64)
    pos_j  = g_j & (w - 1)
    sign_j = +1 if (g_j >> log2_w) & 1 else -1

so in "md5" hashing mode (h = top-60-md5-bits, < 2^60; j*h2 < 2^31 — no
64-bit wrap possible) ANY ANSI SQL engine replays the whole sketch, the
median, and the F2 estimate bit-for-bit.  ``d`` defaults to an ODD 5 so the
median is the exact middle order statistic (an integer), not an average of
two middles.

Codec (kind 7):
  header(4) | d(1) | log2_w(1) | mode(1) | n_total(uint64 LE) | payload
  dense payload:  d*w int64 counters
  sparse payload: nnz * (uint32 flat_index, int64 count)
"""

from __future__ import annotations

import struct

import numpy as np

from .codec import KIND_COUNTSKETCH, check_header, pack_header

U64 = np.uint64

DEFAULT_D = 5            # odd: median == exact middle order statistic
DEFAULT_LOG2_W = 15      # w = 32768 -> F2 rel. err ~ 1/sqrt(w) ~ 0.6% per row

MODE_SPARSE = 0
MODE_DENSE = 1

_HDR = struct.Struct("<BBBQ")
_PAIR = np.dtype([("idx", "<u4"), ("cnt", "<i8")])


def _row_mix(hashes: np.ndarray, d: int) -> np.ndarray:
    """(d, n) combined per-row hash g_j = h1 + j*h2 (mod 2^64)."""
    h = np.ascontiguousarray(hashes, dtype=np.uint64)
    h1, h2 = h, (h >> U64(32)) | U64(1)
    js = np.arange(d, dtype=np.uint64)[:, None]
    with np.errstate(over="ignore"):
        return h1[None, :] + js * h2[None, :]


def positions_signs(
    hashes: np.ndarray, d: int, log2_w: int
) -> tuple[np.ndarray, np.ndarray]:
    """(d, n) bucket index and (d, n) ±1 sign per row."""
    g = _row_mix(hashes, d)
    pos = (g & U64((1 << log2_w) - 1)).astype(np.int64)
    signs = (((g >> U64(log2_w)) & U64(1)).astype(np.int64) << 1) - 1
    return pos, signs


def _sparse_threshold(d: int, log2_w: int) -> int:
    # sparse pair = 12 B vs dense cell = 8 B
    return (d << log2_w) // 3


def _serialize(d: int, log2_w: int, n: int, tbl: np.ndarray) -> bytes:
    header = pack_header(KIND_COUNTSKETCH)
    flat = tbl.ravel()
    nz = np.flatnonzero(flat)
    if len(nz) <= _sparse_threshold(d, log2_w):
        pairs = np.empty(len(nz), dtype=_PAIR)
        pairs["idx"] = nz.astype(np.uint32)
        pairs["cnt"] = flat[nz]
        return header + _HDR.pack(d, log2_w, MODE_SPARSE, n) + pairs.tobytes()
    return header + _HDR.pack(d, log2_w, MODE_DENSE, n) + flat.tobytes()


def empty(d: int = DEFAULT_D, log2_w: int = DEFAULT_LOG2_W) -> bytes:
    if not 1 <= d <= 16:
        raise ValueError(f"d must be in [1, 16], got {d}")
    if d % 2 == 0:
        # The estimators take the exact middle order statistic; an even d
        # would silently pick the upper-middle and bias estimates upward.
        raise ValueError(f"d must be odd (median over rows), got {d}")
    if not 4 <= log2_w <= 26:
        raise ValueError(f"log2_w must be in [4, 26], got {log2_w}")
    return pack_header(KIND_COUNTSKETCH) + _HDR.pack(d, log2_w, MODE_SPARSE, 0)


def params(sketch: bytes) -> tuple[int, int, int]:
    """(d, log2_w, n_total)."""
    body = check_header(sketch, KIND_COUNTSKETCH)
    d, log2_w, _, n = _HDR.unpack_from(body, 0)
    return d, log2_w, n


def table(sketch: bytes) -> np.ndarray:
    """Decode to the dense (d, w) int64 signed counter table."""
    body = check_header(sketch, KIND_COUNTSKETCH)
    d, log2_w, mode, _ = _HDR.unpack_from(body, 0)
    w = 1 << log2_w
    payload = body[_HDR.size:]
    if mode == MODE_DENSE:
        flat = np.frombuffer(payload, dtype="<i8")
        if len(flat) != d * w:
            raise ValueError("countsketch dense payload length mismatch")
        return flat.reshape(d, w).astype(np.int64)
    pairs = np.frombuffer(payload, dtype=_PAIR)
    flat = np.zeros(d * w, dtype=np.int64)
    flat[pairs["idx"].astype(np.int64)] = pairs["cnt"]
    return flat.reshape(d, w)


def from_hashes(
    hashes: np.ndarray,
    counts: np.ndarray | None = None,
    d: int = DEFAULT_D,
    log2_w: int = DEFAULT_LOG2_W,
) -> bytes:
    """Build from hashed values; ``counts`` (default all-1) weights each."""
    empty(d, log2_w)  # validate (d odd, ranges) before building
    h = np.ascontiguousarray(hashes, dtype=np.uint64)
    if counts is None:
        h, counts = np.unique(h, return_counts=True)
    counts = counts.astype(np.int64)
    w = 1 << log2_w
    tbl = np.zeros((d, w), dtype=np.int64)
    pos, signs = positions_signs(h, d, log2_w)
    for j in range(d):
        np.add.at(tbl[j], pos[j], signs[j] * counts)
    return _serialize(d, log2_w, int(counts.sum()), tbl)


def merge_many(sketches) -> bytes:
    sketches = [s for s in sketches if s is not None]
    if not sketches:
        raise ValueError("merge_many needs at least one sketch")
    d, log2_w, n = params(sketches[0])
    acc = table(sketches[0]).copy()
    for s in sketches[1:]:
        d2, w2, n2 = params(s)
        if (d2, w2) != (d, log2_w):
            raise ValueError(
                f"cannot merge count sketches of different shape: "
                f"({d},{log2_w}) vs ({d2},{w2})"
            )
        acc += table(s)
        n += n2
    return _serialize(d, log2_w, n, acc)


def point_query(sketch: bytes, hashes: np.ndarray) -> np.ndarray:
    """Unbiased count estimate per hashed value: median over rows of
    sign_j * counter[j][pos_j] -> int64[n].  ``empty()`` enforces odd d so
    this is the exact middle order statistic; a foreign even-d sketch gets
    the floor-mean of the two middles rather than an upward-biased
    upper-middle."""
    d, log2_w, _ = params(sketch)
    tbl = table(sketch)
    pos, signs = positions_signs(hashes, d, log2_w)
    ests = np.sort(signs * tbl[np.arange(d)[:, None], pos], axis=0)  # (d, n)
    if d % 2 == 1:
        return ests[d // 2]
    return (ests[d // 2 - 1] + ests[d // 2]) // 2


def f2_estimate(sketch: bytes) -> int:
    """Second frequency moment (self-join size): median over rows of the
    row's sum of squared counters.  Exact when no two distinct values
    collide in the median row; unbiased per row in general (AMS)."""
    d, _, _ = params(sketch)
    tbl = table(sketch)
    row_sums = np.sort((tbl.astype(object) ** 2).sum(axis=1))
    if d % 2 == 1:
        return int(row_sums[d // 2])
    return int((row_sums[d // 2 - 1] + row_sums[d // 2]) // 2)


def f2_relative_error(sketch: bytes) -> float:
    """Per-row std of the AMS-over-buckets estimator is sqrt(2/w) * F2;
    the median over d rows concentrates it.  Returned bound: 3 sigma of a
    single row — conservative for the median."""
    _, log2_w, _ = params(sketch)
    return 3.0 * float(np.sqrt(2.0 / (1 << log2_w)))
