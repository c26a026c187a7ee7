"""Count-min sketch kernel: vectorized counter updates, + merge, point/top-k
queries.

Standard count-min (Cormode & Muthukrishnan 2005) with conservative width as
a power of two and double hashing for the d row hashes. Not present in the
reference — added per BASELINE.json north_star as a mergeable BinaryType
aggregator sharing the HLL two-phase skeleton (SURVEY.md §2.4).

Guarantees: point estimate >= true count; estimate <= true + eps*N with
probability 1-delta, eps = e/w, delta = e^-d.

Codec:
  header(4) | d(1) | log2_w(1) | mode(1) | n_total(uint64 LE) | payload
  dense payload:  d*w uint64 counters
  sparse payload: nnz * (uint32 flat_index, uint64 count) — emitted when the
                  occupied cells are few (small groups), keeping shuffle bytes
                  proportional to observed distincts like the HLL sparse mode.
"""

from __future__ import annotations

import struct

import numpy as np

from .codec import KIND_CMS, check_header, pack_header

U64 = np.uint64

DEFAULT_D = 4
DEFAULT_LOG2_W = 15  # w = 32768 -> eps ~ 8.3e-5, 1 MB dense

MODE_SPARSE = 0
MODE_DENSE = 1

_HDR = struct.Struct("<BBBQ")
_PAIR = np.dtype([("idx", "<u4"), ("cnt", "<u8")])


def _row_positions(hashes: np.ndarray, d: int, log2_w: int) -> np.ndarray:
    """(d, n) column index per row via double hashing."""
    h = np.ascontiguousarray(hashes, dtype=np.uint64)
    h1, h2 = h, (h >> U64(32)) | U64(1)
    mask = U64((1 << log2_w) - 1)
    js = np.arange(d, dtype=np.uint64)[:, None]
    with np.errstate(over="ignore"):
        return ((h1[None, :] + js * h2[None, :]) & mask).astype(np.int64)


def _sparse_threshold(d: int, log2_w: int) -> int:
    # sparse pair = 12 B vs dense cell = 8 B: stay sparse while pairs use
    # less than half the dense size
    return (d << log2_w) // 3


def _serialize(d: int, log2_w: int, n: int, table: np.ndarray) -> bytes:
    header = pack_header(KIND_CMS)
    flat = table.ravel()
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
    if not 4 <= log2_w <= 26:
        raise ValueError(f"log2_w must be in [4, 26], got {log2_w}")
    return pack_header(KIND_CMS) + _HDR.pack(d, log2_w, MODE_SPARSE, 0)


def params(sketch: bytes) -> tuple[int, int, int]:
    """(d, log2_w, n_total)."""
    body = check_header(sketch, KIND_CMS)
    d, log2_w, _, n = _HDR.unpack_from(body, 0)
    return d, log2_w, n


def table(sketch: bytes) -> np.ndarray:
    """Decode to the dense (d, w) uint64 counter table."""
    body = check_header(sketch, KIND_CMS)
    d, log2_w, mode, _ = _HDR.unpack_from(body, 0)
    w = 1 << log2_w
    payload = body[_HDR.size:]
    if mode == MODE_DENSE:
        flat = np.frombuffer(payload, dtype="<u8")
        if len(flat) != d * w:
            raise ValueError("cms dense payload length mismatch")
        return flat.reshape(d, w).astype(np.uint64)
    pairs = np.frombuffer(payload, dtype=_PAIR)
    flat = np.zeros(d * w, dtype=np.uint64)
    flat[pairs["idx"].astype(np.int64)] = pairs["cnt"]
    return flat.reshape(d, w)


def from_hashes(
    hashes: np.ndarray,
    counts: np.ndarray | None = None,
    d: int = DEFAULT_D,
    log2_w: int = DEFAULT_LOG2_W,
) -> bytes:
    """Build from hashed values; ``counts`` (default all-1) weights each."""
    h = np.ascontiguousarray(hashes, dtype=np.uint64)
    if counts is None:
        # pre-aggregate duplicates: one np.add.at per distinct value
        h, counts = np.unique(h, return_counts=True)
    counts = counts.astype(np.uint64)
    w = 1 << log2_w
    tbl = np.zeros((d, w), dtype=np.uint64)
    pos = _row_positions(h, d, log2_w)
    for j in range(d):
        np.add.at(tbl[j], pos[j], counts)
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
                f"cannot merge CMS of different shape: "
                f"({d},{log2_w}) vs ({d2},{w2})"
            )
        acc += table(s)
        n += n2
    return _serialize(d, log2_w, n, acc)


def point_query(sketch: bytes, hashes: np.ndarray) -> np.ndarray:
    """Vectorized min-over-rows estimate for each hashed value -> uint64[n]."""
    d, log2_w, _ = params(sketch)
    tbl = table(sketch)
    pos = _row_positions(hashes, d, log2_w)  # (d, n)
    ests = tbl[np.arange(d)[:, None], pos]
    return ests.min(axis=0)


def inner_product(a: bytes, b: bytes) -> int:
    """Join-size estimate |A ⋈ B| = Σ_k cnt_A(k)·cnt_B(k) as the min over
    rows of the bucketwise dot product (Cormode & Muthukrishnan 2005 §4.2).
    Guarantee: exact <= estimate <= exact + eps·N_A·N_B w.p. 1-delta.
    Both sketches must share (d, w) AND the same hashing of the join key."""
    da, wa, _ = params(a)
    db, wb, _ = params(b)
    if (da, wa) != (db, wb):
        raise ValueError(
            f"cannot inner-product CMS of different shape: "
            f"({da},{wa}) vs ({db},{wb})"
        )
    ta, tb = table(a).astype(object), table(b).astype(object)
    return int(min((ra * rb).sum() for ra, rb in zip(ta, tb)))


def error_bound(sketch: bytes) -> tuple[float, float]:
    """(eps, delta): estimate <= true + eps*N with prob 1-delta."""
    d, log2_w, _ = params(sketch)
    return float(np.e / (1 << log2_w)), float(np.exp(-d))
