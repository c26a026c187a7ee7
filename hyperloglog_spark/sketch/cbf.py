"""Counting Bloom filter kernel: signed integer counters, deletion support,
vector-addition merge.

Fan, Cao, Almeida & Broder 2000 ("Summary Cache", IEEE/ACM ToN) — the
deletion-capable Bloom variant: each of the k probe positions holds a
counter instead of a bit; insert increments, delete decrements, membership
checks all k counters > 0. Not in the reference (which ships only HLL,
/root/reference/HyperLogLog/HyperLogLog.cs); added to the §2.4 membership
family because a plain Bloom filter (sketch/bloom.py) cannot retract — and a
100 TB pipeline that upserts (tombstones, GDPR deletes, compaction) needs a
membership summary that can.

Design for the two-phase pipeline: counters are int64 and Z-valued — a
partial built from a partition holding only the DELETE rows of a key is
legitimately negative, and the merge (element-wise vector addition) is a
commutative group, so partials combine in any order/bracketing to the same
bytes. Validity (no cell < 0, i.e. nothing deleted that was never inserted)
is a property of the MERGED filter only, so it is enforced at probe/finalize
time, never during build/merge.

Positions use the same Kirsch-Mitzenmacher double-hash chain as bloom.py /
cms.py: pos_j = (h + j*((h >> 32) | 1)) mod m — with the md5 hashing mode
this makes every counter and every probe replayable bit-for-bit in ANSI SQL.

Codec: header(4) | k(1) | log2_m(1) | net_added(int64 LE) | int64[m] LE
"""

from __future__ import annotations

import struct

import numpy as np

from .bloom import _positions
from .codec import KIND_CBF, check_header, pack_header

DEFAULT_LOG2_M = 16
DEFAULT_K = 4

_HDR = struct.Struct("<BBq")


def empty(log2_m: int = DEFAULT_LOG2_M, k: int = DEFAULT_K) -> bytes:
    if not 3 <= log2_m <= 28:
        raise ValueError(f"log2_m must be in [3, 28], got {log2_m}")
    if not 1 <= k <= 30:
        raise ValueError(f"k must be in [1, 30], got {k}")
    return (
        pack_header(KIND_CBF)
        + _HDR.pack(k, log2_m, 0)
        + bytes(8 << log2_m)
    )


def params(sketch: bytes) -> tuple[int, int, int]:
    """(m, k, net_added). net_added = inserts - deletes (signed)."""
    body = check_header(sketch, KIND_CBF)
    k, log2_m, net = _HDR.unpack_from(body, 0)
    return 1 << log2_m, k, net


def counters(sketch: bytes) -> np.ndarray:
    """Zero-copy int64[m] view of the counter array."""
    body = check_header(sketch, KIND_CBF)
    _, log2_m, _ = _HDR.unpack_from(body, 0)
    c = np.frombuffer(body[_HDR.size:], dtype="<i8")
    if len(c) != (1 << log2_m):
        raise ValueError("cbf payload length mismatch")
    return c


def update(sketch: bytes, hashes: np.ndarray, deltas: np.ndarray) -> bytes:
    """Apply signed updates: +1 rows insert, -1 rows delete (any int64
    weight works). Vectorized np.add.at over all k positions per row."""
    m, k, net = params(sketch)
    h = np.ascontiguousarray(hashes, dtype=np.uint64)
    d = np.ascontiguousarray(deltas, dtype=np.int64)
    if len(h) != len(d):
        raise ValueError("hashes and deltas must align")
    c = counters(sketch).copy()
    if len(h):
        pos = _positions(h, m, k)                    # (k, n)
        np.add.at(c, pos.ravel(), np.tile(d, k))
        net += int(d.sum())
    return pack_header(KIND_CBF) + _HDR.pack(k, int(m).bit_length() - 1, net) \
        + c.astype("<i8").tobytes()


def from_hashes(
    hashes: np.ndarray,
    deltas: np.ndarray | None = None,
    log2_m: int = DEFAULT_LOG2_M,
    k: int = DEFAULT_K,
) -> bytes:
    if deltas is None:
        deltas = np.ones(len(hashes), dtype=np.int64)
    return update(empty(log2_m, k), hashes, deltas)


def merge_many(sketches) -> bytes:
    """Element-wise counter addition (commutative group — order and
    bracketing never change the merged bytes). Parameters must match."""
    it = iter(sketches)
    first = bytes(next(it))
    m, k, net = params(first)
    acc = counters(first).astype(np.int64)
    for s in it:
        m2, k2, net2 = params(s)
        if (m2, k2) != (m, k):
            raise ValueError(
                f"cannot merge cbf(m={m2}, k={k2}) into cbf(m={m}, k={k})"
            )
        acc = acc + counters(s)
        net += net2
    return pack_header(KIND_CBF) + _HDR.pack(k, int(m).bit_length() - 1, net) \
        + acc.astype("<i8").tobytes()


def validate(sketch: bytes) -> None:
    """Raise if any counter is negative: more deletes than inserts landed on
    a cell, which can only happen when a key was deleted more times than it
    was inserted — the one misuse a counting filter cannot absorb."""
    c = counters(sketch)
    if len(c) and int(c.min()) < 0:
        bad = int((c < 0).sum())
        raise ValueError(
            f"counting bloom filter has {bad} negative counters: some keys "
            "were deleted more times than they were inserted"
        )


def might_contain(sketch: bytes, hashes: np.ndarray) -> np.ndarray:
    """Boolean per hash: all k counters > 0. No false negatives for any key
    whose net insert count is positive; false-positive rate as a plain Bloom
    filter with the same (m, k) fill."""
    validate(sketch)
    m, k, _ = params(sketch)
    c = counters(sketch)
    h = np.ascontiguousarray(hashes, dtype=np.uint64)
    if not len(h):
        return np.zeros(0, dtype=bool)
    pos = _positions(h, m, k)                        # (k, n)
    return (c[pos] > 0).all(axis=0)


def fill_ratio(sketch: bytes) -> float:
    c = counters(sketch)
    return float((c > 0).mean()) if len(c) else 0.0
