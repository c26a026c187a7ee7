"""Bloom filter kernel: vectorized bitset, OR-merge, membership probes.

Standard Bloom filter (Bloom 1970; double hashing per Kirsch & Mitzenmacher
2006: position_j = h1 + j*h2 mod m). Not present in the reference — added per
BASELINE.json north_star as a mergeable BinaryType aggregator sharing the HLL
two-phase skeleton (SURVEY.md §2.4).

Codec:  header(4) | k(1) | m_bits(uint32 LE) | n_added(uint64 LE) | bitset
Merge:  bitwise OR (associative, commutative, idempotent); n_added is summed
        (upper bound on distinct adds, used only for FPP reporting).
"""

from __future__ import annotations

import math
import struct

import numpy as np

from .codec import KIND_BLOOM, check_header, pack_header

U64 = np.uint64

DEFAULT_M_BITS = 1 << 20
DEFAULT_K = 7

_HDR = struct.Struct("<BIQ")


def optimal_params(expected_items: int, fpp: float = 0.01) -> tuple[int, int]:
    """(m_bits, k) minimizing memory for a target false-positive rate."""
    if expected_items <= 0:
        raise ValueError("expected_items must be positive")
    m = max(64, int(math.ceil(-expected_items * math.log(fpp) / (math.log(2) ** 2))))
    m = 1 << (m - 1).bit_length()  # round up to power of two
    k = max(1, round(m / expected_items * math.log(2)))
    return m, min(k, 30)


def _positions(hashes: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(k, n) bit positions via double hashing; m_bits must be a power of 2."""
    h = np.ascontiguousarray(hashes, dtype=np.uint64)
    h1 = h
    h2 = (h >> U64(32)) | U64(1)  # odd -> full-period stride mod 2^b
    mask = U64(m_bits - 1)
    js = np.arange(k, dtype=np.uint64)[:, None]
    with np.errstate(over="ignore"):
        return ((h1[None, :] + js * h2[None, :]) & mask).astype(np.int64)


def empty(m_bits: int = DEFAULT_M_BITS, k: int = DEFAULT_K) -> bytes:
    if m_bits < 8 or m_bits & (m_bits - 1):
        raise ValueError(f"m_bits must be a power of two >= 8, got {m_bits}")
    if not 1 <= k <= 30:
        raise ValueError(f"k must be in [1, 30], got {k}")
    return (
        pack_header(KIND_BLOOM)
        + _HDR.pack(k, m_bits, 0)
        + bytes(m_bits // 8)
    )


def params(sketch: bytes) -> tuple[int, int, int]:
    """(m_bits, k, n_added)."""
    body = check_header(sketch, KIND_BLOOM)
    k, m_bits, n = _HDR.unpack_from(body, 0)
    return m_bits, k, n


def bitset(sketch: bytes) -> np.ndarray:
    body = check_header(sketch, KIND_BLOOM)
    _, m_bits, _ = _HDR.unpack_from(body, 0)
    bits = np.frombuffer(body[_HDR.size:], dtype=np.uint8)
    if len(bits) != m_bits // 8:
        raise ValueError("bloom payload length mismatch")
    return bits


def from_hashes(
    hashes: np.ndarray, m_bits: int = DEFAULT_M_BITS, k: int = DEFAULT_K
) -> bytes:
    sk = empty(m_bits, k)
    return update(sk, hashes)


def update(sketch: bytes, hashes: np.ndarray) -> bytes:
    m_bits, k, n = params(sketch)
    bits = bitset(sketch).copy()
    pos = _positions(hashes, m_bits, k).ravel()
    np.bitwise_or.at(bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
    return (
        pack_header(KIND_BLOOM)
        + _HDR.pack(k, m_bits, n + len(np.atleast_1d(hashes)))
        + bits.tobytes()
    )


def merge_many(sketches) -> bytes:
    sketches = [s for s in sketches if s is not None]
    if not sketches:
        raise ValueError("merge_many needs at least one sketch")
    m_bits, k, n = params(sketches[0])
    acc = bitset(sketches[0]).copy()
    for s in sketches[1:]:
        mb, kk, nn = params(s)
        if (mb, kk) != (m_bits, k):
            raise ValueError(
                f"cannot merge bloom filters with different params: "
                f"({m_bits},{k}) vs ({mb},{kk})"
            )
        acc |= bitset(s)
        n += nn
    return pack_header(KIND_BLOOM) + _HDR.pack(k, m_bits, n) + acc.tobytes()


def might_contain(sketch: bytes, hashes: np.ndarray) -> np.ndarray:
    """Vectorized membership probe -> bool[n]. No false negatives."""
    m_bits, k, _ = params(sketch)
    bits = bitset(sketch)
    pos = _positions(hashes, m_bits, k)  # (k, n)
    probed = (bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
    return probed.all(axis=0)


def fill_ratio(sketch: bytes) -> float:
    from .hashing import popcount64

    bits = bitset(sketch)
    n64 = len(bits) // 8
    ones = int(popcount64(np.frombuffer(bits[: n64 * 8], dtype=np.uint64)).sum())
    m_bits, _, _ = params(sketch)
    return ones / m_bits


def expected_fpp(sketch: bytes) -> float:
    """Actual expected false-positive rate given the observed fill ratio."""
    _, k, _ = params(sketch)
    return fill_ratio(sketch) ** k
