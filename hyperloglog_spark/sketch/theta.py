"""Theta sketch: bottom-k distinct sketch closed under set operations.

The KMV/bottom-k state (the same state ``pipeline.sampling.kmv_distinct``
computes) generalized into the theta-sketch form (Dasgupta, Lang, Rhodes,
Thaler, "Theta Sketch Framework", 2016; Bar-Yossef et al. 2002): a sketch
is ``(theta, K)`` where ``K`` is the set of retained distinct hash keys,
every retained key hashes strictly below ``theta``, and ``|K| / theta``
estimates the number of distinct items. Unlike HLL — whose register-max
state supports only union, forcing lossy inclusion-exclusion for
intersections — the theta state is CLOSED under union, intersection, and
set difference, with relative standard error roughly
``sqrt(union/result) / sqrt(k)`` for the derived sets.

Conventions (exclusive theta):

- build from n distinct keys: if ``n <= k`` the sketch is EXACT
  (``theta = 1``, all keys retained, estimate = n). Otherwise retain the
  k smallest and set ``theta`` to the (k+1)-th smallest key — so every
  retained key is strictly below theta and ``k / theta`` is the unbiased
  ``(k'-1)/U_{k'}`` estimator with ``k' = k+1``.
- union: concatenate, dedupe, drop keys >= min(theta_a, theta_b),
  re-clip to the k smallest (theta becomes the (k+1)-th if clipped).
  Associative + commutative — the min-k merge law.
- intersect / a_not_b: ``theta = min(theta_a, theta_b)``; keep keys of
  the set expression that are < theta; estimate = count / theta. Exact
  iff both inputs are exact.

Key domains (``mode`` byte): 0 = full signed-int64 (``F.xxhash64``,
fraction-below(key) = (key + 2^63) / 2^64); 1 = 60-bit non-negative
(top-15-hex-digit md5 — fraction-below(key) = key / 2^60), bit-
reproducible in any ANSI SQL engine, which is what makes the driver-gate
oracles replay the estimates exactly.

The reference ships only HLL (union-only merge at
/root/reference/HyperLogLog/HyperLogLog.cs:733-781); theta is the
extension that answers the intersection/difference queries HLL cannot.

Serialized layout after the 4-byte codec envelope (little-endian):

    u8 mode | u8 is_exact | u16 zero | u32 k | i64 theta_key | i64 n
    | n * i64 sorted keys
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

from .codec import KIND_THETA, check_header, pack_header

MODE_I64 = 0   # xxhash64: keys uniform over [-2^63, 2^63)
MODE_U60 = 1   # md5 top-60-bit: keys uniform over [0, 2^60)

_HDR = struct.Struct("<BBHIqq")
_DOMAIN_U60 = float(1 << 60)
_TWO63 = float(2 ** 63)
_TWO64 = float(2 ** 64)

DEFAULT_K = 4096


@dataclass(frozen=True, eq=False)
class ThetaState:
    mode: int
    k: int
    is_exact: bool
    theta_key: int          # meaningless when is_exact
    keys: np.ndarray        # sorted int64, strictly < theta_key unless exact

    def __eq__(self, other: object) -> bool:
        if not isinstance(other, ThetaState):
            return NotImplemented
        return (
            self.mode == other.mode
            and self.k == other.k
            and self.is_exact == other.is_exact
            and (self.is_exact or self.theta_key == other.theta_key)
            and np.array_equal(self.keys, other.keys)
        )

    @property
    def theta_frac(self) -> float:
        """P(hash key < theta_key) under the mode's uniform domain."""
        if self.is_exact:
            return 1.0
        if self.mode == MODE_U60:
            return float(self.theta_key) / _DOMAIN_U60
        return (float(self.theta_key) + _TWO63) / _TWO64


def _validate_k(k: int) -> None:
    if k < 2:
        raise ValueError(f"theta sketch k must be >= 2: {k}")


def build(hashes: np.ndarray, k: int = DEFAULT_K, mode: int = MODE_I64) -> bytes:
    """Sketch an array of int64 hash keys (duplicates fine)."""
    _validate_k(k)
    uniq = np.unique(np.asarray(hashes, dtype=np.int64))
    if uniq.size <= k:
        return _encode(ThetaState(mode, k, True, 0, uniq))
    return _encode(
        ThetaState(mode, k, False, int(uniq[k]), uniq[:k].copy())
    )


def _encode(st: ThetaState) -> bytes:
    return (
        pack_header(KIND_THETA)
        + _HDR.pack(st.mode, int(st.is_exact), 0, st.k,
                    st.theta_key, st.keys.size)
        + st.keys.astype("<i8").tobytes()
    )


def decode(buf: bytes) -> ThetaState:
    mv = check_header(bytes(buf), KIND_THETA)
    mode, is_exact, _, k, theta_key, n = _HDR.unpack_from(mv, 0)
    keys = np.frombuffer(mv, dtype="<i8", count=n, offset=_HDR.size).astype(
        np.int64
    )
    return ThetaState(mode, k, bool(is_exact), theta_key, keys)


def _clip(mode: int, k: int, keys: np.ndarray,
          is_exact: bool, theta_key: int) -> ThetaState:
    """Re-establish the |keys| <= k invariant after a set operation."""
    if keys.size > k:
        return ThetaState(mode, k, False, int(keys[k]), keys[:k].copy())
    return ThetaState(mode, k, is_exact, theta_key, keys)


def _common(a: ThetaState, b: ThetaState) -> tuple[int, int, bool, int]:
    if a.mode != b.mode:
        raise ValueError(
            f"cannot combine theta sketches of different key domains "
            f"(mode {a.mode} vs {b.mode})"
        )
    k = min(a.k, b.k)
    both_exact = a.is_exact and b.is_exact
    if both_exact:
        theta_key = 0
    elif a.is_exact:
        theta_key = b.theta_key
    elif b.is_exact:
        theta_key = a.theta_key
    else:
        theta_key = min(a.theta_key, b.theta_key)
    return a.mode, k, both_exact, theta_key


def _below(keys: np.ndarray, is_exact: bool, theta_key: int) -> np.ndarray:
    return keys if is_exact else keys[keys < theta_key]


def union(a_buf: bytes, b_buf: bytes) -> bytes:
    a, b = decode(a_buf), decode(b_buf)
    mode, k, both_exact, theta_key = _common(a, b)
    merged = np.union1d(
        _below(a.keys, both_exact, theta_key),
        _below(b.keys, both_exact, theta_key),
    )
    return _encode(_clip(mode, k, merged, both_exact, theta_key))


def union_many(bufs: list[bytes]) -> bytes:
    if not bufs:
        raise ValueError("union_many of zero sketches")
    out = bufs[0]
    for nxt in bufs[1:]:
        out = union(out, nxt)
    return out


def intersect(a_buf: bytes, b_buf: bytes) -> bytes:
    a, b = decode(a_buf), decode(b_buf)
    mode, k, both_exact, theta_key = _common(a, b)
    common = np.intersect1d(a.keys, b.keys, assume_unique=True)
    return _encode(
        _clip(mode, k, _below(common, both_exact, theta_key),
              both_exact, theta_key)
    )


def a_not_b(a_buf: bytes, b_buf: bytes) -> bytes:
    a, b = decode(a_buf), decode(b_buf)
    mode, k, both_exact, theta_key = _common(a, b)
    diff = np.setdiff1d(a.keys, b.keys, assume_unique=True)
    return _encode(
        _clip(mode, k, _below(diff, both_exact, theta_key),
              both_exact, theta_key)
    )


def estimate(buf: bytes) -> int:
    """Distinct-count estimate, floored to a long (exact when theta=1).

    The floor(count / theta_frac) arithmetic is one IEEE double divide —
    in MODE_U60 any ANSI engine replays it bit-for-bit, which is how the
    driver-gate oracles verify these estimates exactly.
    """
    st = decode(buf)
    if st.is_exact:
        return int(st.keys.size)
    return int(np.floor(st.keys.size / st.theta_frac))


def estimate_f(buf: bytes) -> float:
    st = decode(buf)
    return float(st.keys.size) if st.is_exact else st.keys.size / st.theta_frac


def jaccard(a_buf: bytes, b_buf: bytes) -> float:
    """Jaccard similarity from the two states (1.0 for two empty sets)."""
    u = estimate_f(union(a_buf, b_buf))
    if u == 0.0:
        return 1.0
    return estimate_f(intersect(a_buf, b_buf)) / u
