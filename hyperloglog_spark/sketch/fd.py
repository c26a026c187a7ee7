"""Frequent Directions matrix sketch: mergeable low-rank covariance summary.

Liberty 2013 (KDD) / Ghashami, Liberty, Phillips & Woodruff 2015 (SIAM J.
Comput.) — the deterministic matrix analogue of Misra-Gries: maintain an
ell x d row buffer B such that

    0  <=  A^T A - B^T B  <=  delta_sum * I        (PSD order)

where delta_sum (tracked in the state) is the cumulative shrinkage and is
bounded by ||A||_F^2 / ell. The sketch is MERGEABLE (ibid. §3): concatenate
the two buffers and re-shrink — which is exactly how it rides this repo's
two-phase pipeline (per-partition partials, associative re-shrink merge).
Not in the reference (HLL only); added for the embedding-pipeline family:
B^T B approximates the corpus Gram/covariance for PCA whitening, spectral
diagnostics, and IVF/LSH plane seeding without ever materializing the d x d
covariance from 10^12 rows.

Unlike the hash sketches, FD bytes are NOT partition-invariant (the buffer
depends on arrival order); what is invariant is the certificate above —
delta_sum rides the state, so every merged sketch carries its own proven
error bound. In the exact regime (total rows <= buffer capacity 2*ell) no
shrink ever fires, delta_sum == 0, and B^T B == A^T A exactly — with
integer-grid inputs, bit-exactly (all float64 sums are exact integers).

Codec: header(4) | ell u16 | dim u16 | nrows u16 | delta_sum f64 | fro2 f64
       | float64[nrows * dim] LE
"""

from __future__ import annotations

import struct

import numpy as np

from .codec import KIND_FD, check_header, pack_header

_HDR = struct.Struct("<HHHdd")

DEFAULT_ELL = 64


def empty(ell: int = DEFAULT_ELL, dim: int = 0) -> bytes:
    if not 1 <= ell <= 4096:
        raise ValueError(f"ell must be in [1, 4096], got {ell}")
    if not 0 <= dim <= 65535:
        raise ValueError(f"dim must be in [0, 65535], got {dim}")
    return pack_header(KIND_FD) + _HDR.pack(ell, dim, 0, 0.0, 0.0)


def params(sketch: bytes) -> tuple[int, int, int, float, float]:
    """(ell, dim, nrows, delta_sum, fro2). delta_sum certifies
    ||A^T A - B^T B||_2 <= delta_sum; fro2 = ||A||_F^2 of everything fed."""
    body = check_header(sketch, KIND_FD)
    return _HDR.unpack_from(body, 0)


def rows(sketch: bytes) -> np.ndarray:
    body = check_header(sketch, KIND_FD)
    ell, dim, n, _, _ = _HDR.unpack_from(body, 0)
    buf = np.frombuffer(body[_HDR.size:], dtype="<f8")
    if len(buf) != n * dim:
        raise ValueError("fd payload length mismatch")
    return buf.reshape(n, dim)


def _pack(ell: int, dim: int, buf: np.ndarray, delta: float,
          fro2: float) -> bytes:
    return pack_header(KIND_FD) + _HDR.pack(ell, dim, len(buf), delta, fro2) \
        + np.ascontiguousarray(buf, dtype="<f8").tobytes()


def _shrink(buf: np.ndarray, ell: int) -> tuple[np.ndarray, float]:
    """SVD shrink to <= ell rows; returns (new buffer, delta added)."""
    _, s, vt = np.linalg.svd(buf, full_matrices=False)
    if len(s) <= ell:
        delta = 0.0
        keep = s
        v = vt
    else:
        delta = float(s[ell] ** 2)
        keep = np.sqrt(np.maximum(s[:ell] ** 2 - delta, 0.0))
        v = vt[:ell]
    nz = keep > 0
    return keep[nz, None] * v[nz], delta


def append(sketch: bytes, mat: np.ndarray) -> bytes:
    """Feed rows. Chunked so intermediate SVDs stay O(ell x d) regardless of
    batch size: the buffer is capped at 2*ell rows and shrunk to <= ell."""
    ell, dim, n, delta, fro2 = params(sketch)
    mat = np.atleast_2d(np.asarray(mat, dtype=np.float64))
    if mat.size == 0:
        return bytes(sketch)
    if dim == 0:
        dim = mat.shape[1]
    if mat.shape[1] != dim:
        raise ValueError(f"dim mismatch: sketch {dim}, batch {mat.shape[1]}")
    buf = rows(sketch).copy() if n else np.zeros((0, dim))
    fro2 += float((mat * mat).sum())
    cap = 2 * ell
    pos = 0
    while pos < len(mat):
        take = min(cap - len(buf), len(mat) - pos)
        buf = np.vstack([buf, mat[pos: pos + take]])
        pos += take
        if len(buf) >= cap and pos < len(mat):
            buf, d = _shrink(buf, ell)
            delta += d
    if len(buf) > cap:
        buf, d = _shrink(buf, ell)
        delta += d
    return _pack(ell, dim, buf, delta, fro2)


def merge_many(sketches) -> bytes:
    """Concatenate-and-reshrink (Ghashami et al. 2015 §3): the error
    certificates ADD, so the merged delta_sum still bounds the merged
    Gram error. Commutative/associative up to the certificate (bytes vary
    with order; the bound does not)."""
    it = iter(sketches)
    first = bytes(next(it))
    ell, dim, _, delta, fro2 = params(first)
    buf = rows(first).copy()
    for s in it:
        ell2, dim2, n2, d2, f2 = params(s)
        if ell2 != ell:
            raise ValueError(f"cannot merge fd(ell={ell2}) into fd(ell={ell})")
        if n2 == 0:
            continue
        if dim == 0:
            dim, buf = dim2, np.zeros((0, dim2))
        if dim2 != dim:
            raise ValueError(f"dim mismatch: {dim} vs {dim2}")
        buf = np.vstack([buf, rows(s)])
        delta += d2
        fro2 += f2
        if len(buf) > 2 * ell:
            buf, d = _shrink(buf, ell)
            delta += d
    return _pack(ell, dim, buf, delta, fro2)


def gram(sketch: bytes) -> np.ndarray:
    """B^T B (d x d): the covariance estimate. Satisfies
    0 <= A^T A - gram <= delta_sum * I in the PSD order."""
    b = rows(sketch)
    _, dim, n, _, _ = params(sketch)
    if n == 0:
        return np.zeros((dim, dim))
    return b.T @ b
