"""Shared binary envelope for all sketch states.

Every sketch travels across Spark boundaries (Arrow batches, shuffle, driver
collect) as a BinaryType cell with a stable, versioned envelope:

    byte 0-1  magic  b"HS"
    byte 2    version (1)
    byte 3    kind    (1=HLL, 2=CMS, 3=BLOOM, 4=KLL, 5=TDIGEST, 6=THETA,
                       7=COUNTSKETCH, 8=CBF counting bloom)
    byte 4..  kind-specific header + payload

The reference keeps state internal-only (/root/reference/HyperLogLog/
EstimatorState.cs:5-12, GetState at HyperLogLog.cs:894-903); an explicit codec
is mandatory for us because partial sketches cross executor/driver boundaries.
"""

from __future__ import annotations

MAGIC = b"HS"
VERSION = 1

KIND_HLL = 1
KIND_CMS = 2
KIND_BLOOM = 3
KIND_KLL = 4
KIND_TDIGEST = 5
KIND_THETA = 6
KIND_COUNTSKETCH = 7
KIND_CBF = 8
KIND_FD = 9


def pack_header(kind: int) -> bytes:
    return MAGIC + bytes((VERSION, kind))


def check_header(buf: bytes, kind: int) -> memoryview:
    """Validate the envelope, return a memoryview past it."""
    if len(buf) < 4 or buf[:2] != MAGIC:
        raise ValueError("not a hyperloglog_spark sketch (bad magic)")
    if buf[2] != VERSION:
        raise ValueError(f"unsupported sketch codec version {buf[2]}")
    if buf[3] != kind:
        raise ValueError(f"sketch kind mismatch: expected {kind}, got {buf[3]}")
    return memoryview(buf)[4:]


def sketch_kind(buf: bytes) -> int:
    if len(buf) < 4 or buf[:2] != MAGIC:
        raise ValueError("not a hyperloglog_spark sketch (bad magic)")
    return buf[3]
