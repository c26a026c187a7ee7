"""Deterministic synthetic multi-turn conversation transcripts.

Schema per BASELINE.json input_hint:
    conv_id string | turn_idx int | role string | text string |
    tool string (nullable) | ts timestamp

Generation rules per FIXTURES.md §1 — pure function of (seed, n_turns,
n_convs): Zipf(1.2) conv skew (hot conversations own a large share of turns),
role cycle with weights, lognormal text lengths with ~2% exact duplicates,
Zipf tool heavy hitters, exp(8s) per-turn latency. Fully vectorized numpy;
writes multi-file parquet so Spark gets real parallelism.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

ROLES = np.array(["user", "assistant", "tool", "system"])
ROLE_W = np.array([0.35, 0.40, 0.20, 0.05])
TOOLS = np.array([
    "search", "bash", "read_file", "write_file", "edit", "browser",
    "python", "sql", "fetch_url", "calculator", "grep", "schedule",
])
_WORDS = np.array([
    f"w{i:03d}" for i in range(512)
])

EPOCH_2024 = np.datetime64("2024-01-01T00:00:00", "us")


def generate(
    n_turns: int,
    n_convs: int,
    seed: int = 42,
    conv_offset: int = 0,
) -> pa.Table:
    rng = np.random.default_rng(seed)

    # conv per turn ~ Zipf(1.2) over n_convs
    ranks = np.arange(1, n_convs + 1, dtype=np.float64)
    w = ranks ** -1.2
    w /= w.sum()
    conv_of_turn = rng.choice(n_convs, size=n_turns, p=w)

    # order turns by conversation; turn_idx = cumcount within conv
    order = np.argsort(conv_of_turn, kind="stable")
    conv_sorted = conv_of_turn[order]
    starts = np.concatenate(([0], np.flatnonzero(np.diff(conv_sorted)) + 1))
    turn_idx = np.arange(n_turns, dtype=np.int64)
    turn_idx -= np.repeat(turn_idx[starts], np.diff(np.append(starts, n_turns)))

    conv_id = np.char.add(
        "conv-", np.char.zfill((conv_sorted + conv_offset).astype("U8"), 8)
    )

    role = rng.choice(ROLES, size=n_turns, p=ROLE_W)

    # text: token sampling, lognormal char-length target, ~2% duplicates
    target_chars = rng.lognormal(4.0, 0.8, size=n_turns)
    n_words = np.maximum((target_chars / 5).astype(np.int64), 1)
    total_words = int(n_words.sum())
    word_ids = rng.integers(0, len(_WORDS), size=total_words)
    bounds = np.concatenate(([0], np.cumsum(n_words))).astype(np.int32)
    flat = pa.array(_WORDS).take(pa.array(word_ids))  # gather, no py objects
    word_lists = pa.ListArray.from_arrays(pa.array(bounds), flat)
    import pyarrow.compute as pc

    text = pc.binary_join(word_lists, " ")
    dup_mask = rng.random(n_turns) < 0.02
    dup_pool = rng.integers(0, n_turns, size=int(dup_mask.sum()))
    take_idx = np.arange(n_turns, dtype=np.int64)
    take_idx[np.flatnonzero(dup_mask)] = dup_pool
    text = text.take(pa.array(take_idx))

    # tool: only for tool-role turns, Zipf-weighted heavy hitters
    tw = np.arange(1, len(TOOLS) + 1, dtype=np.float64) ** -1.5
    tw /= tw.sum()
    tool = np.full(n_turns, None, dtype=object)
    tool_rows = np.flatnonzero(role == "tool")
    tool[tool_rows] = rng.choice(TOOLS, size=len(tool_rows), p=tw)

    # ts: per-conv uniform start over 30 days + cumulative exp(8s) latency
    conv_start_us = rng.integers(0, 30 * 86400, size=n_convs) * 1_000_000
    lat_us = (rng.exponential(8.0, size=n_turns) * 1e6).astype(np.int64) + 1
    cum = np.cumsum(lat_us)
    seg_base = cum[starts] - lat_us[starts]
    ts_us = (
        conv_start_us[conv_sorted]
        + cum
        - np.repeat(seg_base, np.diff(np.append(starts, n_turns)))
    )
    ts = EPOCH_2024 + ts_us.astype("timedelta64[us]")

    return pa.table({
        "conv_id": pa.array(conv_id),
        "turn_idx": pa.array(turn_idx, pa.int32()),
        "role": pa.array(role),
        "text": text,
        "tool": pa.array(tool),
        "ts": pa.array(ts, pa.timestamp("us")),
    })


def _write_chunk(args: tuple) -> int:
    """Generate + shuffle + write one chunk's files (process-pool worker).
    Pure function of its spec, so pool scheduling order cannot change the
    output bytes."""
    path, turns_c, convs_c, chunk_seed, shuffle_seed, conv_offset, \
        file_start, k = args
    tbl = generate(turns_c, convs_c, chunk_seed, conv_offset=conv_offset)
    rng = np.random.default_rng(shuffle_seed)
    tbl = tbl.take(pa.array(rng.permutation(tbl.num_rows)))
    sz = -(-tbl.num_rows // k)
    written = 0
    for j in range(k):
        part = tbl.slice(j * sz, sz)
        if part.num_rows:
            pq.write_table(
                part, f"{path}/part-{file_start + written:04d}.parquet"
            )
            written += 1
    return written


def write(
    path: str,
    n_turns: int,
    n_convs: int,
    seed: int = 42,
    n_files: int = 8,
    chunk_turns: int = 4_000_000,
    parallel: int | None = None,
) -> str:
    """Write a multi-file parquet directory; returns the path.

    Rows are row-shuffled before splitting so conversations span files —
    the realistic (and adversarial for ordering invariants) layout.
    Chunks are generated by a process pool (``parallel`` workers, default
    min(16, cpus)); every chunk is a pure function of its precomputed spec
    (seed, conv offset, file indices), so the output is byte-identical to
    the sequential order regardless of scheduling.
    """
    os.makedirs(path, exist_ok=True)
    # generate in <=4M-turn chunks with disjoint conv-id namespaces: one
    # shot at 64M turns overflows Arrow's int32 string offsets
    CHUNK = chunk_turns
    n_chunks = -(-n_turns // CHUNK)
    files_per_chunk = -(-n_files // n_chunks)
    specs = []
    convs_so_far = 0  # accumulated offset: chunk conv-id namespaces must be
    # disjoint even when the last chunk is smaller (a per-chunk ci*convs_c
    # offset would overlap earlier ranges and shrink the distinct-conv count)
    file_i = 0
    for ci in range(n_chunks):
        turns_c = min(CHUNK, n_turns - ci * CHUNK)
        convs_c = max(1, round(n_convs * turns_c / n_turns))
        # every chunk writes >= 1 file; when chunks outnumber n_files the
        # clamp matters (the old `or 1` let k go NEGATIVE there, silently
        # dropping the leading chunks' data)
        k = max(1, min(files_per_chunk, n_files - (n_chunks - 1 - ci)))
        specs.append((path, turns_c, convs_c, seed + ci * 7919,
                      seed + 1 + ci, convs_so_far, file_i, k))
        convs_so_far += convs_c
        # file index advance assumes every slice is non-empty (true for
        # turns_c >= k, i.e. any non-degenerate chunking)
        file_i += k
    if parallel is None:
        parallel = min(16, os.cpu_count() or 1)
    if parallel <= 1 or len(specs) == 1:
        for sp in specs:
            _write_chunk(sp)
    else:
        from concurrent.futures import ProcessPoolExecutor

        with ProcessPoolExecutor(max_workers=parallel) as ex:
            list(ex.map(_write_chunk, specs))
    return path


SCALES = {
    "t1": dict(n_turns=10_000, n_convs=1_000),
    "t2": dict(n_turns=200_000, n_convs=20_000),
    "bench": dict(n_turns=2_000_000, n_convs=150_000),
}
