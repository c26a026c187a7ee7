"""Approximate-nearest-neighbor search over an embedding column.

Two paths:

- ``brute_force_topk`` — the exact baseline. The (small) query set is
  collected once and broadcast inside the Arrow UDF closure as a dense
  float64 matrix; each corpus batch does ONE numpy matmul, keeps its local
  top-k per query, and only #partitions × #queries × k candidate rows ever
  reach the final per-query merge. At 100 TB the scan dominates and the
  reduction is output-bounded — this is the classic distributed-topk shape.
- ``lsh_topk`` — the scale path: random-hyperplane signatures bucket the
  corpus; queries probe their own bucket plus all 1-bit-flip neighbors
  (multiprobe), candidates are exactly re-ranked. Join-based, no
  all-pairs; recall vs the brute-force baseline is asserted in tests.

Scores cross engine boundaries as ``floor(1000 * cosine)`` integers
(permille) to keep comparisons float-free; ties break on neighbor id.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _vec_matrix(arr: pa.Array) -> np.ndarray:
    """list<float> column -> (n, d) float64 matrix (zero-copy flat)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    offsets = arr.offsets.to_numpy(zero_copy_only=False)
    d = int(offsets[1] - offsets[0]) if len(offsets) > 1 else 0
    flat = arr.values.to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(-1, d)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


_CAND_SCHEMA = T.StructType([
    T.StructField("query_id", T.LongType(), False),
    T.StructField("neighbor_id", T.LongType(), False),
    T.StructField("score_permille", T.LongType(), False),
])

_TOPK_SCHEMA = T.StructType([
    T.StructField("query_id", T.LongType(), False),
    T.StructField("rank", T.IntegerType(), False),
    T.StructField("neighbor_id", T.LongType(), False),
    T.StructField("score_permille", T.LongType(), False),
])


def _topk_merge(k: int):
    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["score_permille", "neighbor_id"], ascending=[False, True]
        ).head(k)
        pdf = pdf.reset_index(drop=True)
        pdf["rank"] = np.arange(1, len(pdf) + 1, dtype=np.int32)
        return pdf[["query_id", "rank", "neighbor_id", "score_permille"]]

    return merge


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    exclude_self: bool = True,
) -> DataFrame:
    """Exact cosine top-k of each query vector against the corpus.

    Returns (query_id, rank, neighbor_id, score_permille), rank 1..k by
    descending cosine, ties broken by ascending neighbor id.
    """
    q_rows = queries.select(id_col, vec_col).collect()
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    q_mat = _normalize(np.array([r[1] for r in q_rows], dtype=np.float64))

    proj = corpus.select(F.col(id_col), F.col(vec_col))
    local_k = k + (1 if exclude_self else 0)

    def scan(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            if batch.num_rows == 0:
                continue
            ids = batch.column(0).to_numpy(zero_copy_only=False).astype(np.int64)
            mat = _normalize(_vec_matrix(batch.column(1)))
            scores = mat @ q_mat.T                       # (n, q)
            pm = np.floor(scores * 1000.0).astype(np.int64)
            n = len(ids)
            take = min(local_k, n)
            out_q, out_n, out_s = [], [], []
            for qi in range(len(q_ids)):
                # local top-k under the FINAL ordering (permille desc, id
                # asc) — selecting on raw floats could drop a permille-tied
                # candidate the global merge would have ranked
                order = np.lexsort((ids, -pm[:, qi]))[:take]
                out_q.append(np.full(take, q_ids[qi], dtype=np.int64))
                out_n.append(ids[order])
                out_s.append(pm[order, qi])
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(np.concatenate(out_q), pa.int64()),
                    pa.array(np.concatenate(out_n), pa.int64()),
                    pa.array(np.concatenate(out_s), pa.int64()),
                ],
                names=["query_id", "neighbor_id", "score_permille"],
            )

    cands = proj.mapInArrow(
        scan, "query_id bigint, neighbor_id bigint, score_permille bigint"
    )
    if exclude_self:
        cands = cands.filter(F.col("query_id") != F.col("neighbor_id"))
    return (
        cands.groupBy("query_id")
        .applyInPandas(_topk_merge(k), _TOPK_SCHEMA)
        .orderBy("query_id", "rank")
    )


def _signatures(mat: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Bit-pack the sign pattern of mat @ planes into int64 buckets."""
    bits = (mat @ planes) > 0                              # (n, nbits)
    weights = (1 << np.arange(planes.shape[1], dtype=np.int64))
    return bits.astype(np.int64) @ weights


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    nbits: int = 10,
    dim: int | None = None,
    seed: int = 77,
    exclude_self: bool = True,
) -> DataFrame:
    """LSH-bucketed approximate top-k: hyperplane buckets + 1-bit multiprobe
    + exact re-rank of candidates. Same output shape as brute_force_topk."""
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, nbits))

    def corpus_sig(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            if batch.num_rows == 0:
                continue
            ids = batch.column(0).to_numpy(zero_copy_only=False).astype(np.int64)
            mat = _normalize(_vec_matrix(batch.column(1)))
            sig = _signatures(mat, planes)
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, pa.int64()), pa.array(sig, pa.int64()),
                 batch.column(1)],
                names=[id_col, "bucket", vec_col],
            )

    vec_t = next(
        f.dataType.simpleString() for f in corpus.schema.fields
        if f.name == vec_col
    )
    corpus_b = corpus.select(id_col, vec_col).mapInArrow(
        corpus_sig, f"{id_col} bigint, bucket bigint, {vec_col} {vec_t}"
    )

    # queries: explode own bucket + all 1-bit flips (multiprobe)
    q_rows = queries.select(id_col, vec_col).collect()
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    q_mat_raw = np.array([r[1] for r in q_rows], dtype=np.float64)
    q_sig = _signatures(_normalize(q_mat_raw), planes)
    probe_rows = []
    for qi, s in zip(q_ids, q_sig):
        probe_rows.append((int(qi), int(s)))
        for b in range(nbits):
            probe_rows.append((int(qi), int(s ^ (1 << b))))
    spark = corpus.sparkSession
    probes = spark.createDataFrame(probe_rows, ["query_id", "bucket"])

    qvec = {int(i): v for i, v in zip(q_ids, _normalize(q_mat_raw))}

    cand = corpus_b.join(F.broadcast(probes), "bucket").select(
        "query_id", F.col(id_col).alias("neighbor_id"), vec_col
    )
    if exclude_self:
        cand = cand.filter(F.col("query_id") != F.col("neighbor_id"))

    def rerank(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            if batch.num_rows == 0:
                continue
            qids = batch.column(0).to_numpy(zero_copy_only=False).astype(np.int64)
            nids = batch.column(1).to_numpy(zero_copy_only=False).astype(np.int64)
            mat = _normalize(_vec_matrix(batch.column(2)))
            qm = np.stack([qvec[int(q)] for q in np.unique(qids)])
            lookup = {int(q): i for i, q in enumerate(np.unique(qids))}
            rows = np.array([lookup[int(q)] for q in qids])
            scores = np.einsum("ij,ij->i", mat, qm[rows])
            yield pa.RecordBatch.from_arrays(
                [pa.array(qids, pa.int64()), pa.array(nids, pa.int64()),
                 pa.array(np.floor(scores * 1000.0).astype(np.int64),
                          pa.int64())],
                names=["query_id", "neighbor_id", "score_permille"],
            )

    scored = cand.mapInArrow(
        rerank, "query_id bigint, neighbor_id bigint, score_permille bigint"
    ).dropDuplicates(["query_id", "neighbor_id"])
    return (
        scored.groupBy("query_id")
        .applyInPandas(_topk_merge(k), _TOPK_SCHEMA)
        .orderBy("query_id", "rank")
    )
