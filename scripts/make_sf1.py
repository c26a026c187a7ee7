"""Deterministic sf1 synthesis for the suite bench (VERDICT r3 #5).

No sf1 parquet exists under /root/testdata (and it is read-only), so sf1
is tiled 10x from sf0.1 — deterministically, no external data — into
``.bench_cache/sf1``. Each replica r in 0..9 (r=0 = the original rows):

- keys offset per replica so cardinalities scale 10x (events user_id
  +10k/replica -> 15k distinct users at sf1, matching the sf ratio);
- documents.text vowel-TRANSLATED per replica (translate is in-codegen
  and length-preserving): replica texts share almost no word 3-grams, so
  the near-dup/Jaccard benches scale ~linearly in docs like real data
  would — naive replication would make every doc a 10-way near-dup
  family and blow pair counts up quadratically;
- embeddings sign-flipped per replica on a hash-keyed coordinate mask
  (norms and distributions preserved, cross-replica cosine destroyed),
  for the same reason on the ANN/embedding-neardup benches.

Dimension tables are copied verbatim (dims do not scale with sf).

Usage: python scripts/make_sf1.py   (writes .bench_cache/sf1/*.parquet)
Then:  SPARK_GRAFT_SF_DIR=$PWD/.bench_cache/sf1 python bench.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DST = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".bench_cache", "sf1",
)
REPLICAS = 10

# per-replica vowel targets (replica 0 = identity)
VOWEL_MAPS = ["aeiou", "eioua", "iouae", "ouaei", "uaeio",
              "bcdfg", "cdfgh", "dfghj", "fghjk", "ghjkl"]


def main() -> None:
    from pyspark.sql import functions as F

    from hyperloglog_spark.engine.session import get_spark

    spark = get_spark("make_sf1", master="local[32]",
                      shuffle_partitions=32)

    def replicate(name, transform):
        parts = []
        for r in range(REPLICAS):
            df = spark.read.parquet(f"{SRC}/{name}.parquet")
            parts.append(transform(df, r))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        (out.repartition(32)
            .write.mode("overwrite").parquet(f"{DST}/{name}.parquet"))
        print(f"{name}: {spark.read.parquet(f'{DST}/{name}.parquet').count()}"
              " rows", flush=True)

    def events(df, r):
        return df.select(
            (F.col("event_id") + r * 10_000_000).alias("event_id"),
            "ts",
            (F.col("user_id") + r * 10_000).alias("user_id"),
            "event_type", "value", "props",
        )

    def documents(df, r):
        text = (F.col("text") if r == 0
                else F.translate("text", "aeiou", VOWEL_MAPS[r]))
        return df.select(
            (F.col("doc_id") + r * 1_000_000).alias("doc_id"),
            text.alias("text"),
            "lang", "source", "n_chars",
        )

    def embeddings(df, r):
        if r == 0:
            emb = F.col("embedding")
        else:
            emb = F.expr(
                f"transform(embedding, (x, j) -> "
                f"IF(pmod(hash(j, {r}), 2) = 0, x, -x))"
            )
        return df.select(
            (F.col("vec_id") + r * 1_000_000).alias("vec_id"),
            emb.alias("embedding"),
            "label",
        )

    def orders(df, r):
        return df.select(
            (F.col("o_orderkey") + r * 10_000_000).alias("o_orderkey"),
            (F.col("o_custkey") + r * 1_000_000).alias("o_custkey"),
            "o_orderstatus", "o_totalprice", "o_orderdate",
            "o_orderpriority",
        )

    def lineitem(df, r):
        return df.select(
            (F.col("l_orderkey") + r * 10_000_000).alias("l_orderkey"),
            (F.col("l_partkey") + r * 1_000_000).alias("l_partkey"),
            (F.col("l_suppkey") + r * 1_000_000).alias("l_suppkey"),
            "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
            "l_tax", "l_returnflag", "l_linestatus", "l_shipdate",
        )

    replicate("events", events)
    replicate("documents", documents)
    replicate("embeddings", embeddings)
    replicate("orders", orders)
    replicate("lineitem", lineitem)

    for dim in ("region", "nation", "customer", "supplier", "part"):
        spark.read.parquet(f"{SRC}/{dim}.parquet").write.mode(
            "overwrite").parquet(f"{DST}/{dim}.parquet")
        print(f"{dim}: copied", flush=True)

    print(f"wrote {DST}")
    spark.stop()


if __name__ == "__main__":
    main()
