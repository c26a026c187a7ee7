"""spark-submit payload for the multi-executor scaling bench
(scripts/bench_cluster.py): times the flagship HLL sketch-build at the
cluster size chosen by the submitter (spark.cores.max / executor.cores)
and prints one JSON line. The hyperloglog_spark package arrives via
--py-files; imports must resolve on executors, not just the driver."""
import json
import sys
import time

from pyspark.sql import SparkSession


def main() -> None:
    path = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    engines = (sys.argv[3].split(",") if len(sys.argv) > 3
               else ["jvm", "arrow"])
    spark = SparkSession.builder.appName("cluster-scaling").getOrCreate()
    from hyperloglog_spark import approx_distinct

    sc = spark.sparkContext
    trans = spark.read.parquet(path)
    n = trans.count()
    out = {"n_turns": n,
           "executors": int(sc.getConf().get("spark.cores.max", "0")) //
                        int(sc.getConf().get("spark.executor.cores", "1"))}
    for eng in engines:
        def q():
            return approx_distinct(trans, "conv_id", engine=eng).collect()

        q()                                  # warm-up at full width
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            rows = q()
            best = min(best, time.perf_counter() - t0)
        out[eng] = best
        out[f"estimate_{eng}"] = rows[0][0]
    print("CLUSTER_RESULT " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
