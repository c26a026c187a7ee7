"""Example cluster job for spark-submit (see submit_example.sh): resumable
distinct-conversation count over a transcripts table with lineage."""
import sys

from pyspark.sql import SparkSession


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "transcripts/"
    ckpt = sys.argv[2] if len(sys.argv) > 2 else "ckpt/"
    spark = SparkSession.builder.appName("distinct-convs").getOrCreate()
    # package zip arrives via --py-files; imports resolve on executors
    from hyperloglog_spark.engine.checkpoint import resumable_sketch_build
    from hyperloglog_spark.functions import HllAggregator

    res = resumable_sketch_build(
        spark, path, "conv_id", HllAggregator(), ckpt, files_per_batch=256
    )
    print({"estimate": res.estimate, "rows": res.rows,
           "files": res.files_total, "resumed": res.files_resumed})
    spark.stop()


if __name__ == "__main__":
    main()
