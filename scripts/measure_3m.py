"""One-off: 3M-row local[32] headline measurement (wall + recall).

Reuses bench.py's job config; runs dedupe once, times it, then
computes dup-pair recall from the same result (no second dedupe run).
Prints ONE JSON line.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# 32 concurrent scan tasks each decode a ~128 MB parquet row group; the
# 8 GB single-JVM default (250 MB/core) OOMs in ParquetFileReader at 3M
# rows. 2 GB/core is the realistic executor provisioning — see BENCH.md
# "r5 recall-at-scale" for the measurement.
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "64g")

from bench import BENCH_CFG, _mk_spark  # noqa: E402


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    corpus_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/bench_corpus_3000000"
    n_rows = int(sys.argv[3]) if len(sys.argv) > 3 else 3000000

    from pyspark.sql import functions as F

    from deduplidog_spark.benchgen import near_truth_pairs
    from deduplidog_spark.config import DedupConfig
    from deduplidog_spark.operators.verify import make_jaccard_udf
    from deduplidog_spark.pipeline import dedupe

    spark = _mk_spark(cores)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(10000).select(F.sha2(F.col("id").cast("string"), 256)).count()
    corpus = spark.read.parquet(corpus_dir)

    cfg = DedupConfig(**BENCH_CFG)
    t0 = time.time()
    res = dedupe(corpus, cfg)
    n_plan = res.plan.count()  # same timed scope as bench.py's _dedup_job
    dt = time.time() - t0
    # recall needs labels again; the recompute happens OUTSIDE the
    # timed window (bench.py times the job once, recall separately)
    labels = res.clusters.select("fid", "component").localCheckpoint()

    fidc = corpus.select(F.concat_ws("/", "repo", "path").alias("fid"), "content")
    jac = make_jaccard_udf(cfg)
    truth = (
        near_truth_pairs(spark, n_rows)
        .join(fidc.select(F.col("fid").alias("id_a"), F.col("content").alias("ca")), "id_a")
        .join(fidc.select(F.col("fid").alias("id_b"), F.col("content").alias("cb")), "id_b")
        .filter(jac(F.col("ca"), F.col("cb")) >= cfg.jaccard_threshold)
        .select("id_a", "id_b")
    )
    found = (
        truth.join(labels.withColumnRenamed("fid", "id_a").withColumnRenamed("component", "comp_a"), "id_a")
        .join(labels.withColumnRenamed("fid", "id_b").withColumnRenamed("component", "comp_b"), "id_b")
        .filter(F.col("comp_a") == F.col("comp_b"))
    )
    n_truth = truth.count()
    n_found = found.count()
    recall = (n_found / n_truth) if n_truth else 1.0
    print(json.dumps({
        "cores": cores, "rows": n_rows, "wall_sec": round(dt, 1),
        "files_per_sec": round(n_rows / dt, 1), "plan_rows": n_plan,
        "recall": round(recall, 5), "n_truth": n_truth, "n_found": n_found,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
