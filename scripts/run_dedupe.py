"""spark-submit entry point: run the dedup pipeline on a corpus table.

Usage (via scripts/submit.sh):
    spark-submit --py-files deduplidog_spark.zip scripts/run_dedupe.py \
        <corpus_location> <checkpoint_dir> [mode] [jaccard_threshold]
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession

from deduplidog_spark.config import DedupConfig
from deduplidog_spark.metrics import lineage_report
from deduplidog_spark.pipeline import dedupe
from deduplidog_spark.sources.readers import read_corpus


def main() -> None:
    corpus_loc = sys.argv[1]
    ckpt = sys.argv[2]
    mode = sys.argv[3] if len(sys.argv) > 3 else "minhash"
    tau = float(sys.argv[4]) if len(sys.argv) > 4 else 0.7

    spark = SparkSession.builder.appName("deduplidog-spark").getOrCreate()
    cfg = DedupConfig(
        mode=mode, shingle_k=9, jaccard_threshold=tau, checkpoint_dir=ckpt
    )
    res = dedupe(read_corpus(spark, corpus_loc), cfg)
    res.metrics.show(truncate=False)
    lineage_report(spark, ckpt).show(truncate=False)
    print(f"plan written to {ckpt}/plan")


if __name__ == "__main__":
    main()
