"""spark-submit entry point: run the dedup pipeline on a corpus table.

Usage (via scripts/submit.sh):
    spark-submit --py-files deduplidog_spark.zip scripts/run_dedupe.py \
        <corpus_location> <checkpoint_target> [mode] [jaccard_threshold]

``checkpoint_target`` is either a path (parquet stage dirs) or
``table:<catalog.db.prefix>[:format]`` for catalog-table stage
checkpoints — e.g. ``table:lake.db.run1:iceberg`` on a cluster with
the Iceberg runtime (north_rule), or ``table:run1`` for the session
catalog's default format.
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession

from deduplidog_spark.config import DedupConfig
from deduplidog_spark.metrics import lineage_report, lineage_report_table
from deduplidog_spark.pipeline import dedupe
from deduplidog_spark.sources.readers import read_corpus


def main() -> None:
    corpus_loc = sys.argv[1]
    ckpt = sys.argv[2]
    mode = sys.argv[3] if len(sys.argv) > 3 else "minhash"
    tau = float(sys.argv[4]) if len(sys.argv) > 4 else 0.7

    spark = SparkSession.builder.appName("deduplidog-spark").getOrCreate()
    common = dict(mode=mode, shingle_k=9, jaccard_threshold=tau)
    if ckpt.startswith("table:"):
        parts = ckpt.split(":")
        prefix = parts[1]
        fmt = parts[2] if len(parts) > 2 else "parquet"
        cfg = DedupConfig(
            checkpoint_table_prefix=prefix, checkpoint_format=fmt, **common
        )
    else:
        cfg = DedupConfig(checkpoint_dir=ckpt, **common)
    res = dedupe(read_corpus(spark, corpus_loc), cfg)
    res.metrics.show(truncate=False)
    if cfg.checkpoint_table_prefix:
        lineage_report_table(spark, cfg.checkpoint_table_prefix).show(truncate=False)
        print(f"plan in table {cfg.checkpoint_table_prefix}_plan_{cfg.fingerprint()}")
    else:
        lineage_report(spark, f"{ckpt.rstrip('/')}/{cfg.fingerprint()}").show(truncate=False)
        print(f"plan written to {ckpt}/{cfg.fingerprint()}/plan")


if __name__ == "__main__":
    main()
