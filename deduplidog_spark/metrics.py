"""Per-partition lineage + run metrics (north_rule: "resumable from
checkpoint with per-partition lineage and metrics").

Each checkpointed stage records one row per physical partition —
(stage, partition_id, n_rows) — appended to ``<checkpoint_dir>/
_lineage``; a skew-diagnosis view (max/median partition ratio) comes
free from that table. The reference's analog is its flat run counters
(deduplidog.py:243-252); per-partition resolution is what a cluster
operator actually needs to spot stragglers.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def partition_histogram(df: DataFrame, stage: str) -> DataFrame:
    return (
        df.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(F.count("*").alias("n_rows"))
        .withColumn("stage", F.lit(stage))
    )


def record_lineage(df: DataFrame, checkpoint_dir: str, stage: str) -> None:
    """Append the stage's partition histogram to the lineage table."""
    out = os.path.join(checkpoint_dir, "_lineage")
    hist = partition_histogram(df, stage).withColumn(
        "recorded_at", F.lit(int(time.time())).cast("timestamp")
    )
    hist.write.mode("append").parquet(out)


def record_lineage_table(
    df: DataFrame, table_prefix: str, fmt: str, stage: str, run: str = ""
) -> None:
    """Append the stage's partition histogram to ``<prefix>_lineage``
    as a catalog table (Iceberg on clusters with the runtime — appends
    are then atomic snapshots; parquet session-catalog tables under
    test). ``run`` carries the config fingerprint so several configs
    sharing one prefix stay distinguishable — the path variant encodes
    it in the run directory instead."""
    name = f"{table_prefix}_lineage"
    hist = (
        partition_histogram(df, stage)
        .withColumn("recorded_at", F.lit(int(time.time())).cast("timestamp"))
        .withColumn("run", F.lit(run))
    )
    hist.write.format(fmt).mode("append").saveAsTable(name)


def lineage_report(spark, checkpoint_dir: str) -> DataFrame:
    """Stage-level skew summary from the lineage table: row totals and
    max/avg partition ratio (≫1 ⇒ salt or cap that stage's key)."""
    hist = spark.read.parquet(os.path.join(checkpoint_dir, "_lineage"))
    return _skew_summary(hist)


def lineage_report_table(spark, table_prefix: str) -> DataFrame:
    """`lineage_report` over the catalog-table lineage sink."""
    return _skew_summary(spark.table(f"{table_prefix}_lineage"))


def _skew_summary(hist: DataFrame) -> DataFrame:
    return (
        hist.groupBy("stage")
        .agg(
            F.sum("n_rows").alias("total_rows"),
            F.count("*").alias("n_partitions"),
            F.max("n_rows").alias("max_partition"),
            F.round(F.avg("n_rows"), 1).alias("avg_partition"),
        )
        .withColumn(
            "skew_ratio",
            F.round(F.col("max_partition") / F.greatest(F.col("avg_partition"), F.lit(1.0)), 2),
        )
    )


def exclude_processed(files: DataFrame, prior_plan: DataFrame) -> DataFrame:
    """S3/F1 resume semantics, order-independent: drop rows already
    decided by a prior run's action plan (anti-join on fid) — replaces
    the reference's positional ``skip`` offset (deduplidog.py:434-441)
    and its "✓" filename marker (deduplidog.py:465-467)."""
    done = prior_plan.select("fid").distinct()
    with_fid = files.withColumn("fid", F.concat_ws("/", "repo", "path"))
    return with_fid.join(done, "fid", "left_anti")
