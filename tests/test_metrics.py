"""Lineage, metrics, and resume-semantics tests (north_rule:
per-partition lineage + metrics, resumable runs)."""

import os
import tempfile

from pyspark.sql import functions as F

from deduplidog_spark import DedupConfig
from deduplidog_spark import fixtures as FX
from deduplidog_spark.metrics import exclude_processed, lineage_report
from deduplidog_spark.pipeline import dedupe


def test_lineage_recorded_per_stage(spark):
    tmp = tempfile.mkdtemp()
    df = FX.to_spark_df(spark, FX.corpus_b_rows())
    dedupe(df, DedupConfig(mode="minhash", checkpoint_dir=f"{tmp}/ck"))
    assert os.path.exists(f"{tmp}/ck/_lineage")
    rep = lineage_report(spark, f"{tmp}/ck")
    rows = {r.stage: r for r in rep.collect()}
    assert "files" in rows and "minhash_bands" in rows
    assert all(r.total_rows > 0 for r in rows.values())
    assert all(r.skew_ratio >= 1.0 for r in rows.values())


def test_exclude_processed_resume(spark):
    df = FX.to_spark_df(spark, FX.corpus_b_rows())
    res = dedupe(df, DedupConfig(mode="exact"))
    remaining = exclude_processed(df, res.plan)
    # every planned fid is gone; unplanned rows survive
    planned = {r.fid for r in res.plan.select("fid").collect()}
    left = {r.fid for r in remaining.select("fid").collect()}
    assert not (planned & left)
    assert "folder1/unique.txt" in left
    # re-running on the remainder plans nothing new in exact mode
    res2 = dedupe(remaining.drop("fid"), DedupConfig(mode="exact"))
    assert res2.plan.count() == 0


def test_run_metrics_counts(spark):
    df = FX.to_spark_df(spark, FX.corpus_b_rows())
    res = dedupe(df, DedupConfig(mode="exact", action="delete"))
    m = res.metrics.collect()[0]
    n_dups = res.plan.filter(~F.col("is_keeper")).count()
    assert m.affected_count == n_dups
    assert m.size_affected > 0
    assert m.skipped_count == 0
