"""Grouped-map (applyInPandas) operators (SURVEY §2.11.4 shape).

Per-group profiles that need true pandas semantics (interpolated
quantiles) rather than Spark's approximate percentiles — one group in,
one summary row out. The grouped-map form is also the template for the
per-group suffix-array variant of substring matching (group → local
index → pair rows out); the winnowing equi-join (operators/substring)
is the default because it distributes without grouping, but the
grouped form is the escape hatch when a corpus partition genuinely
needs an in-memory index.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

PROFILE_SCHEMA = (
    "repo string, n_files long, total_bytes long, median_size double, "
    "p90_size double, distinct_sha long, dup_ratio double"
)


def repo_profiles(files: DataFrame) -> DataFrame:
    """Per-repo dedup profile: size quantiles + duplicate ratio
    (1 - distinct_sha/n). Input needs (repo, size, sha)."""

    def profile(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        distinct = pdf["sha"].nunique()
        return pd.DataFrame(
            {
                "repo": [pdf["repo"].iloc[0]],
                "n_files": [n],
                "total_bytes": [int(pdf["size"].sum())],
                # 4dp rounding: pandas' linear interpolation and DuckDB's
                # quantile_cont agree mathematically but differ by ~1 ulp
                # in float96-vs-float64 accumulation order; rounding makes
                # the column oracle-comparable bit-for-bit
                "median_size": [round(float(pdf["size"].median()), 4)],
                "p90_size": [round(float(pdf["size"].quantile(0.9)), 4)],
                "distinct_sha": [distinct],
                "dup_ratio": [round(1.0 - distinct / n, 4) if n else 0.0],
            }
        )

    return (
        files.select("repo", "size", "sha")
        .groupBy("repo")
        .applyInPandas(profile, PROFILE_SCHEMA)
    )
