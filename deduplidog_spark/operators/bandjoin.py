"""Time-band and as-of joins (SURVEY §2.4 J6/J7, §2.7 W2).

The reference's date tolerance (deduplidog.py:711-713) and
``are_contained`` nearest-timestamp probe (utils.py:128-166) are range
predicates. Spark has no native band join; the scalable idiom is
bucketization: equi-join on floor(ts / bucket) with the probe side
exploded to its neighbor buckets, then the exact band filter. The join
stays a hash join on a high-cardinality composite key — no cross
product, no range-scan skew — and AQE handles residual bucket
imbalance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _epoch(col) -> "F.Column":
    """Epoch seconds for TIMESTAMP and TIMESTAMP_NTZ alike (NTZ can't
    cast straight to double; session TZ is pinned UTC so the NTZ→TZ
    hop is the identity)."""
    return col.cast("timestamp").cast("double")


def band_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    ts_col: str,
    band_seconds: float,
    left_prefix: str = "a_",
    right_prefix: str = "b_",
) -> DataFrame:
    """All pairs with equal ``keys`` and |left.ts - right.ts| <= band.

    Bucket width = band → a match is always in the same or adjacent
    bucket, so the left side explodes to 3 buckets (−1, 0, +1): 3×
    probe rows, one equi-join, exact filter after.
    """
    bucket = F.lit(float(band_seconds))
    l_sec = _epoch(F.col(ts_col))
    lp = left.select(
        *[F.col(c).alias(f"{left_prefix}{c}") for c in left.columns],
        F.explode(
            F.array(
                F.floor(l_sec / bucket) - 1,
                F.floor(l_sec / bucket),
                F.floor(l_sec / bucket) + 1,
            )
        ).alias("_bucket"),
    )
    r_sec = _epoch(F.col(ts_col))
    rp = right.select(
        *[F.col(c).alias(f"{right_prefix}{c}") for c in right.columns],
        F.floor(r_sec / bucket).alias("_bucket"),
    )
    cond = lp["_bucket"] == rp["_bucket"]
    for k in keys:
        cond = cond & (lp[f"{left_prefix}{k}"] == rp[f"{right_prefix}{k}"])
    joined = lp.join(rp, cond, "inner")
    delta = _epoch(F.col(f"{left_prefix}{ts_col}")) - _epoch(
        F.col(f"{right_prefix}{ts_col}")
    )
    return (
        joined.filter(F.abs(delta) <= band_seconds)
        .withColumn("delta_s", delta)
        .drop("_bucket")
    )


def asof_nearest(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    ts_col: str,
    max_seconds: float,
    left_id: str,
) -> DataFrame:
    """J7/W2: for each left row, the nearest right row within
    ±max_seconds — band join then top-1 by |delta| (probe order
    0, −1, +1, … of utils.py:146-151 becomes orderBy(abs(delta)));
    deterministic tie-break toward the earlier right row, matching the
    reference's nearest-first, negative-before-positive probe order."""
    pairs = band_join(left, right, keys, ts_col, max_seconds)
    w = Window.partitionBy(f"a_{left_id}").orderBy(
        F.abs(F.col("delta_s")).asc(), F.col(f"b_{ts_col}").asc()
    )
    return (
        pairs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
