"""Substring candidate mode — winnowing fingerprints (SURVEY §2.11.4).

Finds files sharing a long common substring (vendored blocks, license
headers, copied functions) even when overall Jaccard is low — the
north_rule's "suffix-array substring" mode re-expressed for scale:
a suffix array over concatenated docs is quadratic in partition skew
and needs global ordering; winnowing (Schleimer et al., SIGMOD'03)
gives the same guarantee — any shared substring of length ≥
window + k - 1 bytes produces at least one shared fingerprint — as a
per-document Arrow UDF followed by an equi-join, which distributes
like every other LSH stage here.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from deduplidog_spark.config import DedupConfig
from deduplidog_spark.functions import hashing as H


def make_fingerprint_udf(cfg: DedupConfig):
    k = cfg.fingerprint_k
    window = cfg.fingerprint_window
    max_size = cfg.hash_max_size

    @pandas_udf(T.ArrayType(T.LongType()))
    def winnow(content: pd.Series) -> pd.Series:
        out = []
        for text in content:
            if text is None or (max_size is not None and len(text) > max_size):
                out.append(None)
                continue
            out.append(H.winnow_fingerprints(text, k, window))
        return pd.Series(out)

    return winnow


def with_fingerprints(files: DataFrame, cfg: DedupConfig) -> DataFrame:
    from deduplidog_spark.ingest import widen_small_scan

    return widen_small_scan(files).withColumn(
        "band_hashes", make_fingerprint_udf(cfg)(F.col("content"))
    )


def explode_fingerprints(df: DataFrame, id_col: str = "fid") -> DataFrame:
    """(band_id=0, band_hash=fingerprint) rows — same shape as MinHash
    bands so the shared LSH join machinery applies unchanged."""
    return df.select(
        F.col(id_col),
        F.lit(0).alias("band_id"),
        F.explode("band_hashes").alias("band_hash"),
    )
