"""LSH candidate-pair generation with skew guards (SURVEY §2.4 J5, §4.3).

The shared machinery behind the minhash / simhash / substring modes:
band rows (fid, band_id, band_hash) self-join into candidate pairs.

Scale analysis (the stage that decides 100 TB viability):
- the join key (band_id, band_hash) is high-cardinality; honest buckets
  hold a handful of docs → pair counts stay near-linear;
- skew comes from boilerplate: one hot content (5% of a corpus) would
  make one bucket of size h and h²/2 pairs. Two guards:
  (a) byte-identical content never reaches LSH — the pipeline
      deduplicates on sha first and sends one representative per sha
      (SURVEY §7 risk list: "rely on sha256 exact groups");
  (b) ``max_bucket_size`` caps what remains: buckets bigger than the
      cap are dropped and *logged* (standard LSH practice — a pair
      sharing one giant bucket almost always shares an honest one).
- AQE skew-join splitting handles residual imbalance at runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deduplidog_spark.config import DedupConfig


def lsh_candidate_pairs(
    band_rows: DataFrame, cfg: DedupConfig, materialize=None
) -> tuple[DataFrame, DataFrame]:
    """band rows (fid, band_id, band_hash) → distinct pairs
    (id_a < id_b). Returns (pairs, dropped_buckets_report).

    Bucket sizes come from a window count over the same shuffle the
    join needs anyway (one pass — a separate groupBy + broadcast
    anti-join would add two more jobs and a second scan of the band
    table); the band table is materialized once and reused for both
    join sides. ``materialize`` is the caller's checkpoint hook (the
    pipeline passes its parquet ``_ckpt`` so on a cluster the band
    table survives executor loss and resumes across runs, instead of
    pinning N×bands rows in executor storage via localCheckpoint).
    """
    from pyspark.sql import Window

    if materialize is None:
        materialize = lambda d: d.localCheckpoint()  # noqa: E731
    w = Window.partitionBy("band_id", "band_hash")
    sized = materialize(band_rows.withColumn("bucket_size", F.count("*").over(w)))
    dropped_report = (
        sized.filter(F.col("bucket_size") > cfg.max_bucket_size)
        .select("band_id", "band_hash", "bucket_size")
        .dropDuplicates(["band_id", "band_hash"])
    )  # logged, per standard LSH practice — SURVEY §4.3
    pruned = sized.filter(F.col("bucket_size") <= cfg.max_bucket_size)
    a = pruned.select(
        F.col("band_id"), F.col("band_hash"), F.col("fid").alias("id_a")
    )
    b = pruned.select(
        F.col("band_id"), F.col("band_hash"), F.col("fid").alias("id_b")
    )
    pairs = (
        a.join(b, ["band_id", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    return pairs, dropped_report


def salt_column(key, unique_col, buckets: int):
    """Salting helper for hot keys (SURVEY §4.3): deterministically
    spread a skewed grouping key over ``buckets`` shards by hashing a
    unique column (e.g. path). Aggregations run salted first, then
    re-aggregate the ``buckets`` partials — two small shuffles instead
    of one skewed one. Returns a STRUCT (key, salt), not a delimited
    string: a delimiter would corrupt un-salting for any key that
    contains the delimiter itself."""
    return F.struct(
        key.alias("key"),
        F.pmod(F.xxhash64(unique_col), F.lit(buckets)).cast("int").alias("salt"),
    )
