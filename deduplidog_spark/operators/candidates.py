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

    Grouped pair generation, not a self-join: in-bucket pairs are
    expanded by a JVM transform/slice expression inside the aggregated
    partition. The count pre-pass combines map-side — its shuffle
    carries ~one compact row per distinct (band_id, band_hash) per
    partition — and classifies buckets in one pass: hot buckets above
    ``max_bucket_size`` (rare by construction: byte-identical content
    is sha-collapsed before banding) are dropped and logged, singleton
    buckets (the overwhelming majority — honest band hashes rarely
    collide) never reach the group stage at all, and only the 2..cap
    keys are grouped, so per-group state is bounded at cap × fid
    bytes and the group-side exchange carries only pair-producing
    rows (usually elided entirely: AQE broadcasts the multi-member
    key set and the probe is a map-side semi join).

    ``materialize`` is the caller's checkpoint hook (the pipeline
    passes its parquet ``_ckpt`` so the bucket table survives executor
    loss and resumes across runs, instead of pinning rows in executor
    storage via localCheckpoint)."""
    if materialize is None:
        # eager=False: the bucket table has exactly one consumer (the
        # in-bucket pair expansion, a full scan), so the lazy form
        # caches identically while skipping the separate
        # materialization job + driver barrier
        materialize = lambda d: d.localCheckpoint(eager=False)  # noqa: E731
    # One count pre-pass (map-side combinable — its shuffle carries
    # ~one compact key row per distinct (band_id, band_hash) per
    # partition) classifies every bucket: > cap → dropped and *logged*,
    # per standard LSH practice (SURVEY §4.3); == 1 → can never emit a
    # pair. Only the 2..cap keys — the REAL candidate buckets, tiny
    # relative to the band table because honest buckets are singletons —
    # reach the collect_list. The r5 shape anti-joined only the
    # oversized keys and then shuffled the ENTIRE band table again to
    # group it; restricting the group-side input to multi-member keys
    # first means the second exchange carries only rows that can
    # produce pairs (bench: 5.8M band rows → ~0.4M), and when the
    # multi-key set fits the broadcast threshold AQE turns the probe
    # into a map-side semi join, removing the full-table exchange
    # outright (guide §2.3/§2.4). On a high-dup-rate corpus where the
    # multi-key set outgrows the threshold, AQE falls back to a
    # shuffled join — the same full-table exchange the old shape
    # always paid, plus one compact key shuffle.
    counts = band_rows.groupBy("band_id", "band_hash").agg(
        F.count("*").alias("bucket_size")
    )
    dropped_report = counts.filter(F.col("bucket_size") > cfg.max_bucket_size)
    multi = counts.filter(
        (F.col("bucket_size") > 1) & (F.col("bucket_size") <= cfg.max_bucket_size)
    ).select("band_id", "band_hash")
    buckets = materialize(
        band_rows.join(multi, ["band_id", "band_hash"], "left_semi")
        .groupBy("band_id", "band_hash")
        .agg(F.collect_list("fid").alias("ids"))
    )
    # element i pairs with every j > i: transform over indices, slice
    # for the tail, flatten + explode — stays in whole-stage codegen
    ids = F.col("ids")
    combos = F.flatten(
        F.transform(
            ids,
            lambda x, i: F.transform(
                F.slice(ids, i + 2, F.size(ids)),
                lambda y: F.struct(
                    F.least(x, y).alias("id_a"), F.greatest(x, y).alias("id_b")
                ),
            ),
        )
    )
    pairs = (
        buckets.select(F.explode(combos).alias("p"))
        .select("p.id_a", "p.id_b")
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


def drop_oversized_groups(
    df: DataFrame, keys: list[str], cap: int, size_col: str = "group_size"
) -> tuple[DataFrame, DataFrame]:
    """THE skew-cap kernel: count pre-pass + broadcast anti-join.

    Removes groups larger than ``cap`` BEFORE any per-group state
    (bucket lists, inverted lists, owner lists) materializes. The
    groupBy count partial-aggregates map-side — its shuffle carries
    ~one row per distinct key per partition — and the oversized key
    set is tiny by construction, so it broadcasts. The window-count
    alternative shuffles the full table on exactly the skewed key the
    cap exists to guard (windows don't partial-aggregate).

    One kernel shared by the LSH band stage, both ANN paths, and
    fork detection — the cap semantics must agree everywhere or the
    dropped-group reports stop being comparable across operators.

    Returns (pruned, oversized_report); the report carries the group
    keys plus ``size_col``.
    """
    oversized = (
        df.groupBy(*keys)
        .agg(F.count("*").alias(size_col))
        .filter(F.col(size_col) > cap)
    )
    pruned = df.join(F.broadcast(oversized.select(*keys)), keys, "left_anti")
    return pruned, oversized
