"""The end-to-end dedup pipeline (SURVEY §7 build plan).

Dataflow (mode-dependent candidate stage, shared tail):

    ingest → [exact sha groups] → representatives → signatures →
    LSH band join → verify → edges (exact ∪ near) →
    connected components → keeper election → action plan + metrics

Design decisions that matter at 100 TB:
- byte-identical content is collapsed to one representative *before*
  any signature work: the boilerplate skew group (one content in 5% of
  rows) costs one sha aggregation, not 5%² of candidate pairs;
- signatures are computed once, checkpointed when a checkpoint_dir is
  set (north_rule "resumable": band tables + cluster state survive a
  restart; re-running resumes from the parquet stage outputs);
- every stage is a DataFrame — `explain()` shows scan-pruned columns,
  one shuffle per groupBy/join, Arrow batches only at the two UDF
  stages (signatures, exact verify).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deduplidog_spark.config import DedupConfig
from deduplidog_spark.ingest import ingest
from deduplidog_spark.metrics import record_lineage, record_lineage_table
from deduplidog_spark.operators import minhash as mh
from deduplidog_spark.operators import simhash as sh
from deduplidog_spark.operators import substring as ss
from deduplidog_spark.operators.actions import action_plan, run_metrics
from deduplidog_spark.operators.candidates import lsh_candidate_pairs
from deduplidog_spark.operators.cluster import connected_components, elect_keepers
from deduplidog_spark.operators.exact import (
    collapse_sha_reps,
    exact_dup_pairs,
    exact_dup_pairs_from_groups,
    sha_groups,
)
from deduplidog_spark.operators.namedate import name_date_matches, pair_plan
from deduplidog_spark.operators.verify import verify_candidate_pairs


@dataclass
class DedupResult:
    files: DataFrame  # ingested rows (with fid/sha/size)
    edges: DataFrame  # verified duplicate pairs (id_a, id_b)
    clusters: DataFrame  # (fid, component, is_keeper, duplicate_of, ...)
    plan: DataFrame  # action-plan table
    metrics: DataFrame  # one-row counters
    dropped_buckets: DataFrame | None = None  # LSH skew-cap log
    # the materialized slim band table + sha-collapsed reps from the
    # fused single-scan path (r6): incremental.state_from_result reuses
    # them so building append state off a completed in-session run
    # never re-pays the signature UDF over the base corpus. None on the
    # durable path (load_state reads the persisted stages instead) and
    # for name/exact modes.
    bands: DataFrame | None = None
    band_reps: DataFrame | None = None


def _fs_exists(spark, path: str) -> bool:
    """Marker check through the Hadoop FS API so resume works for any
    scheme the cluster mounts (hdfs://, s3a://, file:) — ``os.path``
    only sees the driver's local disk."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(p))


def _ckpt(df: DataFrame, cfg: DedupConfig, stage: str, reuse: bool = True) -> DataFrame:
    """Stage checkpoint: parquet round-trip when checkpoint_dir is set,
    catalog-table round-trip when checkpoint_table_prefix is set
    (north_rule "checkpoints LSH band tables and cluster state to
    Iceberg": `checkpoint_format='iceberg'` on a cluster with the
    Iceberg runtime gives atomic replace + snapshot history; the
    parquet session-catalog provider exercises the same code path under
    test). Stage paths/names embed the config fingerprint, so a rerun
    with a different mode/threshold against the same checkpoint target
    recomputes instead of silently reusing stale files/edges/labels.
    Without a checkpoint target, stages consumed by several downstream
    operators (``reuse=True``) are localCheckpointed so each consumer
    doesn't re-execute the UDF stage; single-consumer stages stay
    lazy — every eager materialization is a driver-side barrier that
    caps scaling. The localCheckpoint is ``eager=False`` (r6): the
    first consuming job computes and caches the partitions exactly as
    the eager form would, but the separate materialization job — one
    driver round-trip + scheduler pass per stage — disappears; every
    consumer here full-scans its input, so the partial-caching hazard
    of lazy checkpoints (a limit() first consumer caching only the
    partitions it touched) cannot arise."""
    if cfg.checkpoint_table_prefix:
        name = f"{cfg.checkpoint_table_prefix}_{stage}_{cfg.fingerprint()}"
        spark = df.sparkSession
        if not spark.catalog.tableExists(name):
            df.write.format(cfg.checkpoint_format).mode("overwrite").saveAsTable(name)
            out = spark.table(name)
            record_lineage_table(
                out,
                cfg.checkpoint_table_prefix,
                cfg.checkpoint_format,
                stage,
                run=cfg.fingerprint(),
            )  # north_rule: per-partition lineage beside the stage tables
            return out
        return spark.table(name)
    if cfg.checkpoint_dir:
        run_dir = cfg.checkpoint_dir.rstrip("/") + "/" + cfg.fingerprint()
        path = run_dir + "/" + stage
        marker = path + "/_SUCCESS"
        spark = df.sparkSession
        if not _fs_exists(spark, marker):
            df.write.mode("overwrite").parquet(path)
            out = spark.read.parquet(path)
            record_lineage(out, run_dir, stage)  # north_rule
            return out
        return spark.read.parquet(path)
    return df.localCheckpoint(eager=False) if reuse else df


def _with_fid(df: DataFrame) -> DataFrame:
    return df.withColumn("fid", F.concat_ws("/", "repo", "path"))


def _cc_materializer(cfg: DedupConfig):
    """Per-round materialization hook for connected_components.

    With a checkpoint target configured, each CC round's label table
    goes through the same durable parquet/table path as every other
    stage (``cc_edges``, ``cc_r0``, ``cc_r1``, …) — localCheckpoint
    pins round state in executor storage, so a single executor loss
    late in a long chain would force the whole iteration over at
    cluster scale; a driver restart resumes from the completed round
    tables (same fingerprint-keyed reuse semantics as ``files`` /
    band stages). Without a target: None → localCheckpoint rounds."""
    if not (cfg.checkpoint_dir or cfg.checkpoint_table_prefix):
        return None
    return lambda df, tag: _ckpt(df, cfg, f"cc_{tag}")


_SLIM_STAGE = {
    "minhash": "minhash_bands",
    "simhash": "simhash_bands",
    "substring": "winnow_bands",
}


def _banded(files_full: DataFrame, cfg: DedupConfig):
    """Mode-specific banded projection: (df with band columns added,
    [band column names])."""
    if cfg.mode == "minhash":
        # fused signature+banding UDF: band values are bit-identical to
        # the two-step with_band_hashes(with_signatures(...)) (pinned in
        # tests) but only B longs per row cross the Python boundary
        return mh.with_banded_signatures(files_full, cfg), ["band_hashes"]
    if cfg.mode == "simhash":
        return (
            sh.with_simhash_chunks(sh.with_simhash(files_full, cfg), cfg),
            ["band_hashes", "simhash"],
        )
    if cfg.mode == "substring":
        return ss.with_fingerprints(files_full, cfg), ["band_hashes"]
    raise ValueError(f"_banded: unsupported mode {cfg.mode!r}")


def near_dup_edges(
    files: DataFrame,
    cfg: DedupConfig,
    slim: DataFrame | None = None,
    reps: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Candidate generation + verification for the selected near-dup
    mode. Returns (verified_pairs, dropped_buckets_report).

    Only one representative per distinct sha enters the LSH stage; the
    exact-dup star edges are unioned back in afterwards.

    ``slim`` — optionally, the already-materialized slim band table
    (fid, sha, size, n_lines, band cols); ``dedupe`` passes the
    projection of its fused single-scan checkpoint so the corpus is
    ingested+signed once, not once for the slim audit table and again
    for the band table.
    """
    # Shuffle-only-hashes design: signatures/bands are computed in the
    # scan stage (no shuffle carries content or even the full signature
    # array). Exact-dup collapse happens on the slim (sha, fid) pairs —
    # winners semi-join back — and the exact-verify stage re-reads
    # content from the scan, where Catalyst broadcasts the (small)
    # surviving pair set against it. Content never crosses a shuffle;
    # at 100 TB that is the difference between shuffling ~hashes
    # (≤ 3% of input bytes) and shuffling the corpus itself.
    contents = files.select("fid", "content")

    def _mat(d):  # band-table checkpoint hook → parquet/table when resumable.
        # reuse=False: in the grouped-LSH design the bucket table has
        # exactly ONE consumer (in-bucket pair expansion), so without a
        # checkpoint target an eager localCheckpoint here is a pure
        # driver barrier — stay lazy and let the single downstream
        # materialization pull the chain once.
        return _ckpt(d, cfg, "lsh_buckets", reuse=False)

    def _sha_reps(slim: DataFrame) -> DataFrame:
        # one representative band row per distinct sha — persisted as
        # its own stage so an incremental append batch probes base
        # representatives directly instead of re-aggregating the whole
        # base band table per batch (that re-collapse was a base-wide
        # O(N) exchange every append; the reps are computed ONCE here).
        # reuse=True: lsh_candidate_pairs consumes the exploded band
        # rows TWICE (bucket-count pre-pass that builds the hot-bucket
        # broadcast, then the pruned anti-join probe side) — left lazy,
        # the collapse would re-execute per consumer.
        return _ckpt(collapse_sha_reps(slim), cfg, "band_reps", reuse=True)

    if cfg.mode not in _SLIM_STAGE:
        raise ValueError(f"near_dup_edges: unsupported mode {cfg.mode!r}")
    if slim is None:
        # band hashes (32 longs) replace the full signature in the
        # materialized table — ~4× smaller; the exact-Jaccard stage is
        # the precision gate, so the signature-agreement estimate adds
        # nothing the bands + exact verify don't already give
        banded, extra = _banded(files, cfg)
        slim = _ckpt(
            banded.select("fid", "sha", "size", "n_lines", *extra),
            cfg,
            _SLIM_STAGE[cfg.mode],
        )
    if reps is None:
        reps = _sha_reps(slim)
    band_rows = (
        ss.explode_fingerprints(reps)
        if cfg.mode == "substring"
        else mh.explode_bands(reps)
    )
    pairs, dropped = lsh_candidate_pairs(band_rows, cfg, materialize=_mat)
    if cfg.mode == "simhash":
        # verify by Hamming distance (V4 analog), then optional exact Jaccard
        pairs = sh.hamming_filter(pairs, slim, cfg)
    verified = verify_candidate_pairs(pairs, slim, cfg, contents=contents)
    return verified.select("id_a", "id_b"), dropped


def dedupe(raw: DataFrame, cfg: DedupConfig) -> DedupResult:
    """Full pipeline over the contract table. ``mode`` picks candidates:

    - 'exact'    — sha groups only (reference checksum mode, V3)
    - 'name'     — name/size/date matcher (reference default)
    - 'minhash' / 'simhash' / 'substring' — near-dup LSH modes
    """
    # Two views of the ingested table:
    # - files_full: lazily re-derived from the scan; carries content,
    #   consumed exactly once by the signature/verify path;
    # - files: slim projection (no content) materialized once — it
    #   feeds exact edges, keeper election, and metrics. Materializing
    #   content here would double the pipeline's I/O volume: content is
    #   ~95% of the bytes and memory/disk bandwidth is the shared
    #   resource that does NOT scale with cores.
    if cfg.collapse_versions:
        # commit-axis pre-collapse: the signature pipeline only ever
        # sees the newest version per (repo, path) — on commit-snapshot
        # corpora this is the biggest reduction in the whole run. The
        # collapsed snapshot is MATERIALIZED as a stage: files_full is
        # consumed by several eager jobs (the slim `files` checkpoint,
        # the signature path, the verify content re-read), and a lazy
        # collapse would re-execute its content-bearing window exchange
        # once per job. Writing the collapsed table instead costs one
        # exchange + one write of the SURVIVORS (~input/versions-per-
        # path — the collapse's own reduction pays for the write) and
        # every downstream pass is then a plain scan, preserving the
        # pipeline's content-never-crosses-a-shuffle posture. On input
        # write-distributed by (repo, path) even that one exchange is
        # elided (see operators/versions.latest_versions). NOTE: state
        # written under collapse_versions=True is a different run
        # identity (fingerprint) and is NOT --append-able — a batch may
        # supersede base versions; incremental_dedupe fails fast.
        from .operators.versions import latest_versions

        raw = _ckpt(
            latest_versions(raw, order_by=cfg.version_order_col),
            cfg,
            "collapsed",
        )
    files_full = _with_fid(ingest(raw, cfg))
    slim_cols = [c for c in files_full.columns if c != "content"]
    durable = bool(cfg.checkpoint_dir or cfg.checkpoint_table_prefix)
    slim = None
    if cfg.mode in _SLIM_STAGE and not durable:
        # FUSED single scan (r6): without a durable checkpoint target
        # the slim audit table and the band table were each a separate
        # localCheckpoint pulling its own full ingest pass (scan +
        # sha256 + derived columns, plus the signature UDF on the band
        # pass). One combined materialization computes everything in
        # one pass over the corpus; `files` and the band-stage `slim`
        # are column projections of the same in-memory RDD. Durable
        # runs keep the two-stage layout — load_state/resume reads
        # `files` and `<mode>_bands` as separate fingerprint-keyed
        # stages, and there the extra pass buys restartability.
        if cfg.mode == "minhash":
            # single mapInPandas pass: ingest stats + signatures +
            # banding in Python, path columns/filters as the shared
            # JVM expressions on top (see minhash.banded_ingest_scan)
            banded, extra = _with_fid(mh.banded_ingest_scan(raw, cfg)), ["band_hashes"]
        else:
            banded, extra = _banded(files_full, cfg)
        combined = _ckpt(banded.select(*slim_cols, *extra), cfg, "files")
        files = combined.select(*slim_cols)
        slim = combined.select("fid", "sha", "size", "n_lines", *extra)
    else:
        files = _ckpt(files_full.select(*slim_cols), cfg, "files")
    reps = None
    dropped = None

    if cfg.mode == "exact":
        edges = exact_dup_pairs(files)
    elif cfg.mode == "name":
        matches = name_date_matches(files_full, cfg)
        if cfg.invert_selection:
            # J8: result is the no-match work set — no clustering stage
            edges = files.sparkSession.createDataFrame(
                [], "id_a string, id_b string"
            )
            clusters = elect_keepers(
                files, edges.select(F.col("id_a").alias("fid"), F.lit("").alias("component")).limit(0)
            )
            plan = matches.select(
                F.concat_ws("/", "repo", "path").alias("fid"),
                "repo",
                "path",
                F.lit(None).cast("string").alias("component"),
                F.lit(False).alias("is_keeper"),
                F.lit(None).cast("string").alias("duplicate_of"),
                F.lit(cfg.action).alias("action"),
                F.lit(False).alias("size_warning"),
                F.lit(False).alias("date_warning"),
                F.lit(cfg.action).alias("action_effective"),
                F.col("mtime").alias("new_mtime"),
            )
            metrics = run_metrics(plan, files)
            return DedupResult(files, edges, clusters, plan, metrics)
        # role-aware per-pair plan (reference _affect semantics): the
        # work file is affected, the original keeps, warnings gate —
        # NOT role-blind cluster election, which could e.g. delete an
        # original-repo file because the work file won a tie-break
        plan = _ckpt(pair_plan(matches, cfg), cfg, "plan", reuse=False)
        edges = matches.select(
            F.concat_ws("/", "o_repo", "o_path").alias("id_a"),
            F.concat_ws("/", "w_repo", "w_path").alias("id_b"),
        )
        clusters = plan.select("fid", "component", "is_keeper", "duplicate_of")
        metrics = run_metrics(plan, files)
        return DedupResult(files, edges, clusters, plan, metrics)
    else:
        if slim is not None:
            # fused path (r6): ONE sha aggregation serves both the rep
            # collapse and the exact-dup star edges — they previously
            # each ran a full groupBy over the same (sha, fid) rows.
            # The group table broadcasts (AQE), so the rep semi-join
            # and the edge join are map-side over the in-memory
            # combined checkpoint.
            groups = _ckpt(sha_groups(files), cfg, "sha_groups", reuse=True)
            reps = slim.join(
                groups.select(F.col("root").alias("fid")), "fid", "left_semi"
            )
            near, dropped = near_dup_edges(files_full, cfg, slim=slim, reps=reps)
            exact = exact_dup_pairs_from_groups(files, groups)
        else:
            near, dropped = near_dup_edges(files_full, cfg, slim=slim, reps=reps)
            exact = exact_dup_pairs(files)
        # plain union, no dedup shuffle: the two edge sets are disjoint
        # by construction (exact stars connect fids SHARING a sha; near
        # edges connect sha REPRESENTATIVES, one per distinct sha, so
        # both endpoints differ in sha) and each side is internally
        # duplicate-free (near: candidate pairs are dropDuplicates'd;
        # exact: one row per member fid)
        edges = near.union(exact)

    # edges feed only connected_components (which materializes its own
    # undirected edge list), labels feed only the keeper window, the
    # plan is consumed lazily — none need an eager barrier here
    edges = _ckpt(edges, cfg, "edges", reuse=False)
    labels = connected_components(
        edges, cfg.cc_max_iterations, materialize=_cc_materializer(cfg),
        # near edges are dropDuplicates'd canonical pairs, exact stars
        # are one row per member, and the sides are disjoint (see the
        # edges union above) -- skip CC's defensive edge dedup shuffle
        assume_unique_edges=True,
    )
    labels = _ckpt(labels, cfg, "cc_labels", reuse=False)
    clusters = elect_keepers(files, labels, cfg)
    plan = action_plan(clusters, cfg)
    plan = _ckpt(plan, cfg, "plan", reuse=False)
    metrics = run_metrics(plan, files)
    return DedupResult(
        files, edges, clusters, plan, metrics, dropped,
        bands=slim, band_reps=reps,
    )
