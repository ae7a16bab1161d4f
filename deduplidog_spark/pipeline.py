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
from deduplidog_spark.operators import minhash as mh
from deduplidog_spark.operators import simhash as sh
from deduplidog_spark.operators import substring as ss
from deduplidog_spark.operators.actions import action_plan, run_metrics
from deduplidog_spark.operators.candidates import lsh_candidate_pairs
from deduplidog_spark.operators.cluster import connected_components, elect_keepers
from deduplidog_spark.operators.exact import exact_dup_pairs
from deduplidog_spark.operators.namedate import name_date_matches
from deduplidog_spark.operators.verify import verify_candidate_pairs


@dataclass
class DedupResult:
    files: DataFrame  # ingested rows (with fid/sha/size)
    edges: DataFrame  # verified duplicate pairs (id_a, id_b)
    clusters: DataFrame  # (fid, component, is_keeper, duplicate_of, ...)
    plan: DataFrame  # action-plan table
    metrics: DataFrame  # one-row counters
    dropped_buckets: DataFrame | None = None  # LSH skew-cap log


def _ckpt(df: DataFrame, cfg: DedupConfig, stage: str) -> DataFrame:
    """Stage checkpoint: parquet round-trip when checkpoint_dir is set
    (resumable, truncates lineage); localCheckpoint otherwise."""
    if cfg.checkpoint_dir:
        path = os.path.join(cfg.checkpoint_dir, stage)
        marker = os.path.join(path, "_SUCCESS")
        spark = df.sparkSession
        if not os.path.exists(marker):
            df.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)
    return df


def _with_fid(df: DataFrame) -> DataFrame:
    return df.withColumn("fid", F.concat_ws("/", "repo", "path"))


def near_dup_edges(files: DataFrame, cfg: DedupConfig) -> tuple[DataFrame, DataFrame]:
    """Candidate generation + verification for the selected near-dup
    mode. Returns (verified_pairs, dropped_buckets_report).

    Only one representative per distinct sha enters the LSH stage; the
    exact-dup star edges are unioned back in afterwards.
    """
    reps = files.dropDuplicates(["sha"])
    if cfg.mode == "minhash":
        sigs = mh.with_signatures(reps, cfg)
        sigs = _ckpt(
            sigs.select("fid", "size", "content", "sig"), cfg, "minhash_sigs"
        )
        bands = mh.with_band_hashes(sigs, cfg)
        band_rows = mh.explode_bands(bands)
        pairs, dropped = lsh_candidate_pairs(band_rows, cfg)
        verified = verify_candidate_pairs(
            pairs, sigs, cfg, sigs=sigs.select("fid", "sig")
        )
    elif cfg.mode == "simhash":
        sigs = sh.with_simhash(reps, cfg)
        sigs = _ckpt(
            sigs.select("fid", "size", "content", "simhash"), cfg, "simhash_sigs"
        )
        chunked = sh.with_simhash_chunks(sigs, cfg)
        band_rows = mh.explode_bands(chunked)
        pairs, dropped = lsh_candidate_pairs(band_rows, cfg)
        # verify by Hamming distance (V4 analog), then optional exact Jaccard
        ha = sigs.select(F.col("fid").alias("id_a"), F.col("simhash").alias("sh_a"))
        hb = sigs.select(F.col("fid").alias("id_b"), F.col("simhash").alias("sh_b"))
        pairs = (
            pairs.join(ha, "id_a")
            .join(hb, "id_b")
            .filter(
                sh.hamming_distance(F.col("sh_a"), F.col("sh_b"))
                <= cfg.simhash_max_hamming
            )
            .select("id_a", "id_b")
        )
        verified = verify_candidate_pairs(pairs, sigs, cfg, sigs=None)
    elif cfg.mode == "substring":
        fps = ss.with_fingerprints(reps, cfg)
        fps = _ckpt(
            fps.select("fid", "size", "content", "band_hashes"), cfg, "winnow_fps"
        )
        band_rows = ss.explode_fingerprints(fps)
        pairs, dropped = lsh_candidate_pairs(band_rows, cfg)
        verified = verify_candidate_pairs(pairs, fps, cfg, sigs=None)
    else:
        raise ValueError(f"near_dup_edges: unsupported mode {cfg.mode!r}")
    return verified.select("id_a", "id_b"), dropped


def dedupe(raw: DataFrame, cfg: DedupConfig) -> DedupResult:
    """Full pipeline over the contract table. ``mode`` picks candidates:

    - 'exact'    — sha groups only (reference checksum mode, V3)
    - 'name'     — name/size/date matcher (reference default)
    - 'minhash' / 'simhash' / 'substring' — near-dup LSH modes
    """
    files = _with_fid(ingest(raw, cfg))
    dropped = None

    if cfg.mode == "exact":
        edges = exact_dup_pairs(files)
    elif cfg.mode == "name":
        matches = name_date_matches(files, cfg)
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
        edges = matches.filter(F.col("action_effective") != "ignored").select(
            F.concat_ws("/", "o_repo", "o_path").alias("id_a"),
            F.concat_ws("/", "w_repo", "w_path").alias("id_b"),
        )
    else:
        near, dropped = near_dup_edges(files, cfg)
        exact = exact_dup_pairs(files)
        # expand representative-level near edges back over sha groups is
        # unnecessary: exact star edges already tie every copy to its
        # representative's component.
        edges = near.union(exact).dropDuplicates(["id_a", "id_b"])

    edges = _ckpt(edges, cfg, "edges")
    labels = connected_components(edges, cfg.cc_max_iterations)
    labels = _ckpt(labels, cfg, "cc_labels")
    clusters = elect_keepers(files, labels, cfg)
    plan = action_plan(clusters, cfg)
    plan = _ckpt(plan, cfg, "plan")
    metrics = run_metrics(plan, files)
    return DedupResult(files, edges, clusters, plan, metrics, dropped)
