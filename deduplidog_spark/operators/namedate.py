"""Name/size/date candidate matching — the reference's default mode.

Reproduces the reference pipeline (SURVEY §2.4-2.5, J1-J10, V1-V3, X6):
candidates = originals with equal normalized stem (J1) and equal suffix
(J2), excluding self (J4); verified by size equality (V1), date
equality or tolerate_hour band (V2/J6), optional sha equality (V3);
first match in deterministic scan order wins (J9/W5); SIZE/DATE
warnings gate the action (X6, deduplidog.py:529-566).

Plan shape: one equi-join on the normalized key. Catalyst broadcasts
the smaller side automatically; for the self-join-at-scale case the key
is (norm_key, ext), high-cardinality → well-distributed shuffle hash
join. The date band is a post-join filter, not a join condition, so the
join stays a pure hash join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from deduplidog_spark.config import DedupConfig
from deduplidog_spark.ingest import ingest, split_roles


def _ensure_ingested(files: DataFrame, cfg: DedupConfig) -> DataFrame:
    return files if "norm_key" in files.columns else ingest(files, cfg)

_WORK_COLS = ("repo", "path", "norm_key", "ext", "size", "mtime", "sha", "lang")


def _prefix(df: DataFrame, p: str, key_col: str = "norm_key") -> DataFrame:
    sel = [F.col(c).alias(f"{p}{c}") for c in _WORK_COLS if c != "norm_key"]
    sel.append(F.col(key_col).alias(f"{p}norm_key"))
    return df.select(*sel)


def candidate_pairs(files: DataFrame, cfg: DedupConfig) -> DataFrame:
    """J1-J4: equi-join work × originals on the blocking key.

    Returns w_* / o_* prefixed pair rows. The originals side uses the
    shortened key (K6) like the reference's index build
    (deduplidog.py:288). ``ignore_name`` (J5) must not fall back to a
    cross join — callers use the LSH modes for that (SURVEY J5).
    """
    if cfg.ignore_name:
        raise ValueError(
            "ignore_name in name mode would be a cross join; use "
            "mode='minhash'/'simhash'/'substring' (SURVEY §2.4 J5)"
        )
    files = _ensure_ingested(files, cfg)
    work, orig = split_roles(files, cfg)
    w = _prefix(work, "w_")
    # work probes with its (possibly shortened) key against the
    # shortened index key, mirroring deduplidog.py:288,492
    o = _prefix(orig, "o_", key_col="norm_key_short")
    cond = (w["w_norm_key"] == o["o_norm_key"]) & (
        (w["w_repo"] != o["o_repo"]) | (w["w_path"] != o["o_path"])  # J4
    )
    if not cfg.ignore_size:
        pass  # size is a verify predicate (V1), kept out of the join key
    pairs = w.join(o, cond, "inner")
    # J2: suffix equality (non-media mode, deduplidog.py:507-508)
    pairs = pairs.filter(F.col("w_ext") == F.col("o_ext"))
    # J3: class blocking — lang plays the media-class role
    pairs = pairs.filter(F.col("w_lang") == F.col("o_lang"))
    return pairs


def date_predicate(cfg: DedupConfig):
    """V2/J6: exact mtime equality OR asymmetric hour band
    lo <= (w.mtime - o.mtime)/3600 <= hi (deduplidog.py:711-713)."""
    if cfg.ignore_date:
        return F.lit(True)
    exact = F.col("w_mtime") == F.col("o_mtime")
    band = cfg.hour_band
    if band is None:
        return exact
    delta_h = (
        F.col("w_mtime").cast("double") - F.col("o_mtime").cast("double")
    ) / 3600.0
    return exact | ((delta_h >= F.lit(band[0])) & (delta_h <= F.lit(band[1])))


def verify_pairs(pairs: DataFrame, cfg: DedupConfig) -> DataFrame:
    """V1-V3 verification predicates, cheap-first like the reference's
    short-circuit chain (deduplidog.py:707-715)."""
    out = pairs
    if not cfg.ignore_size:
        out = out.filter(F.col("w_size") == F.col("o_size"))  # V1
    out = out.filter(date_predicate(cfg))  # V2
    if cfg.checksum:
        out = out.filter(F.col("w_sha") == F.col("o_sha"))  # V3
    return out


def first_match(verified: DataFrame) -> DataFrame:
    """J9/W1/W5: first verified candidate per work file in deterministic
    scan order (orderBy(repo, path) replaces rglob order — Spark has no
    implicit row order, SURVEY W5). Top-1-per-group window; the
    partition key (work file) is unique-ish so no skew."""
    w = Window.partitionBy("w_repo", "w_path").orderBy("o_repo", "o_path")
    return (
        verified.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def with_warnings(matches: DataFrame, cfg: DedupConfig) -> DataFrame:
    """X6 warning gate (deduplidog.py:529-566):

    - SIZE WARNING — the would-be-affected work file is bigger than the
      original (you may be deleting the better copy);
    - DATE WARNING — the work file is older by ≥ 1 s (sub-second
      differences neglected, deduplidog.py:554-558).

    A warned action is skipped unless neglect_warning, but still logged.
    """
    size_warn = F.col("w_size") > F.col("o_size")
    date_warn = (
        F.col("o_mtime").cast("double") - F.col("w_mtime").cast("double")
    ) >= 1.0
    out = matches.withColumn("size_warning", size_warn).withColumn(
        "date_warning", date_warn
    )
    warned = F.col("size_warning") | F.col("date_warning")
    action = F.when(
        warned & F.lit(not cfg.neglect_warning), F.lit("skipped")
    ).otherwise(F.lit(cfg.action))
    return out.withColumn("action_effective", action)


def name_date_matches(files: DataFrame, cfg: DedupConfig) -> DataFrame:
    """The full default-mode dataflow: candidates → verify → first match
    → warnings. ``invert_selection`` (J8) returns work files with NO
    verified match instead (left-anti, deduplidog.py:128-129,513-516)."""
    files = _ensure_ingested(files, cfg)
    pairs = candidate_pairs(files, cfg)
    verified = verify_pairs(pairs, cfg)
    if cfg.invert_selection:
        work, _ = split_roles(files, cfg)
        return work.join(
            verified.select("w_repo", "w_path").distinct(),
            (work["repo"] == F.col("w_repo")) & (work["path"] == F.col("w_path")),
            "left_anti",
        )
    return with_warnings(first_match(verified), cfg)


def multi_candidate_report(files: DataFrame, cfg: DedupConfig) -> DataFrame:
    """J10/A4: work files with several candidates but no verified match
    (deduplidog.py:251-252,517-519)."""
    files = _ensure_ingested(files, cfg)
    pairs = candidate_pairs(files, cfg)
    verified = verify_pairs(pairs, cfg).select("w_repo", "w_path").distinct()
    unverified = pairs.join(verified, ["w_repo", "w_path"], "left_anti")
    return (
        unverified.groupBy("w_repo", "w_path")
        .agg(
            F.count("*").alias("n_candidates"),
            F.array_sort(
                F.collect_list(F.concat_ws("/", "o_repo", "o_path"))
            ).alias("candidates"),
        )
        .filter(F.col("n_candidates") > 1)
    )
