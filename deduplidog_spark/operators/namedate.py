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
        F.lit(cfg.skip_bigger) & F.col("size_warning"), F.lit("skipped")
    ).when(
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


def pair_plan(matches: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Name-mode action plan straight from the per-pair match table —
    role-aware, like the reference's ``_affect`` (deduplidog.py:523-566):

    - the WORK file is affected, the ORIGINAL keeps — never the other
      way around (role-blind cluster election could target an original
      when e.g. action='delete' and the work file won a tie-break);
    - ``treat_bigger_as_original`` swaps the pair's roles when the work
      file is bigger (deduplidog.py:73-75,529-535): the bigger file
      keeps, the original becomes the affected one;
    - ``skip_bigger`` skips affecting a bigger work file outright
      (deduplidog.py:76-78,536-540);
    - SIZE/DATE warnings are evaluated on the post-swap roles and gate
      the action to 'skipped' unless ``neglect_warning`` (X6,
      deduplidog.py:541-566);
    - ``set_both_to_older_date`` redates both sides of the pair to the
      older mtime (X5, deduplidog.py:681-696).

    One plan row per affected file + one 'keep' row per surviving
    keeper. A file that is affected in one pair and keeper in another
    (self-dedupe chains) ends affected — the reference's sequential
    scan reaches it as a work file eventually too.
    """
    w_fid = F.concat_ws("/", "w_repo", "w_path")
    o_fid = F.concat_ws("/", "o_repo", "o_path")
    swap = F.lit(cfg.treat_bigger_as_original) & (
        F.col("w_size") > F.col("o_size")
    )

    def pick(w_col: str, o_col: str):
        return F.when(swap, F.col(o_col)).otherwise(F.col(w_col))

    pairs = matches.select(
        F.when(swap, o_fid).otherwise(w_fid).alias("fid"),
        pick("w_repo", "o_repo").alias("repo"),
        pick("w_path", "o_path").alias("path"),
        pick("w_size", "o_size").alias("aff_size"),
        pick("w_mtime", "o_mtime").alias("aff_mtime"),
        F.when(swap, w_fid).otherwise(o_fid).alias("keep_fid"),
        pick("o_repo", "w_repo").alias("keep_repo"),
        pick("o_path", "w_path").alias("keep_path"),
        pick("o_size", "w_size").alias("keep_size"),
        pick("o_mtime", "w_mtime").alias("keep_mtime"),
    )
    size_warn = F.col("aff_size") > F.col("keep_size")
    date_warn = (
        F.col("keep_mtime").cast("double") - F.col("aff_mtime").cast("double")
    ) >= 1.0
    base = F.when(
        F.lit(cfg.skip_bigger) & size_warn, F.lit("skipped")
    ).otherwise(F.lit(cfg.action))
    warned = size_warn | date_warn
    effective = F.when(
        warned & F.lit(not cfg.neglect_warning), F.lit("skipped")
    ).otherwise(base)
    older = F.least("aff_mtime", "keep_mtime")
    aff_new_mtime = older if cfg.set_both_to_older_date else F.col("aff_mtime")

    affected = pairs.select(
        "fid",
        "repo",
        "path",
        F.col("keep_fid").alias("component"),
        F.lit(False).alias("is_keeper"),
        F.col("keep_fid").alias("duplicate_of"),
        base.alias("action"),
        size_warn.alias("size_warning"),
        date_warn.alias("date_warning"),
        effective.alias("action_effective"),
        aff_new_mtime.alias("new_mtime"),
    )
    keep_new_mtime = (
        F.min(older) if cfg.set_both_to_older_date else F.min(F.col("keep_mtime"))
    )
    keepers = (
        pairs.groupBy(F.col("keep_fid").alias("fid"))
        .agg(
            F.first("keep_repo").alias("repo"),
            F.first("keep_path").alias("path"),
            keep_new_mtime.alias("new_mtime"),
        )
        .join(affected.select("fid"), "fid", "left_anti")
        .select(
            "fid",
            "repo",
            "path",
            F.col("fid").alias("component"),
            F.lit(True).alias("is_keeper"),
            F.lit(None).cast("string").alias("duplicate_of"),
            F.lit("keep").alias("action"),
            F.lit(False).alias("size_warning"),
            F.lit(False).alias("date_warning"),
            F.lit("keep").alias("action_effective"),
            F.col("new_mtime"),
        )
    )
    return affected.unionByName(keepers)


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
