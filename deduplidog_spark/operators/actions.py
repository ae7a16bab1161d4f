"""Action-plan emission (SURVEY §2.8 X1-X6, S6-S7).

The reference mutates the filesystem (rename/delete/copy/symlink/utime,
deduplidog.py:613-696); a table engine emits an **action-plan table**
instead — one row per affected file with the decided action, warning
flags, and the redate target. Appliers (an Iceberg MERGE INTO or an FS
job) consume it; the plan table doubles as the change log / audit
record (the reference's ``Change`` dict, deduplidog.py:32-33,584) and
as the idempotence marker source (F1: anti-join next run's input
against prior plans instead of the "✓" filename prefix).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deduplidog_spark.config import DedupConfig

PLAN_COLUMNS = [
    "fid",
    "repo",
    "path",
    "component",
    "is_keeper",
    "duplicate_of",
    "action",
    "size_warning",
    "date_warning",
    "action_effective",
    "new_mtime",
]


def action_plan(clustered: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Clustered members (from cluster.elect_keepers) → plan rows.

    - keepers get action 'keep' (they survive, like the reference's
      original / the swap target of treat_bigger_as_original);
    - duplicates get cfg.action, downgraded to 'skipped' when warned
      and warnings are not neglected (X6, deduplidog.py:565-566);
    - ``new_mtime`` = min mtime over the cluster when
      set_both_to_older_date (X5 — resolved cluster-at-once, so the
      oldest of a multi-dup chain wins, matching the launch-time
      resolution note at deduplidog.py:681-690).
    """
    # keeper attributes via filter + join, not a component window: an
    # unordered window still funnels the WHOLE component into one task
    # (a 100M-copy boilerplate cluster = one straggler) to read the one
    # keeper row; elect_keepers guarantees exactly one keeper per
    # component, so this join is 1:n by construction
    keepers = clustered.filter(F.col("is_keeper")).select(
        "component",
        F.col("size").alias("keeper_size"),
        F.col("mtime").alias("keeper_mtime"),
    )
    m = clustered.join(keepers, "component", "left")
    size_warn = (~F.col("is_keeper")) & (F.col("size") > F.col("keeper_size"))
    date_warn = (~F.col("is_keeper")) & (
        (F.col("keeper_mtime").cast("double") - F.col("mtime").cast("double")) >= 1.0
    )
    base_action = F.when(F.col("is_keeper"), F.lit("keep")).otherwise(F.lit(cfg.action))
    if cfg.skip_bigger:
        base_action = F.when(
            (~F.col("is_keeper")) & (F.col("size") > F.col("keeper_size")),
            F.lit("skipped"),
        ).otherwise(base_action)
    warned = size_warn | date_warn
    effective = F.when(
        (~F.col("is_keeper")) & warned & F.lit(not cfg.neglect_warning),
        F.lit("skipped"),
    ).otherwise(base_action)
    new_mtime = (
        F.col("cluster_min_mtime") if cfg.set_both_to_older_date else F.col("mtime")
    )
    return m.select(
        "fid",
        "repo",
        "path",
        "component",
        "is_keeper",
        "duplicate_of",
        base_action.alias("action"),
        size_warn.alias("size_warning"),
        date_warn.alias("date_warning"),
        effective.alias("action_effective"),
        new_mtime.alias("new_mtime"),
    )


def longest_common_prefix(a, b):
    """LCP length of two string columns, pure JVM: prefix-equality is
    monotone in i, so Σ_i [a[:i] == b[:i]] IS the LCP length — one
    aggregate over a position sequence, no UDF."""
    n = F.least(F.length(a), F.length(b))
    lcp = F.aggregate(
        F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
        F.lit(0),
        lambda acc, i: acc
        + F.when(a.substr(F.lit(1), i) == b.substr(F.lit(1), i), 1).otherwise(0),
    )
    return F.when(n < 1, F.lit(0)).otherwise(lcp)


def cluster_common_prefix(clustered: DataFrame) -> DataFrame:
    """A5 common-prefix display (deduplidog.py:301-302,793: duplicate
    sets print as ``prefix{suffix1,suffix2,…}``): per component, the
    longest common prefix of all member fids. Because members sort
    lexicographically, LCP(set) == LCP(min, max) — so the whole display
    column costs ONE groupBy, not a per-pair fold."""
    agg = clustered.groupBy("component").agg(
        F.min("fid").alias("mn"),
        F.max("fid").alias("mx"),
        F.count("*").alias("n_members"),
    )
    lcp = longest_common_prefix(F.col("mn"), F.col("mx"))
    return agg.select(
        "component",
        "n_members",
        F.col("mn").substr(F.lit(1), lcp).alias("common_prefix"),
    )


def revert_plan(plan: DataFrame) -> DataFrame:
    """X8 un-mark utility (reference utils.py:169-174 strips the '✓'
    prefix a prior run added): invert a previously-emitted plan into
    the retraction plan an applier consumes to undo it.

    Only rows whose action actually fired are inverted (keepers and
    'skipped' rows were no-ops). ``new_mtime`` is NULL in the inverse —
    the forward plan doesn't carry the pre-redate mtime, so an applier
    that needs exact restoration must keep its own change log (the
    reference has the same limitation: un-marking restores the name,
    not the mtime)."""
    inverse = (
        F.when(F.col("action_effective") == "mark", F.lit("unmark"))
        .when(F.col("action_effective") == "delete", F.lit("restore"))
        .when(F.col("action_effective") == "replace", F.lit("restore"))
        .when(F.col("action_effective") == "link", F.lit("unlink"))
    )
    fired = plan.filter(
        (~F.col("is_keeper"))
        & ~F.col("action_effective").isin("skipped", "keep", "none")
    )
    return fired.select(
        "fid",
        "repo",
        "path",
        "component",
        "is_keeper",
        "duplicate_of",
        inverse.alias("action"),
        F.lit(False).alias("size_warning"),
        F.lit(False).alias("date_warning"),
        inverse.alias("action_effective"),
        F.lit(None).cast("timestamp").alias("new_mtime"),
    )


def mark_symlinks_by_target(
    files: DataFrame, starting_path: str, target_col: str = "symlink_target"
) -> DataFrame:
    """X9a symlink janitor (reference utils.py:177-187
    ``mark_symlink_by_target``: renames with a '→' prefix every symlink
    whose resolved target lies under ``starting_path``): emitted here
    as 'mark_symlink' plan rows over the files table — FS mutation
    stays plan-driven like X1-X5.

    Expects a ``target_col`` string column (the scan records the link
    target; ``read_binary_tree`` rows that aren't symlinks carry NULL).
    """
    hit = (
        F.col("is_symlink")
        & F.col(target_col).isNotNull()
        & F.col(target_col).startswith(starting_path)
    )
    return files.filter(hit).select(
        F.concat_ws("/", "repo", "path").alias("fid"),
        "repo",
        "path",
        F.col(target_col).alias("target"),
        F.lit("mark_symlink").alias("action"),
    )


def symlink_only_dirs(files: DataFrame) -> DataFrame:
    """X9b (reference utils.py:189-193 ``mark_symlink_only_dirs``:
    renames directories that contain only symlinks): per (repo,
    directory) group, flag those whose every member is a symlink — one
    bool_and aggregate. Empty directories don't exist in a table of
    files, so the reference's "or empty" clause is vacuous here."""
    dirname = F.when(
        F.col("path").contains("/"),
        F.regexp_replace(F.col("path"), "/[^/]*$", ""),
    ).otherwise(F.lit(""))
    return (
        files.withColumn("dir", dirname)
        .groupBy("repo", "dir")
        .agg(
            F.count("*").alias("n_files"),
            F.bool_and(F.col("is_symlink")).alias("all_symlinks"),
        )
        .filter(F.col("all_symlinks"))
        .select("repo", "dir", "n_files")
    )


def run_metrics(plan: DataFrame, files: DataFrame) -> DataFrame:
    """A3 run counters as one aggregate row: affected count/size,
    warning count, ignored count (deduplidog.py:243-252,315-325)."""
    affected = F.sum(
        F.when(
            (~F.col("is_keeper")) & (F.col("action_effective") != "skipped"), 1
        ).otherwise(0)
    )
    plan_with_size = plan.join(
        files.select(
            F.concat_ws("/", "repo", "path").alias("fid"),
            F.col("size").alias("f_size"),
        ),
        "fid",
    )
    agg = plan_with_size.agg(
        affected.alias("affected_count"),
        F.sum(
            F.when(
                (~F.col("is_keeper")) & (F.col("action_effective") != "skipped"),
                F.col("f_size"),
            ).otherwise(0)
        ).alias("size_affected"),
        F.sum(
            F.when(F.col("size_warning") | F.col("date_warning"), 1).otherwise(0)
        ).alias("warning_count"),
        F.sum(F.when(F.col("action_effective") == "skipped", 1).otherwise(0)).alias(
            "skipped_count"
        ),
    )
    if "quarantined" in files.columns:
        q = files.agg(
            F.sum(F.when(F.col("quarantined"), 1).otherwise(0))
            .cast("long")
            .alias("quarantined_count")
        )
        return agg.crossJoin(q)  # two 1-row aggregates
    return agg.withColumn("quarantined_count", F.lit(0).cast("long"))
