"""Cross-commit version operators over the contract's ``commit`` column.

The input contract (BASELINE.json input_hint) is an Iceberg table of
source-code repositories ``(repo, path, commit, lang, content)`` — at
10^12-file scale the dominant duplicate class is not cross-repo forks
but *versions of the same path across commits*: most files are
untouched by most commits, so a naive snapshot-per-commit corpus is
overwhelmingly N identical copies per path. These operators collapse
that axis BEFORE the content-similarity pipeline runs, which is the
single biggest corpus reduction available (it needs no signatures —
just a window over the natural key).

This generalizes the reference's date-based keeper election
(deduplidog.py:73-75,681-696: prefer the newer/older copy inside a
duplicate set) to the commit axis: the duplicate set is implicit in
the key (repo, path), and the election order is commit recency.

Scale posture: one shuffle on (repo, path) — a high-cardinality
composite key with bounded group size (≤ number of commits touching
that path), so it partitions evenly with no skew cliff; everything
else is per-partition window arithmetic in whole-stage codegen. The
content column never moves: windows carry only the key, the commit
ordinal, and the 32-byte sha.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def commits_look_unsortable(files: DataFrame, sample: int = 64) -> bool:
    """Heuristic guard for the default commit-string ordering: sample a
    few distinct ``commit`` values and report whether they are
    git-SHA-shaped (uniform-width hex, ≥ 7 chars) — lexicographic order
    over those is meaningless, so the caller should demand an explicit
    ``order_by`` (commit timestamp / topological ordinal) instead of
    silently electing the lexicographically-largest hash as "newest".

    Deliberately a separate, eager helper (runs one tiny ``limit``
    job) rather than a check inside the operators: the operators are
    lazy plan builders and must not launch jobs at plan time. The CLI
    calls this when ``--collapse-versions`` is passed without
    ``--version-order-col``."""
    # distinct BEFORE the final limit — a bare limit() samples whatever
    # partition comes first, masking a git-SHA majority behind one
    # counter-committed repo — but bound the distinct's input first: an
    # unbounded corpus-wide distinct would shuffle every commit value
    # of a lake-scale table just to print a warning. 100k rows spans
    # many partitions while keeping the aggregation trivial.
    vals = [
        r[0]
        for r in files.select("commit")
        .limit(100_000)
        .distinct()
        .limit(sample)
        .collect()
        if r[0] is not None
    ]
    if not vals:
        return False
    hexdigits = set("0123456789abcdefABCDEF")
    widths = {len(v) for v in vals}
    return (
        len(widths) == 1
        and widths.pop() >= 7
        and all(set(v) <= hexdigits for v in vals)
        # all-digit counters / timestamps DO sort — only flag when some
        # value actually uses a hex letter
        and any(not v.isdigit() for v in vals)
    )


def _order_col(files: DataFrame, order_by: str | Column | None) -> Column:
    """Commit recency order. Default: the ``commit`` string itself —
    correct for sortable ids (generation counters, zero-padded seqs,
    timestamps). For real git SHAs pass an explicit ordinal column
    (commit timestamp / topological index) — hashes do not sort."""
    if order_by is None:
        return F.col("commit")
    return F.col(order_by) if isinstance(order_by, str) else order_by


def version_keeper(
    files: DataFrame, order_by: str | Column | None = None
) -> DataFrame:
    """One keeper per (repo, path) across commits — newest wins.

    Emits one row per version: ``repo, path, commit, is_keeper,
    keeper_commit, n_versions, action`` (``keep`` | ``supersede``).
    Single-version paths pass through as keepers, so downstream stages
    can filter ``action = 'keep'`` to get the latest-snapshot corpus.

    Ties on the order column break on the commit string ascending so
    the election is deterministic (W5)."""
    ordc = _order_col(files, order_by)
    w = Window.partitionBy("repo", "path").orderBy(
        ordc.desc(), F.col("commit").asc()
    )
    ws = Window.partitionBy("repo", "path")
    return (
        files.withColumn("_rn", F.row_number().over(w))
        .withColumn("keeper_commit", F.first("commit").over(w))
        .withColumn("n_versions", F.count("*").over(ws))
        .select(
            "repo",
            "path",
            "commit",
            (F.col("_rn") == 1).alias("is_keeper"),
            "keeper_commit",
            "n_versions",
            F.when(F.col("_rn") == 1, F.lit("keep"))
            .otherwise(F.lit("supersede"))
            .alias("action"),
        )
    )


def latest_versions(
    files: DataFrame, order_by: str | Column | None = None
) -> DataFrame:
    """The newest-snapshot corpus: keep exactly the keeper row per
    (repo, path), all input columns intact — the pre-stage
    ``DedupConfig(collapse_versions=True)`` runs before ingest so the
    signature pipeline never sees superseded versions.

    Cost model: one window exchange on (repo, path) over FULL rows
    (content rides this shuffle once — unavoidable on unclustered
    input, since electing among versions requires co-locating them;
    the pipeline materializes the collapsed snapshot as a checkpoint
    stage so its several downstream consumers re-SCAN the survivors
    instead of re-executing this shuffle). On an Iceberg table
    write-distributed / bucketed by (repo, path) — the natural layout
    for a commit-snapshot corpus — Catalyst elides the exchange
    entirely and the collapse is scan-local."""
    ordc = _order_col(files, order_by)
    w = Window.partitionBy("repo", "path").orderBy(
        ordc.desc(), F.col("commit").asc()
    )
    return (
        files.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def unchanged_across_commits(
    files: DataFrame, order_by: str | Column | None = None
) -> DataFrame:
    """Versions whose content is byte-identical to the path's previous
    commit (``sha`` equal to the lag-1 version) — the no-op-change rows
    a commit-snapshot corpus is mostly made of.

    Input needs a ``sha`` column (ingest provides sha256 of content;
    NULL shas — quarantined rows — never match, mirroring the NULL-sha
    hygiene of the signature stages). Emits ``repo, path, commit,
    prev_commit, sha`` for exactly the redundant versions, so
    ``files.join(out, ["repo","path","commit"], "left_anti")`` is the
    change-only corpus."""
    ordc = _order_col(files, order_by)
    w = Window.partitionBy("repo", "path").orderBy(
        ordc.asc(), F.col("commit").asc()
    )
    lag_sha = F.lag("sha").over(w)
    lag_commit = F.lag("commit").over(w)
    return (
        files.withColumn("_prev_sha", lag_sha)
        .withColumn("prev_commit", lag_commit)
        .filter(
            F.col("sha").isNotNull() & (F.col("sha") == F.col("_prev_sha"))
        )
        .select("repo", "path", "commit", "prev_commit", "sha")
    )
