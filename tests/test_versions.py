"""Cross-commit version operators (operators/versions.py): newest-wins
keeper per (repo, path) and unchanged-across-commits detection."""

from pyspark.sql import functions as F

from deduplidog_spark import DedupConfig
from deduplidog_spark.ingest import ingest
from deduplidog_spark.operators.versions import (
    unchanged_across_commits,
    version_keeper,
)


def _history(spark):
    rows = [
        # r1/a.py: c2 repeats c1's bytes, c3 edits, c4 repeats c3
        ("r1", "a.py", "c1", "py", "v1 body"),
        ("r1", "a.py", "c2", "py", "v1 body"),
        ("r1", "a.py", "c3", "py", "v2 body"),
        ("r1", "a.py", "c4", "py", "v2 body"),
        # r1/b.py: single version
        ("r1", "b.py", "c3", "py", "only"),
        # r2/a.py: same path in another repo — independent history
        ("r2", "a.py", "c1", "py", "other"),
        ("r2", "a.py", "c2", "py", "other2"),
        # r1/broken.py: quarantined (NULL content) twice — NULL sha
        # must never count as "unchanged"
        ("r1", "broken.py", "c1", "py", None),
        ("r1", "broken.py", "c2", "py", None),
    ]
    return spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )


def test_version_keeper_newest_wins_per_path(spark):
    files = ingest(_history(spark), DedupConfig(mode="exact", skip_empty=False))
    out = version_keeper(files)
    keepers = {
        (r.repo, r.path): (r.commit, r.n_versions)
        for r in out.filter("is_keeper").collect()
    }
    assert keepers == {
        ("r1", "a.py"): ("c4", 4),
        ("r1", "b.py"): ("c3", 1),
        ("r2", "a.py"): ("c2", 2),
        ("r1", "broken.py"): ("c2", 2),
    }
    losers = out.filter("NOT is_keeper")
    assert losers.count() == 5
    assert losers.filter(F.col("action") != "supersede").count() == 0
    # every version row knows its keeper
    assert out.filter(
        (F.col("repo") == "r1") & (F.col("path") == "a.py")
        & (F.col("keeper_commit") != "c4")
    ).count() == 0


def test_version_keeper_injectable_order(spark):
    """With an explicit recency ordinal (git SHAs don't sort), the
    election follows the ordinal, not the commit string."""
    files = ingest(_history(spark), DedupConfig(mode="exact", skip_empty=False))
    # reverse ordinal: c1 is "newest"
    files = files.withColumn(
        "commit_ts", -F.ascii(F.substring("commit", 2, 1)).cast("long")
    )
    out = version_keeper(files, order_by="commit_ts")
    keeper = out.filter(
        "is_keeper AND repo = 'r1' AND path = 'a.py'"
    ).collect()
    assert [r.commit for r in keeper] == ["c1"]


def test_unchanged_across_commits_and_change_only_corpus(spark):
    files = ingest(_history(spark), DedupConfig(mode="exact", skip_empty=False))
    redundant = unchanged_across_commits(files)
    got = {
        (r.repo, r.path, r.commit, r.prev_commit) for r in redundant.collect()
    }
    # NULL-content versions never match (NULL sha), single versions
    # have no lag, r2's two versions differ
    assert got == {
        ("r1", "a.py", "c2", "c1"),
        ("r1", "a.py", "c4", "c3"),
    }
    change_only = files.join(
        redundant.select("repo", "path", "commit"),
        ["repo", "path", "commit"],
        "left_anti",
    )
    assert change_only.count() == files.count() - 2


def test_pipeline_collapse_versions_pre_stage(spark):
    """DedupConfig(collapse_versions=True): the pipeline sees only the
    newest version per (repo, path) — its plan equals dedupe() over the
    manually collapsed corpus, and superseded versions never appear."""
    from deduplidog_spark.operators.versions import latest_versions
    from deduplidog_spark.pipeline import dedupe

    raw = (
        _history(spark)
        .withColumn("mtime", F.lit("2026-01-01 00:00:00").cast("timestamp"))
        .withColumn("is_symlink", F.lit(False))
    )
    cfg = DedupConfig(mode="exact", collapse_versions=True)
    res = dedupe(raw, cfg)
    got = {(r.repo, r.path) for r in res.files.select("repo", "path").collect()}
    # one surviving row per (repo, path); quarantined-only path kept
    assert got == {
        ("r1", "a.py"), ("r1", "b.py"), ("r2", "a.py"), ("r1", "broken.py")
    }
    manual = dedupe(latest_versions(raw), DedupConfig(mode="exact"))
    assert sorted(res.plan.collect()) == sorted(manual.plan.collect())


def test_versions_match_python_model_on_random_histories(spark):
    """Randomized (seeded) histories vs a pure-Python model: keeper =
    max commit per (repo, path), unchanged = adjacent equal contents in
    commit order — one Spark job over all histories at once."""
    import random

    rng = random.Random(20260817)
    rows = []
    for r in range(12):
        repo = f"repo{r}"
        for p in range(rng.randint(1, 5)):
            path = f"f{p}.py"
            n_versions = rng.randint(1, 7)
            body = f"seed {r}/{p}"
            for v in range(n_versions):
                if rng.random() < 0.4 and v > 0:
                    pass  # body unchanged from the previous version
                else:
                    body = f"body {r}/{p}/{v}"
                rows.append((repo, path, f"c{v:03d}", "py", body))
    df = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    ).withColumn("sha", F.sha2("content", 256))

    # python model
    hist = {}
    for repo, path, commit, _, body in rows:
        hist.setdefault((repo, path), []).append((commit, body))
    want_keeper = {k: max(v)[0] for k, v in hist.items()}
    want_unchanged = {
        (k[0], k[1], vs[i][0], vs[i - 1][0])
        for k, vs in ((k, sorted(v)) for k, v in hist.items())
        for i in range(1, len(vs))
        if vs[i][1] == vs[i - 1][1]
    }

    got_keeper = {
        (r.repo, r.path): r.commit
        for r in version_keeper(df).filter("is_keeper").collect()
    }
    assert got_keeper == want_keeper
    got_unchanged = {
        (r.repo, r.path, r.commit, r.prev_commit)
        for r in unchanged_across_commits(df).collect()
    }
    assert got_unchanged == want_unchanged


def test_streaming_append_rejects_collapse_versions(spark, tmp_path):
    """The streaming append path must reject collapse_versions BEFORE
    the StreamingQuery starts, not asynchronously inside the first
    micro-batch."""
    import pytest as _pytest

    from deduplidog_spark.streaming.incremental import streaming_append_dedupe

    cfg = DedupConfig(mode="exact", collapse_versions=True)
    with _pytest.raises(ValueError, match="streaming append path"):
        streaming_append_dedupe(
            _history(spark), cfg, str(tmp_path / "state"), str(tmp_path / "qc")
        )


def test_incremental_rejects_collapse_versions(spark):
    """A batch can supersede base versions, so collapse_versions under
    --append cannot hold the equals-full-recompute guarantee — the
    incremental path must fail fast, not silently collapse batch-only."""
    import pytest as _pytest

    from deduplidog_spark.incremental import BaseState, incremental_dedupe

    cfg = DedupConfig(mode="exact", collapse_versions=True)
    with _pytest.raises(ValueError, match="full-run pre-stage"):
        incremental_dedupe(
            _history(spark), cfg, BaseState(files=None, bands=None, labels=None)
        )
