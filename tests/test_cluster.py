"""Connected-components + keeper election unit tests."""

from datetime import timedelta

from deduplidog_spark import DedupConfig
from deduplidog_spark import fixtures as FX
from deduplidog_spark.operators.cluster import connected_components, elect_keepers


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "id_a string, id_b string")


def test_cc_chain_and_islands(spark):
    # a-b-c-d chain + isolated pair e-f; g never appears
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("e", "f")])
    labels = {r.fid: r.component for r in connected_components(e).collect()}
    assert labels == {"a": "a", "b": "a", "c": "a", "d": "a", "e": "e", "f": "e"}


def test_cc_converges_on_cycle(spark):
    e = _edges(spark, [("x", "y"), ("y", "z"), ("z", "x")])
    labels = {r.fid: r.component for r in connected_components(e).collect()}
    assert set(labels.values()) == {"x"}


def test_cc_long_path_needs_iterations(spark):
    n = 12
    e = _edges(spark, [(f"n{i:02d}", f"n{i + 1:02d}") for i in range(n)])
    labels = {r.fid: r.component for r in connected_components(e, max_iterations=30).collect()}
    assert set(labels.values()) == {"n00"}
    assert len(labels) == n + 1


def test_cc_chain_longer_than_cap_converges_via_shortcut(spark):
    """Pointer-doubling regression pin: a 60-node chain (gradually
    evolving near-dup versions) converges WITHIN the default cap of
    20 — plain neighbor propagation moves the min one hop per round
    and would need 59. Before the shortcut this returned silently
    WRONG labels (one true component split into dozens)."""
    e = _edges(spark, [(f"n{i:03d}", f"n{i + 1:03d}") for i in range(59)])
    labels = {r.fid: r.component for r in connected_components(e).collect()}
    assert set(labels.values()) == {"n000"}
    assert len(labels) == 60


def test_cc_raises_instead_of_returning_unconverged_labels(spark):
    """Exhausting max_iterations must raise, never hand keeper
    election a label table that splits true components."""
    import pytest

    e = _edges(spark, [(f"n{i:03d}", f"n{i + 1:03d}") for i in range(59)])
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(e, max_iterations=2).collect()


def _keeper_fixture(spark):
    rows = [
        dict(repo="r", path="small.txt", commit="c0", lang="txt",
             content="x" * 10, mtime=FX.T0, is_symlink=False),
        dict(repo="r", path="big_new.txt", commit="c0", lang="txt",
             content="y" * 50, mtime=FX.T0 + timedelta(days=1), is_symlink=False),
        dict(repo="r", path="big_old.txt", commit="c0", lang="txt",
             content="z" * 50, mtime=FX.T0, is_symlink=False),
    ]
    from deduplidog_spark.ingest import ingest
    from pyspark.sql import functions as F

    files = ingest(FX.to_spark_df(spark, rows), DedupConfig()).withColumn(
        "fid", F.concat_ws("/", "repo", "path")
    )
    labels = connected_components(
        _edges(spark, [("r/small.txt", "r/big_new.txt"), ("r/big_new.txt", "r/big_old.txt")])
    )
    return files, labels


def test_cluster_common_prefix(spark):
    """A5: per-component longest common fid prefix (display helper)."""
    from deduplidog_spark.operators.actions import cluster_common_prefix

    rows = [
        ("photos/2021/IMG_001.jpg", "c1"),
        ("photos/2021/IMG_002.jpg", "c1"),
        ("photos/2021/IMG_100.jpg", "c1"),
        ("a.txt", "c2"),
        ("b.txt", "c2"),
        ("same/path.txt", "c3"),
    ]
    df = spark.createDataFrame(rows, "fid string, component string")
    out = {r.component: r for r in cluster_common_prefix(df).collect()}
    assert out["c1"].common_prefix == "photos/2021/IMG_"
    assert out["c1"].n_members == 3
    assert out["c2"].common_prefix == ""
    assert out["c3"].common_prefix == "same/path.txt"


def test_keeper_default_is_scan_order(spark):
    """Reference default: the first file in deterministic scan order
    keeps regardless of size (deduplidog.py:73-78 default off)."""
    files, labels = _keeper_fixture(spark)
    out = {r.fid: r for r in elect_keepers(files, labels).collect()}
    assert out["r/big_new.txt"].is_keeper  # lexicographically first
    assert out["r/small.txt"].duplicate_of == "r/big_new.txt"
    assert out["r/big_old.txt"].duplicate_of == "r/big_new.txt"
    # cluster_min_mtime = T0 propagated to all members (X5 redate)
    assert all(r.cluster_min_mtime == FX.T0.replace(tzinfo=None) for r in out.values())


def test_keeper_treat_bigger_as_original(spark):
    """treat_bigger_as_original → biggest wins; size tie broken by
    older mtime (W3/W4, deduplidog.py:73-75,529-535)."""
    files, labels = _keeper_fixture(spark)
    cfg = DedupConfig(treat_bigger_as_original=True)
    out = {r.fid: r for r in elect_keepers(files, labels, cfg).collect()}
    assert out["r/big_old.txt"].is_keeper
    assert not out["r/small.txt"].is_keeper
    assert out["r/small.txt"].duplicate_of == "r/big_old.txt"
    assert out["r/big_new.txt"].duplicate_of == "r/big_old.txt"


def test_cc_durable_rounds_resume_without_recomputing_edges(spark):
    """Round-3 VERDICT item 6: with a checkpoint target configured, CC
    rounds are parquet-backed (cc_edges / cc_r*), so the chain survives
    executor loss and a rerun resumes from the round tables. Proven by
    rerunning against the same checkpoint with a POISONED edge input:
    if any round recomputed from edges instead of reading its stage
    table, the rerun would raise (or labels would change)."""
    import tempfile

    from pyspark.sql import functions as F

    from deduplidog_spark.pipeline import _cc_materializer

    cfg = DedupConfig(
        mode="minhash", checkpoint_dir=tempfile.mkdtemp(prefix="cc_durable_")
    )
    e = _edges(spark, [("a", "b"), ("b", "c"), ("e", "f")])
    mat = _cc_materializer(cfg)
    assert mat is not None
    first = {
        r.fid: r.component
        for r in connected_components(e, materialize=mat).collect()
    }
    assert first == {"a": "a", "b": "a", "c": "a", "e": "e", "f": "e"}
    # the stage tables are on disk, fingerprint-keyed like every stage
    import os

    run_dir = os.path.join(cfg.checkpoint_dir, cfg.fingerprint())
    assert os.path.exists(os.path.join(run_dir, "cc_edges", "_SUCCESS"))
    assert os.path.exists(os.path.join(run_dir, "cc_r0", "_SUCCESS"))

    # "kill the state": a rerun gets an edge plan that fails if it is
    # ever evaluated — resume must come from the round tables alone
    @F.udf("string")
    def boom(x):
        raise RuntimeError("edge plan re-evaluated during resume")

    poisoned = e.select(boom("id_a").alias("id_a"), boom("id_b").alias("id_b"))
    again = {
        r.fid: r.component
        for r in connected_components(poisoned, materialize=mat).collect()
    }
    assert again == first


def test_cc_without_target_still_local(spark):
    """No checkpoint target → materializer is None → localCheckpoint
    path unchanged."""
    from deduplidog_spark.pipeline import _cc_materializer

    assert _cc_materializer(DedupConfig(mode="exact")) is None
