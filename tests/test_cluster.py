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


def test_keeper_is_biggest_then_oldest(spark):
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
    labels = _edges(
        spark, [("r/small.txt", "r/big_new.txt"), ("r/big_new.txt", "r/big_old.txt")]
    )
    labels = connected_components(labels)
    out = {r.fid: r for r in elect_keepers(files, labels).collect()}
    # biggest wins; tie on size broken by older mtime (W3/W4)
    assert out["r/big_old.txt"].is_keeper
    assert not out["r/small.txt"].is_keeper
    assert out["r/small.txt"].duplicate_of == "r/big_old.txt"
    assert out["r/big_new.txt"].duplicate_of == "r/big_old.txt"
    # cluster_min_mtime = T0 propagated to all members (X5 redate)
    assert all(r.cluster_min_mtime == FX.T0.replace(tzinfo=None) for r in out.values())
