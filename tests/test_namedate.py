"""Golden parity tests vs the reference's own test matrix.

Corpus A reproduces /root/reference/tests/test_deduplidog.py:39-85
(mtime tolerance matrix); Corpus B reproduces tests/test_disk.py:10-27
(name blocking both directions, symlink exclusion). Expected sets are
the reference's assertions translated to rows (FIXTURES.md §1-2).
"""

import pytest

from deduplidog_spark import DedupConfig
from deduplidog_spark import fixtures as FX
from deduplidog_spark.operators.namedate import name_date_matches

BASE = DedupConfig(work_repo="work", original_repo="originals")

CASES = [
    ("default", BASE, {11}, set()),
    ("ignore_date", BASE.with_(ignore_date=True), {4, 5, 6, 7, 11}, {8, 9, 10}),
    (
        "ignore_date_neglect",
        BASE.with_(ignore_date=True, neglect_warning=True),
        {4, 5, 6, 7, 8, 9, 10, 11},
        set(),
    ),
    ("tolerate1", BASE.with_(tolerate_hour=1), {4, 7, 11}, {8, 9}),
    (
        "tolerate1_neglect",
        BASE.with_(tolerate_hour=1, neglect_warning=True),
        {4, 7, 8, 9, 11},
        set(),
    ),
    ("tolerate2", BASE.with_(tolerate_hour=2), {4, 5, 6, 7, 11}, {8, 9}),
    (
        "tolerate2_neglect",
        BASE.with_(tolerate_hour=2, neglect_warning=True),
        {4, 5, 6, 7, 8, 9, 11},
        set(),
    ),
]


@pytest.fixture(scope="module")
def corpus_a(spark):
    return FX.to_spark_df(spark, FX.corpus_a_rows()).cache()


@pytest.mark.parametrize("name,cfg,exp_affected,exp_warned", CASES, ids=[c[0] for c in CASES])
def test_corpus_a_matrix(corpus_a, name, cfg, exp_affected, exp_warned):
    rows = name_date_matches(corpus_a, cfg).collect()
    affected = {int(r.w_path.split("_")[1]) for r in rows if r.action_effective != "skipped"}
    warned = {int(r.w_path.split("_")[1]) for r in rows if r.action_effective == "skipped"}
    assert affected == exp_affected
    assert warned == exp_warned
    # every match pairs work/file_i with originals/file_i (stem blocking)
    for r in rows:
        assert r.o_path == r.w_path
        assert r.o_repo == "originals"


def test_corpus_a_invert_selection(corpus_a):
    cfg = BASE.with_(tolerate_hour=2, invert_selection=True)
    rows = name_date_matches(corpus_a, cfg).collect()
    assert {int(r.path.split("_")[1]) for r in rows} == {1, 2, 10}


@pytest.fixture(scope="module")
def corpus_b(spark):
    return FX.to_spark_df(spark, FX.corpus_b_rows()).cache()


def test_disk_tree_forward(corpus_b):
    """work=folder1 vs orig=folder2 (tests/test_disk.py:10-18)."""
    cfg = DedupConfig(
        work_repo="folder1", original_repo="folder2", ignore_date=True
    )
    rows = name_date_matches(corpus_b, cfg).collect()
    pairs = {(f"{r.w_repo}/{r.w_path}", f"{r.o_repo}/{r.o_path}") for r in rows}
    assert ("folder1/2.txt", "folder2/2.txt") in pairs
    assert ("folder1/1.txt", "folder2/folder2.1/1.txt") in pairs
    # name blocking: 1.txt never pairs with 1-different-name.txt
    assert not any("1-different-name" in o for _, o in pairs)
    # symlink original excluded → symlinkable.txt unmatched
    assert not any("symlinkable" in w for w, _ in pairs)


def test_disk_tree_reverse(corpus_b):
    """work=folder2 vs orig=folder1 (tests/test_disk.py:20-27)."""
    cfg = DedupConfig(
        work_repo="folder2", original_repo="folder1", ignore_date=True
    )
    rows = name_date_matches(corpus_b, cfg).collect()
    pairs = {(f"{r.w_repo}/{r.w_path}", f"{r.o_repo}/{r.o_path}") for r in rows}
    assert ("folder2/2.txt", "folder1/2.txt") in pairs
    assert ("folder2/folder2.1/1.txt", "folder1/1.txt") in pairs
    # symlinked work row filtered at ingest
    assert not any("symlinkable" in w for w, _ in pairs)
