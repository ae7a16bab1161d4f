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


def test_name_mode_plan_role_semantics(corpus_a):
    """dedupe(mode='name') must honor roles: the action targets ONLY
    work-repo files, originals always keep, warned pairs are skipped —
    the reference's _affect always affects the work file
    (deduplidog.py:523-566)."""
    from deduplidog_spark.pipeline import dedupe

    cfg = BASE.with_(ignore_date=True, action="delete")
    plan = dedupe(corpus_a, cfg).plan.collect()
    work_rows = [r for r in plan if r.repo == "work"]
    orig_rows = [r for r in plan if r.repo == "originals"]
    assert {
        int(r.path.split("_")[1]) for r in work_rows if r.action_effective == "delete"
    } == {4, 5, 6, 7, 11}
    assert {
        int(r.path.split("_")[1]) for r in work_rows if r.action_effective == "skipped"
    } == {8, 9, 10}
    # an original is NEVER the target of the action
    assert orig_rows and all(
        r.is_keeper and r.action_effective == "keep" for r in orig_rows
    )
    assert all(not r.is_keeper for r in work_rows)


def _bigger_work_corpus(spark):
    rows = [
        dict(repo="work", path="a.txt", commit="c0", lang="txt",
             content="x" * 50, mtime=FX.T0, is_symlink=False),
        dict(repo="originals", path="a.txt", commit="c0", lang="txt",
             content="y" * 10, mtime=FX.T0, is_symlink=False),
    ]
    return FX.to_spark_df(spark, rows)


@pytest.mark.parametrize(
    "flags,exp",
    [
        # default: bigger work file → SIZE WARNING → skipped
        ({}, ("work/a.txt", "skipped", True)),
        # neglect_warning: warned action goes through
        ({"neglect_warning": True}, ("work/a.txt", "mark", True)),
        # skip_bigger: skipped outright (base action, not a warning gate)
        ({"skip_bigger": True}, ("work/a.txt", "skipped", True)),
        # treat_bigger_as_original: roles swap — the ORIGINAL is affected
        ({"treat_bigger_as_original": True}, ("originals/a.txt", "mark", False)),
    ],
    ids=["default", "neglect", "skip_bigger", "treat_bigger"],
)
def test_bigger_work_file_matrix(spark, flags, exp):
    """treat_bigger_as_original / skip_bigger / warning-gate parity
    (deduplidog.py:73-78,529-540)."""
    from deduplidog_spark.pipeline import dedupe

    cfg = BASE.with_(ignore_size=True, ignore_date=True, **flags)
    plan = dedupe(_bigger_work_corpus(spark), cfg).plan.collect()
    aff_fid, aff_effective, size_warned = exp
    affected = [r for r in plan if not r.is_keeper]
    assert len(affected) == 1
    assert affected[0].fid == aff_fid
    assert affected[0].action_effective == aff_effective
    assert affected[0].size_warning == size_warned
    keepers = [r for r in plan if r.is_keeper]
    assert len(keepers) == 1
    assert keepers[0].fid != aff_fid
    assert keepers[0].action_effective == "keep"


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
