"""Composite-suite contract tests: each suite in ``queries()`` is the
tag-union of its constituent narrow queries — per-mode row counts must
equal the narrow query's own rows at sf0.001, the mode set must be
exactly the documented one, and the registry must stay at the driver's
50-row certification window (COVERAGE.md "Query-name mapping")."""

import os

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF), reason="driver testdata not present"
)

# suite -> {mode: narrow builder}
SUITES = {
    "join_modes": {
        "anti": E.q_anti_join,
        "semi": E.q_semi_join,
        "first_match": E.q_first_match,
        "multi": E.q_multi_candidate,
        "time_semi": E.q_time_proximity_semi,
    },
    "window_suite": {
        "topk": E.q_topk_per_group,
        "minmax": E.q_min_over_cluster,
        "flatten": E.q_distinct_flatten,
        "version_keeper": E.q_version_keeper,
        "unchanged": E.q_unchanged_versions,
    },
    "report_suite": {
        "warning_gate": E.q_warning_gate,
        "report_top": E.q_report_top,
        "common_prefix": E.q_common_prefix,
    },
    "key_norm_skew": {
        "norm_key": E.q_norm_key,
        "salted_agg": E.q_salted_agg,
    },
    "symlink_suite": {
        "janitor": E.q_symlink_janitor,
        "dirs": E.q_symlink_dirs,
    },
    "media_pairs_suite": {
        "h3": E.q_media_phash_pairs,
        "h8": E.q_media_near_pairs,
        "h8gate": E.q_media_near_pairs_gated,
    },
    "media_features_suite": {
        "features": E.q_media_features,
        "phash": E.q_media_phash,
        "frames": E.q_media_frames,
    },
    "lang_id": {
        "heuristic": E.q_lang_id_heuristic,
        "multi": E.q_lang_id_multi,
    },
    "dedup_name": {
        "default": E.q_dedup_name_default,
        "space2char": E.q_dedup_name_space2char,
        "strip_suffix": E.q_dedup_name_strip_suffix,
        "shorten": E.q_dedup_name_shorten,
        "casefold": E.q_dedup_name_casefold,
    },
}


def test_registry_is_exactly_driver_window(spark):
    qs, oracles = E.queries(), E.oracle_sql()
    assert len(qs) == 50
    assert set(qs) == set(oracles)


@pytest.mark.parametrize("suite", sorted(SUITES))
def test_suite_modes_match_constituents(spark, suite):
    df = E.queries()[suite](spark, SF)
    got = {
        r["mode"]: r["n"]
        for r in df.groupBy("mode").agg(F.count("*").alias("n")).collect()
    }
    want = {
        mode: narrow(spark, SF).count()
        for mode, narrow in SUITES[suite].items()
    }
    # a 0-row constituent (e.g. 'anti' at sf0.001: every customer has
    # orders) contributes no group — normalize both sides
    got = {m: got.get(m, 0) for m in want}
    assert got == want


def test_simhash_and_substring_suites_cover_both_layers(spark):
    """The two kernel suites are heavier — check the mode sets and that
    the per-doc signature layer is non-empty (pair layers may be empty
    at sf0.001, which is itself a fact the oracle checks)."""
    for suite, sig_mode in (("simhash_suite", "sig"), ("substring_suite", "fp")):
        df = E.queries()[suite](spark, SF)
        counts = {
            r["mode"]: r["n"]
            for r in df.groupBy("mode").agg(F.count("*").alias("n")).collect()
        }
        assert set(counts) <= {sig_mode, "pair"}
        assert counts[sig_mode] > 0
