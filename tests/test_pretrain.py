"""Training-data curation operators (operators/pretrain.py)."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from deduplidog_spark.operators import pretrain


def _docs(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in rows])


def test_passage_dup_stats_flags_shared_and_repeated_passages(spark):
    shared = " ".join(f"w{i}" for i in range(20))
    unique_a = " ".join(f"a{i}" for i in range(20))
    unique_b = " ".join(f"b{i}" for i in range(20))
    docs = _docs(
        spark,
        [
            (1, shared + " " + unique_a),          # passage 0 shared
            (2, shared + " " + unique_b),          # passage 0 shared
            (3, shared + " " + shared),            # internal repeat
            (4, " ".join(f"c{i}" for i in range(40))),  # clean
            (5, ""),                               # empty → no rows
        ],
    )
    out = {
        r.doc_id: r
        for r in pretrain.passage_dup_stats(docs, passage_words=20).collect()
    }
    assert set(out) == {1, 2, 3, 4}
    assert out[1].n_passages == 2 and out[1].n_dup_passages == 1
    assert out[2].n_dup_passages == 1
    assert out[3].n_passages == 2 and out[3].n_dup_passages == 2
    assert out[3].dup_fraction == 1.0
    assert out[4].n_dup_passages == 0 and out[4].dup_fraction == 0.0


def test_decontaminate_flags_benchmark_overlap_only(spark):
    bench_text = " ".join(f"q{i}" for i in range(10))
    corpus = _docs(
        spark,
        [
            (1, "x0 x1 " + bench_text),  # contains benchmark 8-grams
            (2, " ".join(f"y{i}" for i in range(12))),  # clean
            (3, "too short"),  # shorter than gram → never flagged
        ],
    )
    benchmark = _docs(spark, [(100, bench_text)])
    hits = {r.doc_id: r.n_hits for r in pretrain.decontaminate(corpus, benchmark).collect()}
    # bench_text has 3 distinct 8-grams; doc 1 contains all of them
    assert hits == {1: 3}


def test_repetition_stats_pure_expression_values(spark):
    docs = _docs(
        spark,
        [
            (1, "a b c d"),          # all distinct
            (2, "a a a a"),          # 4 words, 1 distinct; 3 grams, 1 distinct
            (3, ""),                 # empty
        ],
    )
    out = {r.doc_id: r for r in pretrain.repetition_stats(docs).collect()}
    assert out[1].dup_word_fraction == 0.0 and out[1].dup_2gram_fraction == 0.0
    assert out[2].n_words == 4
    assert out[2].dup_word_fraction == 0.75
    assert abs(out[2].dup_2gram_fraction - round(2 / 3, 6)) < 1e-9
    assert out[3].n_words == 0 and out[3].dup_word_fraction == 0.0
    # no shuffle: the whole operator must be a single stage
    plan = pretrain.repetition_stats(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_vocab_topk_deterministic_ordering(spark):
    docs = _docs(spark, [(1, "a b a b a b"), (2, "a b c d")])
    top = pretrain.vocab_topk(docs, gram_words=2, k=3).collect()
    assert [(r.gram, r.n_occurrences) for r in top] == [
        ("a b", 4),
        ("b a", 2),
        ("b c", 1),
    ]


def test_quality_keepers_prefers_highest_quality_member(spark):
    # same normalized fingerprint (case/whitespace variants), different
    # quality: the longer doc scores higher only if content differs —
    # here contents normalize identically so quality ties and the id
    # tie-break elects the smallest id; a second cluster with distinct
    # quality elects the higher-quality member regardless of id.
    long_text = " ".join(f"t{i}" for i in range(60))
    docs = _docs(
        spark,
        [
            (1, "Alpha  Beta Gamma"),
            (2, "alpha beta gamma"),
            (7, long_text + " !!!!!!!!!!!!!!!!"),   # punct-penalized variant
            (8, long_text.upper() + " !!!!!!!!!!!!!!!!"),  # same fp, same quality
            (9, "lonely unique document"),          # singleton → excluded
        ],
    )
    rows = pretrain.quality_keepers(docs).collect()
    by_id = {r.doc_id: r for r in rows}
    assert 9 not in by_id
    assert by_id[1].is_keeper and by_id[1].keeper_id == 1
    assert not by_id[2].is_keeper and by_id[2].keeper_id == 1
    assert by_id[7].keeper_id == by_id[8].keeper_id == 7


def test_elect_keepers_order_override(spark):
    from deduplidog_spark.operators.cluster import elect_keepers

    files = spark.createDataFrame(
        [("r", "a", 10, None, 5), ("r", "b", 99, None, 9)],
        "repo string, path string, size long, mtime timestamp, quality int",
    )
    labels = spark.createDataFrame(
        [Row(fid="r/a", component="r/a"), Row(fid="r/b", component="r/a")]
    )
    out = {
        r.fid: r.is_keeper
        for r in elect_keepers(
            files, labels, order=[F.col("quality").desc(), F.col("fid").asc()]
        ).collect()
    }
    assert out == {"r/a": False, "r/b": True}


def test_curate_reason_precedence_and_keep(spark):
    long_good = " ".join(f"tok{chr(97+i%26)}{chr(97+i//26%26)}" for i in range(60))
    bench_text = " ".join(f"q{i}" for i in range(12))
    docs = spark.createDataFrame(
        [
            (1, long_good),                       # keep
            (2, None),                            # quarantined
            (3, "tiny doc"),                      # too_short
            (4, "a b " * 15),                     # repetitive (2-grams repeat)
            (5, "x0 x1 " + bench_text),           # contaminated... unless shorter gates fire
            (6, long_good + " zz"),               # same head-20 passage as 1 → duplicate
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(100, bench_text)], "doc_id long, text string")
    from deduplidog_spark.operators.pretrain import curate, head_passage_fingerprint
    from pyspark.sql import functions as F

    out = {
        r.doc_id: r
        for r in curate(
            docs, bench, min_tokens=5, min_quality_bp=100, max_dup_2gram=0.5,
            cluster_key=head_passage_fingerprint(F.col("text"), 20),
        ).collect()
    }
    assert out[1].keep and out[1].drop_reason is None
    assert out[2].drop_reason == "quarantined"
    assert out[3].drop_reason == "too_short"
    assert out[4].drop_reason == "repetitive"
    assert out[5].drop_reason == "contaminated"
    assert out[6].drop_reason == "duplicate"   # lower quality than doc 1 twin
    # precedence: a doc failing multiple stages reports the FIRST one
    assert out[4].dup_2gram_fraction > 0.5 and out[4].n_tokens >= 5


def test_whitespace_boundary_tokenization(spark):
    """Boundary whitespace must not mint phantom tokens: F.trim strips
    only ASCII spaces, so '\\nfoo' used to tokenize as ['', 'foo'] —
    shifting every token count and passage boundary for source files
    with a leading/trailing newline (i.e. nearly all of them). The
    fingerprint must likewise erase boundary \\n/\\t (it exists to
    catch formatting-only duplicates)."""
    from pyspark.sql import functions as F

    from deduplidog_spark.operators.pretrain import passage_table
    from deduplidog_spark.operators.textstats import (
        content_fingerprint,
        token_count,
    )

    body = " ".join(f"w{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, body), (2, "\n" + body + "\n"), (3, "\n"), (4, "")],
        "doc_id long, text string",
    )
    toks = {
        r.doc_id: r.n
        for r in docs.select("doc_id", token_count(F.col("text")).alias("n")).collect()
    }
    assert toks == {1: 40, 2: 40, 3: 0, 4: 0}
    fps = {
        r.doc_id: r.fp
        for r in docs.select(
            "doc_id", content_fingerprint(F.col("text")).alias("fp")
        ).collect()
    }
    assert fps[1] == fps[2], "boundary newline is a formatting-only difference"
    p = passage_table(docs)
    rows = p.groupBy("doc_id").count().collect()
    counts = {r.doc_id: r["count"] for r in rows}
    # identical passage boundaries for 1 and 2; whitespace-only and
    # empty docs emit no rows (and no bogus descending-sequence rows)
    assert counts == {1: 2, 2: 2}
    h1 = {r.passage_hash for r in p.filter(F.col("doc_id") == 1).collect()}
    h2 = {r.passage_hash for r in p.filter(F.col("doc_id") == 2).collect()}
    assert h1 == h2


def test_curate_keeper_prefers_surviving_copy(spark):
    """A cluster whose highest-quality member is itself dropped
    (contaminated) must elect a surviving copy as keeper: otherwise
    every copy of the content is dropped — losers as 'duplicate',
    keeper as 'contaminated' — and the content silently vanishes even
    though a clean copy existed."""
    from pyspark.sql import functions as F

    from deduplidog_spark.operators.pretrain import (
        curate,
        head_passage_fingerprint,
    )

    head = " ".join(f"h{i}" for i in range(20))
    dirty_tail = " ".join(f"bench{i}" for i in range(30))
    clean_tail = " ".join(f"c{i}" for i in range(10))
    docs = spark.createDataFrame(
        [
            # same head passage => same cluster; doc 1 longer => higher
            # quality and would win the old quality-only election
            (1, f"{head} {dirty_tail}"),
            (2, f"{head} {clean_tail}"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(100, dirty_tail)], "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in curate(
            docs, bench, min_tokens=5, min_quality_bp=100, max_dup_2gram=0.5,
            cluster_key=head_passage_fingerprint(F.col("text"), 20),
        ).collect()
    }
    assert out[1].quality_bp > out[2].quality_bp, "setup: dirty copy outranks"
    assert out[1].drop_reason == "contaminated"
    assert out[2].keep and out[2].drop_reason is None, (
        "surviving copy must be elected keeper, not dropped as duplicate"
    )
