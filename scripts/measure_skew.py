"""Skew-robustness measurement: dedupe wall-clock under planted key skew.

The 100 TB risk with dedup is quadratic blow-up on hot keys: one
boilerplate content in p% of rows is p²/2 · N² candidate pairs if it
reaches the pair expansion. This engine bounds both skew classes by
construction — byte-identical content is collapsed to one
representative per sha BEFORE any signature work (pipeline dataflow),
and near-identical-but-distinct-sha families hit the LSH bucket cap
(config.max_bucket_size, dropped buckets logged) — and this script
MEASURES that: the same pipeline, same row count, three corpora:

  uniform   every doc unique (no skew) — the baseline wall;
  sha25     25% of rows share ONE byte-identical content (the
            boilerplate license/header class) — must cost ~the
            baseline wall, NOT (0.25·N)²/2 pairs, via sha collapse;
  hotband   10% of rows are near-identical VARIANTS of one base doc
            (distinct shas, ~identical shingles → one hot LSH bucket
            family) — must stay bounded via the bucket cap, with the
            drop visibly reported (dropped_buckets > 0).

Each variant runs in a fresh subprocess (JVM isolation, like
scripts/scaling_run.py); the parent prints one JSON line per variant
plus a summary with walls normalized to the uniform baseline. Pass/
fail intuition: both skewed walls within ~1.5× of uniform at equal N
(they do slightly more exact-dup accounting), and hotband reports a
non-empty dropped-bucket log.

Usage:
    python scripts/measure_skew.py [n_rows=200000] [cores=32]
    python scripts/measure_skew.py --variant <name> <rows> <cores> <dir>
        (internal: one measurement, emits one JSON line)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

VARIANTS = ("uniform", "sha25", "hotband")


def _synth_skew(spark, n_rows: int, variant: str, doc_tokens: int = 250):
    """Deterministic corpus with the variant's skew class planted.
    Content is a pure function of (row id, variant) — same
    embarrassingly-parallel mapInPandas shape as benchgen.synth_corpus,
    reusing its token generator."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import functions as F

    from deduplidog_spark.benchgen import _SCHEMA, _gen_tokens

    def content_for(i: int) -> str:
        if variant == "sha25" and i % 4 == 0:
            toks = _gen_tokens(777_777, doc_tokens)  # one shared content
        elif variant == "hotband" and i % 10 == 0:
            # near-identical family: ONE base doc, two token edits per
            # member (distinct sha, Jaccard >> threshold vs every other
            # member) — every member lands in the same LSH buckets
            # object dtype BEFORE assignment: _gen_tokens returns a
            # <U8 numpy array, where f"edit_{i}" silently truncates to
            # 8 chars and members with equal i mod 250 could collapse
            # to byte-identical docs (r5 ADVICE), contaminating the
            # sha-collapse vs bucket-cap split this benchmark measures
            toks = _gen_tokens(888_888, doc_tokens).astype(object)
            toks[i % doc_tokens] = f"edit_{i}"
            toks[(i * 7 + 1) % doc_tokens] = f"edit2_{i}"
        else:
            toks = _gen_tokens(3_000_000 + i, doc_tokens)  # unique
        return " ".join(toks.tolist())

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            yield pd.DataFrame(
                {
                    "repo": [f"repo{int(i) % 100:03d}" for i in ids],
                    "path": [f"src/f{int(i):09d}.py" for i in ids],
                    "commit": ["c0" for _ in ids],
                    "lang": ["py" for _ in ids],
                    "content": [content_for(int(i)) for i in ids],
                    "mtime": pd.to_datetime("2024-01-01"),
                    "is_symlink": [False for _ in ids],
                }
            )

    parts = spark.sparkContext.defaultParallelism
    return (
        spark.range(0, n_rows, numPartitions=parts)
        .mapInPandas(gen, _SCHEMA)
        .withColumn("mtime", F.col("mtime").cast("timestamp"))
    )


def _measure(variant: str, n_rows: int, cores: int, workdir: str) -> None:
    from bench import BENCH_CFG, _mk_spark

    from deduplidog_spark.config import DedupConfig
    from deduplidog_spark.pipeline import dedupe

    spark = _mk_spark(cores)
    spark.sparkContext.setLogLevel("ERROR")
    corpus_path = os.path.join(workdir, f"corpus_{variant}")
    _synth_skew(spark, n_rows, variant).write.mode("overwrite").parquet(
        corpus_path
    )
    corpus = spark.read.parquet(corpus_path)
    corpus.count()  # warm: scan + python workers out of the timed window
    t0 = time.time()
    res = dedupe(corpus, DedupConfig(**BENCH_CFG))
    plan_rows = res.plan.count()
    wall = time.time() - t0
    dropped = (
        res.dropped_buckets.count() if res.dropped_buckets is not None else 0
    )
    edges = res.edges.count()
    print(
        json.dumps(
            {
                "variant": variant,
                "rows": n_rows,
                "cores": cores,
                "wall_sec": round(wall, 2),
                "files_per_sec": round(n_rows / wall, 1),
                "plan_rows": plan_rows,
                "edges": edges,
                "dropped_buckets": dropped,
            }
        ),
        flush=True,
    )
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--variant":
        _, _, variant, rows, cores, workdir = sys.argv
        _measure(variant, int(rows), int(cores), workdir)
        return
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    results = []
    with tempfile.TemporaryDirectory(prefix="skewbench_") as workdir:
        for variant in VARIANTS:
            out = subprocess.run(
                [
                    sys.executable, os.path.abspath(__file__), "--variant",
                    variant, str(n_rows), str(cores), workdir,
                ],
                capture_output=True, text=True, cwd=REPO,
            )
            line = [
                ln for ln in out.stdout.splitlines() if ln.startswith("{")
            ]
            if out.returncode != 0 or not line:
                sys.exit(
                    f"variant {variant} failed (rc={out.returncode}):\n"
                    f"{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
                )
            rec = json.loads(line[-1])
            results.append(rec)
            print(json.dumps(rec), flush=True)
    base = results[0]["wall_sec"]
    print(
        json.dumps(
            {
                "summary": {
                    r["variant"]: {
                        "wall_sec": r["wall_sec"],
                        "wall_vs_uniform": round(r["wall_sec"] / base, 3),
                        "dropped_buckets": r["dropped_buckets"],
                    }
                    for r in results
                },
                "rows": n_rows,
                "cores": cores,
            }
        )
    )


if __name__ == "__main__":
    main()
