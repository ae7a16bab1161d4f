"""Benchmark harness — prints ONE JSON line.

Headline metric: files/sec of the full minhash dedup pipeline
(signatures → LSH → verify → connected components → plan) on a
deterministic synthetic source-code corpus, plus per-query timings of
representative operators at $SPARK_GRAFT_SF_DIR.

Scaling evidence (north_rule: throughput efficiency ≥ 0.8 from N to 4N
executors; sandbox proxy = local[N] vs local[4N] on the same input):
run with SPARK_GRAFT_SCALING=1 to execute the same dedup job at
local[SCALING_N] and local[4·SCALING_N] and report both throughputs +
efficiency = throughput_4N / (4 · throughput_N). Results also appended
to BENCH.md.

Env knobs: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_BENCH_ROWS (default 200000
— large enough that per-job fixed costs (codegen, stage scheduling,
Python-worker spin-up) stop dominating: 40k rows measured ~2.4k
files/s where 200k measures ~8.3k on the same code, and 3M measures
~11.6k — the asymptote the 100 TB posture cares about),
SPARK_GRAFT_SCALING (default 0), SPARK_GRAFT_SCALING_N (default 8).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_ROWS = int(os.environ.get("SPARK_GRAFT_BENCH_ROWS", "200000"))
DO_SCALING = os.environ.get("SPARK_GRAFT_SCALING", "0") == "1"
SCALING_N = int(os.environ.get("SPARK_GRAFT_SCALING_N", "2"))


def measured_code_id() -> str | None:
    """Identity of the code a scaling measurement exercises: the git
    tree hash of deduplidog_spark/ plus the bench.py blob hash — doc,
    test and entry-file commits do not change it, so a scaling series
    measured on this round's library stays `cached: false` through
    later bookkeeping commits, while ANY library/bench change (or a
    dirty working tree) honestly flips the embedded block back to
    `cached: true` until re-measured. None when git is unavailable or
    the measured files are dirty."""
    import subprocess

    repo = os.path.dirname(os.path.abspath(__file__))
    try:
        dirty = subprocess.run(
            ["git", "-C", repo, "status", "--porcelain",
             "deduplidog_spark", "bench.py"],
            capture_output=True, text=True, check=True,
        ).stdout.strip()
        if dirty:
            return None
        out = subprocess.run(
            ["git", "-C", repo, "rev-parse",
             "HEAD:deduplidog_spark", "HEAD:bench.py"],
            capture_output=True, text=True, check=True,
        )
        return "+".join(out.stdout.split())
    except Exception:
        return None


def _mk_spark(cores: int):
    from deduplidog_spark.session import get_spark

    return get_spark(
        f"bench-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=cores,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )


BENCH_CFG = dict(
    # shingle_k=9 for code-ish corpora: token-vocab text has high
    # background 5-gram similarity, and background-J × N²/2 band
    # collisions is what kills LSH at scale (measured: k=5 → 5.2M
    # candidates for 40k docs; k=9 → background J ≈ 0.01)
    mode="minhash",
    shingle_k=9,
    jaccard_threshold=0.6,
    sig_est_threshold=0.45,
)


def _dedup_job(spark, corpus_df):
    """The headline job: full near-dup pipeline, forced to completion.
    Returns (result, plan_rows) so the recall check reuses the SAME
    DedupResult — its label table is already materialized through the
    pipeline's stage checkpoints; a fresh dedupe() call would recompute
    the whole run (which is what pre-r3 bench did: the old "reuses the
    pipeline DAG" comment was wrong, there is no checkpoint_dir here)."""
    from deduplidog_spark.config import DedupConfig
    from deduplidog_spark.pipeline import dedupe

    res = dedupe(corpus_df, DedupConfig(**BENCH_CFG))
    return res, res.plan.count()


def _near_recall(spark, corpus_df, n_rows: int, res) -> float:
    """Dup-pair recall vs planted ground truth (BASELINE.json metric):
    truth = planted near pairs whose true shingle-Jaccard ≥ τ; found =
    pairs co-clustered by the pipeline (labels reused from the headline
    run — this timer covers only the truth join + recall aggregate, a
    series break vs r1/r2 where it re-ran the full pipeline)."""
    from pyspark.sql import functions as F

    from deduplidog_spark.benchgen import near_truth_pairs
    from deduplidog_spark.config import DedupConfig
    from deduplidog_spark.operators.verify import make_jaccard_udf

    cfg = DedupConfig(**BENCH_CFG)
    fidc = corpus_df.select(
        F.concat_ws("/", "repo", "path").alias("fid"), "content"
    )
    jac = make_jaccard_udf(cfg)
    truth = (
        near_truth_pairs(spark, n_rows)
        .join(fidc.select(F.col("fid").alias("id_a"), F.col("content").alias("ca")), "id_a")
        .join(fidc.select(F.col("fid").alias("id_b"), F.col("content").alias("cb")), "id_b")
        .filter(jac(F.col("ca"), F.col("cb")) >= cfg.jaccard_threshold)
        .select("id_a", "id_b")
    )
    labels = res.clusters.select("fid", "component")
    found = (
        truth.join(labels.withColumnRenamed("fid", "id_a").withColumnRenamed("component", "comp_a"), "id_a")
        .join(labels.withColumnRenamed("fid", "id_b").withColumnRenamed("component", "comp_b"), "id_b")
        .filter(F.col("comp_a") == F.col("comp_b"))
    )
    n_truth = truth.count()
    n_found = found.count()
    return (n_found / n_truth) if n_truth else 1.0


def run_once(cores: int, corpus_path: str, n_rows: int) -> tuple[float, int]:
    spark = _mk_spark(cores)
    spark.sparkContext.setLogLevel("ERROR")
    # warm up the executor pool + python workers: cluster spin-up is
    # startup cost, not throughput (same as excluding executor
    # provisioning on a real cluster)
    from pyspark.sql import functions as WF

    spark.range(10000).select(WF.sha2(WF.col("id").cast("string"), 256)).count()
    corpus = spark.read.parquet(corpus_path)
    t0 = time.time()
    _, n_plan = _dedup_job(spark, corpus)
    dt = time.time() - t0
    spark.stop()
    return dt, n_plan


def _scale_subprocess(cores: int, corpus_dir: str, n_rows: int) -> float:
    """One isolated measurement in a fresh JVM (sequential sessions in
    one process share heap/GC state and contaminate timings)."""
    import subprocess

    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--once", str(cores), corpus_dir, str(n_rows)],
        capture_output=True,
        text=True,
        check=True,
    )
    return float(out.stdout.strip().splitlines()[-1])


def main() -> None:
    import tempfile

    if len(sys.argv) > 1 and sys.argv[1] == "--once":
        cores, corpus_dir, n_rows = int(sys.argv[2]), sys.argv[3], int(sys.argv[4])
        dt, _ = run_once(cores, corpus_dir, n_rows)
        print(dt)
        return

    results: dict[str, float] = {}

    spark = _mk_spark(CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    # materialize the synthetic corpus once (generation excluded from timing)
    corpus_dir = os.path.join(tempfile.gettempdir(), f"bench_corpus_{BENCH_ROWS}")
    if not os.path.exists(os.path.join(corpus_dir, "_SUCCESS")):
        from deduplidog_spark.benchgen import synth_corpus

        synth_corpus(spark, BENCH_ROWS).write.mode("overwrite").parquet(corpus_dir)

    corpus = spark.read.parquet(corpus_dir)

    # same warm-up as run_once(): executor pool + python workers +
    # codegen are startup cost, not throughput
    from pyspark.sql import functions as WF

    spark.range(10000).select(WF.sha2(WF.col("id").cast("string"), 256)).count()

    # headline: dedup pipeline throughput
    t0 = time.time()
    dedup_res, n_plan = _dedup_job(spark, corpus)
    dedup_sec = time.time() - t0
    results["dedup_synth"] = round(dedup_sec, 3)
    files_per_sec = BENCH_ROWS / dedup_sec

    # representative operator queries at SF_DIR
    import __spark_entry__ as E

    qs = E.queries()
    for name in (
        "agg_counters",
        "equi_join_agg",
        # r3: topk_per_group was tag-unioned into window_suite (same
        # top-3 window plus minmax/flatten modes — series not
        # comparable to r1/r2 topk_per_group timings)
        "window_suite",
        "band_join",
        "asof_nearest",
        "ngram_jaccard",
        "cosine_topk",
        "minhash_pairs",
        "dedup_pipeline",
        "incremental_pipeline",
        "passage_dedup",
        "decontaminate",
        "curation",
        "fork_pairs",
        "token_count",
        "quality",
        # r4: media phash pipeline (mapInPandas decode → capped
        # multi-probe chunk join + V5 gate) and the multi-language
        # profile scorer — the two surfaces r4 hardened
        "media_pairs_suite",
        "lang_id",
    ):
        t0 = time.time()
        qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        results[name] = round(time.time() - t0, 3)

    # dup-pair recall vs planted ground truth (labels reused from the
    # headline run's DedupResult — r3 series break, see _near_recall)
    t0 = time.time()
    recall = _near_recall(spark, corpus, BENCH_ROWS, dedup_res)
    results["near_recall_check"] = round(time.time() - t0, 3)
    spark.stop()

    out = {
        "metric": "dedup_files_per_sec",
        "value": round(files_per_sec, 1),
        "unit": "sec",
        "queries": results,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "bench_rows": BENCH_ROWS,
        "plan_rows": n_plan,
        "near_dup_recall": round(recall, 4),
        "cores": CPUS,
    }

    scaling_cache = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "scaling_results.json"
    )
    if DO_SCALING:
        import statistics

        n, n4 = SCALING_N, 4 * SCALING_N
        pairs = int(os.environ.get("SPARK_GRAFT_SCALING_PAIRS", "3"))
        # ALTERNATING paired runs + medians: this host's run-to-run
        # variance is large and drifts (thermal/cache state), so
        # interleaving N and 4N measurements decorrelates the drift
        # from the treatment; each run is a fresh JVM subprocess
        t_n_runs, t_4n_runs = [], []
        for _ in range(pairs):
            t_n_runs.append(_scale_subprocess(n, corpus_dir, BENCH_ROWS))
            t_4n_runs.append(_scale_subprocess(n4, corpus_dir, BENCH_ROWS))
        t_n = statistics.median(t_n_runs)
        t_4n = statistics.median(t_4n_runs)
        thr_n = BENCH_ROWS / t_n
        thr_4n = BENCH_ROWS / t_4n
        eff = thr_4n / (4.0 * thr_n)
        exp = {
            "pairs": pairs,
            "n_cores": n,
            "t_n_sec_runs": [round(t, 2) for t in t_n_runs],
            "t_n_sec": round(t_n, 2),
            "files_per_sec_n": round(thr_n, 1),
            "n4_cores": n4,
            "t_4n_sec_runs": [round(t, 2) for t in t_4n_runs],
            "t_4n_sec": round(t_4n, 2),
            "files_per_sec_4n": round(thr_4n, 1),
            "efficiency": round(eff, 3),
            "bench_rows": BENCH_ROWS,
        }
        out["scaling"] = exp
        try:
            data = {"primary": exp, "experiments": [exp]}
            if os.path.exists(scaling_cache):
                with open(scaling_cache) as fh:
                    old = json.load(fh)
                if "experiments" in old:
                    # non-pair experiments (e.g. core_sweep) have no
                    # n_cores — .get keeps them untouched
                    old["experiments"] = [
                        e for e in old["experiments"]
                        if (e.get("n_cores"), e.get("bench_rows")) != (n, BENCH_ROWS)
                    ] + [exp]
                    data = old
            with open(scaling_cache, "w") as fh:
                json.dump(data, fh)
        except (OSError, ValueError):
            pass
    elif os.path.exists(scaling_cache):
        # the N→4N evidence takes ~6 isolated JVM runs (tens of minutes
        # at useful corpus sizes) — too slow for every default bench
        # invocation, so embed the last measured block with provenance;
        # regenerate with SPARK_GRAFT_SCALING=1 or scripts/scaling_run.py
        try:
            with open(scaling_cache) as fh:
                cached = json.load(fh)
            primary = cached["primary"] if "experiments" in cached else cached
            # `cached` means "NOT measured on this code": false iff the
            # stored series carries the code-identity stamp of the
            # library tree + bench.py as they are NOW (see
            # measured_code_id) — the file merely pre-existing does not
            # make a same-code measurement stale
            code_now = measured_code_id()
            fresh = (
                code_now is not None
                and primary.get("measured_code") == code_now
            )
            out["scaling"] = dict(primary, cached=not fresh)
        except (OSError, ValueError):
            pass

    # COMPACT summary only: the r3 bench line embedded every per-run
    # timing of a 14-pair scaling series and grew past the driver's
    # stdout tail window, so the driver recorded "parsed": null. The
    # full series (runs, windows, per-pair efficiencies) lives in
    # scaling_results.json; the metric line keeps scalars only and is
    # printed LAST.
    if "scaling" in out:
        keep = (
            "pairs", "n_cores", "n4_cores", "t_n_sec", "t_4n_sec",
            "files_per_sec_n", "files_per_sec_4n", "efficiency",
            "efficiency_paired", "bench_rows", "cached", "measured_unix",
        )
        out["scaling"] = {
            k: v for k, v in out["scaling"].items() if k in keep
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
