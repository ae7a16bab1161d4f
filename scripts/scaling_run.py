"""Scaling-efficiency experiment runner (north_rule evidence).

The rule asks for throughput scaling efficiency >= 0.8 from N to 4N
executors. No real cluster exists in this sandbox, so the directed
proxy is: the SAME dedup job on the SAME input at local[N] vs
local[4N], fresh JVM per measurement, alternating pairs, medians.

Usage:
    python scripts/scaling_run.py N ROWS PAIRS [--primary] [--extend]

Runs the bench headline job (bench.py --once) at local[N] and
local[4N] with PAIRS alternating repetitions on a ROWS-row synthetic
corpus, then records the experiment into scaling_results.json as

    {"primary": {...}, "experiments": [{...}, ...]}

bench.py embeds this file into its JSON line (key "scaling" =
primary, "scaling_experiments" = all), so the driver's BENCH_r{N}.json
carries the full evidence.

--primary marks this experiment as the headline one. Experiments are
keyed by (n_cores, bench_rows); re-running replaces the old entry,
--extend instead APPENDS the new pairs to the existing entry's runs
and recomputes the medians — more host windows, tighter estimate.

Two efficiency statistics are recorded:

  * ``efficiency``          = median(t_n) / (4 * median(t_4n)) —
    cross-run medians, ignores the pairing.
  * ``efficiency_paired``   = median over pairs of
    t_n[i] / (4 * t_4n[i]) — each pair's two legs run back-to-back
    in the same host window, so the within-pair ratio cancels the
    host-throughput drift this box exhibits (up to 2x between
    windows, see BENCH.md controls); the median of per-pair ratios
    is the drift-robust estimator for this interleaved-pair design.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import measured_code_id  # noqa: E402  (repo-root module)

RESULTS = os.path.join(REPO, "scaling_results.json")


def _ensure_corpus(rows: int) -> str:
    corpus_dir = os.path.join(tempfile.gettempdir(), f"bench_corpus_{rows}")
    if not os.path.exists(os.path.join(corpus_dir, "_SUCCESS")):
        from deduplidog_spark.benchgen import synth_corpus
        from deduplidog_spark.session import get_spark

        spark = get_spark(
            "scaling-gen", master="local[16]", shuffle_partitions=16,
            extra_conf={"spark.ui.showConsoleProgress": "false"},
        )
        spark.sparkContext.setLogLevel("ERROR")
        synth_corpus(spark, rows).write.mode("overwrite").parquet(corpus_dir)
        spark.stop()
    return corpus_dir


def _once(cores: int, corpus_dir: str, rows: int) -> float:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--once",
         str(cores), corpus_dir, str(rows)],
        capture_output=True, text=True, check=True,
    )
    return float(out.stdout.strip().splitlines()[-1])


def derive(n: int, rows: int, t_n_runs: list, t_4n_runs: list) -> dict:
    """Fill every derived statistic from the raw paired run lists."""
    t_n = statistics.median(t_n_runs)
    t_4n = statistics.median(t_4n_runs)
    thr_n, thr_4n = rows / t_n, rows / t_4n
    eff_pairs = [
        a / (4.0 * b) for a, b in zip(t_n_runs, t_4n_runs)
    ]
    return {
        "pairs": min(len(t_n_runs), len(t_4n_runs)),
        "n_cores": n,
        "t_n_sec_runs": [round(t, 2) for t in t_n_runs],
        "t_n_sec": round(t_n, 2),
        "files_per_sec_n": round(thr_n, 1),
        "n4_cores": 4 * n,
        "t_4n_sec_runs": [round(t, 2) for t in t_4n_runs],
        "t_4n_sec": round(t_4n, 2),
        "files_per_sec_4n": round(thr_4n, 1),
        "efficiency": round(thr_4n / (4.0 * thr_n), 3),
        "eff_pairs": [round(e, 3) for e in eff_pairs],
        "efficiency_paired": round(statistics.median(eff_pairs), 3),
        "bench_rows": rows,
        "measured_unix": int(time.time()),
        # code-identity stamp: bench.py flips its embedded block to
        # cached=false only while the library tree + bench.py still
        # hash to this (so the "fresh on HEAD" claim is machine-checked,
        # not asserted) — None on a dirty tree
        "measured_code": measured_code_id(),
    }


def main() -> None:
    n = int(sys.argv[1])
    rows = int(sys.argv[2])
    pairs = int(sys.argv[3])
    primary = "--primary" in sys.argv
    extend = "--extend" in sys.argv

    corpus_dir = _ensure_corpus(rows)
    n4 = 4 * n
    t_n_runs, t_4n_runs = [], []
    for i in range(pairs):
        t_n_runs.append(_once(n, corpus_dir, rows))
        print(f"pair {i + 1}: local[{n}] = {t_n_runs[-1]:.1f}s", flush=True)
        t_4n_runs.append(_once(n4, corpus_dir, rows))
        print(f"pair {i + 1}: local[{n4}] = {t_4n_runs[-1]:.1f}s", flush=True)

    data = {"primary": None, "experiments": []}
    if os.path.exists(RESULTS):
        with open(RESULTS) as fh:
            old = json.load(fh)
        if "experiments" in old:
            data = old
        elif old.get("n_cores"):  # legacy single-block format
            data = {"primary": old, "experiments": [old]}

    prior = next(
        (e for e in data["experiments"]
         # .get: non-pair entries (core_sweep) carry no n_cores
         if (e.get("n_cores"), e.get("bench_rows")) == (n, rows)),
        None,
    )
    if extend and prior is not None:
        t_n_runs = list(prior["t_n_sec_runs"]) + t_n_runs
        t_4n_runs = list(prior["t_4n_sec_runs"]) + t_4n_runs
    exp = derive(n, rows, t_n_runs, t_4n_runs)
    if extend and prior is not None and "windows" in prior:
        exp["windows"] = prior["windows"]

    data["experiments"] = [
        e for e in data["experiments"]
        if (e.get("n_cores"), e.get("bench_rows")) != (n, rows)
    ] + [exp]
    if prior is not None and not extend:
        # a same-key re-measurement supersedes the old entry but its
        # evidence (other code versions / host windows) stays on file
        data.setdefault("history", []).append(prior)
    if primary or data.get("primary") is None:
        data["primary"] = exp
    with open(RESULTS, "w") as fh:
        json.dump(data, fh, indent=1)
    print(json.dumps(exp))


if __name__ == "__main__":
    main()
