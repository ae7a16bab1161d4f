"""Per-phase wall-clock of the minhash pipeline at one core count —
the attribution behind BENCH.md's scaling story. Each phase is forced
with an eager materialization so its cost can't leak into the next
measurement; phase boundaries mirror pipeline.near_dup_edges/dedupe.

Usage:
    python scripts/phase_timing.py <cores> <corpus_parquet_dir>
    python scripts/phase_timing.py --pair <n> <4n> <corpus_parquet_dir>

--pair runs both core counts in fresh subprocesses (JVM state isolation)
and prints a combined JSON line with per-phase speedups.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BENCH_CFG = dict(
    mode="minhash", shingle_k=9, jaccard_threshold=0.6, sig_est_threshold=0.45
)


def run_phases(cores: int, corpus_dir: str) -> dict[str, float]:
    from pyspark.sql import functions as F

    from deduplidog_spark.config import DedupConfig
    from deduplidog_spark.ingest import ingest
    from deduplidog_spark.operators import minhash as mh
    from deduplidog_spark.operators.actions import action_plan
    from deduplidog_spark.operators.candidates import lsh_candidate_pairs
    from deduplidog_spark.operators.cluster import connected_components, elect_keepers
    from deduplidog_spark.operators.exact import exact_dup_pairs
    from deduplidog_spark.operators.verify import verify_candidate_pairs
    from deduplidog_spark.session import get_spark

    cfg = DedupConfig(**BENCH_CFG)
    spark = get_spark(
        f"phases-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=cores,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    # warm the executor pool so JVM spin-up isn't charged to phase 1
    spark.range(10000).select(F.sha2(F.col("id").cast("string"), 256)).count()

    out: dict[str, float] = {}
    raw = spark.read.parquet(corpus_dir)

    t = time.time()
    files_full = ingest(raw, cfg).withColumn("fid", F.concat_ws("/", "repo", "path"))
    slim_cols = [c for c in files_full.columns if c != "content"]
    files = files_full.select(*slim_cols).localCheckpoint()
    out["ingest_slim"] = round(time.time() - t, 2)

    t = time.time()
    sigs = mh.with_band_hashes(mh.with_signatures(files_full, cfg), cfg)
    slim = sigs.select("fid", "sha", "size", "band_hashes").localCheckpoint()
    out["signatures_bands"] = round(time.time() - t, 2)

    t = time.time()
    from deduplidog_spark.operators.exact import collapse_sha_reps

    reps = collapse_sha_reps(slim)
    pairs, _ = lsh_candidate_pairs(mh.explode_bands(reps), cfg)
    pairs = pairs.localCheckpoint()
    out["lsh_candidates"] = round(time.time() - t, 2)

    t = time.time()
    contents = files_full.select("fid", "content")
    verified = verify_candidate_pairs(pairs, slim, cfg, contents=contents)
    near = verified.select("id_a", "id_b").localCheckpoint()
    out["verify"] = round(time.time() - t, 2)

    t = time.time()
    edges = near.union(exact_dup_pairs(files)).dropDuplicates(["id_a", "id_b"])
    labels = connected_components(edges, cfg.cc_max_iterations)
    plan = action_plan(elect_keepers(files, labels, cfg), cfg)
    out["cc_plan"] = float(plan.count()) * 0 + round(time.time() - t, 2)

    out["total"] = round(sum(out.values()), 2)
    spark.stop()
    return out


def main() -> None:
    if sys.argv[1] == "--pair":
        n, n4, corpus = int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
        res = {}
        for cores in (n, n4):
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), str(cores), corpus],
                capture_output=True, text=True, check=True,
            )
            res[cores] = json.loads(p.stdout.strip().splitlines()[-1])
        speedups = {
            k: round(res[n][k] / res[n4][k], 2) if res[n4][k] else None
            for k in res[n]
        }
        print(json.dumps({
            "n_cores": n, "n4_cores": n4,
            f"phases_local{n}": res[n], f"phases_local{n4}": res[n4],
            "speedup_ideal": round(n4 / n, 1), "speedup_by_phase": speedups,
        }))
        return
    cores, corpus = int(sys.argv[1]), sys.argv[2]
    print(json.dumps(run_phases(cores, corpus)))


if __name__ == "__main__":
    main()
