"""Stage-level wall profile of the headline dedupe job.

Times each macro-stage of pipeline.dedupe() by forcing materialization
in sequence on the cached bench corpus. Stages already materialize via
localCheckpoint inside the pipeline, so sequential timing reflects the
real per-stage cost split. Diagnostic only — not part of bench.py.

Usage: python scripts/profile_dedupe.py [corpus_dir] [cores]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from deduplidog_spark.config import DedupConfig
from deduplidog_spark.ingest import ingest
from deduplidog_spark.operators import minhash as mh
from deduplidog_spark.operators.actions import action_plan, run_metrics
from deduplidog_spark.operators.candidates import lsh_candidate_pairs
from deduplidog_spark.operators.cluster import connected_components, elect_keepers
from deduplidog_spark.operators.exact import exact_dup_pairs
from deduplidog_spark.operators.verify import verify_candidate_pairs
from deduplidog_spark.session import get_spark


def main() -> None:
    corpus_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_corpus_200000"
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    spark = get_spark(
        "profile", master=f"local[{cores}]", shuffle_partitions=cores,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(10000).select(F.sha2(F.col("id").cast("string"), 256)).count()

    cfg = DedupConfig(
        mode="minhash", shingle_k=9, jaccard_threshold=0.6, sig_est_threshold=0.45
    )
    raw = spark.read.parquet(corpus_dir)
    marks: list[tuple[str, float]] = []
    t = time.time()

    def mark(name: str) -> None:
        nonlocal t
        now = time.time()
        marks.append((name, now - t))
        t = now

    files_full = ingest(raw, cfg).withColumn(
        "fid", F.concat_ws("/", "repo", "path")
    )
    slim_cols = [c for c in files_full.columns if c != "content"]
    files = files_full.select(*slim_cols).localCheckpoint()
    mark("ingest+files_ckpt")

    contents = files_full.select("fid", "content")
    sigs = mh.with_band_hashes(mh.with_signatures(files_full, cfg), cfg)
    slim = sigs.select(
        "fid", "sha", "size", "n_lines", "band_hashes"
    ).localCheckpoint()
    mark("signatures+bands_ckpt")

    from deduplidog_spark.operators.exact import collapse_sha_reps

    reps = collapse_sha_reps(slim).localCheckpoint()
    band_rows = mh.explode_bands(reps)
    pairs, dropped = lsh_candidate_pairs(band_rows, cfg)
    n_pairs = pairs.count()
    pairs = pairs.localCheckpoint()
    mark(f"lsh_pairs({n_pairs})")

    verified = verify_candidate_pairs(pairs, slim, cfg, contents=contents)
    n_ver = verified.count()
    verified = verified.select("id_a", "id_b").localCheckpoint()
    mark(f"verify({n_ver})")

    exact = exact_dup_pairs(files)
    edges = verified.union(exact).dropDuplicates(["id_a", "id_b"]).localCheckpoint()
    n_edges = edges.count()
    mark(f"exact+edges({n_edges})")

    labels = connected_components(edges, cfg.cc_max_iterations)
    n_lab = labels.count()
    mark(f"cc({n_lab})")

    clusters = elect_keepers(files, labels)
    plan = action_plan(clusters, cfg)
    n_plan = plan.count()
    mark(f"keeper+plan({n_plan})")

    total = sum(d for _, d in marks)
    for name, d in marks:
        print(f"{d:8.2f}s  {100*d/total:5.1f}%  {name}")
    print(f"{total:8.2f}s  total")
    spark.stop()


if __name__ == "__main__":
    main()
