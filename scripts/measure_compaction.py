"""Measure the delta-chain READ cost with vs without compaction.

Round-4 VERDICT weak #2 said the chain's read side grows with chain
length (every load unions O(chain) partition dirs and windows the full
label log); round 5 added ``compact_state_delta``. This script is the
measurement: build the SAME append chain twice — once never compacted,
once compacted every ``compact_every`` batches (the streaming hook's
default cadence) — and time ``load_state_delta`` + a forced label
collapse at checkpoints along the chain. Prints ONE JSON line.

Usage: python scripts/measure_compaction.py \
    [base_rows=100000] [n_batches=32] [batch_rows=1000] [compact_every=16] \
    [store=path|table]

``store=table`` runs the identical experiment through the
catalog-table delta store (``cfg.checkpoint_table_prefix`` →
``_TableDeltaStore``, session-catalog parquet provider standing in
for Iceberg) — the same code path a lakehouse deployment uses, with
per-partition dynamic ``insertInto`` overwrites.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BENCH_CFG, _mk_spark  # noqa: E402


def _count_partition_dirs(delta_root: str) -> int:
    n = 0
    for stage in os.listdir(delta_root):
        sp = os.path.join(delta_root, stage)
        if os.path.isdir(sp):
            n += sum(1 for d in os.listdir(sp) if d.startswith("batch_id="))
    return n


def main() -> None:
    base_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 100000
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    batch_rows = int(sys.argv[3]) if len(sys.argv) > 3 else 1000
    compact_every = int(sys.argv[4]) if len(sys.argv) > 4 else 16
    store_kind = sys.argv[5] if len(sys.argv) > 5 else "path"

    from pyspark.sql import functions as F

    from deduplidog_spark.benchgen import synth_corpus
    from deduplidog_spark.config import DedupConfig
    from deduplidog_spark.incremental import (
        _delta_store,
        append_state_delta,
        compact_state_delta,
        incremental_dedupe,
        load_state,
        load_state_delta,
        write_state_delta,
    )
    from deduplidog_spark.pipeline import dedupe
    from deduplidog_spark.session import get_spark

    tmp = tempfile.mkdtemp(prefix="compact_bench_")
    if store_kind == "table":
        spark = get_spark(
            "compact-bench", master="local[16]", shuffle_partitions=16,
            extra_conf={
                "spark.ui.showConsoleProgress": "false",
                "spark.sql.warehouse.dir": os.path.join(tmp, "warehouse"),
            },
        )
    else:
        spark = _mk_spark(16)
    spark.sparkContext.setLogLevel("ERROR")
    total = base_rows + n_batches * batch_rows
    corpus_dir = os.path.join(tmp, "corpus")
    synth_corpus(spark, total).withColumn(
        "idnum", F.regexp_extract("path", r"f_(\d+)", 1).cast("long")
    ).write.parquet(corpus_dir)
    corpus = spark.read.parquet(corpus_dir)

    def run_chain(label: str, every: int | None) -> dict:
        if store_kind == "table":
            root = None
            cfg = DedupConfig(
                **BENCH_CFG, checkpoint_table_prefix=f"compactbench_{label}"
            )
        else:
            root = os.path.join(tmp, f"state_{label}")
            cfg = DedupConfig(
                **BENCH_CFG, checkpoint_dir=os.path.join(tmp, f"boot_{label}")
            )
        base = corpus.filter(F.col("idnum") < base_rows).drop("idnum")
        dedupe(base, cfg).plan.count()
        write_state_delta(spark, load_state(spark, cfg), cfg, root)

        load_times: dict[str, float] = {}
        for k in range(n_batches):
            lo = base_rows + k * batch_rows
            raw = corpus.filter(
                (F.col("idnum") >= lo) & (F.col("idnum") < lo + batch_rows)
            ).drop("idnum")
            contents = corpus.filter(F.col("idnum") < lo).select(
                F.concat_ws("/", "repo", "path").alias("fid"), "content"
            )
            st = load_state_delta(spark, cfg, root, max_batch_id=k)
            r = incremental_dedupe(raw, cfg, st, base_contents=contents)
            append_state_delta(spark, r, cfg, root, k)
            if every is not None and (k + 1) % every == 0:
                # the streaming hook's bound: fold strictly earlier
                # batches; batch k's engine commit is durable here
                compact_state_delta(spark, cfg, root, max_batch_id=k + 1)
            if (k + 1) % 8 == 0 or k == n_batches - 1:
                t0 = time.time()
                st2 = load_state_delta(spark, cfg, root)
                st2.labels.count()  # forces the latest-batch-wins window
                st2.files.count()  # forces the multi-partition union scan
                load_times[str(k + 1)] = round(time.time() - t0, 2)

        if store_kind == "table":
            store = _delta_store(spark, cfg, None)
            n_parts = sum(
                len(store.list_partitions(s))
                for s in ("files", "minhash_bands", "band_reps", "cc_labels")
                if store.stage_exists(s)
            )
        else:
            n_parts = _count_partition_dirs(
                os.path.join(root, cfg.fingerprint(), "delta")
            )
        return {
            "load_sec_at_chain_len": load_times,
            "partition_dirs": n_parts,
        }

    out = {
        "base_rows": base_rows,
        "n_batches": n_batches,
        "batch_rows": batch_rows,
        "compact_every": compact_every,
        "store": store_kind,
        "no_compaction": run_chain("nc", None),
        "compacted": run_chain("c", compact_every),
    }
    nc = out["no_compaction"]["load_sec_at_chain_len"]
    c = out["compacted"]["load_sec_at_chain_len"]
    last = str(n_batches)
    out["final_load_speedup"] = (
        round(nc[last] / c[last], 2) if c.get(last) else None
    )
    print(json.dumps(out))
    spark.stop()
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
