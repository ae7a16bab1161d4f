"""Structured Streaming smoke: streaming exact dedup + signature
extraction over a file stream (memory sink, processAllAvailable)."""

import os
import tempfile

from deduplidog_spark import DedupConfig
from deduplidog_spark import fixtures as FX
from deduplidog_spark.streaming.incremental import (
    read_file_stream,
    streaming_exact_dedup,
    streaming_signatures,
)


def test_streaming_exact_dedup_drops_later_copies(spark):
    tmp = tempfile.mkdtemp()
    src = os.path.join(tmp, "in")
    FX.to_spark_df(spark, FX.corpus_b_rows()).write.parquet(src)

    stream = read_file_stream(spark, src, FX.FILES_SCHEMA)
    deduped = streaming_exact_dedup(stream)
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(tmp, "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    out = spark.sql("SELECT sha, count(*) AS n FROM dedup_out GROUP BY sha").collect()
    assert out, "stream produced rows"
    assert all(r.n == 1 for r in out), "one survivor per content sha"


def test_streaming_signatures_schema(spark):
    tmp = tempfile.mkdtemp()
    src = os.path.join(tmp, "in")
    FX.to_spark_df(spark, FX.corpus_b_rows()).write.parquet(src)
    stream = read_file_stream(spark, src, FX.FILES_SCHEMA)
    sigs = streaming_signatures(stream, DedupConfig(mode="minhash"))
    q = (
        sigs.writeStream.format("memory")
        .queryName("sig_out")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(tmp, "ckpt2"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT * FROM sig_out").collect()
    assert len(rows) == len(FX.corpus_b_rows())
    assert all(len(r.band_hashes) == 32 for r in rows)
