"""Incremental (streaming) dedup — beyond the reference's batch scans.

The reference has no streaming concepts (SURVEY §2.12); its "resume" is
a positional skip counter. For a corpus that grows continuously, the
Spark-native shape is Structured Streaming: new file rows arrive as a
stream, exact duplicates are flagged against the stream's own history
via ``dropDuplicates`` state, and near-dup signatures are emitted to a
signature sink that a periodic batch job LSH-joins (stream-stream LSH
self-join would need unbounded state; the standard production split is
streaming signature extraction + micro-batch candidate join via
``foreachBatch``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deduplidog_spark.config import DedupConfig
from deduplidog_spark.operators import minhash as mh


def read_file_stream(spark, path: str, schema) -> DataFrame:
    """S1 as a stream: each new parquet file under ``path`` is a
    micro-batch of corpus rows."""
    return spark.readStream.schema(schema).parquet(path)


def streaming_exact_dedup(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Exact-dup suppression on the stream: keep the first row per
    content sha; later identical rows arriving within the watermark
    window are dropped by the state store.

    ``dropDuplicatesWithinWatermark`` (not plain ``dropDuplicates``) is
    load-bearing: with a dedup subset that excludes the event-time
    column, ``dropDuplicates`` never purges its state even under a
    watermark — at corpus scale (1e12 rows) that is unbounded state and
    an executor OOM. WithinWatermark evicts each sha's state once the
    watermark passes its first-seen event time + delay, bounding state
    to the duplicate-arrival horizon, like the reference's tombstone
    set bounds its dict (deduplidog.py:224). The trade: a duplicate
    arriving AFTER the horizon re-emits — the periodic batch LSH/exact
    join over the signature sink (run_incremental) catches those.
    """
    return (
        stream.withColumn("sha", F.sha2(F.col("content"), 256))
        .withWatermark("mtime", watermark)
        .dropDuplicatesWithinWatermark(["sha"])
    )


def streaming_signatures(stream: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Arrow-UDF MinHash signatures on the stream — the stateless part
    of the near-dup pipeline runs unchanged on streaming DataFrames."""
    sigs = mh.with_band_hashes(
        mh.with_signatures(
            stream.withColumn("sha", F.sha2(F.col("content"), 256)).withColumn(
                "fid", F.concat_ws("/", "repo", "path")
            ),
            cfg,
        ),
        cfg,
    )
    return sigs.select("fid", "sha", F.octet_length("content").alias("size"), "band_hashes")


def run_incremental(
    stream: DataFrame,
    cfg: DedupConfig,
    signature_sink: str,
    checkpoint: str,
    trigger_seconds: int = 30,
):
    """Wire the streaming half: signatures append to ``signature_sink``
    (parquet/Iceberg); a periodic batch job runs the LSH join + CC over
    the accumulated signature table (operators/candidates.py) — append-
    only signatures make that join incremental: only (new × all) band
    matches need processing per batch."""
    sigs = streaming_signatures(stream, cfg)
    return (
        sigs.writeStream.format("parquet")
        .option("path", signature_sink)
        .option("checkpointLocation", checkpoint)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )
