"""Multimodal column plumbing (task brief: image/audio/video columns).

Media payloads are opaque ``binary`` columns with typed metadata; the
Spark-side plumbing — schema, partition sizing, Arrow batch shape, UDF
signatures — is real and tested. The actual codec calls are stubbed
behind ``_decode_image_stub`` (the image/audio libraries are not in
this container): the stub is deterministic so tests can assert the full
dataflow, and a real deployment swaps one function.

Pattern: ``mapInPandas`` over batches — media rows are big, so the
iterator form lets one task stream many small Arrow batches instead of
materializing a partition (spark.sql.execution.arrow.maxRecordsPerBatch
caps batch memory; set files.maxPartitionBytes so a partition of blobs
fits the executor).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("phash", T.LongType()),  # NULL when quarantined
        T.StructField("feature", T.ArrayType(T.FloatType())),
        T.StructField("quarantined", T.BooleanType()),  # P2: bad row, kept
        # EXIF datetimes extracted from the payload (reference
        # helpers.py:32-41 collects the whole set) — feeds the V6
        # time-set proximity predicate (readers.time_set_proximity)
        T.StructField("aux_ts", T.ArrayType(T.TimestampType())),
    ]
)

# EXIF datetime-bearing tags, in the reference's collection order
# (helpers.py:32-41): DateTime, DateTimeOriginal, DateTimeDigitized
_EXIF_DT_TAGS = (306, 36867, 36868)


def _decode_image_stub(payload: bytes):
    """STUB — deterministic fake decode. A real deployment replaces this
    with PIL/libvips/ffmpeg; everything around it (batching, schema,
    partitioning) is production-shaped. Raises on empty payload like a
    real codec would. Returns (pixels, exif_datetimes); the fake EXIF
    set is a deterministic function of the payload bytes so the V6
    aux_ts plumbing is testable without a codec."""
    import datetime as _dt
    import hashlib

    if not payload:
        raise ValueError("empty media payload")
    # deterministic pseudo-pixels from the payload bytes
    arr = np.frombuffer(payload, dtype=np.uint8)
    side = max(int(len(arr) ** 0.5), 1)
    pixels = np.resize(arr, (side, side)).astype(np.float32)
    h = int.from_bytes(hashlib.sha256(payload).digest()[:4], "big")
    t0 = _dt.datetime(2020, 1, 1) + _dt.timedelta(seconds=h % 100_000_000)
    aux = [t0, t0 + _dt.timedelta(seconds=90)]  # original + digitized
    return pixels, aux


def _make_decoder():
    """Real-codec seam: when Pillow is installed (a real cluster) and
    SPARK_GRAFT_MEDIA_CODEC != 'stub', decode via PIL grayscale and
    read the EXIF datetime tags out of the payload; otherwise the
    deterministic stub. Resolved once per Python worker — the UDF
    body, batching and quarantine path are identical either way, so
    swapping codecs changes zero Spark-side code. Either way returns
    (pixels, exif_datetimes)."""
    import os

    if os.environ.get("SPARK_GRAFT_MEDIA_CODEC", "auto") != "stub":
        try:
            import datetime as _dt
            import io

            from PIL import Image  # not in this container; real clusters

            def _decode_pil(payload: bytes):
                if not payload:
                    raise ValueError("empty media payload")
                try:
                    img = Image.open(io.BytesIO(payload))
                    exif = img.getexif()
                    gray = img.convert("L")
                except Exception as e:  # undecodable → quarantine
                    raise ValueError(f"undecodable payload: {e}") from e
                aux = []
                for tag in _EXIF_DT_TAGS:
                    raw = exif.get(tag)
                    if not raw:
                        continue
                    try:  # EXIF format: "YYYY:MM:DD HH:MM:SS"
                        aux.append(
                            _dt.datetime.strptime(
                                str(raw).strip(), "%Y:%m:%d %H:%M:%S"
                            )
                        )
                    except ValueError:
                        continue  # malformed tag — not a quarantine cause
                return np.asarray(gray, dtype=np.float32), aux

            return _decode_pil
        except ImportError:
            pass
    return _decode_image_stub


def _phash64(pixels: np.ndarray) -> int:
    """8×8 average-hash over the decoded frame — the reference's
    perceptual aHash (helpers.py:44-53) re-expressed on our fake
    decode; bit i = cell mean > global mean."""
    cells = np.resize(pixels, (8, 8))
    bits = (cells > cells.mean()).flatten()
    h = 0
    for i, b in enumerate(bits):
        if b:
            h |= 1 << i
    return h - (1 << 64) if h >= 1 << 63 else h


def extract_media_features(media: DataFrame, feature_dim: int = 16) -> DataFrame:
    """media rows → (media_id, kind, n_bytes, phash, feature) via
    mapInPandas. Batch shape: the iterator yields one output frame per
    input Arrow batch — constant memory regardless of partition size."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode = _make_decoder()  # once per worker, not per row
        for pdf in batches:
            out = {
                "media_id": [], "kind": [], "n_bytes": [], "phash": [],
                "feature": [], "quarantined": [], "aux_ts": [],
            }
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                payload = bytes(payload) if payload is not None else b""
                try:
                    pixels, aux = decode(payload)
                    ph = _phash64(pixels)
                    feat = np.resize(pixels.flatten(), feature_dim)
                    norm = float(np.linalg.norm(feat)) or 1.0
                    feat = (feat / norm).astype(np.float32).tolist()
                    bad = False
                except ValueError:
                    # quarantine, don't fail the task (P2). phash must be
                    # NULL, not a sentinel: any shared sentinel value would
                    # make every quarantined pair Hamming-distance-0 "near
                    # duplicates" in the chunk join.
                    ph, feat, aux, bad = None, None, None, True
                out["media_id"].append(mid)
                out["kind"].append(kind)
                out["n_bytes"].append(len(payload))
                out["phash"].append(ph)
                out["feature"].append(feat)
                out["quarantined"].append(bad)
                out["aux_ts"].append(aux)
            # phash must stay object-dtyped: a single None (quarantined
            # row) would coerce the column to float64 and silently
            # corrupt every 64-bit hash above 2^53 in the batch
            yield pd.DataFrame(
                {
                    k: (pd.Series(v, dtype="object") if k == "phash" else v)
                    for k, v in out.items()
                }
            )

    return media.mapInPandas(feats, FEATURE_SCHEMA)


def synthesize_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests/bench (no codecs in the
    container — payload bytes are seeded pseudo-random)."""
    rng = np.random.RandomState(seed)
    rows = []
    prev = b""
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        size = int(rng.randint(256, 4096))
        payload = rng.bytes(size) if i % 7 else b""  # some broken rows
        if i % 9 == 4 and prev:
            payload = prev  # planted duplicate → a true near-dup pair
        prev = payload or prev
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                64,
                64,
                1000 if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def near_dup_media_pairs(features: DataFrame, max_hamming: int = 4) -> DataFrame:
    """Perceptual-hash near-dup pairs over extracted features — the
    media analog of the simhash mode: chunk join + bit_count verify.

    Recall bound: the signature is split into q = max_hamming + 1 bit
    chunks (width 64 // q), so by the pigeonhole principle two hashes
    within Hamming distance <= max_hamming must agree exactly on at
    least one chunk — the equi-join has recall 1.0 for the configured
    radius, and the bit_count verify makes the output EXACTLY the
    exhaustive Hamming-threshold pair set. (Bits >= q * width are
    uncovered by any chunk; differences there only reduce the number
    of differing bits inside covered chunks, so the bound still holds.)
    Mirrors simhash.with_simhash_chunks (the text path) via the shared
    ``hamming_chunks`` kernel — which also handles the max_hamming=0
    (exact phash match) case, where the single full-width chunk mask
    must be the signed all-ones long."""
    from deduplidog_spark.operators.simhash import hamming_chunks

    chunks = hamming_chunks(F.col("phash"), max_hamming)
    hashed = features.filter(F.col("phash").isNotNull())  # quarantined out
    a = hashed.select(
        F.col("media_id").alias("id_a"),
        F.col("phash").alias("ph_a"),
        F.posexplode(chunks).alias("chunk_id", "chunk_val"),
    )
    b = hashed.select(
        F.col("media_id").alias("id_b"),
        F.col("phash").alias("ph_b"),
        F.posexplode(chunks).alias("chunk_id", "chunk_val"),
    )
    return (
        a.join(b, ["chunk_id", "chunk_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b"))) <= max_hamming
        )
        .select("id_a", "id_b")
        .distinct()
    )
