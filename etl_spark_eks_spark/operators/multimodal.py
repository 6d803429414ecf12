"""Multimodal column handling (BASELINE north star): image/audio/video
as opaque binary columns + typed metadata, processed via Arrow-batched
mapInPandas.

The container has no image/audio codecs, so the DECODE step is stubbed
(deterministic fake derived from the bytes; the real implementation
slot is marked and unit-tested to raise cleanly). Everything around it
— binary schema, batch iteration, UDF signatures, partitioning — is
real Spark plumbing and oracle-tested where SQL can express it.

Scale: binary payloads stay columnar (Arrow) end to end; mapInPandas
streams batches so one executor never holds a partition of raw media in
Python memory at once. Partition sizing for media tables is bytes-based
(spark.sql.files.maxPartitionBytes), not row-based.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_spark_eks_spark.catalog import load_table
from etl_spark_eks_spark.registry import query

DECODED_SCHEMA = (
    "doc_id long, n_bytes long, format string, width int, height int, "
    "n_frames int"
)


def _fake_decode(payload: bytes) -> tuple[str, int, int, int]:
    """Deterministic stand-in for a real media decoder (PIL/ffmpeg not
    available in this environment). Derives fake metadata purely from
    the byte length so the oracle can mirror it in SQL."""
    n = len(payload)
    fmt = ("png", "jpeg", "wav", "mp4")[n % 4]
    width = n % 256
    height = (n // 256) % 256
    n_frames = 1 if fmt in ("png", "jpeg") else n % 16
    return fmt, width, height, n_frames


def decode_media(payload: bytes):  # pragma: no cover - real-codec slot
    """REAL decode slot. Wire PIL/torchaudio/ffmpeg here on a cluster
    with codecs installed; see _fake_decode for the test stand-in."""
    raise NotImplementedError(
        "media codecs not available in this environment; "
        "use _fake_decode-backed operators for plumbing tests"
    )


def extract_media_metadata(df: DataFrame, binary_col: str, id_col: str) -> DataFrame:
    """mapInPandas over binary payloads -> typed metadata rows.

    Arrow batches stream through Python; per-batch vectorized work, no
    per-row py4j calls.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            meta = pdf[binary_col].map(_fake_decode)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": pdf[binary_col].map(len).astype("int64"),
                    "format": meta.map(lambda m: m[0]),
                    "width": meta.map(lambda m: m[1]).astype("int32"),
                    "height": meta.map(lambda m: m[2]).astype("int32"),
                    "n_frames": meta.map(lambda m: m[3]).astype("int32"),
                }
            )

    return df.select(id_col, binary_col).mapInPandas(batches, DECODED_SCHEMA)


@query(
    "q_m1_multimodal_meta",
    oracle="""
    WITH payloads AS (
      SELECT doc_id, encode(text) AS payload FROM documents
    )
    SELECT doc_id,
           CAST(octet_length(payload) AS BIGINT) AS n_bytes,
           CASE octet_length(payload) % 4
             WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
             WHEN 2 THEN 'wav' ELSE 'mp4' END AS format,
           CAST(octet_length(payload) % 256 AS INTEGER) AS width,
           CAST((octet_length(payload) // 256) % 256 AS INTEGER) AS height,
           CAST(CASE WHEN octet_length(payload) % 4 IN (0, 1) THEN 1
                     ELSE octet_length(payload) % 16 END AS INTEGER) AS n_frames
    FROM payloads
    """,
)
def q_m1_multimodal_meta(spark, sf_dir):
    """M1 (extension): binary media column -> typed metadata via
    mapInPandas. The fixture has no raw media, so payloads are the
    documents' UTF-8 bytes (schema/plumbing identical to real media);
    the stub decoder's output is mirrored exactly by the SQL oracle."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return extract_media_metadata(d, "payload", "doc_id")


def sample_frames(df: DataFrame, binary_col: str, id_col: str, every_n: int = 4):
    """Frame-sampling plumbing: one row per sampled frame index (UDTF
    shape). Uses the stubbed frame count; swap decode_media in for real
    video."""
    meta = extract_media_metadata(df, binary_col, id_col)
    return meta.select(
        "doc_id",
        "format",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("n_frames") - 1, F.lit(0)),
                F.lit(every_n),
            )
        ).alias("frame_idx"),
    )


@query(
    "q_m2_frame_sample",
    oracle="""
    WITH meta AS (
      SELECT doc_id,
             octet_length(encode(text)) AS n_bytes,
             CASE octet_length(encode(text)) % 4
               WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
               WHEN 2 THEN 'wav' ELSE 'mp4' END AS format,
             CASE WHEN octet_length(encode(text)) % 4 IN (0, 1) THEN 1
                  ELSE octet_length(encode(text)) % 16 END AS n_frames
      FROM documents
    )
    SELECT doc_id, format,
           CAST(unnest(range(0, greatest(n_frames - 1, 0) + 1, 4)) AS INTEGER)
             AS frame_idx
    FROM meta
    """,
)
def q_m2_frame_sample(spark, sf_dir):
    """M2 (extension): every-4th-frame sampling over the decoded frame
    counts — one row per (doc, frame)."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return sample_frames(d, "payload", "doc_id", every_n=4)


@query(
    "q_m3_media_shard_pack",
    oracle="""
    WITH p AS (
      SELECT doc_id, octet_length(encode(text)) AS n_bytes FROM documents
    )
    SELECT doc_id,
           CAST(n_bytes AS BIGINT) AS n_bytes,
           CAST(FLOOR(CAST(SUM(n_bytes) OVER (ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) - n_bytes AS DOUBLE)
                      / 4096) AS BIGINT) AS shard_id
    FROM p
    """,
)
def q_m3_media_shard_pack(spark, sf_dir):
    """M3 (extension): WebDataset-style shard assembly for multimodal
    payloads — pack binary media rows into ~4 KiB-budget shards in key
    order (shard_id = floor(bytes_before_me / budget)). This is how a
    training pipeline lays raw media out for sequential-read dataloaders:
    size-bounded archive shards, order preserved so (doc, shard)
    assignment is deterministic and resumable.

    Scale: byte sizes come from the Arrow-batched metadata extractor
    (mapInPandas — the payload bytes never leave the executor), and the
    running total is the SAME distributed two-phase prefix sum as the
    token packer (running_total_before, sampling.py): no single-task
    global window, serial work ~ n_rows / bucket_size."""
    from etl_spark_eks_spark.operators.sampling import running_total_before

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    meta = extract_media_metadata(d, "payload", "doc_id").select(
        "doc_id", "n_bytes"
    )
    return running_total_before(meta, "doc_id", "n_bytes").select(
        "doc_id",
        "n_bytes",
        F.floor(F.col("__cum_before").cast("double") / 4096)
        .cast("bigint")
        .alias("shard_id"),
    )
