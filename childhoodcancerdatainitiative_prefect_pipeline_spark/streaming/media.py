"""Continuous media ingestion — the codec kernels under
Structured Streaming.

A production media corpus isn't loaded once; it ARRIVES — new
parquet files of (media_id, mime, payload) rows land continuously
(object-store staging, Kafka→parquet, a crawler's output).  Because
every decode kernel in ``operators/`` is a STATELESS ``mapInPandas``
stage, the same functions run unchanged on a streaming DataFrame:

    stream = read_media_stream(spark, staging_dir, schema)
    stats  = decode_bmp_stats(stream)        # the batch kernel, as-is
    stats.writeStream...                     # any sink

- :func:`read_media_stream` — file-source stream over a staging
  directory (parquet carries binary columns natively; maxFilesPerTrigger
  bounds per-batch decode work so one giant drop can't stall a
  micro-batch);
- :func:`route_media_stream` — the mime-dispatch of
  ``multimodal_route_decode`` on a stream: per-format filters feed
  each kernel and union long-form, still fully stateless (no
  watermark needed — decode is per-row);
- dead-letter rows flow to the SAME sink with ``decode_error`` set,
  so corrupt payloads are observable, not fatal, exactly as in batch.

Scale: decode parallelism = file/partition parallelism; a 1000-
executor cluster drains staging as fast as the object store serves
it, and the kernels' per-row isolation bounds the blast radius of a
bad payload to one row per micro-batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: staging-table schema the stream reader expects
MEDIA_STREAM_SCHEMA = "media_id long, mime string, payload binary"


def read_media_stream(
    spark: SparkSession,
    staging_dir: str,
    max_files_per_trigger: int = 8,
) -> DataFrame:
    """Streaming scan of a parquet staging directory of media rows."""
    return (
        spark.readStream.schema(MEDIA_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(staging_dir)
    )


def route_media_stream(stream: DataFrame) -> DataFrame:
    """Mime-dispatch a media stream through the real codec kernels,
    unioned long-form — the streaming twin of
    ``multimodal_route_decode`` (stateless, so no watermark)."""
    from ..operators.flac import decode_flac_stats
    from ..operators.multimodal import decode_bmp_stats, decode_jpeg_stats

    def long_form(stats: DataFrame, mime: str, cols: list[str]) -> DataFrame:
        pairs = [
            F.struct(
                F.lit(c).alias("stat"),
                F.col(c).cast("long").alias("value"),
            )
            for c in cols
        ]
        return stats.select(
            "media_id",
            F.lit(mime).alias("mime"),
            "decode_error",
            F.explode(F.array(*pairs)).alias("s"),
        ).select(
            "media_id", "mime", F.col("s.stat"), F.col("s.value"),
            "decode_error",
        )

    bmp = long_form(
        decode_bmp_stats(stream.filter(F.col("mime") == "image/bmp")),
        "image/bmp", ["width", "height", "sum_r", "sum_g", "sum_b"],
    )
    jpg = long_form(
        decode_jpeg_stats(stream.filter(F.col("mime") == "image/jpeg")),
        "image/jpeg", ["width", "height", "sum_r", "sum_g", "sum_b"],
    )
    flac = long_form(
        decode_flac_stats(stream.filter(F.col("mime") == "audio/flac")),
        "audio/flac",
        ["n_frames", "duration_milli", "sum_samples", "sum_abs"],
    )
    return bmp.unionByName(jpg).unionByName(flac)
