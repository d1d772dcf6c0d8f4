"""Multimodal column plumbing: image/audio/video as opaque binary.

Pattern: media payloads live in a ``binary`` column with typed
metadata columns alongside (modality, mime, width/height/duration).
Decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages so a 1000-executor cluster streams batches
without materializing whole partitions.

The actual codecs (PIL/librosa/ffmpeg) are NOT available in this
container, so the decode kernel is stubbed behind
``DECODERS_AVAILABLE`` with a deterministic fake; the Spark-side
contract — schemas, batch iteration, partitioning — is real and
tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Flip when real codec libraries are importable on executors.
DECODERS_AVAILABLE = False

#: Canonical media-table schema: payload + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("modality", StringType(), False),  # image|audio|video
        StructField("mime", StringType(), True),
        StructField("payload", BinaryType(), True),
        StructField("n_bytes", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("modality", StringType(), False),
        StructField("feature_kind", StringType(), False),
        StructField("feature_value", StringType(), True),
    ]
)


def synthesize_media(df: DataFrame, id_col: str, modality: str = "image") -> DataFrame:
    """Build a media table from any keyed table (test fixture path).

    Payload = deterministic pseudo-bytes derived from the id; at
    production scale this is a parquet/iceberg table with real blobs
    or object-store references.
    """
    payload = F.encode(
        F.concat(F.lit(f"{modality}-payload-"), F.col(id_col).cast("string")), "UTF-8"
    )
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(modality).alias("modality"),
        F.lit(f"{modality}/x-synthetic").alias("mime"),
        payload.alias("payload"),
        F.length(payload).cast("long").alias("n_bytes"),
    )


def _decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Decode kernel for one Arrow batch.

    With real codecs this would open the payload and emit e.g.
    (width, height) for images or duration for audio.  The stub emits
    a deterministic fake feature so plumbing is verifiable end-to-end.
    """
    if DECODERS_AVAILABLE:  # pragma: no cover - container has no codecs
        raise NotImplementedError("wire PIL/librosa/ffmpeg decode here")
    out = pd.DataFrame(
        {
            "media_id": pdf["media_id"],
            "modality": pdf["modality"],
            "feature_kind": "stub_digest",
            "feature_value": pdf["payload"].map(
                lambda b: f"len={len(b) if b is not None else 0}"
            ),
        }
    )
    return out


def extract_features(media: DataFrame) -> DataFrame:
    """Decode/feature-extract via ``mapInPandas`` (Arrow batches).

    Executors iterate record batches — constant memory per task even
    for multi-GB partitions of blobs; repartition by ``media_id``
    upstream if payload sizes are skewed.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _decode_batch(pdf)

    return media.mapInPandas(kernel, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame.

    Emits (media_id, frame_no) rows row-locally via ``sequence`` +
    ``explode`` — the decode of each frame is then a second
    ``mapInPandas`` stage (stubbed, as above).  Frame fan-out happens
    on executors, so a 2-hour video never materializes on one task.
    """
    n_frames = F.greatest(
        (F.col("n_bytes") / F.lit(100)).cast("long"), F.lit(1)
    )  # stub: pretend 1 frame per 100 bytes
    return media.filter(F.col("modality") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
        ).alias("frame_no"),
    )


def resize_images(
    media: DataFrame, width: int = 224, height: int = 224
) -> DataFrame:
    """Image resize via ``mapInPandas`` — media table in, media table out.

    The output keeps MEDIA_SCHEMA (payload replaced by the resized
    bytes, ``n_bytes`` updated, mime stamped) so resize stages chain
    with decode/extract stages freely.  Stub kernel: payload tagged
    deterministically; a real kernel swaps in PIL here and nothing
    else changes.
    """
    tag = f"resized-{width}x{height}-".encode()

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if DECODERS_AVAILABLE:  # pragma: no cover - no codecs here
                raise NotImplementedError("wire PIL Image.resize here")
            resized = pdf["payload"].map(
                lambda b: tag + (b or b"")[: 16]
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "mime": "image/x-resized",
                    "payload": resized,
                    "n_bytes": resized.map(len).astype("int64"),
                }
            )

    return media.filter(F.col("modality") == "image").mapInPandas(
        kernel, schema=MEDIA_SCHEMA
    )


def chunk_audio(
    media: DataFrame, chunk_ms: int = 30_000, stride_ms: int = 20_000
) -> DataFrame:
    """Audio chunking plan + payload slicing — media table in/out.

    Speech pipelines window long recordings into overlapping chunks
    (e.g. 30 s windows at 20 s stride for ASR).  The chunk PLAN is
    row-local ``sequence``+``explode`` (like ``frame_sample_plan`` —
    a 3-hour recording fans out on executors, never one task), and
    the byte slicing runs in the Arrow kernel.  Stub decode: duration
    inferred as 1 ms per payload byte, slice boundaries proportional;
    a real kernel swaps in soundfile/librosa offsets and nothing
    else changes.  Output keeps MEDIA_SCHEMA with chunked payloads
    and ``media_id`` shifted to (id * 10000 + chunk_no) so chunk ids
    stay unique and traceable.
    """
    dur_ms = F.col("n_bytes")  # stub: 1 ms per byte
    n_chunks = F.greatest(
        F.ceil((dur_ms - chunk_ms) / stride_ms) + 1, F.lit(1)
    ).cast("long")
    plan = media.filter(F.col("modality") == "audio").select(
        "media_id",
        "modality",
        "mime",
        "payload",
        "n_bytes",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_no"),
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if DECODERS_AVAILABLE:  # pragma: no cover - no codecs here
                raise NotImplementedError("wire soundfile block reads here")
            start = pdf["chunk_no"] * stride_ms  # stub: ms == bytes
            sliced = [
                (b or b"")[s : s + chunk_ms]
                for b, s in zip(pdf["payload"], start)
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"] * 10000 + pdf["chunk_no"],
                    "modality": pdf["modality"],
                    "mime": "audio/x-chunk",
                    "payload": sliced,
                    "n_bytes": pd.Series(
                        [len(x) for x in sliced], dtype="int64"
                    ),
                }
            )

    return plan.mapInPandas(kernel, schema=MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# REAL image decode for a stdlib-decodable format: 24-bit BMP.
# PNG/JPEG stay behind DECODERS_AVAILABLE (no codecs in this
# container), but the BMP path exercises the full contract — binary
# payload in, struct-parsed pixels out — with zero dependencies, so
# the multimodal pipeline has one end-to-end REAL decode.
# ---------------------------------------------------------------------------


def encode_bmp(width: int, height: int, pixel_fn) -> bytes:
    """Minimal 24-bpp bottom-up BMP writer (BITMAPINFOHEADER).

    ``pixel_fn(x, y) -> (r, g, b)``; rows padded to 4 bytes per spec.
    """
    import struct

    row_raw = width * 3
    pad = (4 - row_raw % 4) % 4
    img_size = (row_raw + pad) * height
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + img_size, 0, 0, off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    rows = bytearray()
    for y in range(height - 1, -1, -1):  # bottom-up
        for x in range(width):
            r, g, b = pixel_fn(x, y)
            rows += bytes((b, g, r))  # BGR order
        rows += b"\x00" * pad
    return header + info + bytes(rows)


def decode_bmp(payload: bytes) -> dict:
    """Parse a 24-bpp BMP: dimensions + per-channel integer pixel sums.

    Sums (not float means) so downstream aggregation stays exact; the
    mean is one division at the end.  Raises ``ValueError`` on
    non-BMP payloads — quarantine upstream, like the corrupt-record
    reader does.
    """
    import struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", payload, 10)[0]
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    if bpp != 24:
        raise ValueError(f"unsupported bpp {bpp}")
    height_abs = abs(height)
    row_raw = width * 3
    pad = (4 - row_raw % 4) % 4
    sr = sg = sb = 0
    for row in range(height_abs):
        base = off + row * (row_raw + pad)
        for x in range(width):
            b, g, r = payload[base + 3 * x : base + 3 * x + 3]
            sr += r
            sg += g
            sb += b
    return {
        "width": width,
        "height": height_abs,
        "sum_r": sr,
        "sum_g": sg,
        "sum_b": sb,
    }


BMP_STATS_SCHEMA = (
    "media_id long, width long, height long, sum_r long, sum_g long, "
    "sum_b long, decode_error string"
)


def decode_bmp_stats(media: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Arrow-batched REAL decode: payload → dimensions + channel sums.

    Malformed payloads produce a ``decode_error`` row instead of
    failing the stage (dead-letter discipline); the batch contract is
    identical to the stubbed PNG/JPEG kernels, so swapping in real
    codecs later changes one function, not the plan.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf["payload"]):
                try:
                    d = decode_bmp(bytes(payload))
                    rows.append(
                        (int(mid), d["width"], d["height"], d["sum_r"],
                         d["sum_g"], d["sum_b"], None)
                    )
                except Exception as ex:  # noqa: BLE001
                    rows.append((int(mid), None, None, None, None, None,
                                 f"{type(ex).__name__}: {ex}"))
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "width", "height", "sum_r", "sum_g", "sum_b",
                    "decode_error",
                ],
            )

    return media.select(id_col, "payload").mapInPandas(
        kernel, BMP_STATS_SCHEMA
    )
