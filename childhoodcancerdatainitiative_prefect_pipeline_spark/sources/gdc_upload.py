"""GDC chunked file upload — the last reference workflow seam.

Reference: workflows/gdc_file_upload.py:147-238 (manifest triage) and
:240-290 (``uploader_handler``) — per manifest row the reference
downloads the object from S3 and shells out to ``gdc-client upload``
with a part size adapted so the transfer needs at most 1000
connections; rows with a pre-set status are skipped; every row ends
with ``status`` = ``"success"`` or an ``"ERROR: ..."`` string and the
updated manifest is the artifact.

Spark-first rendering (the S7/S8/S13 injectable-kernel pattern):

- the *bookkeeping* (which files, triage against already-submitted,
  result manifest) is DataFrame work — triage is the
  ``guid_fill_reconcile`` / ``s3_inventory_reconcile`` join shapes;
- the *side effect* (ranged source reads + chunked PUTs) is a
  ``mapPartitions`` kernel with one source client and one transport
  per partition.  No gdc-client binary, no boto3 requirement: both
  ends are injectable callables, so the kernel is unit-testable and
  endpoint-agnostic (any chunked-PUT API).  Retry/backoff reuses the
  REST discipline (``sources/rest.py::with_retries`` — 3 retries,
  [10, 30, 60] s schedule, workflows/gdc_import.py:147-238 parity).

Streaming discipline: chunks are read with ranged GETs (the S8 512
MiB pattern) and PUT one at a time — executor memory is bounded by
one part, never the file.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from .rest import DEFAULT_BACKOFF, with_retries

MAX_PARTS = 1000  # gdc-client connection cap (gdc_file_upload.py:240)


def adaptive_part_bytes(file_size: int, part_size_mb: int) -> int:
    """Reference part-size rule (workflows/gdc_file_upload.py:240-250):
    if the requested part size would need more than 1000 parts, bump
    it to ``round(size / 1000 / MiB) + 2`` MiB so the transfer always
    fits the connection cap."""
    mib = 1024 * 1024
    if file_size / (part_size_mb * mib) > MAX_PARTS:
        return int((round(file_size / MAX_PARTS / mib) + 2) * mib)
    return int(part_size_mb * mib)


#: one row per manifest entry — the reference's updated sub-manifest.
UPLOAD_RESULT_SCHEMA = StructType(
    [
        StructField("id", StringType(), False),
        StructField("file_name", StringType(), True),
        StructField("status", StringType(), False),
        StructField("n_parts", LongType(), True),
        StructField("bytes_sent", LongType(), True),
    ]
)


def upload_files_chunked(
    manifest: DataFrame,
    source_factory,
    transport_factory,
    part_size_mb: int = 128,
    backoff: Sequence[float] = DEFAULT_BACKOFF,
    part_bytes: int | None = None,
) -> DataFrame:
    """Chunked-PUT upload of every manifest row, one kernel per
    partition.

    ``manifest`` needs columns ``id``, ``file_name``, ``file_url``,
    ``file_size`` and (optionally) ``status`` — rows arriving with a
    non-empty status are passed through untouched (the reference's
    "already uploaded, skip" triage, gdc_file_upload.py:138-145).

    ``source_factory()`` → object with
    ``read_range(url, start, end) -> bytes`` (ranged GET; the S8
    discipline — one part in memory at a time).

    ``transport_factory()`` → object with
    ``put_part(file_id, part_number, total_parts, data) -> None``
    (raise to signal a retryable failure) and optionally
    ``finalize(file_id, total_parts) -> None`` called after the last
    part (the gdc-client's upload-finish handshake).  Each part is
    retried on the REST backoff schedule; a part that exhausts its
    retries fails THAT row only (per-object isolation, parity with
    probe_objects / execute_moves).

    Status values: ``success`` | ``skipped: <prior status>`` |
    ``ERROR: <exception>`` — the reference's tri-state manifest.

    ``part_bytes`` overrides the adaptive rule with a fixed part size
    (tests / endpoints with their own chunk contract).
    """

    has_status = "status" in manifest.columns

    def kernel(rows: Iterator) -> Iterator[tuple]:
        source = source_factory()
        transport = transport_factory()
        for row in rows:
            fid, name = row["id"], row["file_name"]
            prior = (row["status"] or "") if has_status else ""
            if prior:
                yield (fid, name, f"skipped: {prior}", None, None)
                continue
            try:
                size = int(row["file_size"])
                part = part_bytes or adaptive_part_bytes(size, part_size_mb)
                total_parts = max(1, -(-size // part))
                sent = 0
                for num, start in enumerate(range(0, max(size, 1), part), 1):
                    end = min(start + part, size) - 1
                    data = (
                        source.read_range(row["file_url"], start, end)
                        if size
                        else b""
                    )
                    with_retries(
                        lambda n=num, d=data: transport.put_part(
                            fid, n, total_parts, d
                        ),
                        backoff=backoff,
                    )
                    sent += len(data)
                if hasattr(transport, "finalize"):
                    with_retries(
                        lambda: transport.finalize(fid, total_parts),
                        backoff=backoff,
                    )
                yield (fid, name, "success", total_parts, sent)
            except Exception as ex:  # noqa: BLE001 - per-object isolation
                yield (fid, name, f"ERROR: {ex}", None, None)

    cols = ["id", "file_name", "file_url", "file_size"]
    if "status" in manifest.columns:
        cols.append("status")
    return (
        manifest.select(*cols)
        .rdd.mapPartitions(kernel)
        .toDF(UPLOAD_RESULT_SCHEMA)
    )
