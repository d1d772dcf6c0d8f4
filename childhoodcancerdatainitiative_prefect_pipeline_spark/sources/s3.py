"""S3 metadata operators (S6-S9) — mapPartitions utilities.

The reference's S3 surface: bucket listing → DataFrame (S6),
per-object head/existence probes (S7), streaming ranged-GET md5 (S8),
copy/move with verify (S9).  Spark-first rendering:

- the *bookkeeping* (which objects, sizes, reconciliation, verify
  results) is DataFrame work — see the inventory schema below and
  the reconcile join in plans; at 100 TB scale the listing comes
  from S3 Inventory parquet, not live ListObjects;
- the *side effects* (HEAD/GET/COPY) are ``mapPartitions`` kernels
  with one boto3 client per partition, retry parity with the
  reference (5 attempts / 300 s timeouts, src/utils.py:444-453).

boto3 is import-gated; without it the kernels raise clearly and the
pure-DataFrame paths (inventory reconcile) still work — which is
what the tests exercise.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: S6 inventory schema — {file_path, file_name, file_size, ext}
#: (src/s3_catcherry.py:1088-1119, src/read_buckets.py:64-106).
INVENTORY_SCHEMA = StructType(
    [
        StructField("file_path", StringType(), False),
        StructField("file_name", StringType(), True),
        StructField("file_size", LongType(), True),
        StructField("ext", StringType(), True),
    ]
)

PROBE_SCHEMA = StructType(
    [
        StructField("file_url", StringType(), False),
        StructField("object_exists", BooleanType(), True),
        StructField("object_size", LongType(), True),
    ]
)

MD5_CHUNK_BYTES = 536_870_912  # 512 MiB ranged GETs (src/utils.py:1237)


def _boto3():
    try:
        import boto3
        from botocore.config import Config

        return boto3, Config(
            connect_timeout=300,
            read_timeout=300,
            retries={"max_attempts": 5, "mode": "standard"},
        )
    except ImportError as e:  # pragma: no cover - env-dependent
        raise ImportError(
            "S3 operators require boto3 (not installed here). Use the "
            "inventory-DataFrame paths for offline reconciliation."
        ) from e


def listing_to_inventory(spark: SparkSession, entries: list[dict]) -> DataFrame:
    """S6 — materialize a (driver-side) listing as the inventory table.

    ``entries`` come from paginated ``list_objects_v2`` (or tests);
    folder placeholders (keys ending '/') are skipped, mirroring
    src/s3_catcherry.py:1100-1104.
    """
    rows = []
    for e in entries:
        key = e["Key"]
        if key.endswith("/"):
            continue
        name = key.rsplit("/", 1)[-1]
        ext = name.rsplit(".", 1)[-1] if "." in name else ""
        rows.append((key, name, int(e.get("Size", 0)), ext))
    return spark.createDataFrame(rows, INVENTORY_SCHEMA)


def list_bucket(spark: SparkSession, bucket: str, prefix: str = "") -> DataFrame:
    """S6 live variant — paginate list_objects_v2 on the driver.

    Listing metadata is tiny relative to data; for inventory-scale
    buckets prefer reading the S3 Inventory report parquet directly:
    ``spark.read.parquet("s3://<inventory-dest>/...")``.
    """
    boto3, cfg = _boto3()
    client = boto3.client("s3", config=cfg)
    entries: list[dict] = []
    for page in client.get_paginator("list_objects_v2").paginate(
        Bucket=bucket, Prefix=prefix
    ):
        entries.extend(page.get("Contents", []))
    return listing_to_inventory(spark, entries)


def _default_client():
    boto3, cfg = _boto3()
    return boto3.client("s3", config=cfg)


def probe_objects(
    urls: DataFrame, url_col: str = "file_url", client_factory=None
) -> DataFrame:
    """S7 — existence+size probe per URL, one client per partition.

    Reference: src/s3_validationry_refactored.py:1367-1384 (3 retries
    per head).  Prefer :func:`reconcile_with_inventory` when an
    inventory table exists — a join beats N HEAD requests.
    ``client_factory`` (picklable, called once per partition) exists
    for tests and alternative S3-compatible endpoints.
    """
    client_factory = client_factory or _default_client

    def kernel(rows: Iterator) -> Iterator[tuple]:
        client = client_factory()
        for row in rows:
            url = row[url_col]
            try:
                bucket, key = url.replace("s3://", "", 1).split("/", 1)
                head = client.head_object(Bucket=bucket, Key=key)
                yield (url, True, int(head["ContentLength"]))
            except Exception:
                yield (url, False, None)

    return urls.select(url_col).distinct().rdd.mapPartitions(kernel).toDF(
        PROBE_SCHEMA
    )


def _object_md5(client, bucket: str, key: str, chunk_bytes: int) -> str:
    """Incremental md5 of one object via ranged GETs (src/utils.py:1227).

    Zero-byte objects: a Range of "bytes=0--1" is a 416 from S3, so the
    GET loop is skipped entirely — md5(b"") is the right digest and
    costs nothing.  Raises on any client error (callers decide whether
    that is a per-object ``failed`` row or a hard error).
    """
    import hashlib

    size = int(client.head_object(Bucket=bucket, Key=key)["ContentLength"])
    md5 = hashlib.md5()
    for start in range(0, size, chunk_bytes):
        end = min(start + chunk_bytes, size) - 1
        body = client.get_object(
            Bucket=bucket, Key=key, Range=f"bytes={start}-{end}"
        )["Body"]
        for chunk in iter(lambda: body.read(1 << 20), b""):
            md5.update(chunk)
    return md5.hexdigest()


def streaming_md5(
    urls: DataFrame,
    url_col: str = "file_url",
    client_factory=None,
    chunk_bytes: int = MD5_CHUNK_BYTES,
) -> DataFrame:
    """S8 — incremental md5 over 512 MiB ranged GETs per object.

    Reference: src/utils.py:1227-1263.  One object per task; the
    ranged reads keep executor memory flat regardless of object size.
    """
    client_factory = client_factory or _default_client

    def kernel(rows: Iterator) -> Iterator[tuple]:
        client = client_factory()
        for row in rows:
            url = row[url_col]
            try:
                bucket, key = url.replace("s3://", "", 1).split("/", 1)
                yield (url, _object_md5(client, bucket, key, chunk_bytes))
            except Exception:
                # Per-object isolation (parity with probe_objects): one
                # bad object must not fail the whole task.
                yield (url, None)

    schema = StructType(
        [
            StructField("file_url", StringType(), False),
            StructField("md5sum", StringType(), True),
        ]
    )
    return urls.select(url_col).distinct().rdd.mapPartitions(kernel).toDF(schema)


def _normalized_sides(
    manifest: DataFrame,
    inventory: DataFrame,
    url_col: str,
    size_col: str,
    bucket_prefix: str,
) -> tuple[DataFrame, DataFrame]:
    m = manifest.select(
        F.col(url_col).alias("file_url"),
        F.col(size_col).cast("long").alias("manifest_size"),
    ).withColumn(
        "file_path",
        F.regexp_replace(F.col("file_url"), r"^s3://[^/]+/", bucket_prefix),
    )
    inv = inventory.select(
        F.col("file_path"), F.col("file_size").alias("bucket_size")
    )
    return m, inv


def reconcile_with_inventory(
    manifest: DataFrame,
    inventory: DataFrame,
    url_col: str = "file_url",
    size_col: str = "file_size",
    bucket_prefix: str = "",
) -> DataFrame:
    """S6+J6 — two-way manifest↔bucket reconcile as one outer join.

    Reference: src/s3_validationry_refactored.py:1618-1783.  Output
    rows carry a status ∈ {ok, size_mismatch, missing_in_bucket,
    missing_in_manifest} — the reference's two anti-join reports and
    the size-compare, in a single shuffle.
    """
    m, inv = _normalized_sides(manifest, inventory, url_col, size_col, bucket_prefix)
    joined = m.join(inv, on="file_path", how="full_outer")
    status = (
        F.when(F.col("file_url").isNull(), "missing_in_manifest")
        .when(F.col("bucket_size").isNull(), "missing_in_bucket")
        .when(F.col("manifest_size") != F.col("bucket_size"), "size_mismatch")
        .otherwise("ok")
    )
    return joined.withColumn("status", status)


def streaming_inventory_status(
    inventory: DataFrame,
    manifest: DataFrame,
    url_col: str = "file_url",
    size_col: str = "file_size",
    bucket_prefix: str = "",
) -> DataFrame:
    """Incremental S6+J6 — the reconcile attached to a stream of
    inventory deltas (``readStream`` over S3 Inventory drops).

    Stream-static left join: each arriving inventory row is checked
    against the manifest without re-reading the accumulated snapshot,
    so a day's delta costs a day's rows regardless of bucket size.
    Statuses covered: ok / size_mismatch / missing_in_manifest.  The
    reverse direction (missing_in_bucket — manifest entries the bucket
    has *never* reported) is a question about the accumulated snapshot,
    not a delta, and stays on :func:`reconcile_with_inventory` over the
    compacted inventory table; stream-static full-outer joins are not
    expressible in Structured Streaming anyway.

    ``inventory`` may be a streaming *or* batch DataFrame — the
    transform is identical (this is the test seam).
    """
    m, inv = _normalized_sides(manifest, inventory, url_col, size_col, bucket_prefix)
    joined = inv.join(m, on="file_path", how="left")
    status = (
        F.when(F.col("file_url").isNull(), "missing_in_manifest")
        .when(F.col("manifest_size") != F.col("bucket_size"), "size_mismatch")
        .otherwise("ok")
    )
    return joined.withColumn("status", status)


def plan_moves(
    manifest: DataFrame,
    url_col: str = "file_url",
    dest_prefix: str = "s3://dest-bucket/",
) -> DataFrame:
    """S9 bookkeeping — the DataFrame half of copy/move: source → dest
    mapping with multipart flag (>5 GB threshold,
    src/file_mover.py:94-171).  The copy itself is a foreachPartition
    side effect executed from this plan.
    """
    return manifest.select(
        F.col(url_col).alias("src_url"),
        F.concat(
            F.lit(dest_prefix),
            F.regexp_replace(F.col(url_col), r"^s3://[^/]+/", ""),
        ).alias("dest_url"),
        (F.col("file_size").cast("long") > 5 * 1024**3).alias("needs_multipart"),
    )


#: S9 execution result schema — one row per attempted transfer.
MOVE_RESULT_SCHEMA = StructType(
    [
        StructField("src_url", StringType(), False),
        StructField("dest_url", StringType(), False),
        StructField("status", StringType(), False),
        StructField("bytes_copied", LongType(), True),
    ]
)

MULTIPART_THRESHOLD = 5 * 1024**3  # 5 GiB (src/file_mover.py:186)
MULTIPART_PART_BYTES = 100 * 1024 * 1024  # 100 MiB parts (src/file_mover.py:102)


def execute_moves(
    moves: DataFrame,
    client_factory=None,
    multipart_threshold: int = MULTIPART_THRESHOLD,
    part_bytes: int = MULTIPART_PART_BYTES,
    delete_source: bool = False,
    md5_chunk_bytes: int = MD5_CHUNK_BYTES,
) -> DataFrame:
    """S9 execution — apply a :func:`plan_moves` frame.

    Reference semantics (src/file_mover.py:94-290, ``copy_file_task``
    / ``copy_file_by_size`` / ``copy_large_file``):

    - HEAD the source for its size; if the destination already exists
      with the SAME size, skip (idempotent restart — the reference's
      "had already been copied" branch);
    - at or under ``multipart_threshold`` use one server-side
      ``copy_object``; above it, ``upload_part_copy`` in
      ``part_bytes`` ranges + ``complete_multipart_upload`` (aborted
      on any part failure, as the reference does);
    - ``delete_source=True`` gives move semantics with the reference's
      copy→verify→delete ordering (workflows/file_mover_delete.py:
      delete runs only on objects that PASS compare_md5sum_flow): the
      source is deleted only after a streaming-md5 comparison of
      source vs destination succeeds — for fresh copies *and* for
      size-matched skips alike (a same-size stale destination must
      never cost the only correct copy).  An md5 mismatch yields a
      ``verify_failed`` row and deletes nothing;
    - per-object isolation: one bad object yields a ``failed`` row,
      never a task failure (parity with probe_objects/streaming_md5).

    One client per partition; ``client_factory`` is picklable and
    injection-testable exactly like S7/S8.  Status values:
    ``copied`` | ``copied_multipart`` | ``skipped`` | ``failed`` |
    ``verify_failed`` (delete_source only).
    """
    client_factory = client_factory or _default_client

    def kernel(rows: Iterator) -> Iterator[tuple]:
        client = client_factory()
        for row in rows:
            src, dest = row["src_url"], row["dest_url"]
            try:
                sb, sk = src.replace("s3://", "", 1).split("/", 1)
                db, dk = dest.replace("s3://", "", 1).split("/", 1)
                size = int(
                    client.head_object(Bucket=sb, Key=sk)["ContentLength"]
                )
                already = False
                try:
                    d = client.head_object(Bucket=db, Key=dk)
                    already = int(d["ContentLength"]) == size
                except Exception:
                    pass
                if already:
                    status, copied = "skipped", 0
                elif size > multipart_threshold:
                    upload_id = client.create_multipart_upload(
                        Bucket=db, Key=dk
                    )["UploadId"]
                    try:
                        parts = []
                        for num, start in enumerate(
                            range(0, size, part_bytes), start=1
                        ):
                            end = min(start + part_bytes, size) - 1
                            resp = client.upload_part_copy(
                                Bucket=db,
                                Key=dk,
                                CopySource={"Bucket": sb, "Key": sk},
                                PartNumber=num,
                                UploadId=upload_id,
                                CopySourceRange=f"bytes={start}-{end}",
                            )
                            parts.append(
                                {
                                    "PartNumber": num,
                                    "ETag": resp["CopyPartResult"]["ETag"],
                                }
                            )
                        client.complete_multipart_upload(
                            Bucket=db,
                            Key=dk,
                            UploadId=upload_id,
                            MultipartUpload={"Parts": parts},
                        )
                    except Exception:
                        client.abort_multipart_upload(
                            Bucket=db, Key=dk, UploadId=upload_id
                        )
                        raise
                    status, copied = "copied_multipart", size
                else:
                    # Dict CopySource (not the "bucket/key" string
                    # form): keys containing '+'/'%' are misread by S3
                    # in the string form — parity with the multipart
                    # upload_part_copy call above.
                    client.copy_object(
                        Bucket=db,
                        CopySource={"Bucket": sb, "Key": sk},
                        Key=dk,
                    )
                    status, copied = "copied", size
                if delete_source:
                    # Reference ordering: delete ONLY objects whose
                    # source/destination md5s match — a size-matched
                    # skip is NOT verification (the stale-destination
                    # trap), and a fresh copy is verified too.
                    src_md5 = _object_md5(client, sb, sk, md5_chunk_bytes)
                    dest_md5 = _object_md5(client, db, dk, md5_chunk_bytes)
                    if src_md5 == dest_md5:
                        client.delete_object(Bucket=sb, Key=sk)
                    else:
                        status = "verify_failed"
                yield (src, dest, status, copied)
            except Exception:
                yield (src, dest, "failed", None)

    return (
        moves.select("src_url", "dest_url")
        .rdd.mapPartitions(kernel)
        .toDF(MOVE_RESULT_SCHEMA)
    )


def verify_transfers(
    moves: DataFrame,
    client_factory=None,
    chunk_bytes: int = MD5_CHUNK_BYTES,
) -> DataFrame:
    """S9 verify — the reference's ``compare_md5sum_flow``
    (src/file_mover.py:319-381): streaming md5 of source AND
    destination (two distributed S8 kernels), joined back to the move
    plan.  Status parity: ``Pass`` (digests equal), ``Fail``
    (differ), ``Error`` (either side unreadable — the kernel's null
    md5).  The join carries url+digest rows only, never object bytes.
    """
    src_md5 = (
        streaming_md5(
            moves.select(F.col("src_url").alias("file_url")),
            client_factory=client_factory,
            chunk_bytes=chunk_bytes,
        )
        .withColumnRenamed("file_url", "src_url")
        .withColumnRenamed("md5sum", "src_md5")
    )
    dest_md5 = (
        streaming_md5(
            moves.select(F.col("dest_url").alias("file_url")),
            client_factory=client_factory,
            chunk_bytes=chunk_bytes,
        )
        .withColumnRenamed("file_url", "dest_url")
        .withColumnRenamed("md5sum", "dest_md5")
    )
    joined = (
        moves.select("src_url", "dest_url")
        .join(src_md5, "src_url")
        .join(dest_md5, "dest_url")
    )
    status = (
        F.when(
            F.col("src_md5").isNull() | F.col("dest_md5").isNull(), "Error"
        )
        .when(F.col("src_md5") == F.col("dest_md5"), "Pass")
        .otherwise("Fail")
    )
    return joined.select(
        "src_url", "dest_url", "src_md5", "dest_md5", status.alias("status")
    )


def split_s3_url(url: "Column | str") -> "Column":
    """``s3://bucket/path/to/file`` → struct(bucket, path).

    Column rendering of the reference's ``split_s3``
    (workflows/kf_data_sync_manifest_generator.py:9-20): bucket is the
    first segment after the scheme, path the remainder ('' when the
    url has no key part).
    """
    url = F.col(url) if isinstance(url, str) else url
    stripped = F.regexp_replace(url, r"^s3://", "")
    return F.struct(
        F.concat(F.lit("s3://"), F.split_part(stripped, F.lit("/"), F.lit(1)))
        .alias("bucket"),
        F.when(
            stripped.contains("/"),
            F.regexp_replace(stripped, r"^[^/]*/", ""),
        )
        .otherwise(F.lit(""))
        .alias("path"),
    )


def transfer_manifest_groups(
    manifest: DataFrame,
    src_col: str = "source",
    dst_col: str = "dest",
) -> DataFrame:
    """KF data-sync manifest generator
    (workflows/kf_data_sync_manifest_generator.py:23-58) as one plan.

    The reference splits both s3 urls, groups the frame by
    (source_bucket, dest_bucket), and writes one per-group manifest of
    source paths.  Here the split is a row-local struct projection and
    the grouping one aggregation producing the per-pair file count —
    the per-group manifest write is ``partitionBy(source_bucket,
    dest_bucket)`` on the ungrouped projection (same plan, no loop
    over groups).
    """
    parts = manifest.select(
        split_s3_url(src_col).alias("s"), split_s3_url(dst_col).alias("d")
    ).select(
        F.col("s.bucket").alias("source_bucket"),
        F.col("s.path").alias("source_path"),
        F.col("d.bucket").alias("dest_bucket"),
    )
    return parts.groupBy("source_bucket", "dest_bucket").agg(
        F.count("*").alias("n_files"),
        F.countDistinct("source_path").alias("n_distinct_paths"),
        F.min("source_path").alias("first_path"),
    )
