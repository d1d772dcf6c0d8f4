"""WARC (Web ARChive) source — the container format of web crawls
(Common Crawl et al.), parsed with stdlib only.

Additive source next to S3/REST/graph-dump intake: a crawl-derived
training corpus starts life as WARC files; this module turns them
into a DataFrame of records ready for the text pipeline
(`text.html_strip` → quality → dedup → …).

Layout (ISO 28500): each record is a ``WARC/1.0`` version line,
CRLF-separated named headers (``WARC-Type``, ``WARC-Target-URI``,
``Content-Length``, …), a blank line, then exactly ``Content-Length``
payload bytes, then two CRLFs.  Payload slicing MUST use
Content-Length — payloads are binary and may contain anything,
including things that look like record boundaries.

Scale shape: one Spark ``binaryFile`` row per WARC file (crawl files
are written ~1 GiB for exactly this reason), parsed inside
``mapInPandas`` — Arrow-batched, one Python pass per file, no
driver-side I/O.  Records explode to one row each with typed
metadata + binary payload, the same contract as
``operators/multimodal.py`` media columns.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

#: output schema — metadata + opaque payload (decode downstream)
WARC_SCHEMA = (
    "path string, record_id string, warc_type string, target_uri string, "
    "warc_date string, content_type string, content_length long, "
    "payload binary"
)


def parse_warc_bytes(data: bytes) -> Iterator[dict]:
    """Iterate records of one WARC file (strict Content-Length slicing)."""
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record padding
        while pos < n and data[pos : pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            return
        if not data[pos : pos + 5] == b"WARC/":
            raise ValueError(
                f"malformed WARC: expected version line at byte {pos}"
            )
        hdr_end = data.index(b"\r\n\r\n", pos)
        header_block = data[pos : hdr_end].decode("utf-8", "replace")
        lines = header_block.split("\r\n")[1:]  # drop version line
        headers = {}
        for ln in lines:
            if ":" in ln:
                k, v = ln.split(":", 1)
                headers[k.strip().lower()] = v.strip()
        length = int(headers.get("content-length", "0"))
        body_start = hdr_end + 4
        payload = data[body_start : body_start + length]
        yield {
            "record_id": headers.get("warc-record-id", ""),
            "warc_type": headers.get("warc-type", ""),
            "target_uri": headers.get("warc-target-uri", ""),
            "warc_date": headers.get("warc-date", ""),
            "content_type": headers.get("content-type", ""),
            "content_length": length,
            "payload": payload,
        }
        pos = body_start + length


def build_warc_bytes(records: list[dict]) -> bytes:
    """Inverse of :func:`parse_warc_bytes` — fixture/sink helper."""
    out = bytearray()
    for r in records:
        payload = r.get("payload", b"")
        headers = [
            ("WARC-Type", r.get("warc_type", "response")),
            ("WARC-Record-ID", r.get("record_id", "<urn:uuid:0>")),
            ("WARC-Target-URI", r.get("target_uri", "")),
            ("WARC-Date", r.get("warc_date", "2024-01-01T00:00:00Z")),
            ("Content-Type", r.get("content_type", "text/html")),
            ("Content-Length", str(len(payload))),
        ]
        out += b"WARC/1.0\r\n"
        for k, v in headers:
            out += f"{k}: {v}\r\n".encode()
        out += b"\r\n"
        out += payload
        out += b"\r\n\r\n"
    return bytes(out)


def read_warc(
    spark: SparkSession,
    path: str,
    warc_types: tuple[str, ...] = ("response",),
) -> DataFrame:
    """WARC files under ``path`` → one row per record.

    ``binaryFile`` gives (path, content) per file; records parse and
    filter inside an Arrow batch stage.  Pushing the type filter into
    the parser avoids materializing request/metadata records at all.
    """
    import pandas as pd

    files = spark.read.format("binaryFile").load(path)

    def parse(batches):
        for pdf in batches:
            rows = []
            for path_, content in zip(pdf["path"], pdf["content"]):
                for rec in parse_warc_bytes(bytes(content)):
                    if warc_types and rec["warc_type"] not in warc_types:
                        continue
                    rec["path"] = path_
                    rows.append(rec)
            yield pd.DataFrame(
                rows,
                columns=[
                    "path",
                    "record_id",
                    "warc_type",
                    "target_uri",
                    "warc_date",
                    "content_type",
                    "content_length",
                    "payload",
                ],
            )

    return files.select("path", "content").mapInPandas(parse, WARC_SCHEMA)


# ---------------------------------------------------------------------------
# Round-5 additions: HTTP-envelope-aware record parsing for payload
# COLUMNS (a WARC per row, e.g. staged in a manifest table, vs
# read_warc's binaryFile directory scan), plus tar/zip bundle intake
# — the other common corpus delivery shape.
# ---------------------------------------------------------------------------

import io
import tarfile
import zipfile

import pandas as pd

CRLF = b"\r\n"


def encode_warc(records: list[dict]) -> bytes:
    """Fixture/oracle writer with the HTTP envelope the crawl format
    actually stores: each record dict carries ``warc_type``,
    ``target_uri``, and either raw ``body`` bytes or ``http_body`` +
    optional ``http_status`` (wrapped in a minimal HTTP/1.1
    response, Content-Type ``application/http``)."""
    out = bytearray()
    for i, rec in enumerate(records):
        if "http_body" in rec:
            body = (
                b"HTTP/1.1 "
                + str(rec.get("http_status", 200)).encode()
                + b" OK" + CRLF
                + b"Content-Type: text/html" + CRLF + CRLF
                + rec["http_body"]
            )
            ctype = "application/http; msgtype=response"
        else:
            body = rec.get("body", b"")
            ctype = "text/plain"
        out += build_warc_bytes(
            [
                {
                    "warc_type": rec["warc_type"],
                    "record_id": f"<urn:uuid:rec-{i}>",
                    "target_uri": rec.get("target_uri", ""),
                    "content_type": ctype,
                    "payload": body,
                }
            ]
        )
    return bytes(out)


def parse_warc(payload: bytes) -> list[dict]:
    """Strict parse + HTTP-envelope split: returns
    ``[{warc_type, target_uri, http_status, body}]`` — for
    ``application/http`` records the status line is read and the
    envelope stripped; other records pass their raw payload with
    ``http_status`` None.  Raises ``ValueError`` on framing or
    envelope damage (the kernels dead-letter)."""
    records = []
    for rec in parse_warc_bytes(payload):
        body = rec["payload"]
        http_status = None
        if rec["content_type"].startswith("application/http"):
            env_end = body.find(CRLF + CRLF)
            if env_end < 0:
                raise ValueError("HTTP envelope missing blank line")
            status_line = body[:env_end].split(CRLF)[0].decode(
                "utf-8", "replace"
            )
            parts = status_line.split(" ")
            if len(parts) < 2 or not parts[1].isdigit():
                raise ValueError(f"bad HTTP status line: {status_line!r}")
            http_status = int(parts[1])
            body = body[env_end + 4 :]
        records.append(
            {
                "warc_type": rec["warc_type"],
                "target_uri": rec["target_uri"] or None,
                "http_status": http_status,
                "body": body,
            }
        )
    if not records:
        raise ValueError("payload contains no WARC records")
    return records


WARC_RECORD_SCHEMA = (
    "warc_id long, record_no long, warc_type string, target_uri string, "
    "http_status long, body binary, parse_error string"
)


def warc_records(media: DataFrame, id_col: str = "warc_id") -> DataFrame:
    """Arrow-batched WARC fan-out over payload COLUMNS: one row per
    contained record; a structurally-broken WARC yields one
    dead-letter row (read_warc is the directory-scan twin)."""
    cols = [
        id_col, "record_no", "warc_type", "target_uri", "http_status",
        "body", "parse_error",
    ]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for wid, payload in zip(pdf[id_col], pdf["payload"]):
                wid = int(wid)
                try:
                    for i, rec in enumerate(parse_warc(bytes(payload))):
                        rows.append(
                            (wid, i, rec["warc_type"], rec["target_uri"],
                             rec["http_status"], rec["body"], None)
                        )
                except Exception as ex:  # noqa: BLE001
                    rows.append(
                        (wid, None, None, None, None, None,
                         f"{type(ex).__name__}: {ex}")
                    )
            yield pd.DataFrame(rows, columns=cols)

    return media.select(id_col, "payload").mapInPandas(
        kernel, WARC_RECORD_SCHEMA
    )


ARCHIVE_MEMBER_SCHEMA = (
    "archive_id long, member_name string, member_bytes long, "
    "body binary, parse_error string"
)


def _archive_kernel(open_members):
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "archive_id", "member_name", "member_bytes", "body",
            "parse_error",
        ]
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf["archive_id"], pdf["payload"]):
                aid = int(aid)
                try:
                    for name, data in open_members(bytes(payload)):
                        rows.append((aid, name, len(data), data, None))
                except Exception as ex:  # noqa: BLE001
                    rows.append(
                        (aid, None, None, None,
                         f"{type(ex).__name__}: {ex}")
                    )
            yield pd.DataFrame(rows, columns=cols)

    return kernel


def tar_members(media: DataFrame) -> DataFrame:
    """tar(.gz) bundle → one row per regular-file member."""

    def open_members(payload: bytes):
        with tarfile.open(fileobj=io.BytesIO(payload)) as tf:
            for m in tf.getmembers():
                if m.isfile():
                    yield m.name, tf.extractfile(m).read()

    return media.select("archive_id", "payload").mapInPandas(
        _archive_kernel(open_members), ARCHIVE_MEMBER_SCHEMA
    )


def zip_members(media: DataFrame) -> DataFrame:
    """zip bundle → one row per member (directories skipped)."""

    def open_members(payload: bytes):
        with zipfile.ZipFile(io.BytesIO(payload)) as zf:
            for info in zf.infolist():
                if not info.is_dir():
                    yield info.filename, zf.read(info)

    return media.select("archive_id", "payload").mapInPandas(
        _archive_kernel(open_members), ARCHIVE_MEMBER_SCHEMA
    )
