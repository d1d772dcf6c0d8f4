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
