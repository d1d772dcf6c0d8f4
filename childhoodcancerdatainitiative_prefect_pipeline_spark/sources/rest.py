"""REST API source/sink utilities (SURVEY.md §2.1 S13).

The reference talks to GDC / dbGaP / CPI / indexd over HTTP with
retry + exponential backoff (workflows/gdc_import.py:147-238,
240-316, 674-757; workflows/guid_checker.py:19-100).  In the Spark
engine the *relational* half of that workload — entity JSON ↔ rows —
is `from_json` / `to_json` (see `sources.files.rows_to_json_column`),
and only the transport is imperative:

- **source**: small entity fetches happen on the driver and become a
  DataFrame via ``spark.createDataFrame``;
- **sink**: chunked submissions run in ``foreachPartition`` so each
  executor posts its own slice with one client per partition.

Transport uses only the standard library (urllib), so nothing extra
is required in the runtime; swap in a richer client by passing
``send``.
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.request
from collections.abc import Callable, Iterator, Sequence

from pyspark.sql import DataFrame, SparkSession

#: Retry schedule mirroring the reference's task options
#: (src/neo4j_data_tools.py:652-654: 3 retries, backoff [10,30,60] s).
#: Tests shrink the delays to keep the suite fast.
DEFAULT_BACKOFF: tuple[float, ...] = (10.0, 30.0, 60.0)


def with_retries(
    op: Callable[[], object],
    backoff: Sequence[float] = DEFAULT_BACKOFF,
    retryable: tuple[type[BaseException], ...] = (
        urllib.error.URLError,
        TimeoutError,
        ConnectionError,
    ),
    sleep: Callable[[float], None] = time.sleep,
):
    """Run ``op``; on a retryable error sleep per the backoff schedule
    and try again; re-raise after the schedule is exhausted."""
    last: BaseException | None = None
    for i, delay in enumerate([0.0, *backoff]):
        if delay:
            sleep(delay)
        try:
            return op()
        except retryable as ex:  # noqa: PERF203 — retry loop by design
            last = ex
    raise last  # type: ignore[misc]


def http_json(
    url: str,
    payload: dict | list | None = None,
    method: str = "GET",
    headers: dict[str, str] | None = None,
    timeout: float = 300.0,
) -> dict | list:
    """One JSON request/response using stdlib urllib (no extra deps).

    300 s timeout matches the reference's boto3 Config
    (src/utils.py:444-453).
    """
    data = None if payload is None else json.dumps(payload).encode()
    req = urllib.request.Request(url, data=data, method=method)
    req.add_header("Content-Type", "application/json")
    for k, v in (headers or {}).items():
        req.add_header(k, v)
    with urllib.request.urlopen(req, timeout=timeout) as resp:  # noqa: S310
        return json.loads(resp.read().decode())


def fetch_entities(
    spark: SparkSession,
    urls: Sequence[str],
    fetch: Callable[[str], dict] | None = None,
    backoff: Sequence[float] = DEFAULT_BACKOFF,
) -> DataFrame:
    """S13 source — fetch entity JSON per url on the driver, return a
    DataFrame of ``(url, response_json)``.

    Entity metadata fetches are driver-scale (hundreds of records);
    the subsequent flatten is `from_json` with an explicit schema.
    """
    fetch = fetch or (lambda u: http_json(u))
    rows = [
        (u, json.dumps(with_retries(lambda u=u: fetch(u), backoff=backoff)))
        for u in urls
    ]
    return spark.createDataFrame(rows, "url string, response_json string")


def submit_partitioned(
    df: DataFrame,
    send: Callable[[list[dict]], object],
    chunk_size: int = 50,
    backoff: Sequence[float] = DEFAULT_BACKOFF,
) -> None:
    """S13 sink — POST rows in chunks from each partition.

    ``chunk_size`` defaults to the reference's ``list_to_chunks(...,
    50)`` (src/utils.py:1202-1208).  ``send`` receives a list of row
    dicts; one client context per partition, retries per chunk.
    """

    def per_partition(rows: Iterator) -> None:
        buf: list[dict] = []
        for row in rows:
            buf.append(row.asDict(recursive=True))
            if len(buf) >= chunk_size:
                chunk = list(buf)
                with_retries(lambda c=chunk: send(c), backoff=backoff)
                buf.clear()
        if buf:
            chunk = list(buf)
            with_retries(lambda c=chunk: send(c), backoff=backoff)

    df.foreachPartition(per_partition)


# ---------------------------------------------------------------------------
# Spark 4 Python DataSource: the S13 fetch as a real `spark.read`
# format.  `fetch_entities` above is driver-scale by design; this is
# the executor-scale path — one input partition per URL, so a
# thousand-endpoint pull fans out across the cluster and retries are
# per-task, not per-driver-loop.
# ---------------------------------------------------------------------------

try:  # pragma: no cover - import surface depends on Spark version
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    class RestJsonDataSource(DataSource):
        """``spark.read.format("rest_json")`` — distributed JSON GETs.

        Options: ``urls`` (``;``-separated), ``timeout`` (seconds).
        Register once per session with
        ``spark.dataSource.register(RestJsonDataSource)``.  Each URL
        becomes one input partition; the fetch itself reuses
        :func:`http_json` + :func:`with_retries` (stdlib urllib, the
        reference's 300 s / 5-attempt discipline), and `file://` URLs
        work unchanged — which is how the tests drive it hermetically.
        """

        @classmethod
        def name(cls) -> str:
            return "rest_json"

        def schema(self) -> str:
            return "url string, response_json string"

        def reader(self, schema):  # noqa: ARG002 - fixed schema
            return _RestJsonReader(self.options)

    class _RestJsonReader(DataSourceReader):
        def __init__(self, options):
            self.urls = [
                u for u in options.get("urls", "").split(";") if u
            ]
            if not self.urls:
                raise ValueError("rest_json requires a non-empty 'urls' option")
            self.timeout = float(options.get("timeout", "300"))

        def partitions(self):
            return [InputPartition(i) for i in range(len(self.urls))]

        def read(self, partition):
            url = self.urls[partition.value]
            body = with_retries(lambda: http_json(url, timeout=self.timeout))
            yield (url, json.dumps(body))

    DATASOURCE_API_AVAILABLE = True
except ImportError:  # pragma: no cover
    DATASOURCE_API_AVAILABLE = False
