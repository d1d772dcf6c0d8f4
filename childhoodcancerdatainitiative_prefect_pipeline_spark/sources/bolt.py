"""Minimal Bolt 4.4 client (pure stdlib) — live Neo4j intake.

The reference pulls graph data with the ``neo4j`` Python driver:
per-study / per-node Cypher queries whose rows are EAV-shaped
(``src/neo4j_data_tools.py:50-98`` — startNodeId / propertyName /
propertyValue / dbgap_accession) and feed the CSV exports that
``sources/eav.py`` re-expresses.  This module closes the "live
connector" seam with the same discipline as the S3 kernels (S7/S8):

- a from-scratch implementation of the PUBLIC Bolt protocol
  (handshake + PackStream v2 + chunked framing, per the published
  Bolt 4.4 specification) — no driver dependency to import-gate;
- one connection per executor partition via a picklable
  ``client_factory``, injection-tested against an in-process fake
  server speaking the same wire format (byte-level golden vectors
  from the spec pin the codec so client and fake can't drift
  together);
- rows transported as JSON strings (schema-free, exactly like
  ``sources/rest.py::fetch_entities``) so one fetch pass serves any
  Cypher projection; the EAV-shaped pulls then parse with
  ``from_json`` into ``sources/eav.py``'s intake.

Scale: the work list (study × node label, thousands of items) is the
DataFrame; each partition holds ONE bolt session and streams its
items' result rows. 100 TB of graph never transits the driver — only
each query's records, in executor-local batches.
"""

from __future__ import annotations

import json
import socket
import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

# ---------------------------------------------------------------------------
# PackStream v2 codec (Bolt's serialization format, public spec)
# ---------------------------------------------------------------------------

_INT8_MIN, _TINY_MIN, _TINY_MAX = -128, -16, 127
_I16 = (-(1 << 15), (1 << 15) - 1)
_I32 = (-(1 << 31), (1 << 31) - 1)
_I64 = (-(1 << 63), (1 << 63) - 1)


class Structure:
    """A PackStream structure: one tag byte + a field list.

    Bolt messages and graph entities (Node 0x4E, Relationship 0x52,
    Path 0x50) all arrive as structures; unknown tags round-trip
    losslessly through this wrapper.
    """

    __slots__ = ("tag", "fields")

    def __init__(self, tag: int, fields: list):
        self.tag = tag
        self.fields = fields

    def __eq__(self, other):
        return (
            isinstance(other, Structure)
            and self.tag == other.tag
            and self.fields == other.fields
        )

    def __repr__(self):
        return f"Structure(0x{self.tag:02X}, {self.fields!r})"


def _pack_sized(code8: int, code16: int, code32: int, n: int) -> bytes:
    if n < 0x100:
        return struct.pack(">BB", code8, n)
    if n < 0x10000:
        return struct.pack(">BH", code16, n)
    return struct.pack(">BI", code32, n)


def pack(value) -> bytes:
    """Serialize a Python value to PackStream bytes."""
    if value is None:
        return b"\xc0"
    if value is True:
        return b"\xc3"
    if value is False:
        return b"\xc2"
    if isinstance(value, int):
        if _TINY_MIN <= value <= _TINY_MAX:
            return struct.pack(">b", value)
        if _INT8_MIN <= value < _TINY_MIN:
            return b"\xc8" + struct.pack(">b", value)
        if _I16[0] <= value <= _I16[1]:
            return b"\xc9" + struct.pack(">h", value)
        if _I32[0] <= value <= _I32[1]:
            return b"\xca" + struct.pack(">i", value)
        if _I64[0] <= value <= _I64[1]:
            return b"\xcb" + struct.pack(">q", value)
        raise OverflowError(f"int out of PackStream range: {value}")
    if isinstance(value, float):
        return b"\xc1" + struct.pack(">d", value)
    if isinstance(value, str):
        b = value.encode("utf-8")
        if len(b) <= 15:
            return struct.pack(">B", 0x80 | len(b)) + b
        return _pack_sized(0xD0, 0xD1, 0xD2, len(b)) + b
    if isinstance(value, bytes):
        return _pack_sized(0xCC, 0xCD, 0xCE, len(value)) + value
    if isinstance(value, (list, tuple)):
        if len(value) <= 15:
            head = struct.pack(">B", 0x90 | len(value))
        else:
            head = _pack_sized(0xD4, 0xD5, 0xD6, len(value))
        return head + b"".join(pack(v) for v in value)
    if isinstance(value, dict):
        if len(value) <= 15:
            head = struct.pack(">B", 0xA0 | len(value))
        else:
            head = _pack_sized(0xD8, 0xD9, 0xDA, len(value))
        return head + b"".join(
            pack(str(k)) + pack(v) for k, v in value.items()
        )
    if isinstance(value, Structure):
        if len(value.fields) > 15:
            raise ValueError("structure has more than 15 fields")
        return (
            struct.pack(">BB", 0xB0 | len(value.fields), value.tag)
            + b"".join(pack(f) for f in value.fields)
        )
    raise TypeError(f"cannot pack {type(value).__name__}")


def unpack(buf: bytes, pos: int = 0):
    """Deserialize one PackStream value; returns ``(value, new_pos)``."""
    marker = buf[pos]
    pos += 1
    if marker == 0xC0:
        return None, pos
    if marker == 0xC2:
        return False, pos
    if marker == 0xC3:
        return True, pos
    if marker <= 0x7F or marker >= 0xF0:  # tiny int
        return struct.unpack_from(">b", buf, pos - 1)[0], pos
    if marker == 0xC8:
        return struct.unpack_from(">b", buf, pos)[0], pos + 1
    if marker == 0xC9:
        return struct.unpack_from(">h", buf, pos)[0], pos + 2
    if marker == 0xCA:
        return struct.unpack_from(">i", buf, pos)[0], pos + 4
    if marker == 0xCB:
        return struct.unpack_from(">q", buf, pos)[0], pos + 8
    if marker == 0xC1:
        return struct.unpack_from(">d", buf, pos)[0], pos + 8

    def _size(code8, code16, code32):
        nonlocal pos
        if marker == code8:
            (n,) = struct.unpack_from(">B", buf, pos)
            pos += 1
        elif marker == code16:
            (n,) = struct.unpack_from(">H", buf, pos)
            pos += 2
        else:
            (n,) = struct.unpack_from(">I", buf, pos)
            pos += 4
        return n

    if 0x80 <= marker <= 0x8F or marker in (0xD0, 0xD1, 0xD2):
        n = (marker & 0x0F) if marker <= 0x8F else _size(0xD0, 0xD1, 0xD2)
        return buf[pos : pos + n].decode("utf-8"), pos + n
    if marker in (0xCC, 0xCD, 0xCE):
        n = _size(0xCC, 0xCD, 0xCE)
        return bytes(buf[pos : pos + n]), pos + n
    if 0x90 <= marker <= 0x9F or marker in (0xD4, 0xD5, 0xD6):
        n = (marker & 0x0F) if marker <= 0x9F else _size(0xD4, 0xD5, 0xD6)
        out = []
        for _ in range(n):
            v, pos = unpack(buf, pos)
            out.append(v)
        return out, pos
    if 0xA0 <= marker <= 0xAF or marker in (0xD8, 0xD9, 0xDA):
        n = (marker & 0x0F) if marker <= 0xAF else _size(0xD8, 0xD9, 0xDA)
        out = {}
        for _ in range(n):
            k, pos = unpack(buf, pos)
            v, pos = unpack(buf, pos)
            out[k] = v
        return out, pos
    if 0xB0 <= marker <= 0xBF:
        n = marker & 0x0F
        tag = buf[pos]
        pos += 1
        fields = []
        for _ in range(n):
            v, pos = unpack(buf, pos)
            fields.append(v)
        return Structure(tag, fields), pos
    raise ValueError(f"unknown PackStream marker 0x{marker:02X}")


# ---------------------------------------------------------------------------
# Bolt connection: handshake, chunked framing, request/response
# ---------------------------------------------------------------------------

BOLT_MAGIC = b"\x60\x60\xb0\x17"
#: proposed versions, most-preferred first: 4.4 only (the subset this
#: client speaks); encoded big-endian as (0, 0, minor, major).
BOLT_VERSIONS = (b"\x00\x00\x04\x04", b"\x00" * 4, b"\x00" * 4, b"\x00" * 4)

MSG_HELLO, MSG_GOODBYE, MSG_RESET = 0x01, 0x02, 0x0F
MSG_RUN, MSG_PULL = 0x10, 0x3F
MSG_SUCCESS, MSG_RECORD, MSG_IGNORED, MSG_FAILURE = 0x70, 0x71, 0x7E, 0x7F

MAX_CHUNK = 0xFFFF


class BoltError(RuntimeError):
    """Server FAILURE: carries the Neo4j code/message metadata."""


def _send_message(sock: socket.socket, msg: Structure) -> None:
    payload = pack(msg)
    for off in range(0, len(payload), MAX_CHUNK):
        chunk = payload[off : off + MAX_CHUNK]
        sock.sendall(struct.pack(">H", len(chunk)) + chunk)
    sock.sendall(b"\x00\x00")


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = bytearray()
    while len(buf) < n:
        part = sock.recv(n - len(buf))
        if not part:
            raise ConnectionError("bolt peer closed the connection")
        buf += part
    return bytes(buf)


def _recv_message(sock: socket.socket) -> Structure:
    payload = bytearray()
    while True:
        (size,) = struct.unpack(">H", _recv_exact(sock, 2))
        if size == 0:
            if payload:
                break
            continue  # NOOP keep-alive chunk
        payload += _recv_exact(sock, size)
    msg, _ = unpack(bytes(payload))
    if not isinstance(msg, Structure):
        raise ValueError("bolt message is not a structure")
    return msg


class BoltClient:
    """One authenticated Bolt 4.4 session; ``run`` streams a query.

    The surface mirrors what the reference's driver usage needs
    (``tx.run(cypher)`` → keys + record values,
    src/neo4j_data_tools.py:429-449) and nothing more.
    """

    def __init__(
        self,
        host: str,
        port: int = 7687,
        user: str = "neo4j",
        password: str = "",
        user_agent: str = "ccdi-spark-bolt/1.0",
        timeout: float = 30.0,
        database: str | None = None,
        encrypted: bool = False,
        ssl_context: "ssl.SSLContext | None" = None,
    ):
        """``encrypted=True`` wraps the connection in TLS (the
        ``bolt+s://`` scheme of the reference's neo4j driver) so basic-
        auth credentials and graph data never cross the wire in the
        clear.  Pass ``ssl_context`` to pin CAs / disable verification
        for self-signed test servers; default is
        :func:`ssl.create_default_context` (full cert + hostname
        verification).  Plaintext (the default) is only appropriate for
        localhost / trusted-network use.
        """
        self._sock = socket.create_connection((host, port), timeout=timeout)
        if encrypted or ssl_context is not None:
            import ssl

            ctx = ssl_context or ssl.create_default_context()
            self._sock = ctx.wrap_socket(self._sock, server_hostname=host)
        self._database = database
        self._sock.sendall(BOLT_MAGIC + b"".join(BOLT_VERSIONS))
        agreed = _recv_exact(self._sock, 4)
        if agreed[3] != 4:
            raise ConnectionError(
                f"server proposed unsupported bolt version {agreed!r}"
            )
        self._request(
            Structure(
                MSG_HELLO,
                [
                    {
                        "user_agent": user_agent,
                        "scheme": "basic",
                        "principal": user,
                        "credentials": password,
                    }
                ],
            )
        )

    def _request(self, msg: Structure) -> Structure:
        """Send one message, read to its summary; raise on FAILURE."""
        _send_message(self._sock, msg)
        reply = _recv_message(self._sock)
        if reply.tag == MSG_FAILURE:
            meta = reply.fields[0] if reply.fields else {}
            _send_message(self._sock, Structure(MSG_RESET, []))
            _recv_message(self._sock)  # SUCCESS of RESET
            raise BoltError(
                f"{meta.get('code', 'Neo.Error')}: "
                f"{meta.get('message', 'bolt failure')}"
            )
        return reply

    def run(
        self, cypher: str, params: dict | None = None
    ) -> tuple[list[str], list[list]]:
        """RUN + PULL(-1): returns ``(field_names, rows)``."""
        extra = {"db": self._database} if self._database else {}
        summary = self._request(
            Structure(MSG_RUN, [cypher, params or {}, extra])
        )
        fields = summary.fields[0].get("fields", []) if summary.fields else []
        _send_message(self._sock, Structure(MSG_PULL, [{"n": -1}]))
        rows: list[list] = []
        while True:
            reply = _recv_message(self._sock)
            if reply.tag == MSG_RECORD:
                rows.append(reply.fields[0])
            elif reply.tag == MSG_SUCCESS:
                return fields, rows
            elif reply.tag == MSG_FAILURE:
                meta = reply.fields[0] if reply.fields else {}
                _send_message(self._sock, Structure(MSG_RESET, []))
                _recv_message(self._sock)
                raise BoltError(
                    f"{meta.get('code', 'Neo.Error')}: "
                    f"{meta.get('message', 'bolt failure')}"
                )
            else:
                raise ValueError(f"unexpected bolt reply 0x{reply.tag:02X}")

    def close(self) -> None:
        try:
            _send_message(self._sock, Structure(MSG_GOODBYE, []))
        except OSError:
            pass
        self._sock.close()


def _jsonable(v):
    """Graph entities → plain JSON: Node/Relationship structures
    become tagged dicts; everything else passes through."""
    if isinstance(v, Structure):
        return {
            "_struct": v.tag,
            "fields": [_jsonable(f) for f in v.fields],
        }
    if isinstance(v, list):
        return [_jsonable(x) for x in v]
    if isinstance(v, dict):
        return {k: _jsonable(x) for k, x in v.items()}
    if isinstance(v, bytes):
        return v.hex()
    return v


CYPHER_RESULT_SCHEMA = StructType(
    [
        StructField("item_id", StringType(), False),
        StructField("fields_json", StringType(), True),
        StructField("row_json", StringType(), True),
        StructField("error", StringType(), True),
    ]
)


def fetch_cypher(
    work: DataFrame,
    client_factory=None,
    id_col: str = "item_id",
    cypher_col: str = "cypher",
) -> DataFrame:
    """Distributed Cypher pull: one bolt session per partition, one
    RUN/PULL per work item, one output row per record.

    ``work``: a DataFrame of ``(item_id, cypher)`` — e.g. the
    (study × node-label) grid the reference iterates serially
    (src/neo4j_data_tools.py per-study export loops).  Rows transport
    as JSON (schema-free) and parse downstream with ``from_json``;
    the reference's EAV-shaped pulls land directly in
    ``sources/eav.py``'s intake.  Per-ITEM isolation: a failing query
    yields one error row; the session survives for the partition's
    remaining items (RESET discipline in the client).
    """
    if client_factory is None:
        raise ValueError("fetch_cypher needs a client_factory")

    def kernel(rows: Iterator) -> Iterator[tuple]:
        client = client_factory()
        try:
            for row in rows:
                item, cypher = row[id_col], row[cypher_col]
                try:
                    fields, records = client.run(cypher)
                    fj = json.dumps(fields)
                    if not records:
                        yield (item, fj, None, None)
                    for rec in records:
                        yield (
                            item,
                            fj,
                            json.dumps(_jsonable(rec)),
                            None,
                        )
                except Exception as ex:  # noqa: BLE001 — per-item isolation
                    yield (item, None, None, f"{type(ex).__name__}: {ex}")
        finally:
            try:
                client.close()
            except Exception:  # noqa: BLE001
                pass

    return (
        work.select(
            F.col(id_col).alias(id_col), F.col(cypher_col).alias(cypher_col)
        )
        .rdd.mapPartitions(kernel)
        .toDF(CYPHER_RESULT_SCHEMA)
    )


def apply_index_statements(
    client: BoltClient, script_text: str
) -> list[tuple[str, str, str | None]]:
    """Run a CypherL index-management script, statement by statement.

    Reference parity (workflows/db_index_creation.py:60-89): one
    statement per line; blank lines and ``#``/``//`` comments skip;
    lines not ending with ``;`` skip with a warning status; only
    ``CREATE INDEX`` / ``DROP INDEX`` statements execute, each with
    per-query isolation.  DDL is tiny and inherently serial, so this
    is a driver-side loop over ONE session — the distributed path is
    for data pulls, not schema management.

    Returns ``(statement, status, error)`` rows; status ∈
    ``executed | failed | skipped_comment | skipped_no_semicolon |
    skipped_not_index``.
    """
    out: list[tuple[str, str, str | None]] = []
    for line in script_text.splitlines():
        query = line.strip()
        if not query:
            continue
        if query.startswith("#") or query.startswith("//"):
            out.append((query, "skipped_comment", None))
        elif not query.endswith(";"):
            out.append((query, "skipped_no_semicolon", None))
        elif query.startswith(("CREATE INDEX", "DROP INDEX")):
            try:
                client.run(query)
                out.append((query, "executed", None))
            except Exception as ex:  # noqa: BLE001 — per-query isolation
                out.append((query, "failed", f"{type(ex).__name__}: {ex}"))
        else:
            out.append((query, "skipped_not_index", None))
    return out


def export_dump(client: BoltClient) -> list[str]:
    """Live graph export: ``DUMP DATABASE;`` → one CypherL statement
    per record (src/memgraph_transfer.py:48 — each record carries one
    complete ``CREATE``/``MATCH`` line).  The statement list then
    flows into ``sources/graph_dump.py``'s parsers (filtering,
    per-study pruning) or back into :func:`import_dump_statements`."""
    _fields, rows = client.run("DUMP DATABASE;")
    return [str(r[0]) for r in rows if r]


def import_dump_statements(
    client: BoltClient, script_text: str
) -> tuple[int, int, list[tuple[str, str | None]]]:
    """Replay a CypherL dump over one live session.

    Reference parity (src/memgraph_transfer.py:506-560,
    ``import_memgraph`` + ``_execute_batch``): blank lines skip,
    ``//`` comments skip, EVERY other line executes with per-query
    isolation (one bad statement logs and continues).  Returns
    ``(executed, failed, [(statement, error), ...])`` — the driver
    batching exists only for the reference's logging cadence, so a
    single loop preserves semantics.
    """
    executed = failed = 0
    results: list[tuple[str, str | None]] = []
    for line in script_text.splitlines():
        query = line.strip()
        if not query or query.startswith("//"):
            continue
        try:
            client.run(query)
            executed += 1
            results.append((query, None))
        except Exception as ex:  # noqa: BLE001 — per-query isolation
            failed += 1
            results.append((query, f"{type(ex).__name__}: {ex}"))
    return executed, failed, results


def cypher_results_to_eav(results: DataFrame) -> DataFrame:
    """:func:`fetch_cypher` rows from the reference's 7-column EAV
    projection → the ``sources/eav.py`` intake frame.

    The reference's per-study pull returns ``(startNodeId,
    startNodeLabels, propertyName, propertyValue, linkedNodeId,
    linkedNodeLabels, dbgap_accession)`` where the label columns are
    Cypher ``labels(n)`` lists (src/neo4j_data_tools.py:60-71);
    single-label graph nodes unwrap to ``labels[0]``, matching the
    staged-CSV intake's plain label strings.  Positional
    ``get_json_object`` extraction is row-local codegen — error rows
    and empty result sets are dropped here, not downstream.
    """

    def j(path: str):
        return F.get_json_object("row_json", path)

    def label(idx: int):
        # list-valued labels(n) → first element; scalar passes through
        return F.coalesce(j(f"$[{idx}][0]"), j(f"$[{idx}]"))

    return results.filter(
        F.col("error").isNull() & F.col("row_json").isNotNull()
    ).select(
        j("$[0]").alias("startNodeId"),
        label(1).alias("startNodeLabels"),
        j("$[2]").alias("startNodePropertyName"),
        j("$[3]").alias("startNodePropertyValue"),
        j("$[4]").alias("linkedNodeId"),
        label(5).alias("linkedNodeLabels"),
        j("$[6]").alias("dbgap_accession"),
    )
