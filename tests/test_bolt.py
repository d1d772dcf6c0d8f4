"""Bolt connector tests: PackStream golden vectors (byte-level, from
the public PackStream spec — these pin the codec so the client and
the fake server cannot drift together), a threaded in-process bolt
server, and the distributed fetch_cypher kernel."""

from __future__ import annotations

import json
import socket
import struct
import threading

import pytest

from childhoodcancerdatainitiative_prefect_pipeline_spark.sources.bolt import (
    MSG_FAILURE,
    MSG_HELLO,
    MSG_PULL,
    MSG_RECORD,
    MSG_RESET,
    MSG_RUN,
    MSG_SUCCESS,
    BoltClient,
    BoltError,
    Structure,
    fetch_cypher,
    pack,
    unpack,
)

# ---------------------------------------------------------------------------
# PackStream codec
# ---------------------------------------------------------------------------

GOLDEN = [
    (None, b"\xc0"),
    (True, b"\xc3"),
    (False, b"\xc2"),
    (0, b"\x00"),
    (42, b"\x2a"),
    (-1, b"\xff"),
    (-16, b"\xf0"),
    (-17, b"\xc8\xef"),
    (-128, b"\xc8\x80"),
    (128, b"\xc9\x00\x80"),
    (-129, b"\xc9\xff\x7f"),
    (32767, b"\xc9\x7f\xff"),
    (32768, b"\xca\x00\x00\x80\x00"),
    (2147483648, b"\xcb\x00\x00\x00\x00\x80\x00\x00\x00"),
    (1.23, b"\xc1" + struct.pack(">d", 1.23)),
    ("", b"\x80"),
    ("A", b"\x81A"),
    ("hello", b"\x85hello"),
    ("a" * 16, b"\xd0\x10" + b"a" * 16),
    ([], b"\x90"),
    ([1, 2, 3], b"\x93\x01\x02\x03"),
    ({}, b"\xa0"),
    ({"one": "eins"}, b"\xa1\x83one\x84eins"),
]


def test_packstream_golden_vectors():
    for value, expected in GOLDEN:
        assert pack(value) == expected, value
        got, pos = unpack(expected)
        assert got == value and pos == len(expected), value


def test_packstream_structure_and_nesting_roundtrip():
    node = Structure(0x4E, [7, ["participant"], {"id": "p1", "n": 3}])
    msg = Structure(MSG_RECORD, [[node, "x", [1, None, True], {"k": 2.5}]])
    blob = pack(msg)
    back, pos = unpack(blob)
    assert pos == len(blob)
    assert back == msg
    assert back.fields[0][0].fields[2]["id"] == "p1"


def test_packstream_large_collections_roundtrip():
    big = {
        "list": list(range(300)),
        "text": "x" * 70000,
        "map": {str(i): i for i in range(20)},
    }
    back, _ = unpack(pack(big))
    assert back == big


# ---------------------------------------------------------------------------
# Fake bolt server: accepts connections in a thread, speaks the same
# wire format through the SPEC-PINNED codec above
# ---------------------------------------------------------------------------


def _read_message(conn):
    payload = bytearray()
    while True:
        size_b = b""
        while len(size_b) < 2:
            part = conn.recv(2 - len(size_b))
            if not part:
                return None
            size_b += part
        (size,) = struct.unpack(">H", size_b)
        if size == 0:
            if payload:
                break
            continue
        while size:
            part = conn.recv(size)
            payload += part
            size -= len(part)
    msg, _ = unpack(bytes(payload))
    return msg


def _write_message(conn, msg):
    blob = pack(msg)
    conn.sendall(struct.pack(">H", len(blob)) + blob + b"\x00\x00")


def start_fake_bolt_server(results, require_password=None, tls_context=None):
    """``results``: {cypher: (fields, rows)}; unknown cypher → FAILURE.
    ``tls_context``: server-side SSLContext → bolt+s (TLS) endpoint.
    Returns (port, stop_fn)."""
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(16)
    port = srv.getsockname()[1]
    stopping = threading.Event()

    def serve_conn(conn):
        if tls_context is not None:
            try:
                conn = tls_context.wrap_socket(conn, server_side=True)
            except Exception:
                conn.close()
                return
        with conn:
            magic = conn.recv(4)
            if magic != b"\x60\x60\xb0\x17":
                return
            conn.recv(16)  # proposed versions
            conn.sendall(b"\x00\x00\x04\x04")  # agree bolt 4.4
            pending_run = None
            while True:
                msg = _read_message(conn)
                if msg is None:
                    return
                if msg.tag == MSG_HELLO:
                    auth = msg.fields[0]
                    if (
                        require_password is not None
                        and auth.get("credentials") != require_password
                    ):
                        _write_message(
                            conn,
                            Structure(
                                MSG_FAILURE,
                                [
                                    {
                                        "code": "Neo.ClientError.Security"
                                        ".Unauthorized",
                                        "message": "bad credentials",
                                    }
                                ],
                            ),
                        )
                        continue
                    _write_message(
                        conn,
                        Structure(MSG_SUCCESS, [{"server": "FakeNeo4j/4.4"}]),
                    )
                elif msg.tag == MSG_RUN:
                    cypher = msg.fields[0]
                    if cypher in results:
                        pending_run = results[cypher]
                        _write_message(
                            conn,
                            Structure(
                                MSG_SUCCESS, [{"fields": pending_run[0]}]
                            ),
                        )
                    else:
                        pending_run = None
                        _write_message(
                            conn,
                            Structure(
                                MSG_FAILURE,
                                [
                                    {
                                        "code": "Neo.ClientError.Statement"
                                        ".SyntaxError",
                                        "message": f"unknown: {cypher}",
                                    }
                                ],
                            ),
                        )
                elif msg.tag == MSG_PULL:
                    if pending_run is None:
                        _write_message(
                            conn,
                            Structure(
                                MSG_FAILURE,
                                [{"code": "Neo.Error", "message": "no run"}],
                            ),
                        )
                    else:
                        for row in pending_run[1]:
                            _write_message(
                                conn, Structure(MSG_RECORD, [row])
                            )
                        _write_message(conn, Structure(MSG_SUCCESS, [{}]))
                        pending_run = None
                elif msg.tag == MSG_RESET:
                    pending_run = None
                    _write_message(conn, Structure(MSG_SUCCESS, [{}]))
                else:  # GOODBYE et al.
                    return

    def accept_loop():
        while not stopping.is_set():
            try:
                srv.settimeout(0.2)
                conn, _ = srv.accept()
            except socket.timeout:
                continue
            except OSError:
                return
            threading.Thread(
                target=serve_conn, args=(conn,), daemon=True
            ).start()

    t = threading.Thread(target=accept_loop, daemon=True)
    t.start()

    def stop():
        stopping.set()
        srv.close()

    return port, stop


_EAV_CYPHER = (
    'MATCH (n:participant {study_id: "phs1"}) '
    "UNWIND keys(properties(n)) AS p "
    "RETURN n.id, p, n[p], n.study_id"
)
_EAV_FIELDS = ["startNodeId", "propertyName", "propertyValue", "accession"]
_EAV_ROWS = [
    ["p1", "sex", "Female", "phs1"],
    ["p1", "age", 9, "phs1"],
    ["p2", "sex", "Male", "phs1"],
]


def test_bolt_client_run_and_failure_reset():
    port, stop = start_fake_bolt_server(
        {_EAV_CYPHER: (_EAV_FIELDS, _EAV_ROWS)}
    )
    try:
        c = BoltClient("127.0.0.1", port)
        fields, rows = c.run(_EAV_CYPHER)
        assert fields == _EAV_FIELDS
        assert rows == _EAV_ROWS
        # a bad query FAILUREs, the session RESETs and stays usable
        try:
            c.run("MATCH (oops)")
            raise AssertionError("expected BoltError")
        except BoltError as ex:
            assert "SyntaxError" in str(ex)
        fields2, rows2 = c.run(_EAV_CYPHER)
        assert rows2 == _EAV_ROWS and fields2 == _EAV_FIELDS
        c.close()
    finally:
        stop()


def _self_signed_cert(tmp_path):
    """Minimal self-signed localhost cert (test-only)."""
    import datetime

    from cryptography import x509
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import rsa
    from cryptography.x509.oid import NameOID

    key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    name = x509.Name(
        [x509.NameAttribute(NameOID.COMMON_NAME, "127.0.0.1")]
    )
    now = datetime.datetime(2026, 1, 1, tzinfo=datetime.timezone.utc)
    cert = (
        x509.CertificateBuilder()
        .subject_name(name)
        .issuer_name(name)
        .public_key(key.public_key())
        .serial_number(x509.random_serial_number())
        .not_valid_before(now)
        .not_valid_after(now + datetime.timedelta(days=3650))
        .add_extension(
            x509.SubjectAlternativeName(
                [x509.IPAddress(__import__("ipaddress").ip_address("127.0.0.1"))]
            ),
            critical=False,
        )
        .sign(key, hashes.SHA256())
    )
    cert_pem = tmp_path / "cert.pem"
    key_pem = tmp_path / "key.pem"
    cert_pem.write_bytes(cert.public_bytes(serialization.Encoding.PEM))
    key_pem.write_bytes(
        key.private_bytes(
            serialization.Encoding.PEM,
            serialization.PrivateFormat.TraditionalOpenSSL,
            serialization.NoEncryption(),
        )
    )
    return str(cert_pem), str(key_pem)


def test_bolt_client_tls(tmp_path):
    """encrypted=True speaks bolt+s — credentials never cross in the
    clear; plaintext clients are rejected by the TLS endpoint."""
    import ssl

    pytest.importorskip("cryptography")
    cert_pem, key_pem = _self_signed_cert(tmp_path)
    srv_ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    srv_ctx.load_cert_chain(cert_pem, key_pem)
    port, stop = start_fake_bolt_server(
        {_EAV_CYPHER: (_EAV_FIELDS, _EAV_ROWS)}, tls_context=srv_ctx
    )
    try:
        cli_ctx = ssl.create_default_context(cafile=cert_pem)
        cli_ctx.check_hostname = False  # IP-SAN verify varies by build
        c = BoltClient("127.0.0.1", port, ssl_context=cli_ctx)
        fields, rows = c.run(_EAV_CYPHER)
        assert fields == _EAV_FIELDS and rows == _EAV_ROWS
        c.close()
        # a plaintext client against the TLS endpoint must fail fast,
        # not silently leak credentials
        with pytest.raises((BoltError, ConnectionError, OSError)):
            BoltClient("127.0.0.1", port, timeout=2.0)
    finally:
        stop()


def test_bolt_client_rejects_bad_credentials():
    port, stop = start_fake_bolt_server({}, require_password="s3cret")
    try:
        try:
            BoltClient("127.0.0.1", port, password="wrong")
            raise AssertionError("expected BoltError")
        except BoltError as ex:
            assert "Unauthorized" in str(ex)
        ok = BoltClient("127.0.0.1", port, password="s3cret")
        ok.close()
    finally:
        stop()


def test_fetch_cypher_distributed(spark):
    nodes_cypher = "MATCH (n) RETURN DISTINCT labels(n) AS uniqueNodes"
    port, stop = start_fake_bolt_server(
        {
            _EAV_CYPHER: (_EAV_FIELDS, _EAV_ROWS),
            nodes_cypher: (
                ["uniqueNodes"],
                [[["participant"]], [["sample"]]],
            ),
        }
    )
    try:
        work = spark.createDataFrame(
            [
                ("phs1:participant", _EAV_CYPHER),
                ("node_labels", nodes_cypher),
                ("broken", "MATCH (oops)"),
            ],
            "item_id string, cypher string",
        )

        def factory(p=port):
            return BoltClient("127.0.0.1", p)

        out = fetch_cypher(work, client_factory=factory).collect()
        by_item = {}
        for r in out:
            by_item.setdefault(r["item_id"], []).append(r)
        assert len(by_item["phs1:participant"]) == 3
        got_rows = sorted(
            json.loads(r["row_json"]) for r in by_item["phs1:participant"]
        )
        assert got_rows == sorted(_EAV_ROWS)
        assert json.loads(by_item["phs1:participant"][0]["fields_json"]) == (
            _EAV_FIELDS
        )
        assert [
            json.loads(r["row_json"]) for r in by_item["node_labels"]
        ] == [[["participant"]], [["sample"]]]
        [err] = by_item["broken"]
        assert err["error"] and "SyntaxError" in err["error"]
        assert err["row_json"] is None
    finally:
        stop()


def test_cypher_results_to_eav_feeds_pivot(spark):
    """End-to-end: live pull through the fake server → EAV frame →
    the existing pivot path (the reference's pull_neo4j_data shape)."""
    from childhoodcancerdatainitiative_prefect_pipeline_spark.sources.bolt import (
        cypher_results_to_eav,
    )
    from childhoodcancerdatainitiative_prefect_pipeline_spark.sources.eav import (
        pivot_node_properties,
    )

    eav_cypher = (
        'MATCH (n:participant)-[*0..5]-(s:study {study_id: "phs9"}) '
        "UNWIND keys(properties(n)) AS p RETURN n.id, labels(n), p, n[p], "
        "NULL, NULL, s.study_id"
    )
    rows = [
        ["p1", ["participant"], "sex", "Female", None, None, "phs9"],
        ["p1", ["participant"], "age", 9, None, None, "phs9"],
        ["p2", ["participant"], "sex", "Male", None, None, "phs9"],
        ["p2", ["participant"], "age", 11, None, None, "phs9"],
    ]
    port, stop = start_fake_bolt_server(
        {
            eav_cypher: (
                [
                    "startNodeId", "startNodeLabels",
                    "startNodePropertyName", "startNodePropertyValue",
                    "linkedNodeId", "linkedNodeLabels", "dbgap_accession",
                ],
                rows,
            )
        }
    )
    try:
        work = spark.createDataFrame(
            [("phs9:participant", eav_cypher)], "item_id string, cypher string"
        )

        def factory(p=port):
            return BoltClient("127.0.0.1", p)

        eav = cypher_results_to_eav(fetch_cypher(work, client_factory=factory))
        got = {
            (r["startNodeId"], r["startNodePropertyName"]):
                r["startNodePropertyValue"]
            for r in eav.collect()
        }
        assert got[("p1", "age")] == "9"  # ints stringify like the CSV path
        assert got[("p2", "sex")] == "Male"
        assert all(
            r["startNodeLabels"] == "participant" for r in eav.collect()
        )
        wide = pivot_node_properties(
            eav, "participant", prop_values=["sex", "age"]
        )
        w = {r["startNodeId"]: (r["sex"], r["age"]) for r in wide.collect()}
        assert w == {"p1": ("Female", "9"), "p2": ("Male", "11")}
    finally:
        stop()


# ---------------------------------------------------------------------------
# PackStream round-trip property over arbitrary nested values
# ---------------------------------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as hst  # noqa: E402

_PS_VALUES = hst.recursive(
    hst.none()
    | hst.booleans()
    | hst.integers(min_value=-(2**63), max_value=2**63 - 1)
    | hst.floats(allow_nan=False, allow_infinity=False)
    | hst.text(max_size=40)
    | hst.binary(max_size=40),
    lambda children: hst.lists(children, max_size=5)
    | hst.dictionaries(hst.text(max_size=8), children, max_size=5),
    max_leaves=25,
)


@settings(max_examples=100, deadline=None)
@given(v=_PS_VALUES)
def test_packstream_roundtrip_property(v):
    blob = pack(v)
    back, pos = unpack(blob)
    assert pos == len(blob)
    assert back == v


def test_apply_index_statements_reference_parity():
    from childhoodcancerdatainitiative_prefect_pipeline_spark.sources.bolt import (
        apply_index_statements,
    )

    ok = "CREATE INDEX p_id FOR (n:participant) ON (n.id);"
    bad = "DROP INDEX does_not_exist;"
    port, stop = start_fake_bolt_server({ok: ([], [])})
    try:
        client = BoltClient("127.0.0.1", port)
        script = "\n".join(
            [
                "# comment line",
                "// другой comment",
                "",
                ok,
                "CREATE INDEX missing_semicolon FOR (n:x) ON (n.y)",
                "MATCH (n) RETURN n;",
                bad,
            ]
        )
        got = apply_index_statements(client, script)
        client.close()
    finally:
        stop()
    by_status = {q: (s, e) for q, s, e in got}
    assert by_status[ok] == ("executed", None)
    assert by_status["# comment line"][0] == "skipped_comment"
    assert by_status["// другой comment"][0] == "skipped_comment"
    assert (
        by_status["CREATE INDEX missing_semicolon FOR (n:x) ON (n.y)"][0]
        == "skipped_no_semicolon"
    )
    assert by_status["MATCH (n) RETURN n;"][0] == "skipped_not_index"
    status, err = by_status[bad]
    assert status == "failed" and "SyntaxError" in err
    assert len(got) == 6  # the blank line vanished entirely


def test_bolt_client_rejects_unsupported_server_version():
    import socket
    import threading

    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]

    def answer_v3():
        conn, _ = srv.accept()
        with conn:
            conn.recv(20)  # magic + proposals
            conn.sendall(b"\x00\x00\x00\x03")  # bolt 3: unsupported

    t = threading.Thread(target=answer_v3, daemon=True)
    t.start()
    try:
        try:
            BoltClient("127.0.0.1", port)
            raise AssertionError("expected ConnectionError")
        except ConnectionError as ex:
            assert "unsupported bolt version" in str(ex)
    finally:
        srv.close()


def test_export_dump_and_import_replay():
    from childhoodcancerdatainitiative_prefect_pipeline_spark.sources.bolt import (
        export_dump,
        import_dump_statements,
    )

    create_a = 'CREATE (:participant {id: "p1"});'
    create_b = 'CREATE (:sample {id: "s1"});'
    link = 'MATCH (p {id: "p1"}), (s {id: "s1"}) CREATE (p)-[:of]->(s);'
    port, stop = start_fake_bolt_server(
        {
            "DUMP DATABASE;": (
                ["query"], [[create_a], [create_b], [link]]
            ),
            create_a: ([], []),
            create_b: ([], []),
            link: ([], []),
        }
    )
    try:
        c = BoltClient("127.0.0.1", port)
        dump = export_dump(c)
        assert dump == [create_a, create_b, link]
        script = "\n".join(
            ["// header comment", "", dump[0], dump[1],
             "CREATE (:unknown_thing);", dump[2]]
        )
        executed, failed, results = import_dump_statements(c, script)
        c.close()
    finally:
        stop()
    assert executed == 3 and failed == 1
    by_q = dict(results)
    assert by_q[create_a] is None and by_q[link] is None
    assert "SyntaxError" in by_q["CREATE (:unknown_thing);"]
    assert "// header comment" not in by_q  # comments never execute
