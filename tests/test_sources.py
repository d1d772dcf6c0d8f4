"""Sources pack tests: TSV round trip, NA bank, inventory reconcile,
EAV intake, exampler determinism."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_tsv_round_trip_with_na_bank(spark, tmp_path):
    from childhoodcancerdatainitiative_prefect_pipeline_spark.sources.files import (
        read_tsv,
        write_tsv,
    )

    df = spark.createDataFrame(
        [("1", "alpha", None), ("2", "NA", "x"), ("3", "n/a", "y")],
        ["id", "a", "b"],
    )
    path = str(tmp_path / "t1")
    write_tsv(df, path, single_file=True)
    back = read_tsv(spark, path)
    rows = {r["id"]: (r["a"], r["b"]) for r in back.collect()}
    assert rows["1"] == ("alpha", None)
    assert rows["2"] == (None, "x")  # NA bank applied on read
    assert rows["3"] == (None, "y")


def test_listing_to_inventory_skips_folders(spark):
    from childhoodcancerdatainitiative_prefect_pipeline_spark.sources.s3 import (
        listing_to_inventory,
    )

    entries = [
        {"Key": "data/", "Size": 0},
        {"Key": "data/a.bam", "Size": 100},
        {"Key": "data/sub/b.vcf.gz", "Size": 200},
    ]
    inv = {r["file_name"]: r for r in listing_to_inventory(spark, entries).collect()}
    assert "data/" not in [r["file_path"] for r in inv.values()]
    assert inv["a.bam"]["file_size"] == 100
    assert inv["b.vcf.gz"]["ext"] == "gz"


def _styled_template(path: str) -> None:
    """Hand-build a styled xlsx: a worksheet with cell styles (s=),
    a cols block and a dimension, plus a styles.xml member — the
    parts a template overlay must preserve."""
    import zipfile

    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main"><dimension ref="A1:C2"/>'
        '<cols><col min="1" max="3" width="22"/></cols><sheetData>'
        '<row r="1"><c r="A1" s="2" t="inlineStr"><is><t>sample_id</t>'
        '</is></c><c r="B1" s="2" t="inlineStr"><is><t>status</t></is>'
        '</c><c r="C1" s="2" t="inlineStr"><is><t>age</t></is></c></row>'
        '<row r="2"><c r="A2" s="1"/><c r="B2" s="3"/><c r="C2" s="4"/>'
        "</row></sheetData></worksheet>"
    )
    styles = (
        '<?xml version="1.0"?><styleSheet xmlns="http://schemas.'
        'openxmlformats.org/spreadsheetml/2006/main"><cellXfs count="5">'
        + "<xf/>" * 5
        + "</cellXfs></styleSheet>"
    )
    with zipfile.ZipFile(path, "w") as z:
        z.writestr(
            "[Content_Types].xml",
            '<?xml version="1.0"?><Types xmlns="http://schemas.'
            'openxmlformats.org/package/2006/content-types">'
            '<Default Extension="rels" ContentType="application/vnd.'
            'openxmlformats-package.relationships+xml"/>'
            '<Default Extension="xml" ContentType="application/xml"/>'
            "</Types>",
        )
        z.writestr(
            "_rels/.rels",
            '<?xml version="1.0"?><Relationships xmlns="http://schemas.'
            'openxmlformats.org/package/2006/relationships">'
            '<Relationship Id="rId1" Type="http://schemas.openxmlformats'
            '.org/officeDocument/2006/relationships/officeDocument" '
            'Target="xl/workbook.xml"/></Relationships>',
        )
        z.writestr(
            "xl/workbook.xml",
            '<?xml version="1.0"?><workbook xmlns="http://schemas.'
            'openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://'
            'schemas.openxmlformats.org/officeDocument/2006/relationships">'
            '<sheets><sheet name="sample" sheetId="1" r:id="rId1"/>'
            "</sheets></workbook>",
        )
        z.writestr(
            "xl/_rels/workbook.xml.rels",
            '<?xml version="1.0"?><Relationships xmlns="http://schemas.'
            'openxmlformats.org/package/2006/relationships">'
            '<Relationship Id="rId1" Type="http://schemas.openxmlformats'
            '.org/officeDocument/2006/relationships/worksheet" '
            'Target="worksheets/sheet1.xml"/></Relationships>',
        )
        z.writestr("xl/styles.xml", styles)
        z.writestr("xl/worksheets/sheet1.xml", sheet)


def test_template_overlay_preserves_styles_stdlib(spark, tmp_path):
    """S2 overlay without openpyxl: values land in template column
    order from row 2, the header row and every non-worksheet member
    (styles.xml!) are byte-identical, and new data cells inherit the
    template's first-data-row style indexes."""
    import re
    import zipfile

    from childhoodcancerdatainitiative_prefect_pipeline_spark.sources import excel
    from childhoodcancerdatainitiative_prefect_pipeline_spark.sources.xlsx_lite import (
        read_xlsx,
    )

    template = str(tmp_path / "template.xlsx")
    out = str(tmp_path / "filled.xlsx")
    _styled_template(template)

    # df columns deliberately NOT in template order; extra col ignored
    df = spark.createDataFrame(
        [("Tumor", "s1", 9, "x"), ("Normal", "s2", 11, "y")],
        "status string, sample_id string, age long, extra string",
    )
    excel.tables_to_workbook({"sample": df, "missing_sheet": df}, template, out)

    back = read_xlsx(out)["sample"]
    assert back[0][:3] == ["sample_id", "status", "age"]
    assert [r[:3] for r in back[1:]] == [
        ["s1", "Tumor", "9"], ["s2", "Normal", "11"],
    ]

    with zipfile.ZipFile(template) as zt, zipfile.ZipFile(out) as zo:
        assert zo.read("xl/styles.xml") == zt.read("xl/styles.xml")
        sheet_xml = zo.read("xl/worksheets/sheet1.xml").decode()
    # header row verbatim, cols block intact, data styles inherited
    assert '<c r="A1" s="2"' in sheet_xml
    assert '<cols><col min="1" max="3" width="22"/></cols>' in sheet_xml
    assert re.search(r'<c r="A2" s="1"[^>]*>', sheet_xml)
    assert re.search(r'<c r="B3" s="3"[^>]*>', sheet_xml)
    assert re.search(r'<c r="C2" s="4"[^>]*><v>9</v>', sheet_xml)
    # the template's <dimension ref="A1:C2"/> is rewritten to the
    # RENDERED extent (2 data rows -> A1:C3) — strict consumers reject
    # a stale dimension when the data region grows or shrinks
    assert '<dimension ref="A1:C3"/>' in sheet_xml


def test_exampler_deterministic_and_valid(spark):
    from childhoodcancerdatainitiative_prefect_pipeline_spark.plans.exampler import (
        generate_node,
        seeded_error_variant,
    )
    from childhoodcancerdatainitiative_prefect_pipeline_spark.plans.rules import (
        NodeSchema,
        PropertyRule,
        validate,
    )

    schema = NodeSchema(
        node="sample",
        rules=[
            PropertyRule("sample_id", type="string", key=True, required=True),
            PropertyRule(
                "status", type="enum", enum_terms=("Tumor", "Normal"), required=True
            ),
            PropertyRule("age", type="integer"),
        ],
        key_props=["sample_id"],
    )
    a = generate_node(spark, schema, 50).collect()
    b = generate_node(spark, schema, 50).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # deterministic

    clean_violations = validate(generate_node(spark, schema, 50), schema).count()
    assert clean_violations == 0  # generator emits schema-valid rows

    dirty = seeded_error_variant(generate_node(spark, schema, 50), schema, every_n=5)
    dirty_violations = validate(dirty, schema)
    kinds = {r["rule"] for r in dirty_violations.collect()}
    assert "required" in kinds and "enum" in kinds and "not_integer" in kinds


def test_create_linkage_deterministic(spark):
    from childhoodcancerdatainitiative_prefect_pipeline_spark.plans.exampler import (
        create_linkage,
    )

    parent = spark.createDataFrame([("p1",), ("p2",), ("p3",)], ["parent_id"])
    child = spark.createDataFrame([(i,) for i in range(20)], ["child_id"])
    linked = create_linkage(child, parent, "parent_id")
    assert linked.count() == 20
    assert linked.filter(F.col("parent_id").isNull()).count() == 0
    again = create_linkage(child, parent, "parent_id")
    assert sorted(map(tuple, linked.collect())) == sorted(map(tuple, again.collect()))


# ---------------------------------------------------------------------------
# S13 REST utilities (childhoodcancerdatainitiative_prefect_pipeline_spark/sources/rest.py)
# ---------------------------------------------------------------------------


def test_with_retries_succeeds_after_failures():
    from childhoodcancerdatainitiative_prefect_pipeline_spark.sources.rest import (
        with_retries,
    )

    calls = {"n": 0}
    slept = []

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise ConnectionError("transient")
        return "ok"

    assert (
        with_retries(flaky, backoff=(0.01, 0.02, 0.03), sleep=slept.append) == "ok"
    )
    assert calls["n"] == 3
    assert slept == [0.01, 0.02]


def test_with_retries_exhausts_and_raises():
    import pytest

    from childhoodcancerdatainitiative_prefect_pipeline_spark.sources.rest import (
        with_retries,
    )

    def always_fail():
        raise ConnectionError("down")

    with pytest.raises(ConnectionError):
        with_retries(always_fail, backoff=(0.0, 0.0), sleep=lambda _: None)


def test_fetch_entities_builds_dataframe(spark):
    from childhoodcancerdatainitiative_prefect_pipeline_spark.sources.rest import (
        fetch_entities,
    )

    fake = {"https://x/1": {"id": 1, "name": "a"}, "https://x/2": {"id": 2}}
    df = fetch_entities(
        spark, list(fake), fetch=lambda u: fake[u], backoff=(0.0,)
    )
    rows = {r["url"]: r["response_json"] for r in df.collect()}
    assert '"id": 1' in rows["https://x/1"]
    assert df.columns == ["url", "response_json"]


def test_submit_partitioned_chunks(spark):
    import json
    import tempfile

    from childhoodcancerdatainitiative_prefect_pipeline_spark.sources.rest import (
        submit_partitioned,
    )

    df = spark.range(7).selectExpr("id", "CAST(id AS STRING) AS v").coalesce(1)
    # executors can't append to driver memory — collect chunk sizes via a file
    with tempfile.NamedTemporaryFile(mode="r", suffix=".jsonl") as f:
        path = f.name

        def send(chunk):
            with open(path, "a") as out:
                out.write(json.dumps(len(chunk)) + "\n")

        submit_partitioned(df, send, chunk_size=3, backoff=(0.0,))
        sizes = [json.loads(line) for line in open(path)]
    assert sorted(sizes) == [1, 3, 3]


# ---------------------------------------------------------------------------
# Driver-side report rendering (report.py): A12 / F19 / W4
# ---------------------------------------------------------------------------


def test_humanize_bytes():
    from childhoodcancerdatainitiative_prefect_pipeline_spark.report import (
        humanize_bytes,
    )

    assert humanize_bytes(512) == "512 B"
    assert humanize_bytes(1536) == "1.5 KB"
    assert humanize_bytes(3 * 1024**4) == "3.0 TB"


def test_to_markdown_summary(spark):
    from childhoodcancerdatainitiative_prefect_pipeline_spark.report import (
        to_markdown_summary,
    )

    df = spark.createDataFrame([("a", 1), ("b", 2)], ["k", "n"])
    md = to_markdown_summary(df.orderBy("k"))
    lines = md.splitlines()
    assert lines[0] == "| k | n |"
    assert "| a | 1 |" in lines


def test_transpose_small(spark):
    from childhoodcancerdatainitiative_prefect_pipeline_spark.report import (
        transpose_small,
    )

    df = spark.createDataFrame(
        [("SUBJECT_ID", "string", "yes"), ("SEX", "enum", "no")],
        ["VARNAME", "TYPE", "REQUIRED"],
    )
    t = transpose_small(df, header_col="VARNAME")
    rows = {r["property"]: (r["SUBJECT_ID"], r["SEX"]) for r in t.collect()}
    assert rows["TYPE"] == ("string", "enum")
    assert rows["REQUIRED"] == ("yes", "no")


# ---------------------------------------------------------------------------
# S7/S8/S9 kernels with an injected in-memory S3 client
# ---------------------------------------------------------------------------


def _make_fake_client_factory(objects):
    """Build a picklable client factory: everything is defined inside
    the closure so cloudpickle ships it by value to executors."""

    def factory():
        class Body:
            def __init__(self, data):
                self._data = data
                self._pos = 0

            def read(self, n):
                out = self._data[self._pos : self._pos + n]
                self._pos += n
                return out

        class Client:
            def head_object(self, Bucket, Key):
                data = objects.get((Bucket, Key))
                if data is None:
                    raise KeyError(Key)
                return {"ContentLength": len(data)}

            def get_object(self, Bucket, Key, Range):
                s, e = (int(x) for x in Range.replace("bytes=", "").split("-"))
                return {"Body": Body(objects[(Bucket, Key)][s : e + 1])}

        return Client()

    return factory


_FAKE_OBJECTS = {
    ("bkt", "data/a.bam"): b"hello world",
    ("bkt", "data/b.txt"): b"x" * 100,
}


def test_probe_objects_with_fake_client(spark):
    from childhoodcancerdatainitiative_prefect_pipeline_spark.sources.s3 import (
        probe_objects,
    )

    urls = spark.createDataFrame(
        [("s3://bkt/data/a.bam",), ("s3://bkt/data/missing.txt",)], ["file_url"]
    )
    got = {
        r["file_url"]: (r["object_exists"], r["object_size"])
        for r in probe_objects(
            urls, client_factory=_make_fake_client_factory(_FAKE_OBJECTS)
        ).collect()
    }
    assert got["s3://bkt/data/a.bam"] == (True, 11)
    assert got["s3://bkt/data/missing.txt"] == (False, None)


def test_streaming_md5_chunked_matches_hashlib(spark):
    import hashlib

    from childhoodcancerdatainitiative_prefect_pipeline_spark.sources.s3 import (
        streaming_md5,
    )

    urls = spark.createDataFrame(
        [("s3://bkt/data/a.bam",), ("s3://bkt/data/b.txt",)], ["file_url"]
    )
    # 7-byte chunks force multiple ranged GETs per object
    got = {
        r["file_url"]: r["md5sum"]
        for r in streaming_md5(
            urls,
            client_factory=_make_fake_client_factory(_FAKE_OBJECTS),
            chunk_bytes=7,
        ).collect()
    }
    assert got["s3://bkt/data/a.bam"] == hashlib.md5(b"hello world").hexdigest()
    assert got["s3://bkt/data/b.txt"] == hashlib.md5(b"x" * 100).hexdigest()


def test_streaming_md5_zero_byte_and_missing_objects(spark):
    """A zero-byte object must hash as md5(b'') with NO ranged GET
    (S3 rejects 'bytes=0--1' with 416), and one bad object must not
    fail the whole task (ADVICE r01)."""
    import hashlib

    from childhoodcancerdatainitiative_prefect_pipeline_spark.sources.s3 import (
        streaming_md5,
    )

    objects = dict(_FAKE_OBJECTS)
    objects[("bkt", "data/empty.txt")] = b""
    urls = spark.createDataFrame(
        [
            ("s3://bkt/data/empty.txt",),
            ("s3://bkt/data/missing.txt",),
            ("s3://bkt/data/a.bam",),
        ],
        ["file_url"],
    )
    got = {
        r["file_url"]: r["md5sum"]
        for r in streaming_md5(
            urls, client_factory=_make_fake_client_factory(objects), chunk_bytes=7
        ).collect()
    }
    assert got["s3://bkt/data/empty.txt"] == hashlib.md5(b"").hexdigest()
    assert got["s3://bkt/data/missing.txt"] is None
    assert got["s3://bkt/data/a.bam"] == hashlib.md5(b"hello world").hexdigest()


def test_plan_moves_multipart_threshold(spark):
    from childhoodcancerdatainitiative_prefect_pipeline_spark.sources.s3 import (
        plan_moves,
    )

    manifest = spark.createDataFrame(
        [
            ("s3://src/a/x.bam", 6 * 1024**3),
            ("s3://src/b/y.txt", 10),
        ],
        ["file_url", "file_size"],
    )
    rows = {r["src_url"]: r for r in plan_moves(manifest).collect()}
    assert rows["s3://src/a/x.bam"]["dest_url"] == "s3://dest-bucket/a/x.bam"
    assert rows["s3://src/a/x.bam"]["needs_multipart"] is True
    assert rows["s3://src/b/y.txt"]["needs_multipart"] is False


def test_write_node_tsvs_and_json(spark, tmp_path):
    import glob
    import json

    from childhoodcancerdatainitiative_prefect_pipeline_spark.sources.files import (
        write_json_records,
        write_node_tsvs,
    )

    nodes = {
        "sample": spark.createDataFrame([("s1", "t")], ["sample_id", "kind"]),
        "participant": spark.createDataFrame([("p1",)], ["participant_id"]),
    }
    out = str(tmp_path / "tsvs")
    write_node_tsvs(nodes, out, study_id="phs1")
    files = sorted(glob.glob(f"{out}/**/*.csv", recursive=True)) + sorted(
        glob.glob(f"{out}/**/part-*", recursive=True)
    )
    assert files, "no TSV part files written"
    sample_file = next(f for f in files if "sample" in f)
    header = open(sample_file).readline().strip().split("\t")
    assert header == ["sample_id", "kind"]

    jpath = str(tmp_path / "recs")
    write_json_records(nodes["sample"], jpath)
    lines = [
        json.loads(line)
        for f in glob.glob(f"{jpath}/part-*")
        for line in open(f)
        if line.strip()
    ]
    assert lines == [{"sample_id": "s1", "kind": "t"}]


# ---------------------------------------------------------------------------
# S1/S2 Excel edge with the stdlib xlsx adapter (no openpyxl needed)
# ---------------------------------------------------------------------------


def test_xlsx_lite_roundtrip_raw():
    from childhoodcancerdatainitiative_prefect_pipeline_spark.sources.xlsx_lite import (
        read_xlsx,
        write_xlsx,
    )
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "wb.xlsx")
        write_xlsx(
            p,
            {
                "sample": [
                    ["sample_id", "age", "note"],
                    ["s1", 42, "a;b <&> 'quoted'"],
                    ["s2", None, "plain"],
                ],
                "README and INSTRUCTIONS": [["v1.7.2"]],
            },
        )
        back = read_xlsx(p)
    assert list(back) == ["sample", "README and INSTRUCTIONS"]
    assert back["sample"][0] == ["sample_id", "age", "note"]
    assert back["sample"][1] == ["s1", "42", "a;b <&> 'quoted'"]
    assert back["sample"][2] == ["s2", None, "plain"]


def test_workbook_to_tables_via_stdlib_adapter(spark, tmp_path):
    """S1 semantics end to end: NA bank applied, instruction sheets
    skipped, empty rows dropped, everything string-typed."""
    from childhoodcancerdatainitiative_prefect_pipeline_spark.sources.excel import (
        workbook_to_tables,
        write_workbook,
    )
    from childhoodcancerdatainitiative_prefect_pipeline_spark.sources.xlsx_lite import (
        write_xlsx,
    )

    p = str(tmp_path / "manifest.xlsx")
    write_xlsx(
        p,
        {
            "participant": [
                ["participant_id", "sex", "race"],
                ["p1", "Female", "NA"],
                [None, None, None],
                ["p2", "n/a", "Asian"],
            ],
            "Dictionary": [["Node", "Property"]],
        },
    )
    tables = workbook_to_tables(spark, p)
    assert list(tables) == ["participant"]
    rows = {r["participant_id"]: r for r in tables["participant"].collect()}
    assert set(rows) == {"p1", "p2"}
    assert rows["p1"]["race"] is None  # 'NA' nulled by the bank
    assert rows["p2"]["sex"] is None  # 'n/a' nulled
    assert dict(tables["participant"].dtypes)["sex"] == "string"

    # S2 plain write → S1 read roundtrip through Spark frames
    out = str(tmp_path / "out.xlsx")
    write_workbook(tables, out)
    back = workbook_to_tables(spark, out)
    assert back["participant"].count() == 2


def test_workbook_sinks_refuse_unbounded_collect(spark, tmp_path):
    """VERDICT r9 item 2: the Excel sinks are driver-side manifest
    writers — past max_rows they must refuse with an error naming the
    distributed TSV sink, and the probe must be a bounded limit()
    scan, not a full count."""
    import pytest as _pytest

    from childhoodcancerdatainitiative_prefect_pipeline_spark.sources.excel import (
        tables_to_workbook,
        write_workbook,
    )
    from childhoodcancerdatainitiative_prefect_pipeline_spark.sources.xlsx_lite import (
        write_xlsx,
    )

    big = spark.range(0, 50).selectExpr("cast(id as string) AS sample_id")
    out = str(tmp_path / "big.xlsx")
    with _pytest.raises(ValueError, match="write_node_tsvs"):
        write_workbook({"sample": big}, out, max_rows=10)

    template = str(tmp_path / "template.xlsx")
    write_xlsx(template, {"sample": [["sample_id"]]})
    with _pytest.raises(ValueError, match="write_node_tsvs"):
        tables_to_workbook({"sample": big}, template, out, max_rows=10)

    # within the bound both sinks still write
    write_workbook({"sample": big}, out, max_rows=50)
    tables_to_workbook({"sample": big}, template, out, max_rows=50)


def test_manifest_pipeline_end_to_end(spark, tmp_path):
    """§3.1 runner, whole loop: xlsx manifest in → repair+derive+index
    → violations report → per-node TSVs + workbook out → read back."""
    import glob

    from childhoodcancerdatainitiative_prefect_pipeline_spark.plans.curation import (
        curate_file_node,
        index_violations,
    )
    from childhoodcancerdatainitiative_prefect_pipeline_spark.report import (
        to_markdown_summary,
    )
    from childhoodcancerdatainitiative_prefect_pipeline_spark.sources.excel import (
        workbook_to_tables,
        write_workbook,
    )
    from childhoodcancerdatainitiative_prefect_pipeline_spark.sources.files import (
        write_node_tsvs,
    )
    from childhoodcancerdatainitiative_prefect_pipeline_spark.sources.xlsx_lite import (
        write_xlsx,
    )

    manifest_path = str(tmp_path / "manifest.xlsx")
    good_md5 = "d41d8cd98f00b204e9800998ecf8427e"
    write_xlsx(
        manifest_path,
        {
            "sequencing_file": [
                [
                    "file_id", "file_name", "file_size", "md5sum", "file_url",
                    "file_access", "acl", "sample_link", "participant_link",
                ],
                # clean row
                ["f1", "a.bam", 100, good_md5, "s3://b/x/a.bam", "Open",
                 "['*']", "s1", "NA"],
                # dirty: uppercase md5 (repairable), zero size (violation)
                ["f2", "b.vcf.gz", 0, good_md5.upper(), "s3://b/x/b.vcf.gz",
                 "Controlled", "['phs1.c1']", "NA", "p1"],
                # dirty: NA md5, url basename mismatch
                ["f3", "c.txt", 5, "NA", "s3://b/x/other.txt", "Open",
                 "['*']", "NA", "NA"],
            ],
            "README and INSTRUCTIONS": [["v1.7.2"]],
        },
    )

    tables = workbook_to_tables(spark, manifest_path)
    assert list(tables) == ["sequencing_file"]

    index = curate_file_node(tables["sequencing_file"])
    rows = {r["file_id"]: r for r in index.collect()}
    assert rows["f2"]["md5sum"] == good_md5          # lowercased
    assert rows["f3"]["md5sum"] is None              # NA-banked
    assert rows["f1"]["file_type"] == "bam"
    assert rows["f2"]["file_type"] == "vcf"
    assert rows["f1"]["file_mapping_level"] == "Sample"
    assert rows["f2"]["file_mapping_level"] == "Participant"
    assert rows["f3"]["file_mapping_level"] == "Study"

    violations = index_violations(index)
    got = {(r["rule"], r["row_ref"]) for r in violations.collect()}
    assert ("zero_size", "f2") in got
    assert ("url_basename_mismatch", "f3") in got
    assert not any(ref == "f1" for _, ref in got)

    report_md = to_markdown_summary(
        violations.groupBy("rule").count().orderBy("rule")
    )
    assert "zero_size" in report_md

    out_dir = str(tmp_path / "tsvs")
    write_node_tsvs({"sequencing_file": index}, out_dir, study_id="phs1")
    parts = glob.glob(f"{out_dir}/phs1-sequencing_file/*", recursive=True)
    assert parts, "no TSV output"

    wb_out = str(tmp_path / "curated.xlsx")
    write_workbook({"sequencing_file": index}, wb_out)
    back = workbook_to_tables(spark, wb_out)
    assert back["sequencing_file"].count() == 3


def test_graph_dump_intake(spark):
    """S11 — openCypher DUMP statements → node/edge tables with
    label/type filters and dangling-edge pruning."""
    from pyspark.sql import functions as F

    from childhoodcancerdatainitiative_prefect_pipeline_spark.sources.graph_dump import (
        dump_to_tables,
    )

    dump = [
        "CREATE INDEX ON :__mg_vertex__(__mg_id__);",
        'CREATE (:__mg_vertex__:`sample` {__mg_id__: 1, `sample_id`: "s1", `n`: 3});',
        'CREATE (:__mg_vertex__:`sample` {__mg_id__: 2, `sample_id`: "s2"});',
        'CREATE (:__mg_vertex__:`participant` {__mg_id__: 3, `participant_id`: "p1"});',
        'CREATE (:__mg_vertex__:`study` {__mg_id__: 4, `phs`: "phs1"});',
        "MATCH (u:__mg_vertex__), (v:__mg_vertex__) WHERE u.__mg_id__ = 1 AND "
        "v.__mg_id__ = 3 CREATE (u)-[:`of_participant`]->(v);",
        "MATCH (u:__mg_vertex__), (v:__mg_vertex__) WHERE u.__mg_id__ = 3 AND "
        "v.__mg_id__ = 4 CREATE (u)-[:`of_study`]->(v);",
        "DROP INDEX ON :__mg_vertex__(__mg_id__);",
    ]

    nodes, edges = dump_to_tables(spark, dump)
    assert nodes.count() == 4
    assert edges.count() == 2
    s1 = nodes.filter(F.col("node_id") == 1).collect()[0]
    assert s1["labels"] == "sample"
    assert '"sample_id": "s1"' in s1["props_json"]
    assert '"n": 3' in s1["props_json"]

    # filtered intake: keep only sample/participant nodes — the
    # of_study edge dangles and must be pruned
    nodes_f, edges_f = dump_to_tables(
        spark, dump, node_labels=("sample", "participant")
    )
    assert nodes_f.count() == 3
    rels = [r["rel_type"] for r in edges_f.collect()]
    assert rels == ["of_participant"]


def test_streaming_inventory_status(spark, tmp_path):
    """The incremental reconcile (SCALE.md): inventory deltas arrive as
    a file stream, each checked against the static manifest via a
    stream-static left join; results match the batch reconcile on the
    statuses a delta can decide."""
    from pyspark.sql import functions as F

    from childhoodcancerdatainitiative_prefect_pipeline_spark.sources.s3 import (
        reconcile_with_inventory,
        streaming_inventory_status,
    )

    manifest = spark.createDataFrame(
        [
            ("s3://b/a.bam", "100"),
            ("s3://b/b.bam", "200"),
            ("s3://b/never_uploaded.bam", "300"),
        ],
        ["file_url", "file_size"],
    )
    inventory = spark.createDataFrame(
        [("a.bam", 100), ("b.bam", 999), ("extra.bam", 5)],
        ["file_path", "file_size"],
    )

    def statuses(df):
        return {
            r["file_path"]: r["status"]
            for r in df.select("file_path", "status").collect()
        }

    expected = statuses(
        reconcile_with_inventory(manifest, inventory).filter(
            F.col("status") != "missing_in_bucket"
        )
    )
    assert expected == {
        "a.bam": "ok",
        "b.bam": "size_mismatch",
        "extra.bam": "missing_in_manifest",
    }

    src = str(tmp_path / "inv_stream")
    inventory.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(inventory.schema).parquet(src)
    q = (
        streaming_inventory_status(stream, manifest)
        .writeStream.format("memory")
        .queryName("inv_status_test")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = statuses(spark.sql("SELECT * FROM inv_status_test"))
    finally:
        q.stop()
    assert got == expected


def test_schema_registry_end_to_end(spark):
    """S12: version listing/resolution/gate + MDF parse compiling
    straight into the rule engine."""
    import pytest

    from childhoodcancerdatainitiative_prefect_pipeline_spark.plans.rules import (
        validate,
    )
    from childhoodcancerdatainitiative_prefect_pipeline_spark.sources.schema_registry import (
        fetch_schema,
        resolve_version,
        version_gate,
    )

    tags = [{"name": "v1.7.2"}, {"name": "v1.9.1"}, {"name": "v1.10.0"},
            {"name": "not-a-version"}]
    model = """
Handle: CCDI
Version: v1.10.0
Nodes:
  sample:
    Props:
      - sample_id
      - anatomic_site
      - participant_age_at_collection
      - id
Relationships:
  of_sample:
    Mul: many_to_one
    Ends:
      - Src: sample
        Dst: participant
"""
    props = """
PropDefinitions:
  sample_id:
    Type: string
    Key: true
    Req: true
  anatomic_site:
    Type:
      value_type: list
      item_type:
        - Lung
        - Kidney
    Req: true
  participant_age_at_collection:
    Type: integer
"""

    def fetch_asset(tag, name):
        assert tag == "v1.10.0"
        return model if name == "model" else props

    # semver ordering: 1.10 > 1.9; junk tags ignored
    tag, schemas, edges = fetch_schema("latest", lambda: tags, fetch_asset)
    assert tag == "v1.10.0"
    assert resolve_version("1.9.1", [t["name"] for t in tags]) == "v1.9.1"
    with pytest.raises(ValueError, match="not in registry"):
        resolve_version("v9.9.9", [t["name"] for t in tags])
    with pytest.raises(ValueError, match="liftover"):
        version_gate("v1.9.1", "1.10.0")
    version_gate("1.10.0", "v1.10.0")  # v-prefix insensitive

    assert edges[0].src == "sample" and edges[0].dst == "participant"
    s = schemas["sample"]
    assert s.key_props == ["sample_id"]
    assert [r.prop for r in s.rules] == [
        "sample_id", "anatomic_site", "participant_age_at_collection",
    ]  # surrogate 'id' dropped
    assert s.rule("anatomic_site").type == "array[enum]"
    assert s.rule("anatomic_site").enum_terms == ("Lung", "Kidney")

    # the parsed schema drives the rule engine directly
    df = spark.createDataFrame(
        [("s1", "Lung;Kidney", "12"), (None, "Mars", "x")],
        ["sample_id", "anatomic_site", "participant_age_at_collection"],
    )
    v = {(r["rule"], r["property"]) for r in validate(df, s).collect()}
    assert ("required", "sample_id") in v
    assert ("enum", "anatomic_site") in v
    assert ("not_integer", "participant_age_at_collection") in v


def test_schema_render_round_trip(spark):
    """§2.13 render half: Dictionary/TaVS sheets from parsed MDF,
    reference conventions (Required carries the node name, example
    values truncate at 4 terms, preferred node order, TaVS blocks
    sorted + blank-separated, shared props deduped) — and the rendered
    sheets rebuild the SAME rule metadata and drive rules_validate."""
    from childhoodcancerdatainitiative_prefect_pipeline_spark.plans.rules import (
        validate,
    )
    from childhoodcancerdatainitiative_prefect_pipeline_spark.sources.schema_registry import (
        parse_mdf,
    )
    from childhoodcancerdatainitiative_prefect_pipeline_spark.sources.schema_render import (
        DICTIONARY_COLS,
        TAVS_COLS,
        render_dictionary,
        render_tavs,
        sheets_to_schemas,
    )

    model = {
        "Nodes": {
            # model order: sequencing_file first — preferred order must
            # still put sample before sequencing_file in the sheet
            "sequencing_file": {"Props": ["file_type", "library_id"]},
            "sample": {"Props": ["sample_id", "anatomic_site", "file_type"]},
        }
    }
    props = {
        "PropDefinitions": {
            "sample_id": {"Type": "string", "Key": True, "Req": True},
            "anatomic_site": {
                "Enum": ["Lung", "Kidney", "Liver", "Bone", "Skin"],
                "Req": True,
            },
            "file_type": {"Enum": ["bam", "cram"], "Strict": False},
            "library_id": {"Type": "string", "Req": True},
        }
    }
    schemas = parse_mdf(model, props)

    dict_rows = render_dictionary(
        schemas,
        descriptions={"sample_id": "sample key"},
        cde_codes={"anatomic_site": "12345"},
        cde_versions={"anatomic_site": "2"},
    )
    assert all(list(r.keys()) == DICTIONARY_COLS for r in dict_rows)
    # preferred order: all sample rows precede sequencing_file rows
    nodes_seq = [r["Node"] for r in dict_rows]
    assert nodes_seq == ["sample"] * 3 + ["sequencing_file"] * 2
    by_pp = {(r["Node"], r["Property"]): r for r in dict_rows}
    site = by_pp[("sample", "anatomic_site")]
    assert site["Example value"].endswith(";etc (see Terms and Values Sets)")
    assert site["Example value"].startswith("Lung;Kidney;Liver;Bone")
    assert site["Required"] == "sample" and site["CDE"] == "12345"
    assert by_pp[("sample", "sample_id")]["Key"] is True
    assert by_pp[("sample", "file_type")]["Type"] == "string;enum"
    assert by_pp[("sequencing_file", "file_type")]["Required"] is None

    tavs_rows = render_tavs(schemas, term_definitions={"Lung": "the lung"})
    assert all(list(r.keys()) == TAVS_COLS for r in tavs_rows)
    names = [r["Value Set Name"] for r in tavs_rows]
    # blocks sorted by prop, one blank separator each, file_type once
    assert names == ["anatomic_site"] * 5 + [None, "file_type", "file_type", None]
    assert tavs_rows[0]["Definition"] == "the lung"

    rebuilt = sheets_to_schemas(dict_rows, tavs_rows)
    for node in schemas:
        orig, back = schemas[node], rebuilt[node]
        assert back.key_props == orig.key_props
        for ro, rb in zip(orig.rules, back.rules):
            assert (ro.prop, ro.type, ro.required, ro.key) == (
                rb.prop, rb.type, rb.required, rb.key
            )
            assert ro.enum_terms == rb.enum_terms  # full list via TaVS
            assert ro.free_text == rb.free_text

    # rendered sheets drive the rule engine identically
    df = spark.createDataFrame(
        [("s1", "Lung", "bam"), (None, "Mars", "weird")],
        ["sample_id", "anatomic_site", "file_type"],
    )
    v_orig = {
        (r["rule"], r["property"], r["severity"])
        for r in validate(df, schemas["sample"]).collect()
    }
    v_back = {
        (r["rule"], r["property"], r["severity"])
        for r in validate(df, rebuilt["sample"]).collect()
    }
    assert v_orig == v_back and ("required", "sample_id", "ERROR") in v_orig


def test_compact_parquet_dir(spark, tmp_path):
    """64 tiny files → a handful of target-sized files, data intact."""
    import glob

    from childhoodcancerdatainitiative_prefect_pipeline_spark.sources.files import (
        compact_parquet_dir,
    )

    src = str(tmp_path / "fragmented")
    dst = str(tmp_path / "compacted")
    df = spark.range(0, 20000).withColumn(
        "payload", F.md5(F.col("id").cast("string"))
    )
    df.repartition(64).write.parquet(src)
    n_src = len(glob.glob(f"{src}/*.parquet"))
    assert n_src == 64

    total = sum(
        __import__("os").path.getsize(p) for p in glob.glob(f"{src}/*.parquet")
    )
    n = compact_parquet_dir(spark, src, dst, target_file_bytes=total // 4)
    n_dst = len(glob.glob(f"{dst}/*.parquet"))
    assert n_dst == n <= 6
    back = spark.read.parquet(dst)
    assert back.count() == 20000
    assert back.agg(F.sum("id")).collect()[0][0] == sum(range(20000))


def test_compact_parquet_dir_partitioned(spark, tmp_path):
    import glob

    from childhoodcancerdatainitiative_prefect_pipeline_spark.sources.files import (
        compact_parquet_dir,
    )

    src = str(tmp_path / "frag_part")
    dst = str(tmp_path / "comp_part")
    df = spark.range(0, 8000).withColumn("bucket", (F.col("id") % 4).cast("int"))
    df.repartition(32).write.parquet(src)
    compact_parquet_dir(
        spark, src, dst, target_file_bytes=10**9, partition_by=("bucket",)
    )
    # one directory per partition value, data intact
    assert len(glob.glob(f"{dst}/bucket=*")) == 4
    assert spark.read.parquet(dst).count() == 8000


def test_split_s3_url_edge_cases(spark):
    from childhoodcancerdatainitiative_prefect_pipeline_spark.sources.s3 import (
        split_s3_url,
    )

    df = spark.createDataFrame(
        [
            ("s3://bucket/path/to/file.txt",),
            ("s3://bucket/file.txt",),
            ("s3://bucket",),
            ("s3://bucket/",),
        ],
        ["u"],
    )
    got = [
        (r["s"]["bucket"], r["s"]["path"])
        for r in df.select(split_s3_url("u").alias("s")).collect()
    ]
    assert got == [
        ("s3://bucket", "path/to/file.txt"),
        ("s3://bucket", "file.txt"),
        ("s3://bucket", ""),
        ("s3://bucket", ""),
    ]


def test_read_with_quarantine_csv(spark, tmp_path):
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from childhoodcancerdatainitiative_prefect_pipeline_spark.sources.files import (
        read_with_quarantine,
    )

    p = tmp_path / "in.tsv"
    p.write_text(
        "id\tname\tsize\n"
        "1\talpha\t100\n"
        "2\tbeta\tnot_a_number\n"  # type-corrupt
        "3\tgamma\t300\n"
    )
    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("name", StringType()),
            StructField("size", LongType()),
        ]
    )
    clean, quarantined, parsed = read_with_quarantine(spark, str(p), schema)
    assert [r["id"] for r in clean.orderBy("id").collect()] == [1, 3]
    qrows = quarantined.collect()
    assert len(qrows) == 1
    assert "not_a_number" in qrows[0]["raw"]
    parsed.unpersist()


def test_read_with_quarantine_json(spark, tmp_path):
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from childhoodcancerdatainitiative_prefect_pipeline_spark.sources.files import (
        read_with_quarantine,
    )

    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"id": 1, "name": "a"}\n'
        '{"id": 2, "name": "b"\n'  # truncated json
        '{"id": 3, "name": "c"}\n'
    )
    schema = StructType(
        [StructField("id", LongType()), StructField("name", StringType())]
    )
    clean, quarantined, parsed = read_with_quarantine(
        spark, str(p), schema, fmt="json"
    )
    assert sorted(r["id"] for r in clean.collect()) == [1, 3]
    assert quarantined.count() == 1
    parsed.unpersist()


def test_schema_evolution_merge_read(spark, tmp_path):
    """Evolved parquet batches (added column) must read as one table
    with mergeSchema, nulls backfilling the old batches."""
    base = str(tmp_path / "evolving")
    spark.range(0, 10).selectExpr("id", "id * 2 AS v").write.parquet(
        f"{base}/batch=0"
    )
    spark.range(10, 20).selectExpr(
        "id", "id * 2 AS v", "'en' AS lang"
    ).write.parquet(f"{base}/batch=1")
    merged = spark.read.option("mergeSchema", True).parquet(base)
    assert set(merged.columns) == {"id", "v", "lang", "batch"}
    assert merged.count() == 20
    assert merged.filter("lang IS NULL").count() == 10


def test_rest_json_datasource_distributed_fetch(spark, tmp_path):
    """The Python DataSource fans one URL out per partition and
    returns parseable JSON bodies; file:// URLs make it hermetic."""
    import json as _json

    from childhoodcancerdatainitiative_prefect_pipeline_spark.sources.rest import (
        DATASOURCE_API_AVAILABLE,
        RestJsonDataSource,
    )

    assert DATASOURCE_API_AVAILABLE
    a = tmp_path / "a.json"
    b = tmp_path / "b.json"
    a.write_text('{"id": 1, "name": "alpha"}')
    b.write_text('{"id": 2, "name": "beta"}')
    urls = f"file://{a};file://{b}"

    spark.dataSource.register(RestJsonDataSource)
    df = (
        spark.read.format("rest_json")
        .option("urls", urls)
        .load()
    )
    assert df.rdd.getNumPartitions() == 2  # one partition per URL
    rows = {r["url"]: _json.loads(r["response_json"]) for r in df.collect()}
    assert rows[f"file://{a}"]["name"] == "alpha"
    assert rows[f"file://{b}"]["id"] == 2


def test_orc_round_trip_and_partition_pruning(spark, sf_dir, tmp_path):
    """ORC sink/scan: values survive the round trip (timestamps,
    doubles, strings) and partition filters prune at the scan."""
    from childhoodcancerdatainitiative_prefect_pipeline_spark.catalog import load_testdata
    from childhoodcancerdatainitiative_prefect_pipeline_spark.sources.files import (
        read_orc,
        write_orc,
    )

    events = load_testdata(spark, sf_dir, tables=("events",), register_views=False)[
        "events"
    ]
    path = str(tmp_path / "events_orc")
    write_orc(events, path, partition_by=("event_type",))
    back = read_orc(spark, path)
    assert back.count() == events.count()
    a = {tuple(r) for r in events.select("event_id", "user_id", "value").collect()}
    b = {tuple(r) for r in back.select("event_id", "user_id", "value").collect()}
    assert a == b

    pruned = back.filter("event_type = 'click'")
    plan = pruned._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PartitionFilters" in plan
    assert pruned.count() == events.filter("event_type = 'click'").count()


def test_warc_roundtrip_and_crawl_to_text_pipeline(spark, tmp_path):
    """Build a WARC with response/request/metadata records, read it
    back (type filter pushed into the parser), and run the crawl→text
    step: html_strip over decoded response payloads."""
    from pyspark.sql import functions as SF

    from childhoodcancerdatainitiative_prefect_pipeline_spark.operators.text import (
        html_strip,
    )
    from childhoodcancerdatainitiative_prefect_pipeline_spark.sources.warc import (
        build_warc_bytes,
        parse_warc_bytes,
        read_warc,
    )

    html = b"<html><script>x()</script><p>Hello &amp; welcome</p></html>"
    tricky = b"\r\n\r\nWARC/1.0\r\n fake boundary inside payload"
    records = [
        {"warc_type": "response", "target_uri": "https://a.example/x",
         "record_id": "<urn:uuid:1>", "payload": html},
        {"warc_type": "request", "target_uri": "https://a.example/x",
         "record_id": "<urn:uuid:2>", "payload": b"GET /x HTTP/1.1"},
        {"warc_type": "response", "target_uri": "https://b.example/y",
         "record_id": "<urn:uuid:3>", "payload": tricky},
        {"warc_type": "metadata", "target_uri": "https://a.example/x",
         "record_id": "<urn:uuid:4>", "payload": b"k: v"},
    ]
    blob = build_warc_bytes(records)
    # pure-python roundtrip first: payload slicing must survive fake
    # boundaries INSIDE payloads (Content-Length, not delimiters)
    back = list(parse_warc_bytes(blob))
    assert [r["warc_type"] for r in back] == [
        "response", "request", "response", "metadata",
    ]
    assert back[2]["payload"] == tricky

    warc_dir = tmp_path / "crawl"
    warc_dir.mkdir()
    (warc_dir / "seg-00000.warc").write_bytes(blob)

    df = read_warc(spark, str(warc_dir))  # responses only by default
    rows = df.orderBy("record_id").collect()
    assert [r["warc_type"] for r in rows] == ["response", "response"]
    assert rows[0]["target_uri"] == "https://a.example/x"
    assert bytes(rows[0]["payload"]) == html
    assert rows[0]["content_length"] == len(html)

    text = df.select(
        "target_uri",
        html_strip(SF.decode(SF.col("payload"), "UTF-8")).alias("t"),
    )
    got = {r["target_uri"]: r["t"] for r in text.collect()}
    assert got["https://a.example/x"] == "Hello & welcome"


def test_bam_stats_kernel_and_quarantine(spark):
    """Real (stdlib) BAM stats: BGZF inflate + CRC check + SAM-spec
    record walk reproduces the reference's samtools-stats numbers
    (src/sra_metadata.py:30-90); corrupt payloads dead-letter."""
    from childhoodcancerdatainitiative_prefect_pipeline_spark.sources.bam import (
        bam_stats,
        decode_bam_stats,
        encode_bam,
        encode_bgzf,
        bgzf_blocks,
    )

    reads = [
        {"name": "r1", "seq": "ACGTACGTAC", "flag": 0},
        {"name": "r2", "seq": "GGGCCC", "flag": 4},  # unmapped
        {"name": "r3", "seq": "ACGTN", "flag": 0x400},  # duplicate
        {"name": "r4", "seq": "A" * 151, "flag": 0},
    ]
    blob = encode_bam([("chr1", 1000), ("chr2", 500)], reads)
    d = decode_bam_stats(blob)
    assert d["n_reads"] == 4 and d["n_mapped"] == 3 and d["n_duplicates"] == 1
    assert d["total_bases"] == 172
    assert d["avg_read_len_milli"] == 172 * 1000 // 4
    assert d["total_ref_len"] == 1500
    assert d["coverage_milli"] == (10 + 5 + 151) * 1000 // 1500

    # CIGAR-aware coverage (ADVICE r04): soft-clips and insertions
    # consume the read but not the reference; deletions the reverse.
    clipped = [
        # 100S in a 151-read: only 51 aligned bases count
        {"name": "c1", "seq": "A" * 151, "flag": 0,
         "cigar": [("S", 100), ("M", 51)]},
        # 10M 5I 10M 3D: 10+10 M + 3 D = 23 reference bases, l_seq 25
        {"name": "c2", "seq": "C" * 25, "flag": 0,
         "cigar": [("M", 10), ("I", 5), ("M", 10), ("D", 3)]},
        # =/X count like M
        {"name": "c3", "seq": "G" * 20, "flag": 0,
         "cigar": [("=", 12), ("X", 8)]},
    ]
    dc = decode_bam_stats(encode_bam([("chr1", 1000)], clipped))
    assert dc["total_bases"] == 151 + 25 + 20
    assert dc["coverage_milli"] == (51 + 23 + 20) * 1000 // 1000

    # BGZF multi-block roundtrip (payload larger than one block)
    big = bytes(range(256)) * 1024
    assert b"".join(bgzf_blocks(encode_bgzf(big))) == big

    crc_damaged = bytearray(blob)
    crc_damaged[30] ^= 0xFF
    media = spark.createDataFrame(
        [
            (1, bytearray(blob)),
            (2, bytearray(b"not a bam")),
            (3, bytearray(blob[:-40])),  # truncated EOF block
            (4, crc_damaged),
        ],
        "file_id long, payload binary",
    )
    rows = {r["file_id"]: r for r in bam_stats(media).collect()}
    assert rows[1]["decode_error"] is None and rows[1]["n_reads"] == 4
    for bad in (2, 3, 4):
        assert rows[bad]["decode_error"] is not None, bad
        assert rows[bad]["n_reads"] is None


def test_readme_render_and_workbook_version_gate(tmp_path):
    """VERDICT r03 items 2/6: the rendered README and INSTRUCTIONS
    sheet carries the template version in the third cell of row 1
    (src/create_submission.py:553-648); workbook_version reads it back
    the way the runner's step-2 gate does (src/utils.py:335-345,
    1119-1122), and check_workbook_version wires it to the registry's
    semver gate."""
    import pytest

    from childhoodcancerdatainitiative_prefect_pipeline_spark.sources.excel import (
        check_workbook_version,
        workbook_version,
    )
    from childhoodcancerdatainitiative_prefect_pipeline_spark.sources.schema_render import (
        render_readme,
    )
    from childhoodcancerdatainitiative_prefect_pipeline_spark.sources.xlsx_lite import (
        write_xlsx,
    )

    rows = render_readme(
        "v1.9.1",
        "CCDI Model v1.9.1",
        release_history=[("v1.9.0", "prior", "https://example.invalid/t")],
    )
    assert rows[0][0] == "CCDI SUBMISSION METADATA TEMPLATE"
    assert rows[0][2] == "v1.9.1"
    # release history: prior rows then the current release appended
    assert rows[-2][1] == "v1.9.0" and rows[-1][1] == "v1.9.1"
    assert rows[-1][3].endswith("/ccdi-model/releases/tag/1.9.1")

    dcc_rows = render_readme("v2.0.0", "DCC", dcc=True)
    assert dcc_rows[0][0] == "CCDI-DCC SUBMISSION METADATA TEMPLATE"
    col1 = [r[0] for r in dcc_rows]
    assert "TYPE COLUMNS" in col1 and "RELATIONSHIP COLUMNS" in col1
    assert "STRUCTURED COLUMNS" not in col1
    assert dcc_rows[-1][3].endswith("/ccdi-dcc-model/releases/tag/2.0.0")

    p = str(tmp_path / "manifest.xlsx")
    write_xlsx(p, {"README and INSTRUCTIONS": rows, "study": [["study_id"]]})
    assert workbook_version(p) == "1.9.1"
    assert check_workbook_version(p, "1.9.1") == "1.9.1"
    with pytest.raises(ValueError, match="!= template"):
        check_workbook_version(p, "1.10.0")

    bad = str(tmp_path / "noreadme.xlsx")
    write_xlsx(bad, {"study": [["study_id"]]})
    with pytest.raises(ValueError, match="no 'README"):
        workbook_version(bad)


def test_node_sheet_columns_and_dcc_order():
    """DCC template deltas (src/create_submission_ccdi_dcc.py): the
    surrogate column and parent index columns rename id->guid
    together; the sheet order derives from the model graph (root, then
    study_*, then the preferred list, then the rest)."""
    from childhoodcancerdatainitiative_prefect_pipeline_spark.sources.schema_render import (
        dcc_node_order,
        render_node_sheet_columns,
    )

    cols = render_node_sheet_columns(
        ["sample_id", "anatomic_site"], ["participant", "pdx"]
    )
    assert cols == [
        "type", "participant.participant_id", "pdx.pdx_id",
        "sample_id", "anatomic_site", "id", "participant.id", "pdx.id",
    ]
    dcc = render_node_sheet_columns(
        ["sample_id", "anatomic_site"], ["participant"], surrogate="guid"
    )
    assert dcc == [
        "type", "participant.participant_id",
        "sample_id", "anatomic_site", "guid", "participant.guid",
    ]

    nodes = ["sample", "diagnosis", "study_admin", "study", "weird_extra",
             "participant"]
    parents = {
        "study": [], "study_admin": ["study"], "participant": ["study"],
        "diagnosis": ["participant"], "sample": ["participant"],
        "weird_extra": ["sample"],
    }
    assert dcc_node_order(nodes, parents) == [
        "study", "study_admin", "participant", "diagnosis", "sample",
        "weird_extra",
    ]


# ---------------------------------------------------------------------------
# S9 execution — execute_moves with a filesystem-backed fake client
# (files survive the executor process boundary, so the tests can
# assert on the store AFTER the Spark job, unlike the dict-backed
# fake used for the read-only S7/S8 kernels)
# ---------------------------------------------------------------------------


def _make_fs_client_factory(root):
    """In-filesystem object store: key layout <root>/<bucket>/<key>.
    Implements exactly the client surface execute_moves touches."""

    def factory():
        import os

        class Client:
            def _path(self, bucket, key):
                return os.path.join(root, bucket, key)

            def head_object(self, Bucket, Key):
                p = self._path(Bucket, Key)
                if not os.path.exists(p):
                    raise KeyError(Key)
                return {"ContentLength": os.path.getsize(p)}

            def get_object(self, Bucket, Key, Range):
                class Body:
                    def __init__(self, data):
                        self._data, self._pos = data, 0

                    def read(self, n):
                        out = self._data[self._pos : self._pos + n]
                        self._pos += n
                        return out

                s, e = (
                    int(x) for x in Range.replace("bytes=", "").split("-")
                )
                with open(self._path(Bucket, Key), "rb") as f:
                    return {"Body": Body(f.read()[s : e + 1])}

            def copy_object(self, Bucket, CopySource, Key):
                # Real S3 prefers the dict form (string form breaks on
                # '+'/'%' in keys) — the kernel now always passes dict.
                if isinstance(CopySource, dict):
                    sb, sk = CopySource["Bucket"], CopySource["Key"]
                else:
                    sb, sk = CopySource.split("/", 1)
                dest = self._path(Bucket, Key)
                os.makedirs(os.path.dirname(dest), exist_ok=True)
                with open(self._path(sb, sk), "rb") as f:
                    data = f.read()
                with open(dest, "wb") as f:
                    f.write(data)

            def create_multipart_upload(self, Bucket, Key):
                return {"UploadId": "up-" + Key.replace("/", "_")}

            def upload_part_copy(
                self, Bucket, Key, CopySource, PartNumber, UploadId,
                CopySourceRange,
            ):
                s, e = (
                    int(x)
                    for x in CopySourceRange.replace("bytes=", "").split("-")
                )
                with open(
                    self._path(CopySource["Bucket"], CopySource["Key"]), "rb"
                ) as f:
                    data = f.read()[s : e + 1]
                part = self._path(Bucket, Key) + f".part{PartNumber}"
                os.makedirs(os.path.dirname(part), exist_ok=True)
                with open(part, "wb") as f:
                    f.write(data)
                return {"CopyPartResult": {"ETag": f"etag-{PartNumber}"}}

            def complete_multipart_upload(
                self, Bucket, Key, UploadId, MultipartUpload
            ):
                dest = self._path(Bucket, Key)
                with open(dest, "wb") as out:
                    for p in sorted(
                        MultipartUpload["Parts"],
                        key=lambda x: x["PartNumber"],
                    ):
                        part = dest + f".part{p['PartNumber']}"
                        with open(part, "rb") as f:
                            out.write(f.read())
                        os.remove(part)

            def abort_multipart_upload(self, Bucket, Key, UploadId):
                import glob

                for p in glob.glob(self._path(Bucket, Key) + ".part*"):
                    os.remove(p)

            def delete_object(self, Bucket, Key):
                os.remove(self._path(Bucket, Key))

        return Client()

    return factory


def _seed_store(root, objects):
    import os

    for (bucket, key), data in objects.items():
        p = os.path.join(root, bucket, key)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "wb") as f:
            f.write(data)


def test_execute_moves_copy_skip_and_fail(spark, tmp_path):
    import os

    from childhoodcancerdatainitiative_prefect_pipeline_spark.sources.s3 import (
        execute_moves,
    )

    root = str(tmp_path)
    _seed_store(
        root,
        {
            ("src", "d/a.txt"): b"alpha",
            ("src", "d/b.txt"): b"bravo!",
            ("dst", "d/b.txt"): b"123456",  # same size -> skip
            ("src", "d/c.txt"): b"charlie",
            ("dst", "d/c.txt"): b"stale",  # size mismatch -> recopy
        },
    )
    moves = spark.createDataFrame(
        [
            ("s3://src/d/a.txt", "s3://dst/d/a.txt"),
            ("s3://src/d/b.txt", "s3://dst/d/b.txt"),
            ("s3://src/d/c.txt", "s3://dst/d/c.txt"),
            ("s3://src/d/missing.txt", "s3://dst/d/missing.txt"),
        ],
        "src_url string, dest_url string",
    )
    got = {
        r["src_url"]: (r["status"], r["bytes_copied"])
        for r in execute_moves(
            moves, client_factory=_make_fs_client_factory(root)
        ).collect()
    }
    assert got["s3://src/d/a.txt"] == ("copied", 5)
    assert got["s3://src/d/b.txt"] == ("skipped", 0)
    assert got["s3://src/d/c.txt"] == ("copied", 7)
    assert got["s3://src/d/missing.txt"] == ("failed", None)
    with open(os.path.join(root, "dst", "d", "a.txt"), "rb") as f:
        assert f.read() == b"alpha"
    with open(os.path.join(root, "dst", "d", "c.txt"), "rb") as f:
        assert f.read() == b"charlie"  # stale dest was replaced
    with open(os.path.join(root, "dst", "d", "b.txt"), "rb") as f:
        assert f.read() == b"123456"  # skip left the dest untouched


def test_execute_moves_multipart_assembles_ranges(spark, tmp_path):
    import glob
    import os

    from childhoodcancerdatainitiative_prefect_pipeline_spark.sources.s3 import (
        execute_moves,
    )

    root = str(tmp_path)
    payload = bytes(range(256)) * 5  # 1280 bytes
    _seed_store(root, {("src", "big.bin"): payload})
    moves = spark.createDataFrame(
        [("s3://src/big.bin", "s3://dst/big.bin")],
        "src_url string, dest_url string",
    )
    [r] = execute_moves(
        moves,
        client_factory=_make_fs_client_factory(root),
        multipart_threshold=100,
        part_bytes=300,
    ).collect()
    assert r["status"] == "copied_multipart"
    assert r["bytes_copied"] == len(payload)
    with open(os.path.join(root, "dst", "big.bin"), "rb") as f:
        assert f.read() == payload
    assert not glob.glob(os.path.join(root, "dst", "big.bin.part*"))


def test_execute_moves_delete_source_only_after_md5_verify(spark, tmp_path):
    import os

    from childhoodcancerdatainitiative_prefect_pipeline_spark.sources.s3 import (
        execute_moves,
    )

    root = str(tmp_path)
    _seed_store(
        root,
        {
            ("src", "m/a.txt"): b"aaaa",
            ("src", "m/b.txt"): b"bb",
            ("dst", "m/b.txt"): b"xx",  # same SIZE, stale bytes
            ("src", "m/c.txt"): b"cc",
            ("dst", "m/c.txt"): b"cc",  # genuine idempotent-restart skip
        },
    )
    moves = spark.createDataFrame(
        [
            ("s3://src/m/a.txt", "s3://dst/m/a.txt"),
            ("s3://src/m/b.txt", "s3://dst/m/b.txt"),
            ("s3://src/m/c.txt", "s3://dst/m/c.txt"),
            ("s3://src/m/gone.txt", "s3://dst/m/gone.txt"),
        ],
        "src_url string, dest_url string",
    )
    got = {
        r["src_url"]: r["status"]
        for r in execute_moves(
            moves,
            client_factory=_make_fs_client_factory(root),
            delete_source=True,
        ).collect()
    }
    assert got["s3://src/m/a.txt"] == "copied"
    assert got["s3://src/m/b.txt"] == "verify_failed"
    assert got["s3://src/m/c.txt"] == "skipped"
    assert got["s3://src/m/gone.txt"] == "failed"
    # md5-verified sources (fresh copy a, true skip c) are gone ...
    assert not os.path.exists(os.path.join(root, "src", "m", "a.txt"))
    assert not os.path.exists(os.path.join(root, "src", "m", "c.txt"))
    assert os.path.exists(os.path.join(root, "dst", "m", "a.txt"))
    # ... but a size-matched STALE destination must never cost the only
    # correct copy: src/m/b.txt survives and dst keeps its stale bytes
    # for verify_transfers to report (reference deletes only objects
    # that pass compare_md5sum_flow, workflows/file_mover_delete.py).
    assert os.path.exists(os.path.join(root, "src", "m", "b.txt"))
    with open(os.path.join(root, "dst", "m", "b.txt"), "rb") as f:
        assert f.read() == b"xx"


def test_verify_transfers_pass_fail_error(spark, tmp_path):
    from childhoodcancerdatainitiative_prefect_pipeline_spark.sources.s3 import (
        verify_transfers,
    )

    root = str(tmp_path)
    _seed_store(
        root,
        {
            ("src", "v/ok.bin"): b"same-bytes",
            ("dst", "v/ok.bin"): b"same-bytes",
            ("src", "v/bad.bin"): b"original!!",
            ("dst", "v/bad.bin"): b"corrupted!",  # same size, diff bytes
            ("src", "v/lost.bin"): b"never copied",
        },
    )
    moves = spark.createDataFrame(
        [
            ("s3://src/v/ok.bin", "s3://dst/v/ok.bin"),
            ("s3://src/v/bad.bin", "s3://dst/v/bad.bin"),
            ("s3://src/v/lost.bin", "s3://dst/v/lost.bin"),
        ],
        "src_url string, dest_url string",
    )
    got = {
        r["src_url"]: r["status"]
        for r in verify_transfers(
            moves, client_factory=_make_fs_client_factory(root), chunk_bytes=4
        ).collect()
    }
    assert got == {
        "s3://src/v/ok.bin": "Pass",
        "s3://src/v/bad.bin": "Fail",
        "s3://src/v/lost.bin": "Error",
    }


# ---------------------------------------------------------------------------
# WARC / archive intake (sources/warc.py)
# ---------------------------------------------------------------------------


def test_warc_roundtrip_and_record_fanout(spark):
    from childhoodcancerdatainitiative_prefect_pipeline_spark.sources.warc import (
        encode_warc,
        parse_warc,
        warc_records,
    )

    recs = [
        {"warc_type": "warcinfo", "body": b"software: t"},
        {"warc_type": "response", "target_uri": "http://a/x",
         "http_body": b"<p>hi</p>", "http_status": 200},
        {"warc_type": "response", "target_uri": "http://a/y",
         "http_body": b"gone", "http_status": 404},
        {"warc_type": "request", "target_uri": "http://a/x",
         "body": b"GET /x HTTP/1.1"},
    ]
    blob = encode_warc(recs)
    parsed = parse_warc(blob)
    assert [p["warc_type"] for p in parsed] == [
        "warcinfo", "response", "response", "request"
    ]
    assert parsed[1]["http_status"] == 200
    assert parsed[1]["body"] == b"<p>hi</p>"
    assert parsed[2]["http_status"] == 404
    assert parsed[3]["http_status"] is None  # non-HTTP record

    media = spark.createDataFrame(
        [(1, bytearray(blob)), (2, bytearray(b"not a warc"))],
        "warc_id long, payload binary",
    )
    rows = warc_records(media).collect()
    ok = [r for r in rows if r["warc_id"] == 1]
    assert len(ok) == 4 and all(r["parse_error"] is None for r in ok)
    assert {r["record_no"] for r in ok} == {0, 1, 2, 3}
    [bad] = [r for r in rows if r["warc_id"] == 2]
    assert bad["parse_error"] is not None and bad["record_no"] is None


def test_tar_and_zip_member_fanout(spark):
    import io
    import tarfile
    import zipfile

    from childhoodcancerdatainitiative_prefect_pipeline_spark.sources.warc import (
        tar_members,
        zip_members,
    )

    tbuf = io.BytesIO()
    with tarfile.open(fileobj=tbuf, mode="w:gz") as tf:
        for name, data in (("a/x.txt", b"one"), ("a/y.txt", b"two2")):
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    zbuf = io.BytesIO()
    with zipfile.ZipFile(zbuf, "w") as zf:
        zf.writestr("b/p.md", "three33")
        zf.writestr("b/sub/", "")  # directory entry: skipped

    tmedia = spark.createDataFrame(
        [(1, bytearray(tbuf.getvalue())), (2, bytearray(b"junk"))],
        "archive_id long, payload binary",
    )
    trows = {
        (r["archive_id"], r["member_name"]): r
        for r in tar_members(tmedia).collect()
    }
    assert bytes(trows[(1, "a/x.txt")]["body"]) == b"one"
    assert trows[(1, "a/y.txt")]["member_bytes"] == 4
    assert trows[(2, None)]["parse_error"] is not None

    zmedia = spark.createDataFrame(
        [(3, bytearray(zbuf.getvalue()))], "archive_id long, payload binary"
    )
    zrows = zip_members(zmedia).collect()
    assert len(zrows) == 1  # directory skipped
    assert bytes(zrows[0]["body"]) == b"three33"


# ---------------------------------------------------------------------------
# GDC chunked file upload (sources/gdc_upload.py) — the last reference
# workflow seam, closed with the injectable-transport pattern.  The
# fake transport records every PUT to the filesystem (surviving the
# executor boundary, like the S9 fs-backed store) so the tests can
# assert the exact part stream: ordering, adaptive sizing, retries,
# per-object isolation, skip triage.
# ---------------------------------------------------------------------------


def test_adaptive_part_bytes_reference_rule():
    from childhoodcancerdatainitiative_prefect_pipeline_spark.sources.gdc_upload import (
        adaptive_part_bytes,
    )

    mib = 1024 * 1024
    # small file: requested part size used as-is
    assert adaptive_part_bytes(10 * mib, 128) == 128 * mib
    # exactly at the 1000-part cap: unchanged
    assert adaptive_part_bytes(1000 * mib, 1) == 1 * mib
    # over the cap: round(size/1000/MiB) + 2 MiB (gdc_file_upload.py:240)
    big = 4000 * mib + 17
    assert adaptive_part_bytes(big, 1) == (round(big / 1000 / mib) + 2) * mib
    assert big / adaptive_part_bytes(big, 1) <= 1000


def _upload_fakes(root):
    """(source_factory, transport_factory): fs-backed object store +
    a transport journaling every put_part/finalize under <root>/tx."""
    import os

    def source_factory():
        class Source:
            def read_range(self, url, start, end):
                bucket, key = url.replace("s3://", "", 1).split("/", 1)
                with open(os.path.join(root, bucket, key), "rb") as f:
                    return f.read()[start : end + 1]

        return Source()

    def transport_factory():
        class Transport:
            def put_part(self, file_id, part_number, total_parts, data):
                if file_id == "flaky" and part_number == 2:
                    marker = os.path.join(root, "tx", "flaky-attempted")
                    if not os.path.exists(marker):
                        os.makedirs(os.path.dirname(marker), exist_ok=True)
                        open(marker, "wb").close()
                        raise ConnectionError("transient blip")
                if file_id == "doomed":
                    raise ConnectionError("endpoint down")
                p = os.path.join(
                    root, "tx", f"{file_id}.part{part_number:04d}of{total_parts}"
                )
                os.makedirs(os.path.dirname(p), exist_ok=True)
                with open(p, "wb") as f:
                    f.write(data)

            def finalize(self, file_id, total_parts):
                p = os.path.join(root, "tx", f"{file_id}.finalized")
                os.makedirs(os.path.dirname(p), exist_ok=True)
                with open(p, "w") as f:
                    f.write(str(total_parts))

        return Transport()

    return source_factory, transport_factory


def test_upload_files_chunked_parts_retries_skip_and_isolation(
    spark, tmp_path
):
    import glob
    import os

    from childhoodcancerdatainitiative_prefect_pipeline_spark.sources.gdc_upload import (
        upload_files_chunked,
    )

    root = str(tmp_path)
    payload = bytes(range(256)) * 4  # 1024 bytes
    _seed_store(
        root,
        {
            ("src", "u/a.bin"): payload,
            ("src", "u/b.bin"): b"tiny",
            ("src", "u/c.bin"): b"doomed-bytes",
        },
    )
    manifest = spark.createDataFrame(
        [
            ("flaky", "a.bin", "s3://src/u/a.bin", len(payload), ""),
            ("ok", "b.bin", "s3://src/u/b.bin", 4, ""),
            ("doomed", "c.bin", "s3://src/u/c.bin", 12, ""),
            ("prior", "d.bin", "s3://src/u/d.bin", 5, "already uploaded"),
            ("lost", "e.bin", "s3://src/u/e.bin", 9, ""),  # missing src
        ],
        "id string, file_name string, file_url string, "
        "file_size long, status string",
    )
    src_f, tx_f = _upload_fakes(root)
    got = {
        r["id"]: r
        for r in upload_files_chunked(
            manifest,
            source_factory=src_f,
            transport_factory=tx_f,
            part_size_mb=1,
            backoff=(0.0, 0.0, 0.0),  # fast retries in tests
        ).collect()
    }
    # part_size 1 MiB > file sizes -> single-part uploads; the flaky
    # part-2 case needs a multi-part file: re-run with a tiny part via
    # adaptive maths below.  Here: success + exact byte accounting.
    assert got["ok"]["status"] == "success"
    assert (got["ok"]["n_parts"], got["ok"]["bytes_sent"]) == (1, 4)
    assert got["prior"]["status"] == "skipped: already uploaded"
    assert got["doomed"]["status"].startswith("ERROR:")
    assert got["lost"]["status"].startswith("ERROR:")  # isolation
    assert got["flaky"]["status"] == "success"
    # transport journal: ok got exactly one part + finalize
    with open(os.path.join(root, "tx", "ok.part0001of1"), "rb") as f:
        assert f.read() == b"tiny"
    assert os.path.exists(os.path.join(root, "tx", "ok.finalized"))
    # doomed never finalized and wrote no parts
    assert not glob.glob(os.path.join(root, "tx", "doomed.part*"))
    assert not os.path.exists(os.path.join(root, "tx", "doomed.finalized"))


def test_upload_files_chunked_multipart_stream_and_retry(spark, tmp_path):
    import os

    from childhoodcancerdatainitiative_prefect_pipeline_spark.sources.gdc_upload import (
        upload_files_chunked,
    )

    root = str(tmp_path)
    payload = bytes((i * 7) % 256 for i in range(1024))
    _seed_store(root, {("src", "m/big.bin"): payload})
    manifest = spark.createDataFrame(
        [("flaky", "big.bin", "s3://src/m/big.bin", len(payload), "")],
        "id string, file_name string, file_url string, "
        "file_size long, status string",
    )
    src_f, tx_f = _upload_fakes(root)

    # part_bytes=300 forces 4 parts over the 1024-byte payload; the
    # fake transport fails part 2 once (ConnectionError) so the REST
    # retry path is exercised on a real multi-part stream
    [r] = upload_files_chunked(
        manifest,
        source_factory=src_f,
        transport_factory=tx_f,
        backoff=(0.0, 0.0),
        part_bytes=300,
    ).collect()
    assert r["status"] == "success"
    assert (r["n_parts"], r["bytes_sent"]) == (4, 1024)
    # reassemble the journaled parts -> byte-identical payload, and
    # the flaky part 2 was retried (marker exists) then delivered
    out = b"".join(
        open(
            os.path.join(root, "tx", f"flaky.part{n:04d}of4"), "rb"
        ).read()
        for n in range(1, 5)
    )
    assert out == payload
    assert os.path.exists(os.path.join(root, "tx", "flaky-attempted"))
    with open(os.path.join(root, "tx", "flaky.finalized")) as f:
        assert f.read() == "4"


# ---------------------------------------------------------------------------
# Scale replica (scale_replica.py) — the bench second-scale-point
# builder: key-shifted N× replication must preserve uniqueness and
# FK-link semantics, and reuse must be idempotent.
# ---------------------------------------------------------------------------


def test_scale_replica_key_shifts_and_reuse(spark, tmp_path):
    from childhoodcancerdatainitiative_prefect_pipeline_spark.scale_replica import (
        KEY_SHIFTS,
        ensure_replica,
    )

    src = "/root/testdata/sf0.001"
    dest = str(tmp_path / "sf2x")
    import childhoodcancerdatainitiative_prefect_pipeline_spark.scale_replica as sr

    built = ensure_replica(spark, src, dest, factor=2)
    assert built is True
    # idempotent reuse: second call touches nothing
    assert ensure_replica(spark, src, dest, factor=2) is False

    for name in ("orders", "lineitem", "region"):
        base = spark.read.parquet(f"{src}/{name}.parquet")
        rep = spark.read.parquet(f"{dest}/{name}.parquet")
        factor = 2 if KEY_SHIFTS.get(name) else 1
        assert rep.count() == base.count() * factor

    # key uniqueness survives the shift (o_orderkey unique per replica)
    o = spark.read.parquet(f"{dest}/orders.parquet")
    assert o.select("o_orderkey").distinct().count() == o.count()
    # FK link survives: every lineitem joins an order in BOTH replicas
    li = spark.read.parquet(f"{dest}/lineitem.parquet")
    joined = li.join(
        o, li["l_orderkey"] == o["o_orderkey"], "left_anti"
    ).count()
    assert joined == 0
    # FK link to a table with a DIFFERENT shift base survives: every
    # replica's orders must still reference existing customers, and
    # every event's user_id must still hit a customer (ADVICE r6 —
    # o_custkey/user_id shift by customer's base, not their own).
    c = spark.read.parquet(f"{dest}/customer.parquet")
    assert (
        o.join(c, o["o_custkey"] == c["c_custkey"], "left_anti").count() == 0
    )
    ev = spark.read.parquet(f"{dest}/events.parquet")
    base_ev = spark.read.parquet(f"{src}/events.parquet")
    base_c = spark.read.parquet(f"{src}/customer.parquet")
    # same unmatched fraction as the base data (user_ids outside the
    # customer range stay outside; in-range ones stay linked)
    base_unmatched = base_ev.join(
        base_c, base_ev["user_id"] == base_c["c_custkey"], "left_anti"
    ).count()
    assert (
        ev.join(c, ev["user_id"] == c["c_custkey"], "left_anti").count()
        == base_unmatched * 2
    )

    # factor mismatch forces a rebuild (never silently reuse a dest
    # built at a different scale point)
    assert ensure_replica(spark, src, dest, factor=3) is True
    o3 = spark.read.parquet(f"{dest}/orders.parquet")
    base_o = spark.read.parquet(f"{src}/orders.parquet")
    assert o3.count() == base_o.count() * 3
    assert ensure_replica(spark, src, dest, factor=3) is False


def test_salted_documents_realistic_dup_rate(spark, tmp_path):
    """The salted replica arm (VERDICT r8 item 4): per-replica word
    salting must (a) keep 1-in-k docs as exact cross-replica dups,
    (b) break cross-replica similarity for the rest (shingle sets
    disjoint), (c) preserve WITHIN-replica similarity structure
    exactly (the salt is a bijective token rename)."""
    import pyspark.sql.functions as SF

    from childhoodcancerdatainitiative_prefect_pipeline_spark.scale_replica import (
        ensure_salted_documents,
    )

    src = str(tmp_path / "base")
    # doc 0: kept (0 % 4 == 0); docs 1/2: planted near-dups; doc 3 odd
    spark.createDataFrame(
        [
            (0, "boilerplate terms of service apply to all pages"),
            (1, "the quick brown fox jumps over the lazy dog daily"),
            (2, "the quick brown fox jumps over the lazy cat daily"),
            (3, "completely unrelated text about rivers and owls"),
            (4, "another kept doc candidate but four mod four is zero"),
        ],
        ["doc_id", "text"],
    ).write.parquet(f"{src}/documents.parquet")

    dest = str(tmp_path / "salted")
    got = ensure_salted_documents(
        spark, src, dest, factor=3, keep_dup_one_in=4
    )
    assert got == dest
    # idempotent reuse
    assert ensure_salted_documents(
        spark, src, dest, factor=3, keep_dup_one_in=4
    ) == dest

    docs = spark.read.parquet(f"{dest}/documents.parquet")
    assert docs.count() == 15
    by_text = {
        r["text"]: r["n"]
        for r in docs.groupBy("text").agg(SF.count("*").alias("n")).collect()
    }
    # (a) kept docs (0, 4) appear verbatim in all 3 replicas
    assert by_text["boilerplate terms of service apply to all pages"] == 3
    assert (
        by_text["another kept doc candidate but four mod four is zero"] == 3
    )
    # (b) salted docs are unique strings (no cross-replica dups), and
    # replica-1/2 tokens never collide with base tokens
    assert all(
        n == 1 for t, n in by_text.items() if "~r" in t
    ) and sum("~r1" in t for t in by_text) == 3
    # (c) within-replica similarity preserved: the fox docs in replica
    # 1 still differ by exactly one token (dog~r1 vs cat~r1)
    r1 = {
        r["doc_id"]: r["text"].split()
        for r in docs.filter(
            (SF.col("doc_id") >= 1_000_001) & (SF.col("doc_id") <= 1_000_002)
        ).collect()
    }
    a, b = r1[1_000_001], r1[1_000_002]
    assert len(a) == len(b) and sum(x != y for x, y in zip(a, b)) == 1
    # non-document tables are symlinked so dest works as an sf_dir
    import os as _os

    assert not _os.path.exists(f"{dest}/orders.parquet") or _os.path.islink(
        f"{dest}/orders.parquet"
    )


def test_salted_documents_repoints_links_on_new_link_from(spark, tmp_path):
    """ADVICE r9: re-running with a different link_from must re-point
    existing symlinks (the marker records the link source), not keep
    stale links at the old scale point."""
    import os as _os

    from childhoodcancerdatainitiative_prefect_pipeline_spark.scale_replica import (
        ensure_salted_documents,
    )

    src_a = str(tmp_path / "a")
    src_b = str(tmp_path / "b")
    for s, okey in ((src_a, 1), (src_b, 2)):
        spark.createDataFrame(
            [(0, "terms of service"), (1, "a document about owls")],
            ["doc_id", "text"],
        ).write.parquet(f"{s}/documents.parquet")
        spark.createDataFrame([(okey, 1)], ["o_orderkey", "o_custkey"]).write.parquet(
            f"{s}/orders.parquet"
        )

    dest = str(tmp_path / "salted")
    ensure_salted_documents(spark, src_a, dest, factor=2, link_from=src_a)
    link = f"{dest}/orders.parquet"
    assert _os.path.islink(link)
    assert _os.readlink(link).startswith(_os.path.abspath(src_a))
    # same params, same link_from -> idempotent reuse (marker matches)
    ensure_salted_documents(spark, src_a, dest, factor=2, link_from=src_a)
    assert _os.readlink(link).startswith(_os.path.abspath(src_a))
    # new link_from -> marker mismatch -> rebuild re-points the link
    ensure_salted_documents(spark, src_a, dest, factor=2, link_from=src_b)
    assert _os.readlink(link).startswith(_os.path.abspath(src_b))
