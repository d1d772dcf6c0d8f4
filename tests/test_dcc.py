"""plans/dcc.py — DCC manifest GUID remap unit tests.

Mirrors src/join_tsv_to_manifest_dcc.py semantics: multi-valued
``;``-joined guid cells with stray spaces, unmapped guids → "",
null/blank cells → "", guid-column blanking, duplicate-guid
determinism, and the root-node fail-loud gate in dcc_node_order.
"""
from __future__ import annotations

import pytest

from childhoodcancerdatainitiative_prefect_pipeline_spark.plans.dcc import (
    build_guid_mapping,
    remap_guid_columns,
)
from childhoodcancerdatainitiative_prefect_pipeline_spark.sources.schema_render import (
    dcc_node_order,
)


@pytest.fixture(scope="module")
def mapping(spark):
    participant = spark.createDataFrame(
        [("g1", "p001"), ("g2 ", "p002")],  # trailing space must trim
        "guid string, participant_id string",
    )
    sample = spark.createDataFrame(
        [("g3", "s001"), (None, "s999"), ("g4", None)],
        "guid string, sample_id string",
    )
    return build_guid_mapping({"participant": participant, "sample": sample})


def test_mapping_trims_and_drops_null_pairs(mapping):
    got = {r["guid"]: r["node_id"] for r in mapping.collect()}
    assert got == {"g1": "p001", "g2": "p002", "g3": "s001"}


def test_mapping_requires_guid_and_id_column(spark):
    no_guid = spark.createDataFrame([("x",)], "study_id string")
    with pytest.raises(ValueError):
        build_guid_mapping({"study": no_guid})


def test_mapping_duplicate_guid_deterministic(spark):
    a = spark.createDataFrame([("g1", "zzz")], "guid string, a_id string")
    b = spark.createDataFrame([("g1", "aaa")], "guid string, b_id string")
    m = build_guid_mapping({"a": a, "b": b})
    assert m.collect() == m.collect()  # stable
    assert {r["node_id"] for r in m.collect()} == {"zzz"}  # max wins


def test_remap_multivalued_with_spaces_and_unmapped(spark, mapping):
    # ADVICE r04 regression: 'g1; g2 ;unknown' must remap to
    # 'p001;p002;' — each item whitespace-trimmed before lookup, not
    # passed through the two-arg TRIM(str, trimChars) form.
    df = spark.createDataFrame(
        [
            ("r1", "g1; g2 ;unknown", "own-guid"),
            ("r2", None, "own-guid"),
            ("r3", "", "own-guid"),
            ("r4", " ; ; ", "own-guid"),
            ("r5", "g3", "own-guid"),
        ],
        ["row_id", "participant.guid", "guid"],
    )
    out = {
        r["row_id"]: r
        for r in remap_guid_columns(df, mapping).collect()
    }
    assert out["r1"]["participant.participant_id"] == "p001;p002;"
    assert out["r2"]["participant.participant_id"] == ""
    assert out["r3"]["participant.participant_id"] == ""
    assert out["r4"]["participant.participant_id"] == ""
    assert out["r5"]["participant.participant_id"] == "s001"
    # consumed parent guid columns and the node's own guid are blanked
    for r in out.values():
        assert r["participant.guid"] == ""
        assert r["guid"] == ""


def test_remap_join_strategy_matches_map_path(spark, mapping):
    # the scale path (posexplode + broadcast hash join) must produce
    # byte-identical cells to the row-local map path — including the
    # null/blank collapse and the unmapped→"" rule (the 10x probe
    # caught the map path's O(|mapping|) element_at linear scan)
    from childhoodcancerdatainitiative_prefect_pipeline_spark.plans.dcc import (
        remap_guid_columns,
    )

    df = spark.createDataFrame(
        [
            ("r1", "g1; g2 ;unknown", "x"),
            ("r2", None, "x"),
            ("r3", "", "x"),
            ("r4", " ; ; ", "x"),
            ("r5", "g3;g1", "x"),
        ],
        ["row_id", "participant.guid", "guid"],
    )
    a = remap_guid_columns(df, mapping, strategy="map")
    b = remap_guid_columns(df, mapping, strategy="join")
    cols = sorted(a.columns)
    assert cols == sorted(b.columns)
    ka = sorted(tuple(r[c] for c in cols) for r in a.collect())
    kb = sorted(tuple(r[c] for c in cols) for r in b.collect())
    assert ka == kb
    with pytest.raises(ValueError):
        remap_guid_columns(df, mapping, strategy="nope")


def test_remap_multiple_parent_columns(spark, mapping):
    df = spark.createDataFrame(
        [("r1", "g1", "g3;g1")],
        ["row_id", "participant.guid", "sample.guid"],
    )
    (row,) = remap_guid_columns(df, mapping).collect()
    assert row["participant.participant_id"] == "p001"
    assert row["sample.sample_id"] == "s001;p001"
    assert row["participant.guid"] == "" and row["sample.guid"] == ""


def test_dcc_exampler_replaces_preexisting_linkage_column(spark):
    # a schema that already renders consent_group.consent_group_id must
    # get the column REPLACED by the sampled linkage, not duplicated —
    # df.drop() matches names literally, so the dotted (unbackticked)
    # form is required (regression for a silent-no-op drop)
    from childhoodcancerdatainitiative_prefect_pipeline_spark.plans.exampler import (
        generate_dcc_example_set,
    )
    from childhoodcancerdatainitiative_prefect_pipeline_spark.plans.rules import (
        NodeSchema,
        PropertyRule,
    )

    schemas = [
        NodeSchema(
            node="consent_group",
            rules=[PropertyRule("consent_group_id", type="string", key=True,
                                required=True)],
            key_props=["consent_group_id"],
        ),
        NodeSchema(
            node="participant",
            rules=[
                PropertyRule("participant_id", type="string", key=True,
                             required=True),
                PropertyRule("consent_group.consent_group_id", type="string"),
            ],
            key_props=["participant_id"],
        ),
    ]
    part = generate_dcc_example_set(spark, schemas, n_rows=10)["participant"]
    assert part.columns.count("consent_group.consent_group_id") == 1
    cg_ids = {
        r["consent_group_id"]
        for r in generate_dcc_example_set(spark, schemas, 10)[
            "consent_group"
        ].collect()
    }
    assert {
        r["consent_group.consent_group_id"] for r in part.collect()
    } <= cg_ids


def test_dcc_node_order_prefers_root_then_study(monkeypatch):
    order = dcc_node_order(
        ["sample", "study_admin", "study", "participant"],
        {
            "sample": ["participant"],
            "participant": ["study"],
            "study_admin": ["study"],
            "study": [],
        },
    )
    assert order[0] == "study"
    assert order[1] == "study_admin"
    assert sorted(order) == ["participant", "sample", "study", "study_admin"]


def test_dcc_postprocess_filters(spark):
    from childhoodcancerdatainitiative_prefect_pipeline_spark.plans.dcc import (
        dcc_postprocess_node,
    )

    diag = spark.createDataFrame(
        [("d1", "Neoplasm, uncertain whether benign or malignant#Neoplasm, NOS"),
         ("d2", "Glioma"), ("d3", None)],
        ["diagnosis_id", "submitted_diagnosis"],
    )
    got = {
        r["diagnosis_id"]: r["submitted_diagnosis"]
        for r in dcc_postprocess_node("diagnosis", diag, "__o__").collect()
    }
    assert got == {"d1": "Neoplasm, NOS", "d2": "Glioma", "d3": None}

    resp = spark.createDataFrame(
        [("r1", "Not Reported"), ("r2", "CR"), ("r3", None)],
        ["id", "response"],
    )
    kept = {r["id"] for r in
            dcc_postprocess_node("treatment_response", resp, "__o__").collect()}
    assert kept == {"r2", "r3"}  # null-safe keep, 'Not Reported' dropped

    surg = spark.createDataFrame(
        [("s1", "Not Applicable"), ("s2", "Resection"), ("s3", None), ("s4", "")],
        ["id", "surgery_type"],
    )
    kept = {r["id"] for r in
            dcc_postprocess_node("treatment_surgery", surg, "__o__").collect()}
    assert kept == {"s2", "s3", "s4"}

    passthrough = dcc_postprocess_node("sample", surg, "__o__")
    assert passthrough.collect() == surg.collect()


def test_dcc_postprocess_chemotherapy_merge(spark):
    from childhoodcancerdatainitiative_prefect_pipeline_spark.plans.dcc import (
        dcc_postprocess_node,
    )

    rows = [
        # key, ctype, agent, ttype, ord — group tc1 merges 3 rows
        ("tc1", "ct1", "a;b", "t1", "1"),
        ("tc1", "ct1", "b;;c", None, "2"),   # empty item dropped, null ttype
        ("tc1", None, "zzz", "tX", "0"),     # null type row dropped pre-merge
        ("tc2", "ct2", None, "t2", "3"),     # null agent → ""
    ]
    df = spark.createDataFrame(
        rows,
        ["treatment_chemotherapy_id", "chemotherapy_type",
         "chemotherapy_agent", "treatment_type", "__ord__"],
    )
    got = {
        r["treatment_chemotherapy_id"]: r
        for r in dcc_postprocess_node(
            "treatment_chemotherapy", df, "__ord__"
        ).collect()
    }
    assert set(got) == {"tc1", "tc2"}
    # first-occurrence set union across the group in __ord__ order
    assert got["tc1"]["chemotherapy_agent"] == "a;b;c"
    # pandas-"first" = first NON-null in order (ord "1" has t1)
    assert got["tc1"]["treatment_type"] == "t1"
    assert got["tc1"]["chemotherapy_type"] == "ct1"
    assert got["tc2"]["chemotherapy_agent"] == ""


def test_dcc_exampler_caps_and_linkage(spark):
    from childhoodcancerdatainitiative_prefect_pipeline_spark.plans.exampler import (
        generate_dcc_example_set,
    )
    from childhoodcancerdatainitiative_prefect_pipeline_spark.plans.rules import (
        NodeSchema,
        PropertyRule,
    )

    schemas = [
        NodeSchema(
            node="consent_group",
            rules=[PropertyRule("consent_group_id", type="string", key=True,
                                required=True)],
            key_props=["consent_group_id"],
        ),
        NodeSchema(
            node="study_status",
            rules=[PropertyRule("study_status_id", type="string", key=True,
                                required=True)],
            key_props=["study_status_id"],
        ),
        NodeSchema(
            node="participant",
            rules=[PropertyRule("participant_id", type="string", key=True,
                                required=True)],
            key_props=["participant_id"],
        ),
    ]
    nodes = generate_dcc_example_set(spark, schemas, n_rows=50)
    assert nodes["study_status"].count() == 1      # DCC cap
    assert nodes["consent_group"].count() == 2     # DCC cap
    part = nodes["participant"]
    assert part.count() == 50
    assert "consent_group.consent_group_id" in part.columns
    cg_ids = {r["consent_group_id"] for r in nodes["consent_group"].collect()}
    linked = {
        r["consent_group.consent_group_id"] for r in part.collect()
    }
    assert linked <= cg_ids and linked  # sampled from generated ids
    # deterministic across reruns (seeded)
    again = generate_dcc_example_set(spark, schemas, n_rows=50)
    assert sorted(part.collect()) == sorted(again["participant"].collect())


def test_dcc_node_order_raises_without_root():
    # cyclic parents: the reference's _get_sorted_node_list asserts on
    # the [None] root; we must fail loud too, not silently reorder.
    with pytest.raises(ValueError, match="root"):
        dcc_node_order(["a", "b"], {"a": ["b"], "b": ["a"]})
