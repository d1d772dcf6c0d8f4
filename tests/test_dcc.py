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


def test_remap_multiple_parent_columns(spark, mapping):
    df = spark.createDataFrame(
        [("r1", "g1", "g3;g1")],
        ["row_id", "participant.guid", "sample.guid"],
    )
    (row,) = remap_guid_columns(df, mapping).collect()
    assert row["participant.participant_id"] == "p001"
    assert row["sample.sample_id"] == "s001;p001"
    assert row["participant.guid"] == "" and row["sample.guid"] == ""


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


def test_dcc_node_order_raises_without_root():
    # cyclic parents: the reference's _get_sorted_node_list asserts on
    # the [None] root; we must fail loud too, not silently reorder.
    with pytest.raises(ValueError, match="root"):
        dcc_node_order(["a", "b"], {"a": ["b"], "b": ["a"]})
