"""TabBreaker plan semantics (src/s3_ccdi_to_tabbreakery.py:45-142)."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from childhoodcancerdatainitiative_prefect_pipeline_spark.functions.ids import (
    uuid5_namespace,
)
from childhoodcancerdatainitiative_prefect_pipeline_spark.plans.tabbreaker import (
    break_node,
    keep_sheet,
    tabbreaker,
)


def _sheets(spark):
    participant = spark.createDataFrame(
        [("PCT_1", "Male"), (None, "Female"), ("PCT_3", None)],
        ["participant_id", "sex_at_birth"],
    )
    sample = spark.createDataFrame(
        [("SMP_1", "PCT_1", "tissue"), ("SMP_2", None, "blood")],
        ["sample_id", "participant.participant_id", "sample_type"],
    )
    empty = spark.createDataFrame(
        [(None, None)], "diagnosis_id string, diagnosis string"
    )
    return {"participant": participant, "sample": sample, "diagnosis": empty}


def test_break_node_uuid5_matches_reference_mint(spark):
    """id == uuid.uuid5(md5('ccdi') ns, 'study::node::key') bit-exactly
    (s3_ccdi_to_tabbreakery.py:11-38)."""
    sheets = _sheets(spark)
    out = break_node(
        sheets["participant"], "participant", "phs000123", "participant_id"
    ).collect()
    ns = uuid5_namespace("ccdi")
    by_key = {r["participant_id"]: r for r in out}
    assert by_key["PCT_1"]["id"] == str(
        uuid.uuid5(ns, "phs000123::participant::PCT_1")
    )
    assert by_key[None]["id"] is None  # null key passes through
    assert all(r["type"] == "participant" for r in out)


def test_break_node_link_surgery(spark):
    """parent.parent_id → parent.id mint + redundant column drop
    (s3_ccdi_to_tabbreakery.py:96-120)."""
    sheets = _sheets(spark)
    out = break_node(sheets["sample"], "sample", "phs000123", "sample_id")
    assert "participant.participant_id" not in out.columns
    assert "participant.id" in out.columns
    rows = {r["sample_id"]: r for r in out.collect()}
    ns = uuid5_namespace("ccdi")
    # the link id is minted under the PARENT node's label
    assert rows["SMP_1"]["participant.id"] == str(
        uuid.uuid5(ns, "phs000123::participant::PCT_1")
    )
    assert rows["SMP_2"]["participant.id"] is None
    # the sample's own surrogate key under its own label
    assert rows["SMP_1"]["id"] == str(uuid.uuid5(ns, "phs000123::sample::SMP_1"))


def test_tabbreaker_prunes_empty_and_link_only_sheets(spark):
    sheets = _sheets(spark)
    broken = tabbreaker(
        sheets,
        study_id="phs000123",
        keys={
            "participant": "participant_id",
            "sample": "sample_id",
            "diagnosis": "diagnosis_id",
        },
    )
    assert set(broken) == {"participant", "sample"}  # all-null sheet dropped
    # a sheet whose content is exclusively dotted linking columns is dropped
    assert not keep_sheet(
        spark.createDataFrame([("a",)], ["participant.alt"]).select(
            F.lit("x").alias("type"), F.col("`participant.alt`")
        ),
        "x",
    )


def test_break_node_plan_is_shuffle_free(spark):
    sheets = _sheets(spark)
    plan = break_node(
        sheets["sample"], "sample", "phs000123", "sample_id"
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_two_links_to_same_parent_last_write_wins(spark):
    """Two dotted columns for one parent both target parent.id — keep
    the LAST mint (pandas column-assignment semantics), never emit
    duplicate column names."""
    sheet = spark.createDataFrame(
        [("S1", "PCT_A", "PCT_B")],
        "sample_id string, `participant.participant_id` string, "
        "`participant.alt_id` string",
    )
    out = break_node(sheet, "sample", "phs1", "sample_id")
    assert out.columns.count("participant.id") == 1
    ns = uuid5_namespace("ccdi")
    got = out.collect()[0]["participant.id"]
    assert got == str(uuid.uuid5(ns, "phs1::participant::PCT_B"))


def test_dcc_variant_multivalue_mint(spark):
    """DCC TabBreaker (src/dcc_tabbreaker.py:12-41): ccdi-dcc
    namespace, per-item mint of ';'-delimited values with trim,
    rejoined by ';' — bit-exact with the reference's get_dcc_uuid."""
    sheet = spark.createDataFrame(
        [("S1", "PCT_A; PCT_B"), ("S2", "PCT_C")],
        "sample_id string, `participant.participant_id` string",
    )
    out = break_node(
        sheet, "sample", "phs9", "sample_id",
        seed="ccdi-dcc", multi_value=True,
    )
    rows = {r["sample_id"]: r for r in out.collect()}
    ns = uuid5_namespace("ccdi-dcc")

    def ref(vals):
        return ";".join(
            str(uuid.uuid5(ns, f"phs9::participant::{v.strip()}"))
            for v in vals.split(";")
        )

    assert rows["S1"]["participant.id"] == ref("PCT_A; PCT_B")
    assert rows["S2"]["participant.id"] == ref("PCT_C")
    assert rows["S1"]["id"] == str(uuid.uuid5(ns, "phs9::sample::S1"))
