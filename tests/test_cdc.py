"""CDC apply semantics (operators/cdc.py)."""

from __future__ import annotations

from childhoodcancerdatainitiative_prefect_pipeline_spark.operators.cdc import (
    apply_changelog,
    collapse_changelog,
)

SNAP_SCHEMA = "k long, v string"
CH_SCHEMA = "k long, seq long, op string, v string"


def _snap(spark, rows):
    return spark.createDataFrame(rows, SNAP_SCHEMA)


def _ch(spark, rows):
    return spark.createDataFrame(rows, CH_SCHEMA)


def _result(df):
    return {r["k"]: r["v"] for r in df.collect()}


def test_merge_paths(spark):
    snap = _snap(spark, [(1, "a"), (2, "b"), (3, "c"), (4, "d")])
    ch = _ch(
        spark,
        [
            (1, 1, "U", "a2"),          # simple update
            (2, 1, "U", "b2"),
            (2, 2, "D", None),           # delete after update
            (3, 1, "D", None),
            (3, 2, "I", "c-back"),       # re-insert after delete
            (5, 1, "I", "e"),            # brand-new key
            (4, 1, "I", "d-upsert"),     # insert replayed on existing key
        ],
    )
    got = _result(apply_changelog(snap, ch, ["k"]))
    assert got == {1: "a2", 3: "c-back", 4: "d-upsert", 5: "e"}


def test_replay_idempotent(spark):
    snap = _snap(spark, [(1, "a"), (2, "b")])
    ch = _ch(spark, [(1, 1, "U", "a2"), (2, 1, "D", None), (3, 2, "I", "c")])
    once = apply_changelog(snap, ch, ["k"])
    twice = apply_changelog(once, ch, ["k"])
    assert _result(once) == _result(twice) == {1: "a2", 3: "c"}


def test_same_seq_tie_breaks_by_op_precedence(spark):
    ch = _ch(spark, [(1, 1, "U", "u"), (1, 1, "D", None), (1, 1, "I", "i")])
    last = collapse_changelog(ch, ["k"]).collect()[0]
    assert last["op"] == "D"  # D > U > I at equal seq — replay-stable


def test_collapse_is_aggregation_not_window(spark):
    ch = _ch(spark, [(1, s, "U", f"v{s}") for s in range(10)])
    plan = (
        collapse_changelog(ch, ["k"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan  # max_by-style agg; map-side combinable
    assert "HashAggregate" in plan or "SortAggregate" in plan
