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


def test_streaming_cdc_snapshot_maintainer(spark, tmp_path):
    """A changelog STREAM maintained via foreachBatch equals the batch
    apply of the full changelog, and replaying a batch id is a no-op
    (per-batch-id overwrite idempotence)."""
    from childhoodcancerdatainitiative_prefect_pipeline_spark.streaming.events import (
        cdc_snapshot_maintainer,
        read_latest_snapshot,
    )

    src = str(tmp_path / "chlog")
    snap = str(tmp_path / "snap")
    ckpt = str(tmp_path / "ckpt")

    b1 = spark.createDataFrame(
        [(1, 1, "I", "a"), (2, 1, "I", "b"), (3, 1, "I", "c")], CH_SCHEMA
    )
    b1.write.mode("overwrite").parquet(src)
    writer = cdc_snapshot_maintainer(snap, ["k"])

    def run_once():
        q = (
            spark.readStream.schema(b1.schema)
            .parquet(src)
            .writeStream.foreachBatch(writer)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run_once()
    s1 = read_latest_snapshot(spark, snap)
    assert _result(s1) == {1: "a", 2: "b", 3: "c"}

    b2 = spark.createDataFrame(
        [(2, 2, "D", None), (3, 2, "U", "c2"), (4, 2, "I", "d")], CH_SCHEMA
    )
    b2.write.mode("append").parquet(src)
    run_once()  # resume from the same checkpoint → one more batch
    s2 = read_latest_snapshot(spark, snap)
    assert _result(s2) == {1: "a", 3: "c2", 4: "d"}

    # crash-replay simulation: re-invoke the foreachBatch callable with
    # the same (batch_df, batch_id) — the snapshot must not change
    import os
    import re

    last_id = max(
        int(re.fullmatch(r"batch_id=(\d+)", d).group(1))
        for d in os.listdir(snap)
        if re.fullmatch(r"batch_id=(\d+)", d)
    )
    writer(b2, last_id)
    assert _result(read_latest_snapshot(spark, snap)) == {1: "a", 3: "c2", 4: "d"}


def test_cdc_merge_on_bucketed_tables_is_shuffle_free(spark, tmp_path):
    """The 100 TB CDC shape: snapshot and collapsed changelog both
    bucketed on the key -> the merge join runs with ZERO exchanges
    (broadcast disabled to force the bucket path)."""
    from childhoodcancerdatainitiative_prefect_pipeline_spark.operators.cdc import (
        collapse_changelog,
    )
    from childhoodcancerdatainitiative_prefect_pipeline_spark.sources.files import (
        write_bucketed_table,
    )
    from pyspark.sql import functions as F

    snap = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") % 7).cast("string").alias("v")
    )
    ch = spark.range(0, 200).select(
        F.col("id").alias("k"),
        F.lit(1).alias("seq"),
        F.when(F.col("id") % 3 == 0, "D").otherwise("U").alias("op"),
        F.lit("nv").alias("v"),
    )
    last = collapse_changelog(ch, ["k"])
    spark.sql("DROP TABLE IF EXISTS b_snap")
    spark.sql("DROP TABLE IF EXISTS b_delta")
    write_bucketed_table(
        snap, "b_snap", bucket_by=["k"], n_buckets=4,
        path=str(tmp_path / "b_snap"),
    )
    write_bucketed_table(
        last, "b_delta", bucket_by=["k"], n_buckets=4,
        path=str(tmp_path / "b_delta"),
    )
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bsnap = spark.table("b_snap")
        bdelta = spark.table("b_delta").select(
            "k",
            F.col("op").alias("__op__"),
            F.col("v").alias("__new_v__"),
        )
        merged = (
            bsnap.join(bdelta, "k", "full_outer")
            .filter(F.col("__op__").isNull() | (F.col("__op__") != "D"))
            .select(
                "k",
                F.when(F.col("__op__").isNotNull(), F.col("__new_v__"))
                .otherwise(F.col("v"))
                .alias("v"),
            )
        )
        plan = merged._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        # and the merge itself is still correct
        out = {r["k"]: r["v"] for r in merged.collect()}
        assert len(out) == 1000 - 67  # 67 deletes in 0..199 step 3
        assert out[1] == "nv" and out[500] == str(500 % 7)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)


def test_attribution_left_outer_emits_unconverted_triggers(spark, tmp_path):
    """Stream-stream LEFT OUTER: matched pairs emit immediately;
    unmatched triggers emit with null outcome once the watermark
    passes their horizon.  Batch mode = plain left join (equivalence
    of the matched+unmatched multiset)."""
    from pyspark.sql import functions as SF

    from childhoodcancerdatainitiative_prefect_pipeline_spark.streaming.events import (
        attribution_join,
    )

    rows = [
        # user 1: click then purchase inside the horizon
        (1, "2024-01-01 00:00:00", 1, "click", 0.0),
        (2, "2024-01-01 00:20:00", 1, "purchase", 9.0),
        # user 2: click with NO purchase — must surface as unconverted
        (3, "2024-01-01 00:05:00", 2, "click", 0.0),
    ]
    # keep BOTH event types flowing: the type filters push below the
    # watermark node, so each branch's watermark advances only with
    # its own type (see attribution_join docstring)
    late = [
        (99, "2024-01-02 00:00:00", 9, "click", 0.0),
        (98, "2024-01-02 00:00:01", 8, "purchase", 1.0),
    ]
    schema = "event_id long, ts string, user_id long, event_type string, value double"

    def mk(df_rows):
        return spark.createDataFrame(df_rows, schema).select(
            "event_id", SF.col("ts").cast("timestamp").alias("ts"),
            "user_id", "event_type", "value",
        )

    # batch equivalence first
    batch = attribution_join(mk(rows + late), how="left_outer")
    got = {(r["trigger_id"], r["outcome_id"]) for r in batch.collect()}
    assert {(1, 2), (3, None)} <= got  # late fillers add their own rows

    # real stream
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    mk(rows).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(mk(rows).schema).parquet(src)
    q = (
        attribution_join(stream, how="left_outer")
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        mk(late).write.mode("append").parquet(src)
        q.processAllAvailable()
        # outer-null emission happens in a micro-batch AFTER the
        # watermark advances, and a batch only runs when there is new
        # data — feed one more far-future event to drive it
        mk(
            [
                (100, "2024-01-03 00:00:00", 9, "click", 0.0),
                (101, "2024-01-03 00:00:01", 8, "purchase", 1.0),
            ]
        ).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()
    out = {
        (r["trigger_id"], r["outcome_id"])
        for r in spark.read.parquet(sink).collect()
    }
    assert (1, 2) in out
    assert (3, None) in out  # unconverted trigger emitted post-watermark


def test_vacuum_snapshots_keeps_complete_recent(spark, tmp_path):
    import os

    from childhoodcancerdatainitiative_prefect_pipeline_spark.streaming.events import (
        read_latest_snapshot,
        vacuum_snapshots,
    )

    snap = str(tmp_path / "snap")
    for n in (0, 1, 2, 3):
        spark.createDataFrame([(n, "v")], "k long, v string").write.mode(
            "overwrite"
        ).parquet(f"{snap}/batch_id={n}")
    # batch 4: incomplete (no _SUCCESS) crash debris
    os.makedirs(f"{snap}/batch_id=4")
    deleted = vacuum_snapshots(spark, snap, keep_last=2)
    assert deleted == [0, 1]  # 2,3 kept; 4 newer than newest kept → left
    assert read_latest_snapshot(spark, snap).collect()[0]["k"] == 3
    remaining = sorted(os.listdir(snap))
    assert remaining == ["batch_id=2", "batch_id=3", "batch_id=4"]
