"""Streaming failure recovery (VERDICT r7 item 7): kill a checkpointed
query mid-batch, restart it, and assert exactly-once output vs the
batch twin.

The crash is simulated the way Structured Streaming actually fails:
after a clean stop, the LAST commit marker is deleted from the
checkpoint (``commits/<epoch>``) while its offset log entry survives —
the on-disk state of a driver killed after writing offsets but before
committing the batch.  On restart Spark REPLAYS that micro-batch with
the same ``batch_id``; the ``idempotent_batch_writer`` sink
(streaming/events.py:221) overwrites the same ``batch_id=N`` directory,
so the replay is a no-op and the total output is exactly-once.

Reference parity note: the reference pipeline has no streaming story
at all (its closest analogue is re-runnable Prefect flows,
workflows/*.py); these tests pin the additive §2.15 surface's declared
recovery contract.
"""

from __future__ import annotations

import datetime
import os

from pyspark.sql import functions as F

from childhoodcancerdatainitiative_prefect_pipeline_spark.streaming.events import (
    idempotent_batch_writer,
    streaming_dedup,
)

COLS = ["event_id", "ts", "user_id", "event_type", "value"]


def _events(spark, rows):
    return spark.createDataFrame(rows, COLS)


def _ts(h, m=0):
    return datetime.datetime(2024, 1, 1, 0, 0, 0) + datetime.timedelta(
        hours=h, minutes=m
    )


def _simulate_kill_after_offsets(checkpoint: str) -> int:
    """Delete the newest commit marker, keeping its offsets entry —
    the exact checkpoint state of a driver killed mid-batch.  Returns
    the batch id that will be replayed on restart."""
    commits = os.path.join(checkpoint, "commits")
    epochs = [int(f) for f in os.listdir(commits) if f.isdigit()]
    assert epochs, "no committed batch to kill"
    last = max(epochs)
    os.remove(os.path.join(commits, str(last)))
    # the local ChecksumFs keeps a sidecar .N.crc; a real HDFS crash
    # loses both, and a stale crc makes the commit rewrite fail
    crc = os.path.join(commits, f".{last}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    return last


def test_stateful_dedup_kill_restart_exactly_once(spark, tmp_path):
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    checkpoint = str(tmp_path / "ckpt")

    # Batch A: dupes within the batch (event 1) and a unique row.
    part_a = [
        (1, _ts(0), 10, "click", 1.0),
        (1, _ts(0), 10, "click", 1.0),
        (2, _ts(0, 30), 11, "view", 2.0),
    ]
    # Batch B (after the "crash"): a replay-window dupe of event 2
    # (must be suppressed by restored state) plus two new events.
    part_b = [
        (2, _ts(0, 30), 11, "view", 2.0),
        (3, _ts(0, 40), 12, "click", 3.0),
        (4, _ts(0, 50), 13, "view", 4.0),
    ]

    def start():
        stream = spark.readStream.schema(
            _events(spark, part_a).schema
        ).parquet(src)
        return (
            streaming_dedup(stream, watermark="1 hour")
            .writeStream.foreachBatch(idempotent_batch_writer(sink))
            .option("checkpointLocation", checkpoint)
            .outputMode("append")
            .start()
        )

    _events(spark, part_a).write.mode("append").parquet(src)
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    replayed = _simulate_kill_after_offsets(checkpoint)

    _events(spark, part_b).write.mode("append").parquet(src)
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    out = spark.read.parquet(sink)
    ids = [r["event_id"] for r in out.select("event_id").collect()]
    # exactly-once: every id exactly once despite the replayed batch
    assert sorted(ids) == [1, 2, 3, 4]
    # the replayed batch_id directory exists exactly once (overwritten)
    batch_dirs = [d for d in os.listdir(sink) if d.startswith("batch_id=")]
    assert f"batch_id={replayed}" in batch_dirs
    # batch twin: dropDuplicates over the full input
    batch_twin = (
        _events(spark, part_a + part_b).dropDuplicates(["event_id"]).count()
    )
    assert out.count() == batch_twin


def test_sliding_rollup_kill_restart_matches_batch(spark, tmp_path):
    """Append-mode sliding rollup (2h window / 1h slide, the
    stream_sliding_rollup shape) across a kill-and-restart: finalized
    windows after recovery equal the batch group-by over all data."""
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    checkpoint = str(tmp_path / "ckpt")

    part_a = [
        (1, _ts(0, 10), 10, "click", 1.0),
        (2, _ts(1, 20), 11, "click", 2.0),
        (3, _ts(2, 40), 12, "view", 3.0),
    ]
    part_b = [
        (4, _ts(3, 15), 13, "view", 4.0),
        (5, _ts(3, 45), 14, "click", 5.0),
    ]
    # flush events: advance the watermark far enough to finalize every
    # real window.  Two files → two micro-batches, because append-mode
    # emission uses the watermark computed from the PREVIOUS batch.
    flush_1 = [(900, _ts(100), 99, "flush", 0.0)]
    flush_2 = [(901, _ts(101), 99, "flush", 0.0)]

    def rollup(df):
        return (
            df.withColumn("ts", F.col("ts").cast("timestamp"))
            .withWatermark("ts", "1 hour")
            .groupBy(
                F.window("ts", "2 hours", "1 hour").alias("win"),
                "event_type",
            )
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(F.col("value").cast("decimal(18,4)"))
                .cast("double")
                .alias("total_value"),
            )
            .select(
                F.col("win.start").alias("window_start"),
                "event_type",
                "n_events",
                "total_value",
            )
        )

    def start():
        stream = spark.readStream.schema(
            _events(spark, part_a).schema
        ).parquet(src)
        return (
            rollup(stream)
            .writeStream.foreachBatch(idempotent_batch_writer(sink))
            .option("checkpointLocation", checkpoint)
            .outputMode("append")
            .start()
        )

    _events(spark, part_a).write.mode("append").parquet(src)
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    _simulate_kill_after_offsets(checkpoint)

    q = start()
    try:
        q.processAllAvailable()  # replay of batch A's micro-batch
        for part in (part_b, flush_1, flush_2):
            _events(spark, part).write.mode("append").parquet(src)
            q.processAllAvailable()
    finally:
        q.stop()

    streamed = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.read.parquet(sink)
        .filter(F.col("event_type") != "flush")
        .collect()
    }
    # batch twin over everything but the flush rows; a batch group-by
    # has no watermark, so no window is withheld.
    twin = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in rollup(
            _events(spark, part_a + part_b)
        ).collect()
    }
    assert streamed == twin
    # every (window, type) emitted exactly once across all batch dirs
    dupes = (
        spark.read.parquet(sink)
        .groupBy("window_start", "event_type")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert dupes == 0
