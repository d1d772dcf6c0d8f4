"""Structured Streaming over the events stream (SURVEY.md §2.15).

The reference is strictly batch; streaming is the engine's additive
capability.  The transforms are written against a *DataFrame* (batch
or stream alike), so the same function is:

- unit-testable in batch and oracle-checkable in SQL, and
- attachable to ``readStream`` with watermarks for production.

Natural production source: incremental S3-inventory reconciliation
(the S6/J6 workload) — new inventory files arrive as a file stream,
each micro-batch anti-joins against the manifest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamWriter


def _as_event_time(df: DataFrame, ts_col: str) -> DataFrame:
    """Coerce the event-time column to TIMESTAMP (LTZ).

    Watermarks and ``window``/``session_window`` event time require
    TIMESTAMP; the driver's events.parquet carries TIMESTAMP(NANOS),
    which Spark 4.x reads natively as TIMESTAMP_NTZ.  The cast is a
    no-op for LTZ input and value-preserving for NTZ under the
    engine's UTC session timezone (session.py ENGINE_CONF).
    """
    return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))


def tumbling_rollup(
    events: DataFrame,
    window_size: str = "1 hour",
    ts_col: str = "ts",
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling-window rollup: counts, users, exact value sums.

    In streaming mode pass ``watermark`` (e.g. "2 hours") so late
    rows beyond the bound are dropped and state is reclaimed; in
    batch mode leave it None and the same plan runs as a group-by.
    """
    src = _as_event_time(events, ts_col)
    if watermark is not None:
        src = src.withWatermark(ts_col, watermark)
    return src.groupBy(
        F.window(F.col(ts_col), window_size).alias("win"), F.col("event_type")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
    ).select(
        F.col("win.start").alias("window_start"),
        F.col("win.end").alias("window_end"),
        "event_type",
        "n_events",
        "approx_users",
        "total_value",
    )


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Session windows per user (gap-based), streaming-native."""
    return (
        _as_event_time(events, ts_col)
        .withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("sess"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("session_value"),
        )
        .select(
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "user_id",
            "n_events",
            "session_value",
        )
    )


def streaming_dedup(
    events: DataFrame,
    keys: list[str] | None = None,
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stateful exact dedup within the watermark horizon.

    ``dropDuplicates`` on a watermarked stream keeps state only for
    the horizon — the streaming rendering of A9.
    """
    return _as_event_time(events, ts_col).withWatermark(
        ts_col, watermark
    ).dropDuplicates(keys or ["event_id"])


def start_console_sink(df: DataFrame, mode: str = "update") -> DataStreamWriter:
    """Debug sink helper (not used by the engine's own tests)."""
    return df.writeStream.outputMode(mode).format("console")


def running_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator: cumulative per-user counters across
    micro-batches via ``applyInPandasWithState``.

    This is the engine's escape hatch for stateful logic Spark's
    built-in windows can't express (the §2.14 "UDTF-like" tier):
    per-group state (event count, value sum, last-seen timestamp)
    persists in the state store and updates as batches arrive.
    State is bounded by processing-time timeout so idle users are
    evicted — the 100 TB-scale requirement for unbounded keyspaces.
    """
    import pandas as pd  # arrow-batched; never row-at-a-time
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    output_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_events", LongType()),
            StructField("total_value", DoubleType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("n_events", LongType()),
            StructField("total_value", DoubleType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        state.setTimeoutDuration(3600 * 1000)  # evict idle users after 1 h
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=output_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
