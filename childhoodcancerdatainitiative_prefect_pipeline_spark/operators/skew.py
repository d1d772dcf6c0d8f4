"""Skew handling for large joins (SURVEY.md §4, BASELINE north star).

The reference never joins at a scale where skew matters (worker-tier
memory is its only knob, Deployment_README.md:70-104); at 100 TB a
handful of hot keys (one study holding half the files, one
``file_type`` dominating) can stall a shuffle join on a single task.

First line of defense is AQE's skew-join splitting
(``spark.sql.adaptive.skewJoin.enabled``, on in session.py) — it
splits oversized *partitions*.  Salting is the explicit fallback for
the case AQE can't fix: a single *key* too hot for one task, joined
against a side too large to broadcast.  The build side is replicated
``n_salts`` times, the probe side gets a deterministic salt from its
row content, and the join key becomes (key, salt) — spreading each
hot key over ``n_salts`` tasks at the cost of replicating the build
side.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt__"


def top_skewed_keys(
    df: DataFrame, keys: Sequence[str], min_share: float = 0.01, max_keys: int = 100
) -> DataFrame:
    """Profile helper: keys carrying ≥ ``min_share`` of all rows.

    One aggregation pass; at 100 TB run it on a sample
    (``df.sample(0.001)``) — heavy hitters survive sampling by
    definition.
    """
    total = df.count()
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .withColumn("share", F.col("n_rows") / F.lit(float(total)))
        .filter(F.col("share") >= min_share)
        .orderBy(F.desc("n_rows"), *keys)  # full tie-break: deterministic
        .limit(max_keys)
    )


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    keys: Sequence[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the build side replicated over ``n_salts`` salts.

    ``probe`` (the big, skewed side) gets a deterministic salt from a
    hash of its full row, so re-runs produce identical distributions
    and no RNG appears in the plan.  ``build`` is exploded once per
    salt value — keep it the smaller side.  Result columns match
    ``probe.join(build, keys, how)`` exactly; a unit test asserts
    equality against the unsalted join.

    Only 'inner' and 'left' are meaningful here: right/full outer
    would see the build side's replicas as distinct rows.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner and left joins")
    probe_salted = probe.withColumn(
        SALT_COL, F.pmod(F.hash(*[F.col(c) for c in probe.columns]), F.lit(n_salts))
    )
    build_salted = build.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    joined = probe_salted.join(build_salted, [*list(keys), SALT_COL], how)
    return joined.drop(SALT_COL)


def _hot_predicate(keys: Sequence[str], hot_keys) -> "F.Column":
    """Membership predicate for a SMALL driver-side hot-key list."""
    keys = list(keys)
    if len(keys) == 1:
        return F.col(keys[0]).isin(list(hot_keys))
    pred = F.lit(False)
    for tup in hot_keys:
        clause = F.lit(True)
        for k, v in zip(keys, tup):
            clause = clause & (F.col(k) == F.lit(v))
        pred = pred | clause
    return pred


def salted_join_targeted(
    probe: DataFrame,
    build: DataFrame,
    keys: Sequence[str],
    hot_keys,
    n_salts: int = 32,
    how: str = "inner",
) -> DataFrame:
    """Salt ONLY the flagged hot keys; everything else joins plain.

    The 100 TB shape: full-side salting replicates the entire build
    side ``n_salts``× through the shuffle, which can cost more than
    the skew it cures.  Here ``hot_keys`` (a small driver-side list,
    e.g. from :func:`top_skewed_keys` — scalars for a single key,
    tuples for composite keys) partitions the probe: cold rows take
    the ordinary equi-join, hot rows take the salted join against a
    build side FILTERED to the hot keys — so the replication cost is
    n_salts × |hot build rows|, not n_salts × |build|.  The union is
    exact because hot/cold partition the probe.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join_targeted supports inner and left")
    hot_keys = list(hot_keys)
    if not hot_keys:
        return probe.join(build, list(keys), how)
    pred = _hot_predicate(keys, hot_keys)
    cold = probe.filter(~pred).join(build, list(keys), how)
    hot = salted_join(
        probe.filter(pred), build.filter(pred), keys, n_salts, how
    )
    return cold.unionByName(hot)
