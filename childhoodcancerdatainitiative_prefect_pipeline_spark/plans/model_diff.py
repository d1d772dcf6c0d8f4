"""Model mapping maker — version-diff of two model prop inventories.

Spark re-expression of workflows/model_mapping_maker.py:

- ``build_mapping`` (:90-98): full outer join of the *from* and *to*
  model's ``(node, property)`` inventories on exact names — the
  name-stable props pair up, everything else gets a null side;
- ``reconcile_mapping`` (:104-129): a user-provided curated mapping
  takes precedence — built rows whose from-key is already covered are
  dropped, net-new rows appended;
- ``expand_semicolon_nodes`` (:199-210): one row per ``;``-separated
  target node;
- ``build_comparison`` (:236-275): classify every mapping row as
  DELETION / ADDITION / CHANGED / SAME, drop SAME, blank-fill nulls.

All steps are dimension-sized metadata joins (model inventories are
thousands of rows at most) — Spark broadcasts every side; the plan
exists so model diffs can run inside the same engine as the data they
govern, not because they're big.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: output column order (workflows/model_mapping_maker.py:15-22)
MAPPING_COLS = [
    "lift_from_node",
    "lift_from_property",
    "lift_from_version",
    "lift_to_node",
    "lift_to_property",
    "lift_to_version",
]


def build_mapping(df_from: DataFrame, df_to: DataFrame) -> DataFrame:
    """Name-equi skeleton mapping (model_mapping_maker.py:90-98).

    Inputs carry ``lift_from_node/lift_from_property/lift_from_version``
    and the ``lift_to_*`` triple respectively.
    """
    return df_from.join(
        df_to,
        (F.col("lift_from_node") == F.col("lift_to_node"))
        & (F.col("lift_from_property") == F.col("lift_to_property")),
        "full_outer",
    ).select(*MAPPING_COLS)


def reconcile_mapping(provided: DataFrame, built: DataFrame) -> DataFrame:
    """Curated rows win; net-new built rows appended (:104-129)."""
    covered = provided.select("lift_from_node", "lift_from_property").distinct()
    net_new = built.join(
        F.broadcast(covered),
        ["lift_from_node", "lift_from_property"],
        "left_anti",
    )
    return provided.select(*MAPPING_COLS).unionByName(net_new.select(*MAPPING_COLS))


def expand_semicolon_nodes(mapping: DataFrame) -> DataFrame:
    """One row per ``;``-separated lift_to_node (:199-210)."""
    keep = F.col("lift_to_node").isNull() | F.col("lift_to_node").isin("NA", "none", "")
    split_nodes = F.explode(
        F.transform(F.split("lift_to_node", ";"), lambda v: F.trim(v))
    )
    exploded = (
        mapping.filter(~keep)
        .withColumn("lift_to_node", split_nodes)
    )
    return mapping.filter(keep).unionByName(exploded).select(*MAPPING_COLS)


def build_comparison(
    mapping: DataFrame, old_version: str, new_version: str
) -> DataFrame:
    """State-classified diff, SAME dropped, ''-filled (:236-275)."""
    f_node = F.coalesce(F.col("lift_from_node"), F.lit(""))
    f_prop = F.coalesce(F.col("lift_from_property"), F.lit(""))
    t_node = F.coalesce(F.col("lift_to_node"), F.lit(""))
    t_prop = F.coalesce(F.col("lift_to_property"), F.lit(""))
    from_na = (f_node == "") | (f_prop == "")
    to_na = (t_node == "") | (t_prop == "")
    state = (
        F.when(to_na & ~from_na, "DELETION")
        .when(from_na & ~to_na, "ADDITION")
        .when((f_node != t_node) | (f_prop != t_prop), "CHANGED")
        .otherwise("SAME")
    )
    return (
        mapping.select(
            state.alias("state"),
            f_node.alias("lift_from_node"),
            f_prop.alias("lift_from_property"),
            F.lit(old_version).alias("lift_from_version"),
            t_node.alias("lift_to_node"),
            t_prop.alias("lift_to_property"),
            F.lit(new_version).alias("lift_to_version"),
        )
        .filter(F.col("state") != "SAME")
        .dropDuplicates()
    )


def model_mapping_diff(
    df_from: DataFrame,
    df_to: DataFrame,
    provided: DataFrame | None,
    old_version: str,
    new_version: str,
) -> DataFrame:
    """The full maker flow: build → reconcile → expand → compare."""
    built = build_mapping(df_from, df_to)
    mapping = built if provided is None else reconcile_mapping(provided, built)
    return build_comparison(
        expand_semicolon_nodes(mapping), old_version, new_version
    )
