"""Liftover — mapping-driven schema migration (SURVEY.md §2.9, L1-L3).

The reference migrates a manifest between model versions with a
mapping table ``(lift_from_node, lift_from_property, lift_to_node,
lift_to_property)`` (src/manifest_liftover.py:26-53; generic TSV
variant src/liftover_generic.py:205-363).

Spark rendering: the mapping is a *driver-side plan input* (it is
schema-sized), compiled into per-target-node ``select`` projections;
collisions (many source props → one target prop) concatenate with
';'; multiple source nodes contributing to one target union by name.
The data itself never leaves executors.
"""

from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class MappingRow:
    from_node: str
    from_prop: str
    to_node: str
    to_prop: str


def evaluate_mapping(
    mapping: list[MappingRow],
    source_props: dict[str, list[str]],
    target_props: dict[str, list[str]],
) -> dict[str, list]:
    """L1 — mapping validation: coverage both directions + many↔one.

    Reference: src/manifest_liftover.py:56-317.  Pure metadata work;
    returns a report dict (the reference renders this to text).
    """
    mapped_from = {(m.from_node, m.from_prop) for m in mapping}
    mapped_to = {(m.to_node, m.to_prop) for m in mapping}
    missing_source = [
        (n, p)
        for n, props in source_props.items()
        for p in props
        if (n, p) not in mapped_from
    ]
    missing_target = [
        (n, p)
        for n, props in target_props.items()
        for p in props
        if (n, p) not in mapped_to
    ]
    by_target: dict[tuple[str, str], list[MappingRow]] = defaultdict(list)
    by_source: dict[tuple[str, str], list[MappingRow]] = defaultdict(list)
    for m in mapping:
        by_target[(m.to_node, m.to_prop)].append(m)
        by_source[(m.from_node, m.from_prop)].append(m)
    many_to_one = {k: v for k, v in by_target.items() if len(v) > 1}
    one_to_many = {k: v for k, v in by_source.items() if len(v) > 1}
    return {
        "unmapped_source_props": missing_source,
        "unmapped_target_props": missing_target,
        "many_to_one": list(many_to_one),
        "one_to_many": list(one_to_many),
    }


def lift_node(
    sources: dict[str, DataFrame],
    mapping: list[MappingRow],
    target_node: str,
    concat_sep: str = ";",
) -> DataFrame:
    """L2 — build one target node table from its mapped sources.

    Reference: src/manifest_liftover.py:388-445.  For each source
    node contributing to ``target_node``: project mapped columns
    renamed to target names; when several source props map to the
    same target prop, concatenate non-null values with ';'; union
    all contributing source nodes; stamp ``type``.
    """
    relevant = [m for m in mapping if m.to_node == target_node]
    by_source_node: dict[str, list[MappingRow]] = defaultdict(list)
    for m in relevant:
        by_source_node[m.from_node].append(m)

    pieces: list[DataFrame] = []
    for src_node, rows in by_source_node.items():
        if src_node not in sources:
            continue
        df = sources[src_node]
        by_target_prop: dict[str, list[str]] = defaultdict(list)
        for m in rows:
            if m.from_prop in df.columns:
                by_target_prop[m.to_prop].append(m.from_prop)
        exprs = [F.lit(target_node).alias("type")]
        for to_prop, from_props in sorted(by_target_prop.items()):
            if len(from_props) == 1:
                exprs.append(F.col(from_props[0]).cast("string").alias(to_prop))
            else:
                # collision: ';'-concat the non-null source values in
                # mapping order (src/manifest_liftover.py:415-431)
                exprs.append(
                    F.concat_ws(
                        concat_sep, *[F.col(p).cast("string") for p in from_props]
                    ).alias(to_prop)
                )
        pieces.append(df.select(*exprs))
    if not pieces:
        raise ValueError(f"no mapping rows target node {target_node}")
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    return out


def unlifted_value_report(
    sources: dict[str, DataFrame], mapping: list[MappingRow]
) -> DataFrame | None:
    """L3 — source props with data but no target mapping.

    Reference: src/manifest_liftover.py:360-385.  A prop is reported
    when it is unmapped AND has ≥1 non-null value — the non-null
    counts are one aggregate per source table.
    """
    mapped_from = {(m.from_node, m.from_prop) for m in mapping}
    parts = []
    for node, df in sources.items():
        unmapped = [
            c for c in df.columns if (node, c) not in mapped_from and c != "type"
        ]
        if not unmapped:
            continue
        aggs = [F.count(F.col(c)).alias(c) for c in unmapped]
        counted = df.agg(*aggs)
        long = counted.unpivot(
            ids=[], values=unmapped,
            variableColumnName="property", valueColumnName="n_values",
        ).select(
            F.lit(node).alias("node"), F.col("property"), F.col("n_values")
        )
        parts.append(long.filter(F.col("n_values") > 0))
    if not parts:
        return None
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def lift_node_generic(
    sources: dict[str, DataFrame],
    mapping: list[MappingRow],
    target_node: str,
    target_props: list[str],
    defaults: dict[str, str] | None = None,
    concat_sep: str = ";",
) -> DataFrame:
    """Generic MDF-driven liftover of one target node
    (src/liftover_generic.py:205-363).

    Beyond :func:`lift_node`: the output carries the FULL lift-to
    model's prop list for the node (unmapped props null-filled, model
    order — the reference's ``model_to_df`` template frame), rows
    that are empty across every target prop are dropped
    (src/liftover_generic.py:306-308), and per-prop ``default_value``
    entries from the mapping file fill remaining nulls
    (src/liftover_generic.py:323-341).

    Deviation kept from :func:`lift_node`: collisions concatenate
    with ``concat_ws`` (null-skipping), not pandas' NaN-propagating
    string add; an all-null collision yields null, never ``"nan"``.
    """
    base = lift_node(sources, mapping, target_node, concat_sep)
    null_s = F.lit(None).cast("string")
    projected = base.select(
        "type",
        *[
            (F.nullif(F.col(p).cast("string"), F.lit("")) if p in base.columns
             else null_s).alias(p)
            for p in target_props
        ],
    )
    any_value = None
    for p in target_props:
        cond = F.col(p).isNotNull()
        any_value = cond if any_value is None else (any_value | cond)
    out = projected.filter(any_value) if any_value is not None else projected
    if defaults:
        out = out.fillna({k: v for k, v in defaults.items() if k in target_props})
    return out


#: nodes the reference expects to be singletons after liftover
#: (src/liftover_generic.py:344-356)
SINGLETON_NODES = ("study", "program")


def liftover_tsv_dir(
    spark,
    in_dir: str,
    out_dir: str,
    mapping: list[MappingRow],
    target_schema: dict[str, list[str]],
    defaults: dict[str, dict[str, str]] | None = None,
) -> dict[str, int]:
    """End-to-end TSV-in/TSV-out generic liftover
    (src/liftover_generic.py:366-457): identify each input TSV's node
    by its ``type`` column (src/liftover_generic.py:101-127), lift
    every target node in ``target_schema``, write one TSV per target
    node, and return per-node row counts (the study/program singleton
    check reads from this — >1 is the reference's logged error).

    File identification and the final counts are driver-side actions
    over node-sized frames; the lift itself is pure projection.
    """
    import os

    from ..sources.files import read_tsv, write_tsv

    sources: dict[str, DataFrame] = {}
    for fname in sorted(os.listdir(in_dir)):
        if not fname.endswith(".tsv"):
            continue
        df = read_tsv(spark, os.path.join(in_dir, fname))
        if "type" not in df.columns:
            continue
        first = df.select("type").limit(1).collect()
        if first:
            sources[first[0]["type"]] = df.drop("type")

    counts: dict[str, int] = {}
    targeted = {m.to_node for m in mapping}
    for node, props in target_schema.items():
        if node not in targeted:
            continue
        lifted = lift_node_generic(
            sources, mapping, node, props,
            defaults=(defaults or {}).get(node),
        )
        write_tsv(lifted, os.path.join(out_dir, f"{node}.tsv"))
        counts[node] = lifted.count()
    return counts
