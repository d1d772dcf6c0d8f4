"""Graph-DB EAV intake (S10 → W1).

The reference exports Neo4j/Memgraph data as long-format EAV CSV —
``(startNodeId, startNodeLabels, propertyName, propertyValue,
linkedNodeId, linkedNodeLabels, dbgap_accession)`` — then pivots it
wide per node type (src/neo4j_data_tools.py:60-71, 1666-1759).

Spark rendering: the EAV frame (from the connector or staged CSV) is
the input; property pivot and link-column pivot are each one
``groupBy().pivot()`` with explicit value lists from the schema
metadata — a single shuffle each, no per-(study,node) thread fan-out
(partitioning replaces ``task.map``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.reshape import eav_pivot

EAV_COLUMNS = (
    "startNodeId",
    "startNodeLabels",
    "startNodePropertyName",
    "startNodePropertyValue",
    "linkedNodeId",
    "linkedNodeLabels",
    "dbgap_accession",
)


def pivot_node_properties(
    eav: DataFrame,
    node_label: str,
    prop_values: list[str] | None = None,
    multi_value: bool = True,
) -> DataFrame:
    """W1 — one node type's EAV rows → wide property table.

    ``multi_value=True`` collapses repeated props with sorted ';'
    joins (the DCC variant, src/neo4j_data_tools.py:2199-2327);
    otherwise first-non-null wins.
    """
    node_rows = eav.filter(F.col("startNodeLabels") == node_label)
    return eav_pivot(
        node_rows,
        id_col="startNodeId",
        prop_col="startNodePropertyName",
        value_col="startNodePropertyValue",
        prop_values=prop_values,
        multi_value=multi_value,
    )


def pivot_node_links(
    eav: DataFrame,
    node_label: str,
    link_labels: list[str] | None = None,
) -> DataFrame:
    """W1 link half — linked-node ids pivoted into ``<label>.id`` cols.

    Reference: src/neo4j_data_tools.py:1718-1759 (link columns
    re-attached after the property pivot).
    """
    links = eav.filter(
        (F.col("startNodeLabels") == node_label)
        & F.col("linkedNodeId").isNotNull()
    ).select("startNodeId", "linkedNodeLabels", "linkedNodeId")
    pivoted = (
        links.groupBy("startNodeId")
        .pivot("linkedNodeLabels", link_labels)
        .agg(F.concat_ws(";", F.sort_array(F.collect_set("linkedNodeId"))))
    )
    renames = {
        c: f"{c}.id" for c in pivoted.columns if c != "startNodeId"
    }
    for old, new in renames.items():
        pivoted = pivoted.withColumnRenamed(old, new)
    return pivoted


def eav_to_node_table(
    eav: DataFrame,
    node_label: str,
    prop_values: list[str] | None = None,
    link_labels: list[str] | None = None,
) -> DataFrame:
    """Full S10→W1 path: properties ⨝ links for one node type."""
    props = pivot_node_properties(eav, node_label, prop_values)
    links = pivot_node_links(eav, node_label, link_labels)
    return props.join(links, on="startNodeId", how="left")
