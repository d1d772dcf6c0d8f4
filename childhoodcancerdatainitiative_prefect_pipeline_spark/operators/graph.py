"""Graph traversal operators — transitive closure over an edge list.

Spark re-expression of the reference's cascade entry removal
(workflows/entry_remover.py:142-224): a worklist BFS that, starting
from user-supplied entry ids, discovers every child row whose link
column points at a removed entry and removes it too, recursively.

The pandas original pops one id at a time off a Python list and scans
every sheet per id.  Here each BFS *level* is one distributed hash
join of the frontier against the edge list — the whole frontier
advances at once, so the number of Spark jobs is the graph depth, not
the entry count.  The DuckDB oracle twin is a recursive CTE
(``WITH RECURSIVE``), making the closure hash-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def transitive_children(
    edges: DataFrame,
    seeds: DataFrame,
    parent_col: str = "parent",
    child_col: str = "child",
    label_col: str | None = "node",
    max_hops: int = 25,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Closure of ``seeds`` under the child relation in ``edges``.

    ``seeds`` must carry ``(entry_id, node)`` (``node`` omitted when
    ``label_col`` is None); ``edges`` carries ``(parent, child[, node])``
    where ``node`` labels the *child* side.  Returns the distinct
    ``(entry_id, node)`` closure — seeds plus every transitive child —
    i.e. exactly the set of rows ``entry_remover`` deletes.

    Scale notes: the frontier starts tiny (a removal list) so each hop
    is a broadcast-able join against the big edge list with the edge
    side streaming; the ``left_anti`` against the closure-so-far stops
    cycles and re-visits.  The frontier is materialized (persist +
    ``isEmpty`` probe) once per hop — one action per *level* of the
    graph, bounded by ``max_hops``.  Lineage is truncated with
    ``localCheckpoint`` every ``checkpoint_every`` hops so deep chains
    don't accumulate a quadratic plan.
    """
    out_cols = ["entry_id"] + ([label_col] if label_col else [])
    closure = seeds.select(*out_cols).distinct()
    frontier = closure.select("entry_id").distinct()

    for hop in range(max_hops):
        frontier = frontier.persist()
        if frontier.isEmpty():
            frontier.unpersist()
            break
        step_cols = [F.col(child_col).alias("entry_id")] + (
            [F.col(label_col)] if label_col else []
        )
        discovered = (
            edges.join(
                F.broadcast(frontier.withColumnRenamed("entry_id", "__p__")),
                F.col(parent_col) == F.col("__p__"),
            )
            .select(*step_cols)
            .distinct()
        )
        fresh = discovered.join(
            closure.select("entry_id").distinct(), "entry_id", "left_anti"
        )
        if (hop + 1) % checkpoint_every == 0:
            fresh = fresh.localCheckpoint(eager=False)
        closure = closure.unionByName(fresh)
        prev = frontier
        frontier = fresh.select("entry_id").distinct()
        prev.unpersist()

    return closure


def cascade_remove(
    tables: dict[str, DataFrame],
    seed_ids: DataFrame,
    id_cols: dict[str, str],
    link_cols: dict[str, list[str]],
    max_hops: int = 25,
) -> tuple[DataFrame, dict[str, DataFrame]]:
    """Entry remover (workflows/entry_remover.py:142-260) as one plan.

    ``tables`` maps node name → frame; ``id_cols`` node → its id
    column; ``link_cols`` node → the ``<parent>.<parent>_id`` link
    columns on that node.  ``seed_ids`` is a one-column frame
    (``entry_id``) of ids to remove.

    Returns ``(closure, kept)``: the ``(entry_id, node)`` closure of
    deleted entries, and per-node frames with those rows anti-joined
    away — the "cleaned manifest" the reference writes back.
    """
    edge_parts = []
    for node, df in tables.items():
        for lc in link_cols.get(node, []):
            # link columns follow the reference's `<parent>.<parent>_id`
            # naming — backtick-quote so the dot isn't struct access
            parent = F.col(f"`{lc}`") if "." in lc else F.col(lc)
            edge_parts.append(
                df.select(
                    parent.alias("parent"),
                    F.col(id_cols[node]).alias("child"),
                    F.lit(node).alias("node"),
                ).filter(parent.isNotNull())
            )
    if not edge_parts:
        raise ValueError("no link columns given")
    edges = edge_parts[0]
    for p in edge_parts[1:]:
        edges = edges.unionByName(p)

    # seed rows are labelled by whichever node table their id lives in
    # (entry_remover scans every sheet's id column for direct hits)
    seed_parts = [
        df.select(F.col(id_cols[node]).alias("entry_id"), F.lit(node).alias("node"))
        .join(F.broadcast(seed_ids), "entry_id", "left_semi")
        for node, df in tables.items()
    ]
    seeds = seed_parts[0]
    for p in seed_parts[1:]:
        seeds = seeds.unionByName(p)

    closure = transitive_children(
        edges, seeds, parent_col="parent", child_col="child", max_hops=max_hops
    )

    kept = {
        node: df.join(
            closure.filter(F.col("node") == node).select(
                F.col("entry_id").alias(id_cols[node])
            ),
            id_cols[node],
            "left_anti",
        )
        for node, df in tables.items()
    }
    return closure, kept
