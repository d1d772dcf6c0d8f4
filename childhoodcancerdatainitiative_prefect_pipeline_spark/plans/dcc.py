"""DCC manifest-join: GUID → business-key translation, multi-valued.

Reference: src/join_tsv_to_manifest_dcc.py — the DCC flavor of the
TSV→manifest join.  Where the non-DCC flow translates surrogate
``<parent>.id`` columns through a per-node (id → key) map
(src/join_tsv_to_manifest.py:111-192; engine twin
``surrogate_key_translate``), the DCC flow:

1. builds ONE global ``guid → <type>_id`` mapping from every node TSV
   that carries both a ``guid`` and its ``<type>_id`` column
   (``build_guid_to_id_mapping``);
2. maps each ``<parent>.guid`` column to ``<parent>.<parent>_id`` —
   but cells are **multi-valued**: ``;``-joined GUID lists whose items
   are trimmed, looked up individually, and re-joined.  An unmapped
   GUID becomes the empty string (the reference logs a warning and
   appends ``""``); null/blank cells become ``""``;
3. blanks the consumed ``<parent>.guid`` columns and the node's own
   ``guid`` column before writing back into the template sheet.

Spark-first design: the mapping is submission-sized (the reference
holds it as a Python dict), so it collapses into ONE ``map``-typed
literal row broadcast to every task; the per-cell translation is then
a row-local ``transform`` over the split array — no explode, no
shuffle, no UDF.  For mappings too large to broadcast, posexplode +
broadcast-join + re-``string_agg`` by position is the drop-in
alternative (same null/missing semantics); the row-local path is the
right default because a guid map bigger than executor memory implies
a submission bigger than any the reference flow can process at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def build_guid_mapping(nodes: dict[str, DataFrame]) -> DataFrame:
    """Global ``guid → node_id`` frame from all node tables.

    Mirrors ``build_guid_to_id_mapping``
    (src/join_tsv_to_manifest_dcc.py:212-228): only nodes exposing
    both ``guid`` and ``<node>_id`` contribute; values are trimmed and
    null pairs dropped.  GUIDs are unique by construction; if a guid
    somehow repeats, the max id wins deterministically (the reference
    dict's last-file-wins is directory-order-dependent).
    """
    parts = []
    for node, df in nodes.items():
        id_col = f"{node}_id"
        if "guid" in df.columns and id_col in df.columns:
            parts.append(
                df.select(
                    F.trim(F.col("guid")).alias("guid"),
                    F.trim(F.col(id_col)).alias("node_id"),
                ).filter(
                    F.col("guid").isNotNull() & F.col(id_col).isNotNull()
                )
            )
    if not parts:
        raise ValueError("no node table carries both guid and <node>_id")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.groupBy("guid").agg(F.max("node_id").alias("node_id"))


def _remap_cell(col: Column, guid_map: Column) -> Column:
    """One multi-valued cell through the broadcast map.

    Split on ``;``, trim items, drop empties, look each up (missing →
    ``""``), re-join — null/blank cells collapse to ``""``
    (src/join_tsv_to_manifest_dcc.py:293-316).
    """
    # NB: the callback must be a single-arg lambda — passing F.trim
    # directly would let transform bind its (element, index) form and
    # resolve the deprecated two-argument TRIM(str, trimChars).
    items = F.filter(
        F.transform(F.split(col, ";"), lambda x: F.trim(x)),
        lambda x: x != "",
    )
    mapped = F.transform(
        items, lambda g: F.coalesce(F.element_at(guid_map, g), F.lit(""))
    )
    return F.coalesce(F.array_join(mapped, ";"), F.lit(""))


#: above this mapping size the row-local map path switches to the
#: explode+hash-join path — Spark's ``element_at`` on a MAP is a
#: LINEAR scan of the map (no hash index in UnsafeMapData), so the
#: map path costs O(rows × items × |mapping|).  The 10× scale probe
#: caught exactly this: a 1.5M-entry guid map turned the remap into
#: hours of interpreted GetMapValue scans.
MAP_PATH_MAX_ENTRIES = 10_000


def remap_guid_columns(
    df: DataFrame,
    mapping: DataFrame,
    guid_cols: list[str] | None = None,
    strategy: str = "auto",
) -> DataFrame:
    """Translate every ``<parent>.guid`` column of ``df`` to
    ``<parent>.<parent>_id`` business keys and blank the guid columns.

    ``mapping`` is the :func:`build_guid_mapping` frame.  The output
    keeps all other columns; each consumed ``<parent>.guid`` column is
    set to ``""`` and the node's own ``guid`` column (if present) is
    blanked too, matching the reference's sheet-write discipline.

    ``strategy``: ``"map"`` — ONE map-typed literal broadcast to every
    task, per-cell row-local ``transform`` (no shuffle, no explode);
    correct choice for submission-sized mappings, but ``element_at``
    on a map is a LINEAR scan, so cost is O(rows·items·|mapping|).
    ``"join"`` — posexplode + broadcast HASH join + positional
    re-assembly: O(1) hash probes, one aggregation shuffle; the scale
    path.  ``"auto"`` (default) counts the mapping once and picks.
    Both paths produce byte-identical cells (unit-pinned).
    """
    if guid_cols is None:
        guid_cols = [c for c in df.columns if c.endswith(".guid")]
    if strategy == "auto":
        strategy = (
            "map" if mapping.count() <= MAP_PATH_MAX_ENTRIES else "join"
        )
    if strategy == "map":
        gm = mapping.agg(
            F.map_from_entries(
                F.collect_list(F.struct("guid", "node_id"))
            ).alias("__gm__")
        )
        out = df.join(F.broadcast(gm))
        for gcol in guid_cols:
            parent = gcol.split(".", 1)[0]
            target = f"{parent}.{parent}_id"
            out = out.withColumn(
                target, _remap_cell(F.col(f"`{gcol}`"), F.col("__gm__"))
            ).withColumn(gcol, F.lit(""))
        if "guid" in df.columns:
            out = out.withColumn("guid", F.lit(""))
        return out.drop("__gm__")
    if strategy != "join":
        raise ValueError(f"unknown strategy {strategy!r}")
    # join path: pin row ids ONCE (monotonically_increasing_id is
    # partition-layout-dependent, and the frame feeds two plan
    # branches), explode trimmed items per column, hash-probe the
    # broadcast mapping, re-assemble by position.
    base = df.withColumn(
        "__rid__", F.monotonically_increasing_id()
    ).localCheckpoint()
    m = F.broadcast(
        mapping.select(F.col("guid").alias("__g__"), "node_id")
    )
    out = base
    for gcol in guid_cols:
        parent = gcol.split(".", 1)[0]
        target = f"{parent}.{parent}_id"
        items = F.filter(
            F.transform(F.split(F.col(f"`{gcol}`"), ";"), lambda x: F.trim(x)),
            lambda x: x != "",
        )
        exploded = base.select(
            "__rid__", F.posexplode_outer(items).alias("__pos__", "__g__")
        )
        cells = (
            exploded.join(m, "__g__", "left")
            .select(
                "__rid__", "__pos__",
                F.coalesce("node_id", F.lit("")).alias("__v__"),
            )
            .groupBy("__rid__")
            .agg(
                # empty/null cells explode to one (null pos, null g)
                # row whose '' value array_joins back to '' — same
                # collapse as the map path
                F.array_join(
                    F.transform(
                        F.sort_array(
                            F.collect_list(F.struct("__pos__", "__v__"))
                        ),
                        lambda s: s["__v__"],
                    ),
                    ";",
                ).alias("__cell__")
            )
        )
        out = (
            out.join(cells, "__rid__", "left")
            .withColumn(target, F.coalesce(F.col("__cell__"), F.lit("")))
            .drop("__cell__")
            .withColumn(gcol, F.lit(""))
        )
    if "guid" in df.columns:
        out = out.withColumn("guid", F.lit(""))
    return out.drop("__rid__")


# ---------------------------------------------------------------------------
# COG/IGM → DCC mapping postprocess (src/cog_igm_mapping_dcc.py:85-146).
# The rule-engine transform itself is plans/cog.py; after it, the DCC
# flow applies a per-node cleanup battery before the manifest append:
#
#   diagnosis           value repair on submitted_diagnosis
#   treatment_response  drop 'Not Reported' (null-safe keep)
#   treatment_surgery   drop 'Not Applicable'
#   treatment_chemo.    drop null chemotherapy_type, then merge rows
#                       sharing a treatment_chemotherapy_id: firsts
#                       for scalar columns, ;-set-union for the agent
#   treatment_other     same merge on other_treatment_type
#
# The reference merges with pandas groupby(first) + ";".join(set(...))
# — group order = TSV row order, set order = CPython hash.  Spark-first
# re-expression: ONE groupBy whose scalar columns use min_by over an
# explicit order column (first NON-null in order, exactly pandas
# "first") and whose multi-valued column is collect_list → sort →
# split/flatten → drop empties → array_distinct (first-occurrence
# order — deterministic where the reference is hash-order-dependent,
# same documented policy as plans/cog.py).
# ---------------------------------------------------------------------------


def merge_multivalued_node(
    df: DataFrame,
    key_col: str,
    merge_col: str,
    first_cols: list[str],
    order_col: str,
) -> DataFrame:
    """Collapse rows sharing ``key_col`` the DCC-postprocess way.

    ``first_cols`` each take their first non-null value in
    ``order_col`` order (pandas ``groupby().agg("first")`` twin);
    ``merge_col`` items are ``;``-split across the group in order,
    empties dropped, first-occurrence-deduped and re-joined.  Null
    merge cells contribute nothing (the reference's list comprehension
    would crash on NaN — deterministic superset, documented).  One
    shuffle on the key; everything after the aggregation is row-local.
    """
    def _c(name: str):  # node columns carry dots (`participant.x`)
        return F.col(f"`{name}`")

    o = _c(order_col)
    firsts = [
        F.min_by(_c(c), F.when(_c(c).isNotNull(), o)).alias(c)
        for c in first_cols
    ]
    pairs = F.sort_array(
        F.collect_list(F.struct(o.alias("o"), _c(merge_col).alias("v")))
    )
    agg = df.groupBy(_c(key_col)).agg(*firsts, pairs.alias("__pairs__"))
    items = F.filter(
        F.flatten(
            F.transform(
                F.col("__pairs__"),
                lambda s: F.coalesce(F.split(s["v"], ";"), F.array()),
            )
        ),
        lambda x: x != "",
    )
    return agg.withColumn(
        merge_col, F.array_join(F.array_distinct(items), ";")
    ).drop("__pairs__")


def dcc_postprocess_node(node: str, df: DataFrame, order_col: str) -> DataFrame:
    """Apply the DCC post-transform cleanup for one node output.

    Mirrors src/cog_igm_mapping_dcc.py:85-146 rule-for-rule; nodes
    without a rule pass through unchanged.
    """
    if node == "diagnosis":
        bad = "Neoplasm, uncertain whether benign or malignant#Neoplasm, NOS"
        return df.withColumn(
            "submitted_diagnosis",
            F.when(F.col("submitted_diagnosis") == bad, "Neoplasm, NOS")
            .otherwise(F.col("submitted_diagnosis")),
        )
    if node == "treatment_response":
        return df.filter(
            F.col("response").isNull() | (F.col("response") != "Not Reported")
        )
    if node == "treatment_surgery":
        return df.filter(
            F.col("surgery_type").isNull()
            | (F.col("surgery_type") != "Not Applicable")
        )
    if node == "treatment_chemotherapy":
        # the reference's boolean keeps '' but drops null (its comment
        # says "drop empty" — code over comment, replicated exactly)
        kept = df.filter(F.col("chemotherapy_type").isNotNull())
        first_cols = [
            c
            for c in df.columns
            if c
            not in ("treatment_chemotherapy_id", "chemotherapy_agent", order_col)
        ]
        return merge_multivalued_node(
            kept, "treatment_chemotherapy_id", "chemotherapy_agent",
            first_cols, order_col,
        )
    if node == "treatment_other":
        first_cols = [
            c
            for c in df.columns
            if c not in ("treatment_other_id", "other_treatment_type", order_col)
        ]
        return merge_multivalued_node(
            df, "treatment_other_id", "other_treatment_type",
            first_cols, order_col,
        )
    return df
