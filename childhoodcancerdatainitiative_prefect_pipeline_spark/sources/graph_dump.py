"""Graph-database dump intake (S11, SURVEY.md §2.1).

The reference streams a Memgraph ``DUMP DATABASE`` (openCypher CREATE
statements) and rebuilds a filtered graph (src/memgraph_transfer.py:19-163).
The engine's rendering splits that into:

- a **driver-side statement parser** (dumps stream line-by-line; the
  parse is regex work over one statement at a time, never holding the
  graph in memory), and
- **node / edge DataFrames** as the output — from there the standard
  EAV pivot (sources/eav.py) and join packs take over, so a dump
  becomes queryable tables in two steps.

Vertex statements carry a stable ``__mg_id__``; edge statements
reference those ids in a WHERE clause.  Properties are kept as a JSON
string column — parse with ``from_json`` + an explicit schema, or
pivot via the EAV path.
"""

from __future__ import annotations

import json
import re
from collections.abc import Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession

_VERTEX_RE = re.compile(
    r"^CREATE \((?P<labels>(?::`?[^`\s{]+`?)+)\s*\{(?P<props>.*)\}\);?$"
)
_EDGE_RE = re.compile(
    r"^MATCH .*?u\.__mg_id__ = (?P<src>\d+) AND v\.__mg_id__ = (?P<dst>\d+) "
    r"CREATE \(u\)-\[:`?(?P<rel>[^`\]]+)`?\s*(?:\{(?P<props>.*)\})?\]->\(v\);?$"
)
_PROP_RE = re.compile(
    r"`?(?P<key>[A-Za-z_][A-Za-z0-9_]*)`?\s*:\s*"
    r"(?P<val>\"(?:[^\"\\]|\\.)*\"|-?\d+(?:\.\d+)?|true|false|null)"
)


def _parse_props(raw: str) -> dict:
    out = {}
    for m in _PROP_RE.finditer(raw):
        key, val = m.group("key"), m.group("val")
        out[key] = json.loads(val)
    return out


def parse_dump_statements(
    lines: Iterable[str],
) -> Iterator[tuple[str, dict]]:
    """Yield ('vertex'|'edge', record) per CREATE statement."""
    for line in lines:
        line = line.strip()
        if not line.startswith(("CREATE", "MATCH")):
            continue
        vm = _VERTEX_RE.match(line)
        if vm:
            props = _parse_props(vm.group("props"))
            labels = [
                lb.strip("`")
                for lb in vm.group("labels").lstrip(":").split(":")
                if lb.strip("`") != "__mg_vertex__"
            ]
            yield (
                "vertex",
                {
                    "node_id": props.pop("__mg_id__", None),
                    "labels": ";".join(labels),
                    "props_json": json.dumps(props, sort_keys=True),
                },
            )
            continue
        em = _EDGE_RE.match(line)
        if em:
            yield (
                "edge",
                {
                    "src": int(em.group("src")),
                    "dst": int(em.group("dst")),
                    "rel_type": em.group("rel"),
                    "props_json": json.dumps(
                        _parse_props(em.group("props") or ""), sort_keys=True
                    ),
                },
            )


def dump_to_tables(
    spark: SparkSession,
    lines: Iterable[str],
    node_labels: tuple[str, ...] = (),
    edge_types: tuple[str, ...] = (),
) -> tuple[DataFrame, DataFrame]:
    """S11 — dump statements → (nodes, edges) DataFrames.

    ``node_labels`` / ``edge_types`` filter during the streamed parse
    (the reference's node/edge filters), so excluded elements never
    materialize.  Edges whose endpoints were filtered out are dropped
    by a semi-join against the kept nodes.
    """
    nodes, edges = [], []
    for kind, rec in parse_dump_statements(lines):
        if kind == "vertex":
            if not node_labels or any(
                lb in node_labels for lb in rec["labels"].split(";")
            ):
                nodes.append((rec["node_id"], rec["labels"], rec["props_json"]))
        else:
            if not edge_types or rec["rel_type"] in edge_types:
                edges.append(
                    (rec["src"], rec["dst"], rec["rel_type"], rec["props_json"])
                )
    node_df = spark.createDataFrame(
        nodes, "node_id long, labels string, props_json string"
    )
    edge_df = spark.createDataFrame(
        edges, "src long, dst long, rel_type string, props_json string"
    )
    kept = node_df.select("node_id")
    edge_df = (
        edge_df.join(kept.withColumnRenamed("node_id", "src"), "src", "left_semi")
        .join(kept.withColumnRenamed("node_id", "dst"), "dst", "left_semi")
    )
    return node_df, edge_df
