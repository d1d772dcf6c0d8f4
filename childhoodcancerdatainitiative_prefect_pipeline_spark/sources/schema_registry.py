"""Versioned schema registry (SURVEY.md §2.1 S12).

The reference fetches release-versioned schema assets from GitHub —
list tags, pick a version, download the template / bento-MDF model
YAML from the tagged release (src/utils.py:57-299) — and gates every
pipeline run on the manifest's embedded version matching the template
(src/utils.py:334-344, workflows/s3-Prefect-Pipeline.py:79-131).

In the Spark engine this stays a driver-side concern: schema payloads
are KBs and they *compile* into the rule metadata
(:class:`..plans.rules.NodeSchema`) that every validation / repair /
liftover plan consumes as broadcastable expressions.  Transport is an
injectable callable (same seam as :mod:`.rest`), so tests run with a
recorded payload and production swaps in the GitHub API fetch.

Supported MDF subset (the shapes that drive query semantics):

- ``Nodes.<node>.Props`` membership and ``Relationships`` ends
  (parent edges, multiplicity);
- per-prop ``Type`` scalar (string / integer / number), ``Enum`` term
  lists with ``Strict: false`` for open vocabularies, and
  ``Type: {value_type: list, item_type: ...}`` arrays;
- ``Req`` / ``Key`` flags.
"""

from __future__ import annotations

import re
from collections.abc import Callable
from dataclasses import dataclass

from ..plans.rules import NodeSchema, PropertyRule

#: Columns whose content is never PII-scanned (ids, checksums, guids)
#: — mirrors the reference's exclusion list for the regex scan
#: (src/s3_validationry_refactored.py:620-746).
_NO_PII_SUFFIXES = ("_id", "md5sum", "dcf_indexd_guid")


# ---------------------------------------------------------------------------
# version listing / resolution
# ---------------------------------------------------------------------------


def list_versions(fetch_tags: Callable[[], list[dict]]) -> list[str]:
    """Tag names from a GitHub-style ``/tags`` payload, newest-first
    by semantic version.  ``fetch_tags`` is the transport seam —
    production passes ``lambda: http_json(f"{api}/repos/{repo}/tags")``.
    """
    tags = [t["name"] for t in fetch_tags() if "name" in t]
    versioned = [t for t in tags if _semver(t) is not None]
    return sorted(versioned, key=_semver, reverse=True)


def _semver(tag: str) -> tuple[int, int, int] | None:
    m = re.fullmatch(r"v?(\d+)\.(\d+)(?:\.(\d+))?", tag.strip())
    if not m:
        return None
    return (int(m.group(1)), int(m.group(2)), int(m.group(3) or 0))


def resolve_version(requested: str, available: list[str]) -> str:
    """``latest`` → newest semver; otherwise the exact tag (accepting
    a missing/extra ``v`` prefix).  Raises on an unknown version so a
    typo'd pin fails the run instead of silently floating."""
    if not available:
        raise ValueError("schema registry returned no versions")
    if requested == "latest":
        return max(available, key=_semver)
    for cand in available:
        if cand == requested or cand.lstrip("v") == requested.lstrip("v"):
            return cand
    raise ValueError(
        f"schema version {requested!r} not in registry ({available[:8]}...)"
    )


def version_gate(manifest_version: str, template_version: str) -> None:
    """The reference's pre-flight check: a manifest authored against a
    different schema release than the template in use is an immediate
    stop (src/utils.py:334-344)."""
    if _semver(manifest_version) != _semver(template_version):
        raise ValueError(
            f"manifest schema {manifest_version} != template {template_version}"
            " — run liftover before curation"
        )


# ---------------------------------------------------------------------------
# MDF → rule metadata
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ParentEdge:
    """One child→parent link from the Relationships block."""

    rel: str
    src: str
    dst: str
    multiplicity: str  # many_to_one / many_to_many / one_to_one


def _prop_rule(name: str, spec: dict) -> PropertyRule:
    spec = spec or {}
    enum_terms: tuple[str, ...] = ()
    type_ = spec.get("Type", "string")
    is_array = False
    if isinstance(type_, dict):  # {value_type: list, item_type: [...] | str}
        is_array = type_.get("value_type") == "list"
        item = type_.get("item_type", "string")
        if isinstance(item, list):
            enum_terms = tuple(str(t) for t in item)
            inner = "enum"
        else:
            inner = str(item)
    elif "Enum" in spec:
        enum_terms = tuple(str(t) for t in spec["Enum"] or ())
        # Strict: false → open vocabulary (string;enum, WARNING rank)
        inner = "enum" if spec.get("Strict", True) else "string;enum"
    else:
        inner = str(type_)
    key = bool(spec.get("Key", False))
    free_text = (
        inner == "string"
        and not key
        and not any(name.endswith(s) for s in _NO_PII_SUFFIXES)
    )
    return PropertyRule(
        prop=name,
        type=f"array[{inner}]" if is_array else inner,
        required=bool(spec.get("Req", False)),
        key=key,
        enum_terms=enum_terms,
        free_text=free_text,
    )


def parse_mdf(model: dict, props: dict) -> dict[str, NodeSchema]:
    """bento-MDF (model + props documents, already YAML-loaded) →
    one :class:`NodeSchema` per node, ready for the rule engine.

    Mirrors GetCCDIModel (src/create_submission.py:61-439): node list
    and per-node prop membership from the model document, per-prop
    type / enum / required / key from PropDefinitions.
    """
    defs = props.get("PropDefinitions", {}) or {}
    out: dict[str, NodeSchema] = {}
    for node, nspec in (model.get("Nodes", {}) or {}).items():
        rules = [
            _prop_rule(p, defs.get(p, {}))
            for p in (nspec or {}).get("Props") or []
            if p != "id"  # surrogate column, dropped at ingest (P1)
        ]
        key_props = [r.prop for r in rules if r.key]
        out[node] = NodeSchema(node=node, rules=rules, key_props=key_props)
    return out


def parse_edges(model: dict) -> list[ParentEdge]:
    """Relationships block → child→parent edge list (drives the
    cross-link rule family and the multi-path flattening join graph)."""
    edges: list[ParentEdge] = []
    for rel, rspec in (model.get("Relationships", {}) or {}).items():
        mul = (rspec or {}).get("Mul", "many_to_one")
        for end in (rspec or {}).get("Ends") or []:
            edges.append(
                ParentEdge(
                    rel=rel, src=end["Src"], dst=end["Dst"], multiplicity=mul
                )
            )
    return edges


def load_model_yaml(
    model_text: str, props_text: str
) -> tuple[dict[str, NodeSchema], list[ParentEdge]]:
    """Parse raw YAML payloads (as fetched from a release asset).

    PyYAML is an optional dependency at this edge only — the engine
    itself never needs it (schemas can also arrive as Dictionary/TaVS
    tables through the Excel/TSV sources).
    """
    try:
        import yaml
    except ImportError as ex:  # pragma: no cover
        raise ImportError(
            "schema_registry.load_model_yaml needs PyYAML; "
            "pass pre-parsed dicts to parse_mdf instead"
        ) from ex
    model = yaml.safe_load(model_text)
    props = yaml.safe_load(props_text)
    return parse_mdf(model, props), parse_edges(model)


def fetch_schema(
    version: str,
    fetch_tags: Callable[[], list[dict]],
    fetch_asset: Callable[[str, str], str],
) -> tuple[str, dict[str, NodeSchema], list[ParentEdge]]:
    """End-to-end S12: resolve ``version`` against the registry, fetch
    the model + props YAML for the resolved tag, compile to rule
    metadata.  ``fetch_asset(tag, name)`` returns the raw text of one
    release asset — production wires this to the release download URL,
    tests to recorded fixtures."""
    tag = resolve_version(version, list_versions(fetch_tags))
    schemas, edges = load_model_yaml(
        fetch_asset(tag, "model"), fetch_asset(tag, "props")
    )
    return tag, schemas, edges
