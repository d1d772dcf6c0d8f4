"""Model → submission-template sheet rendering (SURVEY.md §2.13).

The reference turns the parsed bento-MDF model into the CCDI
submission template's metadata sheets (src/create_submission.py:61-439):

- **Dictionary** — one row per (node, property) with Type / Required /
  Key / CDE columns, example values truncated to the first four enum
  terms, rows sorted by a hand-curated preferred node order
  (``GetCCDIModel.node_preferred_order``,
  src/create_submission.py:62-95; ``get_prop_dict_df``,
  src/create_submission.py:288-360);
- **Terms and Value Sets** — one block per distinct enum-carrying
  property (first node wins for shared props like ``file_type``),
  blocks sorted by property name and separated by a blank row
  (``get_terms_df``, src/create_submission.py:362-439).

These tables are driver-side KBs of metadata, so they render as plain
row dicts (ready for the Excel overlay writer or a ``createDataFrame``)
— never through an executor.  The inverse, :func:`sheets_to_schemas`,
rebuilds :class:`..plans.rules.NodeSchema` rule metadata from rendered
sheets, closing the loop promised in :mod:`.schema_registry`: a schema
can arrive as MDF YAML *or* as Dictionary/TaVS tables and drive the
same validation plans.
"""

from __future__ import annotations

from ..plans.rules import NodeSchema, PropertyRule

#: Hand-curated sheet order (src/create_submission.py:62-95); nodes
#: not listed sort after, in model order.
NODE_PREFERRED_ORDER: list[str] = [
    "study",
    "study_admin",
    "study_arm",
    "study_funding",
    "study_personnel",
    "publication",
    "consent_group",
    "participant",
    "diagnosis",
    "survival",
    "treatment",
    "treatment_response",
    "synonym",
    "family_relationship",
    "medical_history",
    "exposure",
    "radiology_file",
    "genetic_analysis",
    "laboratory_test",
    "sample",
    "cell_line",
    "pdx",
    "sequencing_file",
    "clinical_measure_file",
    "methylation_array_file",
    "cytogenomic_file",
    "pathology_file",
    "generic_file",
]

DICTIONARY_COLS = [
    "Property", "Description", "Node", "Type", "Example value",
    "Required", "Key", "CDE", "CDE version",
]

TAVS_COLS = ["Value Set Name", "(subset)", "Term", "Definition"]

_ETC = ";etc (see Terms and Values Sets)"


def _example_value(terms: tuple[str, ...]) -> str:
    """First four enum terms, ``;``-joined, with the etc marker beyond
    four (src/create_submission.py:323-329)."""
    if len(terms) <= 4:
        return ";".join(terms)
    return ";".join(terms[:4]) + _ETC


def render_dictionary(
    schemas: dict[str, NodeSchema],
    descriptions: dict[str, str] | None = None,
    cde_codes: dict[str, str] | None = None,
    cde_versions: dict[str, str] | None = None,
    node_order: list[str] | None = None,
) -> list[dict]:
    """Dictionary sheet rows (src/create_submission.py:288-360).

    ``Required`` carries the NODE NAME when the prop is required (the
    reference's convention, src/create_submission.py:334-338), else
    None; ``Key`` is True or None.  Stable within a node (model prop
    order), nodes in preferred order.
    """
    descriptions = descriptions or {}
    cde_codes = cde_codes or {}
    cde_versions = cde_versions or {}
    order = node_order if node_order is not None else NODE_PREFERRED_ORDER
    rank = {n: i for i, n in enumerate(order)}
    nodes = sorted(
        schemas, key=lambda n: (rank.get(n, len(order)), list(schemas).index(n))
    )
    rows: list[dict] = []
    for node in nodes:
        for r in schemas[node].rules:
            rows.append({
                "Property": r.prop,
                "Description": descriptions.get(r.prop),
                "Node": node,
                "Type": r.type,
                "Example value": _example_value(r.enum_terms),
                "Required": node if r.required else None,
                "Key": True if r.key else None,
                "CDE": cde_codes.get(r.prop),
                "CDE version": cde_versions.get(r.prop),
            })
    return rows


def render_tavs(
    schemas: dict[str, NodeSchema],
    term_definitions: dict[str, str] | None = None,
    node_order: list[str] | None = None,
) -> list[dict]:
    """Terms and Value Sets sheet rows (src/create_submission.py:362-439).

    One block per distinct enum-carrying property — first occurrence
    wins for props shared across nodes — blocks sorted by property
    name, each followed by one all-None separator row.
    """
    term_definitions = term_definitions or {}
    order = node_order if node_order is not None else NODE_PREFERRED_ORDER
    rank = {n: i for i, n in enumerate(order)}
    nodes = sorted(
        schemas, key=lambda n: (rank.get(n, len(order)), list(schemas).index(n))
    )
    blocks: dict[str, tuple[str, ...]] = {}
    for node in nodes:
        for r in schemas[node].rules:
            if r.enum_terms and r.prop not in blocks:
                blocks[r.prop] = r.enum_terms
    rows: list[dict] = []
    for prop in sorted(blocks):
        for term in blocks[prop]:
            rows.append({
                "Value Set Name": prop,
                "(subset)": None,
                "Term": term,
                "Definition": term_definitions.get(term),
            })
        rows.append(dict.fromkeys(TAVS_COLS))
    return rows


def sheets_to_schemas(
    dictionary_rows: list[dict], tavs_rows: list[dict]
) -> dict[str, NodeSchema]:
    """Inverse render: Dictionary + TaVS rows → rule metadata.

    Enum term lists come from TaVS (the Dictionary's Example value is
    truncated at four); ``free_text`` is re-derived with the same
    policy as :func:`.schema_registry.parse_mdf`.
    """
    from .schema_registry import _NO_PII_SUFFIXES

    terms: dict[str, list[str]] = {}
    for row in tavs_rows:
        name = row.get("Value Set Name")
        if name is not None and row.get("Term") is not None:
            terms.setdefault(name, []).append(row["Term"])

    out: dict[str, NodeSchema] = {}
    for row in dictionary_rows:
        node, prop, type_ = row["Node"], row["Property"], row["Type"]
        inner = type_[6:-1] if type_.startswith("array[") else type_
        enum_terms = tuple(terms.get(prop, ())) if "enum" in inner else ()
        key = bool(row.get("Key"))
        rule = PropertyRule(
            prop=prop,
            type=type_,
            required=row.get("Required") == node,
            key=key,
            enum_terms=enum_terms,
            free_text=(
                inner == "string"
                and not key
                and not any(prop.endswith(s) for s in _NO_PII_SUFFIXES)
            ),
        )
        ns = out.setdefault(node, NodeSchema(node=node))
        ns.rules.append(rule)
        if key:
            ns.key_props.append(prop)
    return out
