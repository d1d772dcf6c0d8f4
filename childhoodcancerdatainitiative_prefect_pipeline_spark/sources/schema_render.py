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


# ---------------------------------------------------------------------------
# Node-sheet column layout + DCC variant (VERDICT r03 items 1/5).
#
# The non-DCC template surrogate is ``id`` and parent index columns are
# ``<parent>.id`` (src/create_submission.py:767-777); the DCC template
# renames both to ``guid`` (src/create_submission_ccdi_dcc.py, same
# function) and derives its sheet order from the model graph instead
# of a fully hand-curated list.
# ---------------------------------------------------------------------------

#: DCC preferred middle order (src/create_submission_ccdi_dcc.py,
#: ``_sort_nodes``): applied AFTER the root node and ``study_*`` nodes.
DCC_PREFERRED_NODES: list[str] = [
    "publication",
    "consent_group",
    "participant",
    "pdx",
    "cell_line",
    "diagnosis",
    "survival",
    "treatment_chemotherapy",
    "treatment_radiation",
    "treatment_surgery",
    "treatment_other",
    "treatment_response",
    "family_relationship",
    "medical_history",
    "exposure",
    "radiology_file",
    "genetic_analysis",
    "laboratory_test",
    "sample",
    "sequencing_file",
    "clinical_measure_file",
    "methylation_array_file",
    "cytogenomic_file",
    "pathology_file",
    "generic_file",
    "synonym",
]


def render_node_sheet_columns(
    props: list[str],
    parent_nodes: list[str],
    surrogate: str = "id",
) -> list[str]:
    """One node sheet's column order (src/create_submission.py:761-777).

    ``["type"] + <parent>.<parent>_id links + content props +
    surrogate + <parent>.<surrogate> index columns``.  The DCC
    template is the same layout with ``surrogate="guid"``
    (src/create_submission_ccdi_dcc.py) — the surrogate column and the
    parent index columns rename together.
    """
    parent_links = [f"{p}.{p}_id" for p in parent_nodes]
    parent_index = [f"{p}.{surrogate}" for p in parent_nodes]
    content = [p for p in props if p not in ("type", surrogate)]
    return ["type"] + parent_links + content + [surrogate] + parent_index


def dcc_node_order(
    nodes: list[str], parents_of: dict[str, list[str]]
) -> list[str]:
    """The DCC template's model-derived sheet order
    (src/create_submission_ccdi_dcc.py ``_sort_nodes``): the root node
    (no outgoing parent edges) first, then ``study_*`` nodes, then
    :data:`DCC_PREFERRED_NODES` that exist in the model, then any
    remaining nodes in model order.  Raises if the result is not a
    permutation of the input (the reference's assertion).
    """
    sorted_nodes: list[str] = []
    for n in nodes:
        if not parents_of.get(n):
            sorted_nodes.append(n)
            break
    if not sorted_nodes:
        # The reference's _get_sorted_node_list ends up with a [None]
        # root and asserts — a model with no parentless node (cyclic
        # parent edges) must fail loud, not silently reorder.
        raise ValueError("model has no root node (cyclic parents_of)")
    sorted_nodes += [
        n for n in nodes if n.startswith("study_") and n not in sorted_nodes
    ]
    sorted_nodes += [
        n for n in DCC_PREFERRED_NODES if n in nodes and n not in sorted_nodes
    ]
    sorted_nodes += [n for n in nodes if n not in sorted_nodes]
    if sorted(sorted_nodes) != sorted(nodes):
        raise ValueError(
            "sorted node list does not match the model's node list"
        )
    return sorted_nodes


# ---------------------------------------------------------------------------
# README and INSTRUCTIONS sheet (VERDICT r03 item 2).
#
# The runner's step-2 gate reads the embedded template version back
# out of this sheet: the version string ("v1.2.3") lives in the THIRD
# cell of the first row, so a pandas read with header=0 surfaces it as
# ``columns[2]`` and ``check_ccdi_version`` strips the leading "v"
# (src/utils.py:335-345, 1119-1122).  The renderer must therefore pin
# the first row exactly: [title, None, model_version, None].
# ---------------------------------------------------------------------------

README_SHEET = "README and INSTRUCTIONS"

# Shared instruction sentences (src/create_submission.py:556-625 and
# the DCC twin) — named once, assembled per variant below.
_R_OVERVIEW_FAIR = (
    "The submission metadata is useful to help make data FAIR for the "
    "potential users."
)
_R_KEEP_COLUMNS = (
    "Please do not delete columns, please keep the columns in the same order."
)
_R_FILL_REQUIRED = "Please fill out the required fields (see below)."
_R_TYPE_COLUMN = (
    "The first column, type, is a value that notes the tab you are in. "
    "Please do not replace with other text and make sure each row has "
    "the value for that node."
)
_R_LINK_ONE = (
    "When linking data from one tab to another, if there are multiple "
    "linking columns [node.node_id], please try to only link to one node."
)
_R_LINK_LOWEST = (
    "While linking can happen at multiple levels, it is best practice to "
    "link it to the lowest level as the parent node should eventually "
    "create that same linkage."
)
_R_REQUIRED_YELLOW = (
    "The required fields are denoted by BOLD black font with a yellow "
    "background."
)
_R_REQUIRED_DICT = (
    "These are also marked as being required on the dictionary tab with "
    'labels based on the section of data, like "study", "sample" or '
    '"participant".'
)
_R_OPTIONAL_GREY = "Optional fields are marked with grey font"
_R_FIELDS_DESCRIBED = (
    "Each of the fields on are described in Dictionary, along with terms "
    "and value sets (enumerated values)."
)
_R_BLUE_MODEL_REQ = (
    "Properties that are highlighted in blue are required in the model "
    "but are not required from the user at the time of submission."
)
_R_SEQ_FILES = (
    "For sequencing files, please try to provide all metadata, if "
    "applicable, for the following properties: avg_read_length, "
    "number_of_reads, number_of_bp, coverage"
)
_R_DICT_DEFINES = (
    'The "Dictionary" defines the top-level parts (or categories or '
    "tabs), their fields and allowed values."
)
_R_VALUE_SETS = (
    'Note that "Value Sets" column describes the name of the value set '
    "of enumerated values. The value sets and comprised terms are found "
    'on the tab "Terms and Value Sets". '
)
_R_CDE_CODE = (
    "Note that the column CDE provides the code used for the value set "
    "for reference purposes."
)
_R_REQUIRED_PRACTICE = (
    "The required fields are denoted with yellow background with black "
    "bold font. While not all fields are required, it is best practice "
    "to supply as much data as possible."
)
_R_TAVS_PLUS = (
    "To see the expanded set of values in the Terms and Value Sets tab, "
    'click the "plus" button on the left side of the table.'
)
_R_REACH_OUT = (
    "Feel free to reach out if you have questions or need help filling "
    "out this metadata manifest for your submission!"
)
_R_CONTACT = "Contact us at CCDIHelpDesk@mail.nih.gov"


def _readme_body(dcc: bool) -> list[tuple[str | None, str | None]]:
    """(col1, col2) pairs below the first row, per variant.

    Non-DCC: src/create_submission.py:556-625 (one STRUCTURED COLUMNS
    section, purple).  DCC: src/create_submission_ccdi_dcc.py:570-648
    (split into pink TYPE COLUMNS + purple RELATIONSHIP COLUMNS).
    """
    overview = (
        "This is the metadata template for submitting data to the "
        "Childhood Caner Data Initiative - Data Coordinating Center "
        "(CCDI-DCC)"
        if dcc
        else "This is the metadata template for submitting data to the "
        "Childhood Caner Data Initiative (CCDI)"
    )
    rows: list[tuple[str | None, str | None]] = [
        (None, None),
        ("OVERVIEW", None),
        (None, overview),
        (None, _R_OVERVIEW_FAIR),
        ("INSTRUCTIONS FOR SUBMISSION METADATA TEMPLATE", None),
        (None, _R_KEEP_COLUMNS),
        (None, _R_FILL_REQUIRED),
    ]
    if dcc:
        rows += [
            ("TYPE COLUMNS", None),
            (
                None,
                "The type fields are denoted by BOLD black font with a "
                "pink background.",
            ),
            (None, _R_TYPE_COLUMN),
            ("RELATIONSHIP COLUMNS", None),
            (
                None,
                "The relationship fields are denoted by BOLD black font "
                "with a purple background.",
            ),
            (None, _R_LINK_ONE),
            (None, _R_LINK_LOWEST),
        ]
    else:
        rows += [
            ("STRUCTURED COLUMNS", None),
            (
                None,
                "The structured fields are denoted by BOLD black font "
                "with a purple background.",
            ),
            (None, _R_TYPE_COLUMN),
            (None, _R_LINK_ONE),
            (None, _R_LINK_LOWEST),
        ]
    rows += [
        (None, None),
        ("REQUIRED DATA", _R_REQUIRED_YELLOW),
        (None, _R_REQUIRED_DICT),
        (None, _R_OPTIONAL_GREY),
        (None, _R_FIELDS_DESCRIBED),
        (None, None),
        ("OTHER REQUIRED DATA", _R_BLUE_MODEL_REQ),
        (None, None),
        ("REQUIRED DATA FOR DATA FILES", _R_SEQ_FILES),
        (None, None),
        ("DICTIONARY, TERMS AND VALUE SETS", _R_DICT_DEFINES),
        # non-DCC repeats a (trailing-space) STRUCTURED COLUMNS heading
        # here; the DCC drops it
        ("STRUCTURED COLUMNS " if not dcc else None, _R_VALUE_SETS),
        (None, _R_CDE_CODE),
        (None, _R_REQUIRED_PRACTICE),
        (None, _R_TAVS_PLUS),
        (None, None),
        ("NEED HELP? HAVE A QUESTION? HAVE FEEDBACK?", _R_REACH_OUT),
        (None, _R_CONTACT),
        (None, None),
        ("VERSION", None),
    ]
    return rows


def render_readme(
    model_version: str,
    release_title: str,
    release_history: list[tuple[str, str, str]] | None = None,
    dcc: bool = False,
) -> list[list]:
    """README and INSTRUCTIONS rows (4 columns, header included).

    ``model_version`` must carry the leading ``v`` (the reference
    strips it on read-back: ``manifest_version = columns[2][1:]``).
    ``release_history`` rows are (version, title, tag_url) triples from
    the release API; the current release is appended last, mirroring
    ``readme_sheet`` (src/create_submission.py:628-639).
    """
    if not model_version.startswith("v"):
        raise ValueError("model_version must start with 'v' (e.g. 'v1.9.1')")
    title = (
        "CCDI-DCC SUBMISSION METADATA TEMPLATE"
        if dcc
        else "CCDI SUBMISSION METADATA TEMPLATE"
    )
    repo = "ccdi-dcc-model" if dcc else "ccdi-model"
    rows: list[list] = [[title, None, model_version, None]]
    rows += [[c1, c2, None, None] for c1, c2 in _readme_body(dcc)]
    history = list(release_history or [])
    history.append(
        (
            model_version,
            release_title,
            f"https://github.com/CBIIT/{repo}/releases/tag/"
            + model_version[1:],
        )
    )
    rows += [[None, v, t, u] for v, t, u in history]
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
