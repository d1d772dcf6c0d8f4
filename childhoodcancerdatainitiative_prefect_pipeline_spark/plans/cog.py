"""COG clinical-rules battery (SURVEY.md §2, mapping batteries).

Spark re-expression of the reference's metadata-driven clinical
transformer (src/cog_rules_functions.py): a mapping file declares, per
(node, mode, property), a transform *function* over named input
columns, optional value *modifiers*, a *core* gate, and a required
default; the engine applies every rule to every input row and emits
one output frame per node (src/cog_rules_functions.py:662-757).

The reference evaluates rules row-at-a-time in pandas.  Here each rule
COMPILES to a single pyspark Column expression, so one ``select`` per
(node, mode) group evaluates the whole battery inside whole-stage
codegen — no Python in the loop, no row iteration, shuffle-free.

Transform registry (reference class → compiler):

- ``liftover`` (:28), ``concatenation`` (:36), ``difference`` (:45),
  ``age_event`` (:59), ``race_ethnicity`` (:73), ``parse_list``
  (:129), ``default`` (:137), ``efs_status`` (:213), ``efs_age``
  (:226), ``follow_up_response`` (:242) — bespoke compilers below;
- the dictionary mappers — CNS spatial extent (:99), diagnosis basis
  (:142), tumor grade (:169), substudy dx (:200), other treatment
  (:271), surgery type (:294), resection margin (:357), chemo ID/type
  (:421,:509) — are all instances of ONE ``mapping_union`` compiler
  parameterized by their mapping dict plus pre/post options
  (title-casing, contains-replacement, value drops, per-input
  pre-maps, post-demotes, empty default).

Known deviation: the reference joins multi-valued outputs with
``";".join(set(values))`` whose order is CPython-hash-dependent; this
engine pins FIRST-OCCURRENCE order (``array_distinct``) so results
are deterministic and oracle-checkable.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_NOISE = ("Other", "Unknown", "Not Reported")


@dataclass
class CogRule:
    """One mapping-file row (src/cog_rules_functions.py:662-699)."""

    node: str
    property: str
    function: str
    inputs: list[str] = field(default_factory=list)
    mode: str = "default"
    core: bool = False
    required_default: str | None = None
    #: modifier pipeline, applied in order (suffix/prefix/default/
    #: priority/regex_replace/regex_remove — src/cog_rules_functions.py:624-656)
    modifiers: list[tuple[str, str]] = field(default_factory=list)
    #: mapping_union options
    mapping: dict[str, str] = field(default_factory=dict)
    pre_map: dict[str, dict[str, str]] = field(default_factory=dict)
    drop_values: tuple[str, ...] = ()
    #: removed after mapping unconditionally (surgery's 'Not Applicable'
    #: filter, src/cog_rules_functions.py:355); empty result → null
    post_drop: tuple[str, ...] = ()
    #: removed after mapping only when MORE THAN ONE value survived
    #: (resection's RX / Positive-NOS demotes, src/cog_rules_functions.py:408-416);
    #: the size gate is evaluated once, before any demote
    post_demote: tuple[str, ...] = ()
    contains_replace: tuple[tuple[str, str], ...] = ()
    title_case: bool = False
    empty_default: str | None = None
    map_nulls_to: str | None = None


def _s(col: str) -> Column:
    return F.col(col).cast("string")


def _nonnull_array(inputs: list[str]) -> Column:
    """``[str(row[c]) for c in inputs if notna(row[c])]``"""
    return F.array_compact(F.array(*[_s(c) for c in inputs]))


def _join_distinct(arr: Column) -> Column:
    return F.array_join(F.array_distinct(arr), ";")


def _map_value(v: Column, mapping: dict[str, str]) -> Column:
    """``mapping_dict.get(v, v)`` as a map-literal lookup."""
    if not mapping:
        return v
    pairs: list[Column] = []
    for k, val in mapping.items():
        pairs.extend([F.lit(k), F.lit(val)])
    return F.coalesce(F.element_at(F.create_map(*pairs), v), v)


def _try_int(c: Column) -> Column:
    # int(str) in the reference raises on floats/garbage → None;
    # try_cast string→int nulls the same inputs.
    return c.cast("string").try_cast("int")


# --- per-function compilers -------------------------------------------------


def _liftover(r: CogRule) -> Column:
    return _s(r.inputs[0])


def _concatenation(r: CogRule) -> Column:
    vals = _nonnull_array(r.inputs)
    return F.when(F.size(vals) > 0, F.array_join(vals, "_"))


def _difference(r: CogRule) -> Column:
    a, b = _try_int(F.col(r.inputs[0])), _try_int(F.col(r.inputs[1]))
    return (b - a).cast("string")


def _age_event(r: CogRule) -> Column:
    a, b = _try_int(F.col(r.inputs[0])), _try_int(F.col(r.inputs[1]))
    return F.coalesce(F.abs(a) + b, F.lit(-999)).cast("string")


def _race_ethnicity(r: CogRule) -> Column:
    """src/cog_rules_functions.py:73-97 — both inputs required; the
    ethnicity side blanks its no-information vocab, then the race side
    blanks too when ethnicity is informative."""
    a0 = F.regexp_replace(F.initcap(_s(r.inputs[0])), "Or", "or")
    b0 = F.regexp_replace(F.initcap(_s(r.inputs[1])), "Or", "or")
    b = F.when(
        b0.isin("Not Hispanic or Latino", "Unknown", "Not Reported"), ""
    ).otherwise(b0)
    a = F.when((b != "") & a0.isin("Unknown", "Not Reported"), "").otherwise(a0)
    out = (
        F.when((a == "") & (b == ""), "Not Reported")
        .when((b != "") & (a != ""), F.concat_ws(";", a, b))
        .when(b != "", b)
        .otherwise(a)
    )
    return F.when(a0.isNotNull() & b0.isNotNull(), out)


def _parse_list(r: CogRule) -> Column:
    vals = _nonnull_array(r.inputs)
    return F.when(F.size(vals) > 0, _join_distinct(vals))


def _default(r: CogRule) -> Column:
    return F.lit(r.empty_default)


def _efs_status(r: CogRule) -> Column:
    vals = F.array_compact(
        F.transform(
            _nonnull_array(r.inputs),
            lambda v: F.when(~v.isin(*_NOISE), v),
        )
    )
    informative = F.size(vals) > 0
    had_any = F.size(_nonnull_array(r.inputs)) > 0
    return F.when(had_any & informative, "Not Censored")


def _efs_age(r: CogRule) -> Column:
    vals = _nonnull_array(r.inputs)
    ints = F.transform(vals, lambda v: v.try_cast("int"))
    ok = (F.size(vals) == 2) & ~F.exists(ints, lambda v: v.isNull())
    return F.when(
        ok, (F.array_max(ints) - F.array_min(ints)).cast("string")
    )


def _follow_up_response(r: CogRule) -> Column:
    """Positional key cascade (src/cog_rules_functions.py:242-269):
    inputs are (first-line-treatment, disease-exam, confirmed-complete-
    response, relapse/progression)."""
    first, exam, conf, prog = [_s(c) for c in r.inputs]
    return (
        F.when(
            (first == "Yes") & (exam == "Yes") & (conf == "Yes") & (prog == "No"),
            "Complete Remission",
        )
        .when((first == "Yes") & (exam == "Yes") & (prog == "Yes"),
              "Progressive Disease")
        .when((first == "Yes") & (exam == "Yes"), "Unknown")
        .when(
            (first != "Yes") & (conf == "Yes") & (prog == "No"),
            "Complete Remission",
        )
        .otherwise("Not Reported")
    )


def _mapping_union(r: CogRule) -> Column:
    """The generic dictionary-mapper shape shared by the CNS spatial
    extent / diagnosis basis / tumor grade / substudy dx / treatment /
    surgery / resection / chemo mappers: collect inputs → optional
    title-case → per-input pre-map → contains-replacement → drop noise
    vocab → mapping-dict lookup → distinct join, with an optional
    default when everything dropped and optional post-demotes."""
    cols: list[Column] = []
    for c in r.inputs:
        v: Column = _s(c)
        if r.title_case:
            v = F.initcap(v)
        if c in r.pre_map:
            v = _map_value(v, r.pre_map[c])
        if r.map_nulls_to is not None:
            v = F.coalesce(v, F.lit(r.map_nulls_to))
        cols.append(v)
    vals = F.array_compact(F.array(*cols))
    for needle, repl in r.contains_replace:
        vals = F.transform(
            vals, lambda v: F.when(v.contains(needle), F.lit(repl)).otherwise(v)
        )
    if r.drop_values:
        vals = F.array_compact(
            F.transform(vals, lambda v: F.when(~v.isin(*r.drop_values), v))
        )
    mapped = F.array_distinct(
        F.transform(vals, lambda v: _map_value(v, r.mapping))
    )
    if r.post_drop:
        mapped = F.array_compact(
            F.transform(mapped, lambda v: F.when(~v.isin(*r.post_drop), v))
        )
    if r.post_demote:
        demoted = F.array_compact(
            F.transform(mapped, lambda v: F.when(~v.isin(*r.post_demote), v))
        )
        mapped = F.when(F.size(mapped) > 1, demoted).otherwise(mapped)
    joined = F.array_join(mapped, ";")
    out = F.when(F.size(mapped) > 0, joined)
    if r.empty_default is not None:
        has_any = F.size(_nonnull_array(r.inputs)) > 0
        return F.when(
            has_any & (F.size(mapped) == 0), r.empty_default
        ).otherwise(out)
    return out


TRANSFORM_REGISTRY = {
    "liftover": _liftover,
    "concatenation": _concatenation,
    "difference": _difference,
    "age_event": _age_event,
    "race_ethnicity": _race_ethnicity,
    "parse_list": _parse_list,
    "default": _default,
    "efs_status": _efs_status,
    "efs_age": _efs_age,
    "follow_up_response": _follow_up_response,
    "mapping_union": _mapping_union,
}


def _apply_modifiers(value: Column, r: CogRule) -> Column:
    """src/cog_rules_functions.py:624-656 — runs only on non-null values."""
    modified = value
    for mod, mv in r.modifiers:
        if mod == "suffix":
            modified = F.concat(modified, F.lit("_" + mv))
        elif mod == "prefix":
            modified = F.concat(F.lit(mv + "_"), modified)
        elif mod == "default":
            modified = F.lit(mv)
        elif mod == "priority":
            n = int(mv)
            parts = F.split(modified, ";")
            modified = F.when(
                F.size(parts) > n, F.array_join(F.slice(parts, 1, n), ";")
            ).otherwise(modified)
        elif mod == "regex_replace":
            pat, repl = mv.split("%", 1)
            replaced = F.regexp_replace(modified, pat, repl)
            # strip(repl) then collapse 2+ repeats, as the reference does
            stripped = F.btrim(replaced, F.lit(repl))
            modified = F.regexp_replace(
                stripped, re.escape(repl) + "{2,}", repl
            )
        elif mod == "regex_remove":
            modified = F.regexp_replace(modified, mv, "")
        else:
            raise ValueError(f"unsupported modifier: {mod}")
    return F.when(value.isNotNull(), modified).otherwise(value)


def compile_rule(r: CogRule) -> Column:
    """rule metadata → one Column: transform → modifiers → required
    default (src/cog_rules_functions.py:692-699)."""
    if r.function not in TRANSFORM_REGISTRY:
        raise ValueError(f"unsupported function: {r.function}")
    value = _apply_modifiers(TRANSFORM_REGISTRY[r.function](r), r)
    if r.required_default is not None:
        return F.when(
            value.isNull() | (value == "") | (F.upper(value) == "NA"),
            r.required_default,
        ).otherwise(value)
    return value


def cog_transform(df: DataFrame, rules: list[CogRule]) -> dict[str, DataFrame]:
    """TransformerEngine.transform (src/cog_rules_functions.py:728-757):
    group rules by (node, mode); a row reaches a group's output only if
    some CORE rule has a non-null input (src/cog_rules_functions.py:713-721);
    per node, mode-group outputs union (missing columns null-filled).

    One projection per mode group over the same scan — Catalyst shares
    the scan, nothing shuffles, and every rule is codegen'd.
    """
    groups: dict[tuple[str, str], list[CogRule]] = {}
    for r in rules:
        groups.setdefault((r.node, r.mode), []).append(r)

    per_node: dict[str, DataFrame] = {}
    for (node, _mode), grp in groups.items():
        core_inputs = [c for r in grp if r.core for c in r.inputs]
        out = df
        if core_inputs:
            gate = None
            for c in core_inputs:
                cond = F.col(c).isNotNull()
                gate = cond if gate is None else (gate | cond)
            out = out.filter(gate)
        projected = out.select(
            *[compile_rule(r).alias(r.property) for r in grp]
        )
        per_node[node] = (
            projected
            if node not in per_node
            else per_node[node].unionByName(projected, allowMissingColumns=True)
        )
    return per_node


def tranche_sparsity_compare(
    old: DataFrame,
    new: DataFrame,
    substudy_col: str,
    props: list[str],
    na_bank: tuple[str, ...] = ("", "NA"),
) -> DataFrame:
    """COG tranche comparer (workflows/cog_comparer.py:19-98).

    The reference loops props in Python, computing per-prop per-substudy
    null ratios in each tranche, merging old vs new, classifying the
    change, and quartile-bucketing both sides.  Here each tranche is
    unpivoted once (``stack`` — one scan regardless of prop count) into
    ``(substudy, prop, value)``, NA-bank values nulled, and ONE
    ``groupBy(substudy, prop)`` computes every sparsity — two shuffles
    total (one per tranche) instead of 2×len(props) pandas groupbys.
    Ratios are rounded to 6 places on both engines for hash parity.
    """

    def sparsity(df: DataFrame, out: str) -> DataFrame:
        pairs: list = []
        for p in props:
            pairs += [F.lit(p), F.col(f"`{p}`")]
        long = df.select(
            F.col(substudy_col).alias("MCI_substudy"),
            F.stack(F.lit(len(props)), *pairs).alias("prop", "__v__"),
        ).withColumn(
            "__v__",
            F.when(F.col("__v__").isin(*na_bank), None).otherwise(F.col("__v__")),
        )
        return long.groupBy("prop", "MCI_substudy").agg(
            F.round(
                F.avg(F.when(F.col("__v__").isNull(), 1).otherwise(0)), 6
            ).alias(out)
        )

    bucket_edges = [(0.25, "0-25%"), (0.5, "25-50%"), (0.75, "50-75%")]

    def bucket(c: Column) -> Column:
        expr = F.lit("75-100%")
        for edge, label in reversed(bucket_edges):
            expr = F.when(c <= edge, label).otherwise(expr)
        return expr

    joined = sparsity(old, "sparsity_old_tranche").join(
        sparsity(new, "sparsity_new_tranche"), ["prop", "MCI_substudy"]
    )
    o, n = F.col("sparsity_old_tranche"), F.col("sparsity_new_tranche")
    return joined.select(
        "prop",
        "MCI_substudy",
        "sparsity_old_tranche",
        "sparsity_new_tranche",
        F.when(n > o, "increased")
        .when(n < o, "decreased")
        .otherwise("same")
        .alias("sparsity_change"),
        bucket(o).alias("sparsity_group_old_tranche"),
        bucket(n).alias("sparsity_group_new_tranche"),
    )
