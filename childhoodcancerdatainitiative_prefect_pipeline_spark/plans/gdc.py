"""GDC mapping battery (src/ccdi_gdc_mapping_functions.py).

The reference declares one Transformation class per GDC-bound output
column and applies them row-at-a-time in pandas
(src/ccdi_gdc_mapping_functions.py:85-420).  Every transform is
row-local, so here each compiles to ONE pyspark Column expression —
the whole battery is a single projection inside whole-stage codegen:
no Python, no shuffle, no joins (the mapping files are small dicts
and become ``create_map`` literals, the Column analog of the
reference's broadcast dict lookups).

Compiled transforms and their reference classes:

- ``race_col`` / ``ethnicity_col`` — Race_Mapper (:127) strips
  hispanic/latino terms and keeps the FIRST remaining race;
  Ethnicity_Mapper (:150) keeps only hispanic/latino terms.
- ``sex_col`` — Sex_Mapper (:173).
- ``wxs_rg_id_col`` / ``read_pair_col`` / ``channel_color_col`` —
  filename regex parsers (:199,:216,:228).
- ``specimen_col`` — Specimen_Mapper (:247) tumor/normal contains.
- ``tumor_descriptor_col`` — Tumor_Desc_Mapper (:264) spatial-extent
  cascade with sample-type fallback.
- ``multi_map_col`` — the shared shape of Disease_Type_Mapper (:292),
  Primary_Site_Mapper (:329), Tissue_Mapper (:355): split ``;``,
  optionally drop unmatched entries, dict-map each with a
  ``Not Mapped`` default, dedup, single value or ``;``-join.
- ``single_map_col`` — Morphology_Mapper / Prim_Dx_Mapper (:380,:404):
  plain dict lookup, unmapped → null.

Known deviation (documented, deterministic): the reference joins
multi-valued mapping outputs with ``";".join(set(...))`` whose order
is CPython-hash-dependent; this engine pins SORTED order
(``array_sort(array_distinct(...))``) so results are stable and
oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _lit_map(d: dict[str, str]) -> Column:
    parts: list[Column] = []
    for k, v in d.items():
        parts += [F.lit(k), F.lit(v)]
    return F.create_map(*parts)


def _blankish(c: Column) -> Column:
    return c.isNull() | (F.trim(c) == "")


def race_col(race: Column) -> Column:
    """Race_Mapper (:127): drop hispanic/latino terms, first survivor."""
    kept = F.filter(
        F.split(race, ";"),
        lambda v: ~(
            F.lower(v).contains("hispanic") | F.lower(v).contains("latino")
        ),
    )
    first = F.try_element_at(F.transform(kept, lambda v: F.trim(F.lower(v))), F.lit(1))
    return F.when(_blankish(race), "Unknown").otherwise(
        F.coalesce(first, F.lit("Unknown"))
    )


def ethnicity_col(race: Column) -> Column:
    """Ethnicity_Mapper (:150): keep only hispanic/latino terms."""
    kept = F.filter(
        F.split(race, ";"),
        lambda v: F.lower(v).contains("hispanic") | F.lower(v).contains("latino"),
    )
    first = F.try_element_at(F.transform(kept, lambda v: F.trim(F.lower(v))), F.lit(1))
    return F.when(_blankish(race), "not reported").otherwise(
        F.coalesce(first, F.lit("not reported"))
    )


def sex_col(sex: Column) -> Column:
    """Sex_Mapper (:173)."""
    low = F.lower(sex)
    return (
        F.when(_blankish(sex), "unknown")
        .when(low.isin("male", "m"), "male")
        .when(low.isin("female", "f"), "female")
        .otherwise("unknown")
    )


#: WXS read-group pattern (src/ccdi_gdc_mapping_functions.py:205)
_RG_PATTERN = r"^(?:[^_]+_){3}([^_]+(?:_[^_]+)*)_R\d+_\d+"


def wxs_rg_id_col(sample_id: Column, file_name: Column) -> Column:
    """WXS_RG_ID_Parse (:199): ``<sample>_rg_<group>`` or null."""
    grp = F.regexp_extract(file_name, _RG_PATTERN, 1)
    return F.when(
        sample_id.isNotNull() & file_name.isNotNull() & (grp != ""),
        F.concat(sample_id, F.lit("_rg_"), grp),
    )


def read_pair_col(file_name: Column) -> Column:
    """Read_Pair_Parse (:216)."""
    m = F.regexp_extract(file_name, r"_(R\d)_\d+", 1)
    return F.when(m != "", m)


def channel_color_col(file_name: Column) -> Column:
    """Channel_Color (:228): Grn/Red idat suffix → Green/Red."""
    m = F.lower(F.regexp_extract(file_name, r"_(Grn|Red).idat", 1))
    return F.when(m == "grn", "Green").when(m == "red", "Red")


def specimen_col(specimen: Column) -> Column:
    """Specimen_Mapper (:247)."""
    low = F.lower(specimen)
    return (
        F.when(_blankish(specimen), None)
        .when(low.contains("tumor"), "Solid Tissue")
        .when(low.contains("normal"), "Peripheral Whole Blood")
    )


def tumor_descriptor_col(tumor_spatial: Column, sample_type: Column) -> Column:
    """Tumor_Desc_Mapper (:264).

    Faithful to the reference's positional-values quirk: when
    ``tumor_spatial`` is null the non-null ``sample_type`` shifts into
    its place (values[0]) and the fallback branch sees no sample type.
    """
    ts = F.coalesce(tumor_spatial, sample_type)
    st = F.when(tumor_spatial.isNotNull(), sample_type)
    low_ts = F.lower(ts)
    low_st = F.lower(st)
    return (
        F.when(tumor_spatial.isNull() & sample_type.isNull(), None)
        .when(low_ts.contains("local"), "Primary")
        .when(low_ts.contains("metastatic"), "Metastatic")
        .when(
            (low_ts.contains("not reported") | low_ts.contains("unknown"))
            & low_st.isin("solid tissue", "tumor"),
            "Primary",
        )
        .when(
            (low_ts.contains("not reported") | low_ts.contains("unknown"))
            & low_st.isin("peripheral whole blood", "normal"),
            "Not Applicable",
        )
        .otherwise("Not Reported")
    )


def multi_map_col(
    value: Column,
    mapping: dict[str, str],
    unmatched: tuple[str, ...] = (),
) -> Column:
    """Disease_Type/Primary_Site/Tissue mapper shape (:292-377).

    Split ``;`` → trim → drop ``unmatched`` entries → map each with
    ``Not Mapped`` default → sorted dedup → single value, else join of
    the mapped survivors, else ``Not Mapped``.
    """
    m = _lit_map(mapping)
    vals = F.transform(F.split(value, ";"), lambda v: F.trim(v))
    if unmatched:
        vals = F.filter(vals, lambda v: ~v.isin(*unmatched))
    mapped = F.array_sort(
        F.array_distinct(
            F.transform(
                vals, lambda v: F.coalesce(F.try_element_at(m, v), F.lit("Not Mapped"))
            )
        )
    )
    survivors = F.filter(mapped, lambda v: v != "Not Mapped")
    return F.when(_blankish(value), None).otherwise(
        F.when(F.size(mapped) == 1, F.try_element_at(mapped, F.lit(1))).otherwise(
            F.when(F.size(survivors) > 0, F.array_join(survivors, ";")).otherwise(
                "Not Mapped"
            )
        )
    )


def single_map_col(value: Column, mapping: dict[str, str]) -> Column:
    """Morphology/Prim_Dx mapper (:380-420): unmapped → null."""
    m = _lit_map(mapping)
    return F.when(_blankish(value), None).otherwise(
        F.try_element_at(m, F.trim(value))
    )
