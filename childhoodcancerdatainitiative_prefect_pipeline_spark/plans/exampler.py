"""Template Exampler — schema-driven synthetic data (SURVEY.md §2.12).

The reference generates schema-valid fake manifests per property type
(md5/uuid/url/age/int/float/word-strings/enum picks/';'-arrays) and
wires parent-child links by sampling parent keys
(src/template_exampler.py:50-327, create_linkage :185-216).

Spark rendering: ``spark.range(n)`` seeds the rows; every generator
is a deterministic Column expression over a seeded ``rand``/hash so
fixtures are reproducible; linkage is a key-sampling join.  Generating
a billion-row fixture is the same plan as twenty rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .rules import NodeSchema, PropertyRule

WORDS = (
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
)


def _rand(seed: int) -> Column:
    return F.rand(seed)


def gen_value(rule: PropertyRule, node: str, idx: Column, seed: int = 42) -> Column:
    """One property's generator expression, by declared type.

    Mirrors populate_exampler's per-type branches
    (src/template_exampler.py:50-182).
    """
    salt = F.xxhash64(F.concat_ws("::", F.lit(node), F.lit(rule.prop), idx.cast("string")), F.lit(seed))
    pos = F.pmod(salt, F.lit(1_000_000)).cast("double") / 1_000_000.0
    if rule.key:
        return F.concat(F.lit(f"{node}_{rule.prop}_"), idx.cast("string"))
    t = rule.inner_type
    if t == "integer":
        return F.pmod(salt, F.lit(10_000)).cast("string")
    if t == "number":
        return F.round(pos * 1000, 3).cast("string")
    if rule.enum_terms:
        arr = F.array(*[F.lit(x) for x in rule.enum_terms])
        pick = F.element_at(arr, (F.pmod(salt, F.lit(len(rule.enum_terms))) + 1).cast("int"))
        if rule.is_array:
            second = F.element_at(
                arr,
                (F.pmod(salt + 1, F.lit(len(rule.enum_terms))) + 1).cast("int"),
            )
            return F.concat_ws(";", F.array_distinct(F.array(pick, second)))
        return pick
    if rule.prop.endswith("md5sum"):
        return F.lower(F.hex(F.unhex(F.substring(F.md5(salt.cast("string")), 1, 32))))
    if rule.prop.endswith("_url"):
        return F.concat(F.lit("s3://synthetic-bucket/"), F.lit(node), F.lit("/f"), idx.cast("string"))
    word = F.element_at(
        F.array(*[F.lit(w) for w in WORDS]),
        (F.pmod(salt, F.lit(len(WORDS))) + 1).cast("int"),
    )
    return F.concat(word, F.lit(" "), F.lit(rule.prop))


def generate_node(
    spark: SparkSession,
    schema: NodeSchema,
    n_rows: int,
    seed: int = 42,
) -> DataFrame:
    """Generate one schema-valid node table of ``n_rows``."""
    base = spark.range(n_rows).withColumnRenamed("id", "__i__")
    cols = [F.lit(schema.node).alias("type")]
    for r in schema.rules:
        cols.append(gen_value(r, schema.node, F.col("__i__"), seed).alias(r.prop))
    return base.select(*cols)


def create_linkage(
    child: DataFrame,
    parent: DataFrame,
    parent_key: str,
    link_col: str | None = None,
    seed: int = 42,
) -> DataFrame:
    """Wire child rows to sampled parent keys (create_linkage,
    src/template_exampler.py:185-216).

    Deterministic: each child row picks parent ``hash(child) mod
    n_parents`` via a broadcast join on the bucket — no driver
    collection of parent keys at scale.
    """
    from pyspark.sql import Window

    w = Window.orderBy(parent_key)
    parents = parent.select(F.col(parent_key)).distinct().withColumn(
        "__bucket__", F.row_number().over(w) - 1
    )
    n = parents.count()
    out_col = link_col or f"{parent_key}"
    keyed = child.withColumn(
        "__bucket__",
        F.pmod(F.xxhash64(F.concat_ws("|", *child.columns), F.lit(seed)), F.lit(n)),
    )
    return (
        keyed.join(F.broadcast(parents), on="__bucket__", how="left")
        .withColumnRenamed(parent_key, out_col)
        .drop("__bucket__")
    )


def seeded_error_variant(
    df: DataFrame, schema: NodeSchema, every_n: int = 10, seed: int = 7
) -> DataFrame:
    """Plant one violation type per rule family at known rows
    (the reference's *_w_missing_value_additional_error fixture).

    Rows where ``hash(key) % every_n == k`` get: k=0 → required null,
    k=1 → leading whitespace, k=2 → out-of-vocab enum, k=3 →
    non-numeric in integer column.
    """
    key = schema.key_props[0] if schema.key_props else df.columns[0]
    bucket = F.pmod(F.xxhash64(F.col(key).cast("string"), F.lit(seed)), F.lit(every_n))
    exprs = []
    for f_ in df.schema.fields:
        c = F.col(f_.name)
        r = schema.rule(f_.name)
        if r is None:
            exprs.append(c)
            continue
        if r.required and not r.key:
            c = F.when(bucket == 0, F.lit(None)).otherwise(c)
        if r.inner_type in ("enum", "string;enum") and r.enum_terms:
            c = F.when(bucket == 2, F.lit("__INVALID_TERM__")).otherwise(c)
        if r.inner_type == "integer":
            c = F.when(bucket == 3, F.lit("not_a_number")).otherwise(c)
        if not r.key:
            c = F.when(bucket == 1, F.concat(F.lit(" "), c)).otherwise(c)
        exprs.append(c.alias(f_.name))
    return df.select(*exprs)
