"""Unit semantics for html_strip, k-anonymity, blocked fuzzy linkage."""

from __future__ import annotations

from pyspark.sql import functions as F

from childhoodcancerdatainitiative_prefect_pipeline_spark.operators.linkage import (
    best_match_per_left,
    blocked_fuzzy_matches,
)
from childhoodcancerdatainitiative_prefect_pipeline_spark.operators.privacy import (
    flag_risky_rows,
    k_anonymity_profile,
)
from childhoodcancerdatainitiative_prefect_pipeline_spark.operators.text import (
    html_strip,
)


def test_html_strip_semantics(spark):
    html = (
        '<html><script>if (1<2) alert("x")</script><style>p{}</style>'
        "<!-- c --><p>Tom &amp; Jerry</p><div>&lt;kept&gt;&nbsp;"
        "&quot;q&#39;s&quot;</div></html>"
    )
    got = (
        spark.range(1)
        .select(html_strip(F.lit(html)).alias("t"))
        .first()["t"]
    )
    assert got == "Tom & Jerry <kept> \"q's\""


def test_html_strip_literal_entities_survive_tag_removal(spark):
    # &lt;b&gt; is TEXT, not markup — decode must come after tag strip
    got = (
        spark.range(1)
        .select(html_strip(F.lit("<b>real</b> &lt;b&gt;fake&lt;/b&gt;")).alias("t"))
        .first()["t"]
    )
    assert got == "real <b>fake</b>"


def test_k_anonymity_flags(spark):
    rows = [("a", "x", "s1")] * 6 + [("a", "y", "s1")] * 2 + [
        ("b", "x", "s1"),
        ("b", "x", "s2"),
        ("b", "x", "s3"),
        ("b", "x", "s4"),
        ("b", "x", "s5"),
    ]
    df = spark.createDataFrame(rows, ["q1", "q2", "s"])
    prof = {
        (r["q1"], r["q2"]): r
        for r in k_anonymity_profile(
            df, ["q1", "q2"], sensitive_col="s", k=5, l_threshold=2
        ).collect()
    }
    assert not prof[("a", "x")]["at_risk_k"]  # n=6
    assert prof[("a", "x")]["at_risk_l"]  # homogeneous sensitive
    assert prof[("a", "y")]["at_risk_k"]  # n=2 < 5
    assert not prof[("b", "x")]["at_risk_k"] and not prof[("b", "x")]["at_risk_l"]
    flagged = flag_risky_rows(df, spark.createDataFrame(
        list(prof.values())), ["q1", "q2"])
    assert flagged.filter(F.col("at_risk_k")).count() == 2


def test_blocked_fuzzy_finds_planted_typos(spark):
    left = spark.createDataFrame(
        [(1, "machinery_17"), (2, "building_44"), (3, "household_9")],
        ["lid", "name"],
    )
    right = spark.createDataFrame(
        [
            (11, "machinery_17"),   # exact
            (12, "macxinery_17"),   # 1 substitution
            (22, "bulding_44"),     # 1 deletion (len bucket may shift)
            (33, "zzz_9"),          # unrelated
        ],
        ["rid", "name"],
    )
    m = blocked_fuzzy_matches(left, right, "lid", "rid", max_dist=2)
    best = {r["lid"]: (r["rid"], r["distance"])
            for r in best_match_per_left(m, "lid", "rid").collect()}
    assert best[1] == (11, 0)  # exact beats the typo candidate
    # lid=3 must not match zzz_9 (different block AND distance > 2)
    assert 3 not in best


def test_blocked_fuzzy_max_block_caps_degenerate_blocks(spark):
    left = spark.createDataFrame(
        [(i, f"aaaa_{i % 2}") for i in range(40)], ["lid", "name"]
    )
    right = spark.createDataFrame(
        [(i, f"aaaa_{i % 2}") for i in range(40)], ["rid", "name"]
    )
    uncapped = blocked_fuzzy_matches(left, right, "lid", "rid", max_dist=2)
    capped = blocked_fuzzy_matches(
        left, right, "lid", "rid", max_dist=2, max_block=10
    )
    assert uncapped.count() == 40 * 40  # one degenerate block squared
    assert capped.count() == 0  # oversized block dropped entirely


def test_flag_risky_rows_matches_null_quasi_identifiers(spark):
    """NULL QI cells are often the most at-risk; the join-back must be
    null-safe or exactly those rows lose their flags."""
    df = spark.createDataFrame(
        [(None, "x", "s1"), (None, "x", "s1"), ("a", "x", "s2")],
        "q1 string, q2 string, s string",
    )
    prof = k_anonymity_profile(df, ["q1", "q2"], sensitive_col="s", k=5)
    flagged = flag_risky_rows(df, prof, ["q1", "q2"])
    rows = flagged.filter(F.col("q1").isNull()).collect()
    assert len(rows) == 2
    assert all(r["at_risk_k"] is True for r in rows)  # n=2 < 5, matched


def test_dataset_card_renders_from_manifest(spark, sf_dir):
    from childhoodcancerdatainitiative_prefect_pipeline_spark.queries import (
        REGISTRY,
    )
    from childhoodcancerdatainitiative_prefect_pipeline_spark.report import (
        dataset_card,
    )

    manifest = REGISTRY["corpus_training_manifest"].fn(spark, sf_dir)
    card = dataset_card(manifest)
    assert card.startswith("# Dataset card")
    for section in ("## Sources", "## Languages (predicted)", "## Splits"):
        assert section in card
    assert "| split | n_docs | n_tokens | n_kept |" in card
    # kept counts must be internally consistent with the manifest
    kept = manifest.filter("keep").count()
    assert f"({kept} kept)" in card
