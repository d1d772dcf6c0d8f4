"""COG clinical-rules battery — golden vectors hand-computed from the
reference transform classes (src/cog_rules_functions.py)."""

from pyspark.sql import functions as F

from childhoodcancerdatainitiative_prefect_pipeline_spark.plans.cog import (
    CogRule,
    cog_transform,
    compile_rule,
)


def _one(spark, rule, row, cols):
    df = spark.createDataFrame([row], ", ".join(f"{c} string" for c in cols))
    return df.select(compile_rule(rule).alias("v")).collect()[0]["v"]


def test_cog_scalar_transforms(spark):
    # liftover (:28) + prefix modifier (:636)
    assert (
        _one(
            spark,
            CogRule("p", "ID", "liftover", ["a"], modifiers=[("prefix", "COG")]),
            ("x1",), ["a"],
        )
        == "COG_x1"
    )
    # concatenation (:36): nulls dropped, '_' join, all-null → None
    r = CogRule("p", "C", "concatenation", ["a", "b"])
    assert _one(spark, r, ("x", "y"), ["a", "b"]) == "x_y"
    assert _one(spark, r, ("x", None), ["a", "b"]) == "x"
    assert _one(spark, r, (None, None), ["a", "b"]) is None
    # difference (:45): b - a, non-numeric → None
    r = CogRule("p", "D", "difference", ["a", "b"])
    assert _one(spark, r, ("3", "10"), ["a", "b"]) == "7"
    assert _one(spark, r, ("x", "10"), ["a", "b"]) is None
    assert _one(spark, r, (None, "10"), ["a", "b"]) is None
    # age_event (:59): abs(a) + b, missing/non-numeric → -999
    r = CogRule("p", "A", "age_event", ["a", "b"])
    assert _one(spark, r, ("-5", "10"), ["a", "b"]) == "15"
    assert _one(spark, r, (None, "10"), ["a", "b"]) == "-999"
    assert _one(spark, r, ("x", "10"), ["a", "b"]) == "-999"
    # efs_age (:226): |max - min|, needs exactly two numerics
    r = CogRule("p", "E", "efs_age", ["a", "b"])
    assert _one(spark, r, ("100", "30"), ["a", "b"]) == "70"
    assert _one(spark, r, ("100", None), ["a", "b"]) is None
    assert _one(spark, r, ("100", "x"), ["a", "b"]) is None


def test_cog_race_ethnicity(spark):
    # (:73-97) hand-computed against the reference cascade
    r = CogRule("p", "RE", "race_ethnicity", ["race", "eth"])
    cases = {
        ("white", "hispanic or latino"): "White;Hispanic or Latino",
        ("Unknown", "Hispanic or Latino"): "Hispanic or Latino",
        ("White", "Not Hispanic or Latino"): "White",
        # b blanks first, so a's noise survives when b is uninformative
        ("Unknown", "Not Reported"): "Unknown",
        ("Asian", "Unknown"): "Asian",
        (None, "Hispanic or Latino"): None,
    }
    for (a, b), want in cases.items():
        assert _one(spark, r, (a, b), ["race", "eth"]) == want, (a, b)


def test_cog_mapping_union_families(spark):
    # tumor grade (:169-199)
    grade = CogRule(
        "dx", "TG", "mapping_union", ["g1", "g2"],
        mapping={"II": "G2 Intermediate Grade", "IV": "G4 Anaplastic"},
    )
    assert (
        _one(spark, grade, ("II", None), ["g1", "g2"])
        == "G2 Intermediate Grade"
    )
    assert (
        _one(spark, grade, ("II", "IV"), ["g1", "g2"])
        == "G2 Intermediate Grade;G4 Anaplastic"
    )
    assert _one(spark, grade, ("weird", None), ["g1", "g2"]) == "weird"
    assert _one(spark, grade, (None, None), ["g1", "g2"]) is None

    # diagnosis basis (:142-167): .title() + 'iopsy' contains-replace
    basis = CogRule(
        "dx", "DB", "mapping_union", ["b1", "b2"],
        title_case=True,
        contains_replace=(("iopsy", "Pathology"),),
        mapping={"Histology": "Pathology", "Other": "Not Reported"},
    )
    assert _one(spark, basis, ("needle biopsy", None), ["b1", "b2"]) == "Pathology"
    assert (
        _one(spark, basis, ("histology", "other"), ["b1", "b2"])
        == "Pathology;Not Reported"
    )

    # CNS spatial extent (:99-127): noise mapped, empty → Not Reported
    extent = CogRule(
        "dx", "SE", "mapping_union", ["m1"],
        mapping={"M0": "Local", "M3": "Metastatic", "Not Answered": "Not Reported"},
    )
    assert _one(spark, extent, ("M3",), ["m1"]) == "Metastatic"

    # substudy dx (:200-211): noise dropped pre-map, empty → Not Reported
    sub = CogRule(
        "dx", "SD", "mapping_union", ["s1", "s2"],
        drop_values=("Other", "Unknown", "Not Reported"),
        empty_default="Not Reported",
    )
    assert _one(spark, sub, ("Other", "Unknown"), ["s1", "s2"]) == "Not Reported"
    assert _one(spark, sub, ("DxA", "Other"), ["s1", "s2"]) == "DxA"
    assert _one(spark, sub, (None, None), ["s1", "s2"]) is None

    # surgery type shape (:294-355): nulls → 'nan' → Not Applicable,
    # pre-map per input, ungated post-drop, empty → None
    surg = CogRule(
        "tx", "ST", "mapping_union", ["p1", "p2"],
        map_nulls_to="nan",
        pre_map={"p2": {"Yes": "Resection", "No": "Not Reported"}},
        mapping={"nan": "Not Applicable", "Biopsy Only": "Biopsy"},
        post_drop=("Not Applicable",),
    )
    assert _one(spark, surg, ("Biopsy Only", "Yes"), ["p1", "p2"]) == "Biopsy;Resection"
    assert _one(spark, surg, (None, None), ["p1", "p2"]) is None

    # resection margin demotes (:357-419): RX removed only when more
    # than one value survived; the size gate is checked ONCE, so
    # [RX, Positive] with both demoted empties to None
    res = CogRule(
        "tx", "RM", "mapping_union", ["m1", "m2"],
        mapping={"Negative": "R0", "Unknown": "RX", "Positive": "PosNOS"},
        post_demote=("RX", "PosNOS"),
    )
    assert _one(spark, res, ("Unknown", None), ["m1", "m2"]) == "RX"
    assert _one(spark, res, ("Unknown", "Negative"), ["m1", "m2"]) == "R0"
    assert _one(spark, res, ("Unknown", "Positive"), ["m1", "m2"]) is None


def test_cog_status_and_cascade(spark):
    # efs_status (:213-224)
    r = CogRule("sv", "ST", "efs_status", ["e1", "e2"])
    assert _one(spark, r, ("Relapse", "Other"), ["e1", "e2"]) == "Not Censored"
    assert _one(spark, r, ("Other", "Unknown"), ["e1", "e2"]) is None
    assert _one(spark, r, (None, None), ["e1", "e2"]) is None
    # follow_up_response (:242-269)
    r = CogRule("fu", "TR", "follow_up_response", ["f", "e", "c", "p"])
    cols = ["f", "e", "c", "p"]
    assert _one(spark, r, ("Yes", "Yes", "Yes", "No"), cols) == "Complete Remission"
    assert _one(spark, r, ("Yes", "Yes", "No", "Yes"), cols) == "Progressive Disease"
    assert _one(spark, r, ("Yes", "Yes", "No", "No"), cols) == "Unknown"
    assert _one(spark, r, ("No", "No", "Yes", "No"), cols) == "Complete Remission"
    assert _one(spark, r, ("No", "No", "No", "No"), cols) == "Not Reported"


def test_cog_modifiers_and_required_default(spark):
    # priority (:639-646): keep first n of ;-list only when longer
    r = CogRule(
        "p", "X", "parse_list", ["a", "b", "c"],
        modifiers=[("priority", "2")],
    )
    assert _one(spark, r, ("H", "M", "L"), ["a", "b", "c"]) == "H;M"
    assert _one(spark, r, ("H", "M", None), ["a", "b", "c"]) == "H;M"
    # regex_replace (:647-653): %-split, strip + collapse repeats
    r = CogRule(
        "p", "X", "liftover", ["a"],
        modifiers=[("regex_replace", "[ /]%-")],
    )
    assert _one(spark, r, ("a b/c",), ["a"]) == "a-b-c"
    assert _one(spark, r, (" ab  cd ",), ["a"]) == "ab-cd"
    # regex_remove (:654-655) + suffix; modifiers skip null values (:625)
    r = CogRule(
        "p", "X", "liftover", ["a"],
        modifiers=[("regex_remove", "[0-9]"), ("suffix", "v2")],
    )
    assert _one(spark, r, ("ab12",), ["a"]) == "ab_v2"
    assert _one(spark, r, (None,), ["a"]) is None
    # required_default fills null/empty/NA AFTER modifiers (:696-698)
    r = CogRule(
        "p", "X", "liftover", ["a"], required_default="Not Reported",
    )
    assert _one(spark, r, (None,), ["a"]) == "Not Reported"
    assert _one(spark, r, ("NA",), ["a"]) == "Not Reported"
    assert _one(spark, r, ("ok",), ["a"]) == "ok"
    # default function (:137): constant from the mapping file
    r = CogRule("p", "X", "default", [], empty_default="phs-999")
    assert _one(spark, r, ("ignored",), ["a"]) == "phs-999"


def test_cog_engine_core_gating_and_multi_mode(spark):
    """TransformerEngine (:728-757): core gate filters rows per mode
    group; a node's mode groups union with null-fill."""
    df = spark.createDataFrame(
        [
            ("p1", "White", "10", None),
            (None, "Asian", "20", None),   # fails participant core gate
            ("p3", None, None, "EventX"),
        ],
        "pid string, race string, age string, event string",
    )
    rules = [
        CogRule("participant", "ID", "liftover", ["pid"], mode="m1", core=True),
        CogRule("participant", "RACE", "liftover", ["race"], mode="m1",
                required_default="Not Reported"),
        CogRule("survival", "PID", "liftover", ["pid"], mode="m1", core=True),
        CogRule("survival", "EVENT", "liftover", ["event"], mode="m2",
                core=True),
    ]
    out = cog_transform(df, rules)
    assert set(out) == {"participant", "survival"}
    parts = {r["ID"]: r["RACE"] for r in out["participant"].collect()}
    assert parts == {"p1": "White", "p3": "Not Reported"}
    # survival: m1 contributes pid rows (EVENT null-filled), m2
    # contributes event rows (PID null-filled)
    sv = {(r["PID"], r["EVENT"]) for r in out["survival"].collect()}
    assert sv == {("p1", None), ("p3", None), (None, "EventX")}


def test_cog_no_python_udfs(spark):
    """Every compiled rule stays JVM-side — no BatchEvalPython."""
    df = spark.createDataFrame([("a", "b")], "a string, b string")
    rules = [
        CogRule("n", "P1", "race_ethnicity", ["a", "b"]),
        CogRule("n", "P2", "mapping_union", ["a", "b"],
                mapping={"x": "y"}, post_demote=("z",), post_drop=("w",),
                title_case=True, contains_replace=(("q", "r"),)),
        CogRule("n", "P3", "efs_age", ["a", "b"]),
    ]
    (node_df,) = cog_transform(df, rules).values()
    plan = node_df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
