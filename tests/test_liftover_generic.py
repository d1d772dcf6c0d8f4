"""Generic MDF-driven TSV liftover (src/liftover_generic.py:205-457)."""

import os

from childhoodcancerdatainitiative_prefect_pipeline_spark.plans.liftover import (
    MappingRow,
    lift_node_generic,
    liftover_tsv_dir,
)


def test_lift_node_generic_schema_defaults_and_drop(spark):
    src = spark.createDataFrame(
        [
            ("p1", "lung", "Alive"),
            ("p2", None, None),
            (None, None, None),  # all target props null → dropped
        ],
        "sid string, site string, vital string",
    )
    mapping = [
        MappingRow("subject", "sid", "sample", "sample_id"),
        MappingRow("subject", "site", "sample", "anatomic_site"),
        MappingRow("subject", "vital", "sample", "vital_status"),
    ]
    out = lift_node_generic(
        {"subject": src},
        mapping,
        "sample",
        # full lift-to model prop list: tumor_status has no mapping
        ["sample_id", "anatomic_site", "vital_status", "tumor_status"],
        defaults={"vital_status": "Unknown", "tumor_status": "Not Reported"},
    )
    assert out.columns == [
        "type", "sample_id", "anatomic_site", "vital_status", "tumor_status",
    ]
    rows = {r["sample_id"]: r for r in out.collect()}
    assert set(rows) == {"p1", "p2"}  # all-null row dropped
    assert rows["p1"]["vital_status"] == "Alive"
    assert rows["p2"]["vital_status"] == "Unknown"  # default fill
    assert rows["p1"]["tumor_status"] == "Not Reported"  # unmapped + default
    assert all(r["type"] == "sample" for r in rows.values())


def test_liftover_tsv_dir_end_to_end(spark, tmp_path):
    """TSV folder in → node identification by `type` column → lift →
    TSV per target node out, with singleton counts surfaced."""
    in_dir, out_dir = tmp_path / "in", tmp_path / "out"
    in_dir.mkdir()
    (in_dir / "a.tsv").write_text(
        "type\told_study_id\ttitle\nstudy\tphs-1\tT1\n"
    )
    (in_dir / "b.tsv").write_text(
        "type\told_pid\tsex\nparticipant\tp1\tF\nparticipant\tp2\tM\n"
    )
    mapping = [
        MappingRow("study", "old_study_id", "study", "study_id"),
        MappingRow("study", "title", "study", "study_title"),
        MappingRow("participant", "old_pid", "participant", "participant_id"),
        MappingRow("participant", "sex", "participant", "sex_at_birth"),
    ]
    schema = {
        "study": ["study_id", "study_title"],
        "participant": ["participant_id", "sex_at_birth", "race"],
        "sample": ["sample_id"],  # no mapping rows → skipped
    }
    counts = liftover_tsv_dir(
        spark, str(in_dir), str(out_dir), mapping, schema,
        defaults={"participant": {"race": "Not Reported"}},
    )
    assert counts == {"study": 1, "participant": 2}

    from childhoodcancerdatainitiative_prefect_pipeline_spark.sources.files import (
        read_tsv,
    )

    part = read_tsv(spark, os.path.join(str(out_dir), "participant.tsv"))
    got = {(r["participant_id"], r["sex_at_birth"], r["race"])
           for r in part.collect()}
    assert got == {("p1", "F", "Not Reported"), ("p2", "M", "Not Reported")}
