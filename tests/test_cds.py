"""CDS flattening (plans/cds.py) — the reference's own invariants.

The reference validates its conversion by file-count preservation:
distinct (md5sum, file_name, file_url) into the path walk == out of
the final Metadata frame (src/s3_ccdi_to_cds.py:1030-1049).  These
tests assert that invariant on the synthetic graph, that every one of
the 14 catalog paths actually contributes rows (the graph plants all
link topologies), and the two conflict-priority rules.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from childhoodcancerdatainitiative_prefect_pipeline_spark.plans.cds import (
    CDS_PATHS,
    REVERSE_COLS,
    build_levels,
    cds_metadata,
    flatten_paths,
    join_hop,
)
from childhoodcancerdatainitiative_prefect_pipeline_spark.queries import (
    _CDS_FINAL_COLS,
    _CDS_REQUIRED_COLS,
    _cds_graph,
)


def _nodes(spark, sf_dir):
    g = _cds_graph(spark, sf_dir)
    study_level, participant_level = build_levels(
        g["study"], g["study_admin"], g["study_personnel"],
        g["participant"], g["diagnosis"],
    )
    return g, {
        "sample": g["sample"],
        "pdx": g["pdx"],
        "cell_line": g["cell_line"],
        "study_level": study_level,
        "participant_level": participant_level,
    }


def test_file_count_invariant(spark, sf_dir):
    """Every distinct file entering the walk must come out exactly
    once — the reference's own conversion check."""
    g, nodes = _nodes(spark, sf_dir)
    expected = (
        g["file"].select("md5sum", "file_name", "file_url").distinct().count()
    )
    out = cds_metadata(g["file"], nodes, _CDS_FINAL_COLS, _CDS_REQUIRED_COLS)
    returned = out.select("md5sum", "file_name", "file_url").distinct().count()
    assert expected == returned
    assert expected > 0


def test_all_14_paths_contribute(spark, sf_dir):
    """The synthetic graph plants every link topology, so each named
    path must produce rows; an empty path means the catalog entry is
    dead code."""
    g, nodes = _nodes(spark, sf_dir)
    assert len(CDS_PATHS) == 14
    for path in CDS_PATHS:
        cur = g["file"]
        for i, (node, key) in enumerate(path.chain):
            terminal = i == len(path.chain) - 1
            rev = REVERSE_COLS if (path.reverse_site and terminal) else ()
            cur = join_hop(nodes[node], cur, key, reverse_cols=rev)
        assert cur.limit(1).count() == 1, f"path {path.name} produced no rows"


def test_anatomic_site_reversal(spark):
    """participant_sample_* paths prefer the sample's anatomic_site
    over the diagnosis value; all other conflicts resolve parent-wins
    (src/s3_ccdi_to_cds.py:563-681)."""
    parent = spark.createDataFrame(
        [("p1", "dx-site", "PI")],
        ["participant_id", "anatomic_site", "personnel_type"],
    )
    child = spark.createDataFrame(
        [("p1", "sample-site", "f1"), ("p1", None, "f2")],
        ["participant_id", "anatomic_site", "file_url"],
    )
    reversed_out = {
        r["file_url"]: r["anatomic_site"]
        for r in join_hop(
            parent, child, "participant_id", reverse_cols=("anatomic_site",)
        ).collect()
    }
    assert reversed_out == {"f1": "sample-site", "f2": "dx-site"}
    parent_wins = {
        r["file_url"]: r["anatomic_site"]
        for r in join_hop(parent, child, "participant_id").collect()
    }
    assert parent_wins == {"f1": "dx-site", "f2": "dx-site"}


def test_pdx_hop_reparents_sample_id(spark):
    """The pdx hop's parent-wins coalesce must replace the file's
    original sample_id with the pdx's base sample — the behavior the
    reference needs for the file→sample→pdx→sample→participant walk
    (its 'previous sample_ids … confusing the join' comment)."""
    pdx = spark.createDataFrame(
        [("x1", "SB1", None)],
        "pdx_id string, sample_id string, study_id string",
    )
    cur = spark.createDataFrame(
        [("x1", "S1", "f1")], ["pdx_id", "sample_id", "file_url"]
    )
    out = join_hop(pdx, cur, "pdx_id").collect()
    assert out[0]["sample_id"] == "SB1"


def test_flatten_union_covers_file_links(spark, sf_dir):
    """Union of all paths must carry exactly the personnel fan-out:
    every (file, personnel_type) pair appears for its resolved study."""
    g, nodes = _nodes(spark, sf_dir)
    flat = flatten_paths(g["file"], nodes)
    # both personnel rows survive until the PI filter
    kinds = {
        r["personnel_type"]
        for r in flat.select("personnel_type").distinct().collect()
    }
    assert kinds == {"PI", "Co-PI"}
