"""Driver-window rotation rules (__spark_entry__._already_certified).

VERDICT r7 item 8: the rotation encodes subtle rules — pin them over a
synthetic CORRECTNESS history so a future refactor can't silently
change which entries get driver-window slots:

1. hash_match=True              -> certified (sinks to back).
2. hash_match=False             -> NOT certified (real failure).
3. hash_match=None, rows-only   -> certified (weaker check is all it
                                   can ever earn).
4. hash_match=None, now-oracle  -> NOT certified (oracle upgrade must
                                   re-front the entry).
5. err set (incl. 'no_oracle')  -> NOT certified.
6. fingerprint drift            -> certification VOIDED even after a
                                   hash pass (ADVICE r7 item 3).
"""

from __future__ import annotations

import json
import sys
from types import SimpleNamespace

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod


def _fake_registry():
    def fn_a(spark, sf):  # pragma: no cover - source only hashed
        return 1

    def fn_b(spark, sf):  # pragma: no cover
        return 2

    def fn_c(spark, sf):  # pragma: no cover
        return 3

    return {
        "hash_pass": SimpleNamespace(fn=fn_a, oracle="SELECT 1"),
        "hash_fail": SimpleNamespace(fn=fn_a, oracle="SELECT 2"),
        "rows_only": SimpleNamespace(fn=fn_b, oracle=None),
        "upgraded": SimpleNamespace(fn=fn_b, oracle="SELECT 3"),
        "errored": SimpleNamespace(fn=fn_c, oracle="SELECT 4"),
        "reworked": SimpleNamespace(fn=fn_c, oracle="SELECT 5"),
    }


def _write_history(tmp_path, registry, reworked_fp="stale"):
    rec_ok = {"rows_match": True, "schema_match": True, "hash_match": True,
              "spark_rows": 1, "oracle_rows": 1, "err": None}
    rec_fail = dict(rec_ok, hash_match=False)
    rec_rows = {"rows_match": True, "schema_match": True, "hash_match": None,
                "spark_rows": 1, "oracle_rows": None, "err": None}
    rec_err = {"rows_match": None, "schema_match": None, "hash_match": None,
               "spark_rows": 1, "oracle_rows": None, "err": "no_oracle"}
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps({
        "hash_pass": rec_ok,
        "hash_fail": rec_fail,
        "rows_only": rec_rows,   # rows-only then, rows-only now
        "upgraded": rec_rows,    # rows-only then, HAS oracle now
        "errored": rec_err,
        "reworked": rec_ok,      # hash pass then, source changed since
    }))
    fp_real = entrymod._fingerprint(registry["hash_pass"])
    (tmp_path / "CERT_FINGERPRINTS.json").write_text(json.dumps({
        "hash_pass": {"fp": fp_real, "round": "r01"},
        "reworked": {"fp": reworked_fp, "round": "r01"},
    }))


def test_rotation_rules(tmp_path):
    reg = _fake_registry()
    _write_history(tmp_path, reg)
    done = entrymod._already_certified(artifact_dir=tmp_path, registry=reg)
    assert "hash_pass" in done          # rule 1
    assert "hash_fail" not in done      # rule 2
    assert "rows_only" in done          # rule 3
    assert "upgraded" not in done       # rule 4
    assert "errored" not in done        # rule 5
    assert "reworked" not in done       # rule 6 (fingerprint drift)


def test_unfingerprinted_entry_stays_certified(tmp_path):
    """Entries certified before the fingerprint file existed keep their
    status (the updater backfills them at the next round boundary)."""
    reg = _fake_registry()
    _write_history(tmp_path, reg)
    fps = json.loads((tmp_path / "CERT_FINGERPRINTS.json").read_text())
    del fps["reworked"]
    (tmp_path / "CERT_FINGERPRINTS.json").write_text(json.dumps(fps))
    done = entrymod._already_certified(artifact_dir=tmp_path, registry=reg)
    assert "reworked" in done


def test_matching_fingerprint_keeps_certification(tmp_path):
    reg = _fake_registry()
    _write_history(
        tmp_path, reg, reworked_fp=entrymod._fingerprint(reg["reworked"])
    )
    done = entrymod._already_certified(artifact_dir=tmp_path, registry=reg)
    assert "reworked" in done


def test_updater_script_uses_tree_fingerprint():
    """r10: scripts/update_cert_fingerprints.py no longer duplicates
    the algorithm — it loads the target tree's __spark_entry__ and uses
    ITS _fingerprint, so the two cannot drift apart."""
    import pathlib

    sys.path.insert(0, "/root/repo/scripts")
    import update_cert_fingerprints as upd

    mod = upd._load_entry_module(pathlib.Path("/root/repo"))
    reg = _fake_registry()
    for q in reg.values():
        assert mod._fingerprint(q) == entrymod._fingerprint(q)


def test_helper_module_drift_voids_fingerprint(tmp_path, monkeypatch):
    """VERDICT r9 item 1 (the 'done =' criterion): editing a HELPER
    module on the fn's execution path — not the fn itself — must change
    the fingerprint, so the certification voids automatically with no
    manual _CERTIFY_FIRST prepend."""
    import importlib
    import linecache

    pkg = tmp_path / "fpfakepkg"
    pkg.mkdir()
    (pkg / "__init__.py").write_text("")
    helper = pkg / "helper.py"
    helper.write_text("def boost(x):\n    return x + 1\n")
    (pkg / "main.py").write_text(
        "def run(spark, sf):\n"
        "    from .helper import boost\n"
        "    return boost(1)\n"
    )
    monkeypatch.syspath_prepend(str(tmp_path))
    monkeypatch.setattr(entrymod, "_PKG", "fpfakepkg")
    try:
        main = importlib.import_module("fpfakepkg.main")
        q = SimpleNamespace(fn=main.run, oracle="SELECT 1")
        fp1 = entrymod._fingerprint(q)
        assert entrymod._fingerprint(q) == fp1  # deterministic
        # the dep walk actually saw the helper
        nodes = entrymod._dep_nodes(main.run)
        assert any(
            t[0] == "f" and t[1] == "fpfakepkg.helper" for t in nodes
        ), nodes
        # rework the helper ONLY; the registered fn's source is untouched
        helper.write_text("def boost(x):\n    return x + 2\n")
        importlib.invalidate_caches()
        importlib.reload(sys.modules["fpfakepkg.helper"])
        linecache.checkcache()
        # per-process memo caches hold pre-edit objects; a real rework
        # lands on disk and the driver fingerprints in a fresh process
        entrymod._DEP_SRC_CACHE.clear()
        entrymod._DEP_IMPORT_CACHE.clear()
        fp2 = entrymod._fingerprint(q)
        assert fp2 != fp1, "helper rework did not void the fingerprint"
    finally:
        for name in list(sys.modules):
            if name.startswith("fpfakepkg"):
                del sys.modules[name]
        entrymod._DEP_SRC_CACHE.clear()
        entrymod._DEP_IMPORT_CACHE.clear()


def test_stamp_after_green_flow(tmp_path):
    """VERDICT r8 item 1: the round-boundary re-stamp flow. An entry
    hash-green in rNN whose fingerprint is still stale stays VOIDED
    (it was reworked after stamping) until the updater re-stamps it
    from a verified tree, after which it is certified again without a
    fresh driver pass."""
    reg = _fake_registry()
    _write_history(tmp_path, reg, reworked_fp="stale")
    done = entrymod._already_certified(artifact_dir=tmp_path, registry=reg)
    assert "reworked" not in done  # green in r01 + stale fp -> void
    # Re-stamp from the current tree (what update_cert_fingerprints.py
    # does at the round boundary, after verify_driver.py passes).
    fps = json.loads((tmp_path / "CERT_FINGERPRINTS.json").read_text())
    fps["reworked"] = {
        "fp": entrymod._fingerprint(reg["reworked"]), "round": "r01",
    }
    (tmp_path / "CERT_FINGERPRINTS.json").write_text(json.dumps(fps))
    done = entrymod._already_certified(artifact_dir=tmp_path, registry=reg)
    assert "reworked" in done  # green in r01 + current fp -> certified


def test_live_fingerprints_match_current_tree():
    """Tripwire for VERDICT r8 item 1: on the live repo, no stamped
    fingerprint may drift from the current source — a drift means a
    query was reworked without re-running verify_driver.py + the
    updater, and the driver would burn r-window slots re-proving
    greens. Fix by verifying locally then re-stamping:
        python scripts/verify_driver.py && \
        python scripts/update_cert_fingerprints.py
    """
    import pathlib

    fps = json.loads(
        pathlib.Path("/root/repo/CERT_FINGERPRINTS.json").read_text()
    )
    reg = entrymod.REGISTRY
    stale = sorted(
        k for k, v in fps.items()
        if k in reg and v.get("fp") != entrymod._fingerprint(reg[k])
    )
    assert stale == [], (
        "stale fingerprints (rework without re-stamp): "
        f"{stale[:10]}{'...' if len(stale) > 10 else ''}"
    )


def test_bench_wait_for_quiet(monkeypatch):
    """bench._wait_for_quiet (VERDICT r8 item 2): waits while loadavg
    is above the cap, returns once it drops, and proceeds loudly on
    timeout instead of waiting forever."""
    import bench

    loads = iter([5.0, 5.0, 1.0, 1.0])
    slept: list = []
    monkeypatch.setattr(bench.os, "getloadavg", lambda: (next(loads), 0, 0))
    monkeypatch.setattr(bench.time, "sleep", slept.append)
    clock = iter([0.0, 1.0, 2.0, 3.0, 4.0, 5.0])
    monkeypatch.setattr(bench.time, "monotonic", lambda: next(clock))
    waited = bench._wait_for_quiet(cap=2.0, max_wait=300, poll=10)
    assert slept == [10]  # one wait tick, then the box went quiet
    assert waited >= 0

    # timeout path: loadavg never drops, the wait gives up at max_wait
    monkeypatch.setattr(bench.os, "getloadavg", lambda: (9.9, 0, 0))
    clock2 = iter([0.0, 100.0, 400.0, 500.0])
    monkeypatch.setattr(bench.time, "monotonic", lambda: next(clock2))
    slept.clear()
    waited = bench._wait_for_quiet(cap=2.0, max_wait=300, poll=10)
    assert slept == [10]  # one tick at t=100, timeout observed at 400
    assert waited == 500.0


def test_certify_first_prepend_wins_over_stale_mentions():
    """Re-prioritizing an entry = PREPENDING it to _CERTIFY_FIRST; a
    stale mention further down the list must not demote it (the pos
    map keeps the FIRST occurrence).  Pinned on the live repo: the
    CURRENT round's reworked entries must land inside the driver's
    50-slot window so the round's changes are re-proved hash-green on
    record (the r9 list this previously pinned was driver-certified in
    CORRECTNESS_r09 — certification is cumulative)."""
    names = list(entrymod.queries())[:50]
    for n in (
        # r11 optimization-phase reworks (cds driver-constant rework,
        # pagerank degrees-on-nodes + dangling fold, CC probe fold,
        # kNN dot_flat/flatten selectExpr, dashboard job-group
        # cancellation).  The r10 window this previously pinned was
        # driver-certified in CORRECTNESS_r10 — certification is
        # cumulative, so each round pins ITS reworks; r11's 9 prepends
        # rotate the r10 tail out of the 50-slot window by design.
        "cds_flatten",
        "ccdi_release_dashboard",
        "graph_pagerank_topk",
        "entity_golden_record",
        "dedup_cluster_components",
        "dedup_minhash_clusters_md5",
        "graph_triangle_count_knn",
        "graph_kcore_membership_knn",
        "similarity_graph_routed_low",
    ):
        assert n in names, f"{n} fell out of the r11 certify window"


def test_live_window_fronts_uncertified():
    """On the real repo: every non-certified entry must sort strictly
    before every certified one in the driver's queries() ordering."""
    names = list(entrymod.queries())
    cert = entrymod._already_certified()
    seen_cert = False
    for n in names:
        if n in cert:
            seen_cert = True
        else:
            assert not seen_cert, f"uncertified {n} sorted after certified"
