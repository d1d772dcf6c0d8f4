"""Regenerate CERT_FINGERPRINTS.json from the current registry.

Run AFTER a round's CORRECTNESS artifact lands green (or after
scripts/verify_driver.py passes locally): for every entry the driver
artifacts mark certified, record the fingerprint of its CURRENT oracle
SQL + function source + transitive in-package dependency sources.
From then on, any rework of that entry OR of an operator module on its
execution path voids its certification in
``__spark_entry__._already_certified`` and rotates it back into the
driver's 50-slot window (ADVICE r7 item 3; VERDICT r9 item 1).

Usage: python scripts/update_cert_fingerprints.py [--from-tree DIR]

--from-tree DIR: compute fingerprints from a different checkout of the
repo (e.g. a git worktree at the round boundary commit) so that edits
made AFTER certification are detected as drift.  The artifact scan
still reads /root/repo's CORRECTNESS files.

The fingerprint algorithm is imported from the TARGET TREE's
``__spark_entry__`` (r10: the r9 duplicate-and-mirror scheme could
drift silently; importing the tree's own algorithm cannot).  For
--from-tree checkouts that predate the mechanism, the current repo's
algorithm is the fallback.
"""

from __future__ import annotations

import importlib.util
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _load_entry_module(tree: Path):
    spec = importlib.util.spec_from_file_location(
        "_tree_spark_entry", tree / "__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> int:
    tree = REPO
    argv = sys.argv[1:]
    if argv and argv[0] == "--from-tree":
        tree = Path(argv[1]).resolve()

    sys.path.insert(0, str(tree))
    from childhoodcancerdatainitiative_prefect_pipeline_spark.queries import (  # noqa: E402
        REGISTRY as reg,
    )

    entrymod = _load_entry_module(tree)
    fingerprint = getattr(entrymod, "_fingerprint", None)
    if fingerprint is None:  # pre-r7 checkout: fall back to the live repo's
        fingerprint = _load_entry_module(REPO)._fingerprint

    # Certified set per the artifact scan, IGNORING fingerprints (we
    # are about to rewrite them).
    done = set()
    for f in sorted(REPO.glob("CORRECTNESS_r*.json")):
        try:
            data = json.loads(f.read_text())
        except (OSError, ValueError):
            continue
        for k, v in data.items():
            if not isinstance(v, dict) or v.get("err"):
                continue
            if not (v.get("rows_match") and v.get("schema_match")):
                continue
            hm = v.get("hash_match")
            if hm is True or (
                hm is None and k in reg and reg[k].oracle is None
            ):
                done.add(k)

    rounds = sorted(p.name for p in REPO.glob("CORRECTNESS_r*.json"))
    stamp = rounds[-1].replace("CORRECTNESS_", "").replace(".json", "") if rounds else "r00"

    out = {}
    for name in sorted(done):
        if name not in reg:
            continue
        out[name] = {"fp": fingerprint(reg[name]), "round": stamp}

    path = REPO / "CERT_FINGERPRINTS.json"
    path.write_text(json.dumps(out, indent=1, sort_keys=True) + "\n")
    print(f"wrote {len(out)} fingerprints (tree={tree}) -> {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
