"""Regenerate CERT_FINGERPRINTS.json from the current registry.

Run AFTER a round's CORRECTNESS artifact lands green (or after
scripts/verify_driver.py passes locally): for every entry the driver
artifacts mark certified, record the fingerprint of its CURRENT oracle
SQL + function source.  From then on, any rework of that entry voids
its certification in ``__spark_entry__._already_certified`` and
rotates it back into the driver's 50-slot window (ADVICE r7 item 3).

Usage: python scripts/update_cert_fingerprints.py [--from-tree DIR]

--from-tree DIR: compute fingerprints from a different checkout of the
repo (e.g. a git worktree at the round boundary commit) so that edits
made AFTER certification are detected as drift.  The artifact scan
still reads /root/repo's CORRECTNESS files.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _fingerprint(q) -> str:
    """MUST mirror __spark_entry__._fingerprint (pinned by the unit
    test) — duplicated here so --from-tree works against checkouts
    that predate the fingerprint mechanism."""
    import hashlib
    import inspect

    try:
        src = inspect.getsource(q.fn)
    except (OSError, TypeError):
        src = repr(q.fn)
    body = (q.oracle or "") + "\n---\n" + src
    return hashlib.sha256(body.encode()).hexdigest()[:16]


def main() -> int:
    tree = REPO
    argv = sys.argv[1:]
    if argv and argv[0] == "--from-tree":
        tree = Path(argv[1]).resolve()

    sys.path.insert(0, str(tree))
    from childhoodcancerdatainitiative_prefect_pipeline_spark.queries import (  # noqa: E402
        REGISTRY as reg,
    )

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
        out[name] = {"fp": _fingerprint(reg[name]), "round": stamp}

    path = REPO / "CERT_FINGERPRINTS.json"
    path.write_text(json.dumps(out, indent=1, sort_keys=True) + "\n")
    print(f"wrote {len(out)} fingerprints (tree={tree}) -> {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
