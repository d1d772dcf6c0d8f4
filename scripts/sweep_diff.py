#!/usr/bin/env python
"""Diff two `bench.py --sweep` artifacts mechanically.

Usage: python scripts/sweep_diff.py OLD.json NEW.json [ratio_threshold]

Prints one line per query whose NEW/OLD time ratio falls outside
[1/threshold, threshold] (default 1.5), plus totals.  Exit code 0
always — the output is the signal; whether a flagged delta is a
regression or weather still needs the SCALE.md A/B rule (a heavy-entry
delta without a controlled same-session A/B is weather).
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__.strip(), file=sys.stderr)
        return 2
    old = json.load(open(sys.argv[1]))
    new = json.load(open(sys.argv[2]))
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    qo, qn = old.get("queries", {}), new.get("queries", {})
    flagged = 0
    for name in sorted(set(qo) | set(qn)):
        a, b = qo.get(name), qn.get(name)
        if a is None or b is None:
            print(f"{name}: only in {'NEW' if a is None else 'OLD'} "
                  f"({b if a is None else a} s)")
            flagged += 1
            continue
        ratio = b / a if a else float("inf")
        if ratio > thr or ratio < 1 / thr:
            print(f"{name}: {a} -> {b} s ({ratio:.2f}x)")
            flagged += 1
    to, tn = old.get("value"), new.get("value")
    print(f"total: {to} -> {tn} s "
          f"({(tn / to):.2f}x); {flagged} flagged at {thr}x "
          f"(old quiet={old.get('quiet')}, new quiet={new.get('quiet')})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
