"""Which queries still lack a green driver CORRECTNESS row across all rounds?

The per-round driver verifies the FIRST 50 entries of __spark_entry__.queries()
(observed exactly in CORRECTNESS_r03.json); this tool unions the green rows of
every committed CORRECTNESS_r*.json with the current front block and prints the
remainder — the set the NEXT round's registry should front-load. Run from the
repo root: python -m tools.coverage_gap
"""

from __future__ import annotations

import glob
import json
import os
import sys


def main() -> int:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entry

    covered: set[str] = set()
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        rows = json.load(open(path))
        covered |= {
            k
            for k, v in rows.items()
            if isinstance(v, dict) and v.get("hash_match")
        }
    names = list(entry.queries())
    front = set(names[:50])
    missing = [n for n in names if n not in covered and n not in front]
    print(f"green driver rows in committed CORRECTNESS files: {len(covered)}")
    print(f"current front block (next driver pass): {len(front)}")
    print(f"cumulative once the front block lands: {len(covered | front)}/{len(names)}")
    print(f"still uncovered ({len(missing)}) — front-load these next round:")
    for n in missing:
        print(f"  {n}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
