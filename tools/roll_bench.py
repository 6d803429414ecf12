#!/usr/bin/env python
"""Roll BENCH_DETAIL.json (the last full bench run) into BENCH.json
(the per-query rolling minimums that BASELINE.md's <=2x contract is
measured against).

Every round until now this merge was an ad-hoc python snippet; this
makes it a committed, repeatable step:

  python bench.py                # full run -> BENCH_DETAIL.json
  python tools/roll_bench.py "r9 full-suite run: ..."   # merge + flag

- keys improving their min are rolled down (mins only ever decrease);
- NEW keys are recorded at their first measured value;
- keys whose fresh time exceeds 2x their rolling min are PRINTED as
  flags — per BASELINE.md these must be re-measured in isolation on an
  idle box before being treated as regressions (this VM's host
  contention swings single runs up to ~3x in both directions, SCALE.md
  r9 calibration note);
- the provenance argument is prepended so BENCH.json carries its own
  history;
- --rebaseline=k1,k2 RESETS those keys' mins to the fresh measured
  value even if higher — for keys whose official implementation
  legitimately changed its floor (r10 precedent: the streaming cohort
  re-baselined at its measured engine floor; r11: the oracle
  conversions that traded the xxhash64/numpy fast paths for
  engine-portable arithmetic). The provenance note must say why; a
  rebaseline without a reason in the note is a review flag.

Exit code: 0 always (flags are advisory — adjudication is a human/
agent step by contract, not a gate).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--rebaseline=")]
    rebase: set[str] = set()
    for a in sys.argv[1:]:
        if a.startswith("--rebaseline="):
            rebase = {k for k in a.split("=", 1)[1].split(",") if k}
    note = args[0] if args else "roll_bench merge"
    bench_path = _REPO / "BENCH.json"
    bench = json.loads(bench_path.read_text())
    mins = bench["queries"]
    new = json.loads((_REPO / "BENCH_DETAIL.json").read_text())["queries"]

    flags, improved, added, rebased = [], 0, 0, []
    for k, v in new.items():
        old = mins.get(k)
        if old is None:
            mins[k] = v
            added += 1
            continue
        if k in rebase:
            rebased.append((k, old, v))
            mins[k] = v
            continue
        if v > 2 * old:
            flags.append((k, old, v))
        if v < old:
            mins[k] = v
            improved += 1

    bench["queries"] = {k: mins[k] for k in sorted(mins)}
    bench["n_queries"] = len(mins)
    bench["value"] = round(sum(mins.values()), 3)
    bench["provenance"] = f"{note}; {bench['provenance']}"
    bench_path.write_text(json.dumps(bench, indent=1))

    print(
        json.dumps(
            {
                "total_of_mins": bench["value"],
                "n_queries": len(mins),
                "improved": improved,
                "new_keys": added,
                "flags_over_2x": [
                    {"query": k, "min": o, "run": v} for k, o, v in flags
                ],
                "rebaselined": [
                    {"query": k, "old_min": o, "new_min": v}
                    for k, o, v in rebased
                ],
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
