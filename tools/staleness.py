"""Verdict-union staleness report -- the round-open rotation input.

The grading driver verifies the FIRST 50 registry entries each round and
records per-query verdicts in CORRECTNESS_r{N}.json. The rotation rule
(operators/__init__.py PRIORITY) is NEWEST-FIRST, THEN OLDEST-VERDICT:
queries changed this round head the window, then the queries whose most
recent FULL driver pass (rows+schema+hash, no err) is oldest. Both the
round-open rotation and the judge's staleness audit recompute the same
union; this tool is that computation, committed so it is reproducible
from a clean clone.

Usage: python tools/staleness.py [--cohort N] [repo_root]

Prints:
  * the verdict-union histogram (round of last full pass -> #queries);
  * queries registered but never fully passed by the driver (new or
    renamed since the last record -- these head the next window as
    ROUND_CHANGED members);
  * record names that no longer match a registered query (renames);
  * the oldest-verdict rotation cohort in (round, name) order -- pass
    --cohort N to cap the listing (default 60, enough to fill a window).

No SparkSession is created; only the registry module import runs.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys


# Record names that were RENAMED after a driver verdict existed under
# the old name: old record name -> current registry name (or None for a
# deliberate retirement with no successor). Keeping the map here makes
# the orphan listing below mean something -- an empty "renames?" list is
# then a real invariant, and an accidental deregistration cannot hide
# among known-historical names (round-12 verdict What's wrong #3).
RENAMED: dict[str, str | None] = {
    # the 60-bit SimHash's round-2 registration name (one r2 verdict
    # exists under it); renamed when the narrow draft became
    # dedup_simhash16 and the wide form took the dedup_simhash name.
    "dedup_simhash_wide": "dedup_simhash",
}


def full_pass(rec: dict) -> bool:
    """A driver verdict counts only as a FULL pass: rows + schema + hash
    all matched and no error. Weaker rows-only records never refresh
    staleness (the judge distinguishes them too)."""
    return (
        rec.get("err") in (None, "")
        and bool(rec.get("rows_match"))
        and bool(rec.get("schema_match"))
        and bool(rec.get("hash_match"))
    )


def verdict_union(root: str) -> dict[str, int]:
    """name -> round of the most recent full driver pass."""
    latest: dict[str, int] = {}
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as fh:
            try:
                records = json.load(fh)
            except json.JSONDecodeError:
                print(f"WARN: unreadable {path}", file=sys.stderr)
                continue
        for name, rec in records.items():
            if isinstance(rec, dict) and full_pass(rec):
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def main() -> int:
    args = list(sys.argv[1:])
    cohort_n = 60
    if "--cohort" in args:
        i = args.index("--cohort")
        cohort_n = int(args[i + 1])
        del args[i : i + 2]
    root = args[0] if args else "/root/repo"

    sys.path.insert(0, root)
    from real_time_fraud_detection_system_spark.operators import (
        ROUND,
        all_queries,
    )

    registered = list(all_queries())
    latest = verdict_union(root)

    hist: dict[int, int] = {}
    never: list[str] = []
    for name in registered:
        if name in latest:
            hist[latest[name]] = hist.get(latest[name], 0) + 1
        else:
            never.append(name)
    orphans = sorted(set(latest) - set(registered) - set(RENAMED))
    stale_map = sorted(
        tgt for tgt in RENAMED.values()
        if tgt is not None and tgt not in registered
    )
    if stale_map:
        print(
            f"WARN: RENAMED targets not registered: {stale_map}",
            file=sys.stderr,
        )

    print(f"registry ROUND = {ROUND}; {len(registered)} registered queries")
    print(
        "verdict-union histogram (round of last full pass -> count): "
        + ", ".join(f"r{r}={hist[r]}" for r in sorted(hist))
    )
    if never:
        print(f"\nnever fully passed ({len(never)}) -- window head material:")
        for name in never:
            print(f"  {name}")
    if orphans:
        print(f"\nrecord names not in the registry ({len(orphans)}) -- renames?:")
        for name in orphans:
            print(f"  {name}")

    cohort = sorted(
        (name for name in registered if name in latest),
        key=lambda n: (latest[n], n),
    )[:cohort_n]
    print(f"\noldest-verdict rotation cohort (first {len(cohort)}):")
    for name in cohort:
        print(f"  r{latest[name]:<3d} {name}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
