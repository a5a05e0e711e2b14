"""Scale audit: sweep every registered query's physical plan for the
patterns that break at 100 TB.

Flags per query:
  CARTESIAN  -- CartesianProduct (quadratic)
  NLJ        -- BroadcastNestedLoopJoin (per-row scan of the broadcast)
  GLOBALWIN  -- Window with empty partition spec (single-task sort)
  1PART      -- Exchange SinglePartition feeding a non-scalar result
                (scalar aggregates legitimately collapse to one row)

Usage: python tools/plan_audit.py [sf_dir]

Reviewed state (2026-08): 11 of 73 queries flag, ALL intentional --
  * NLJ on ann_*/freshness/windowed_rates/customers_without_orders is a
    1-row or N_QUERIES-row broadcast (scalar subquery / query fan-out),
    constant-size at any data scale;
  * NLJ on embedding_near_dup is the documented all-pairs verification
    primitive (the LSH/IVF variants are the scale paths);
  * 1PART flags are scalar or near-scalar outputs (single-row results,
    incl. the conversion_funnel 4-counter summary);
  * GLOBALWIN on moving_avg_revenue orders day-grain aggregates -- row
    count bounded by calendar days, not data volume.
A NEW flag appearing here after a change is a regression to explain or
fix before committing.
"""

from __future__ import annotations

import contextlib
import io
import sys

sys.path.insert(0, "/root/repo")

from real_time_fraud_detection_system_spark.operators import all_queries
from real_time_fraud_detection_system_spark.session import cpu_count, get_spark


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("extended")
    return buf.getvalue()


def audit(name: str, df) -> list[str]:
    plan = plan_of(df)
    flags = []
    if "CartesianProduct" in plan:
        flags.append("CARTESIAN")
    if "BroadcastNestedLoopJoin" in plan:
        flags.append("NLJ")
    if "windowspecdefinition(" in plan and "Window [" in plan:
        # empty partition spec renders as windowspecdefinition(<sort>...
        # with no partition columns before the ORDER spec
        for line in plan.splitlines():
            if "Window [" in line and "windowspecdefinition(" in line:
                spec = line.split("windowspecdefinition(")[1]
                # partition cols come first; a spec starting with the
                # sort column list only (ends "ASC NULLS FIRST" before
                # any comma-separated partition ref) is heuristic --
                # flag specs with no '#' before the first ASC/DESC
                head = spec.split(",")[0]
                if "ASC" in head or "DESC" in head:
                    flags.append("GLOBALWIN")
                break
    n_out_cols = len(df.columns)
    if "Exchange SinglePartition" in plan and n_out_cols > 1:
        # scalar summaries (1 row out) are fine; anything else funnels
        if "collect_limit" not in plan.lower():
            flags.append("1PART")
    return flags


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("plan-audit", cpus=min(8, cpu_count()))
    flagged = 0
    for name, fn in sorted(all_queries().items()):
        try:
            flags = audit(name, fn(spark, sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {e}")
            flagged += 1
            continue
        if flags:
            flagged += 1
            print(f"FLAG  {name}: {', '.join(flags)}")
    print(f"\n{flagged} flagged of {len(all_queries())}")
    spark.stop()


if __name__ == "__main__":
    main()
