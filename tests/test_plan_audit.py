"""Regression gate for the 100 TB plan audit: the set of queries whose
physical plans contain CARTESIAN / NLJ / GLOBALWIN / 1PART patterns must
equal the reviewed allowlist in tools/plan_audit.py. A new flag means a
scale regression to justify (add to ALLOWLIST with a comment) or fix."""

import sys

sys.path.insert(0, "/root/repo/tools")

from plan_audit import ALLOWLIST, sweep  # noqa: E402


def test_plan_flags_match_reviewed_allowlist(spark, sf_dir):
    got = sweep(spark, sf_dir)
    new = {k: sorted(v) for k, v in got.items() if ALLOWLIST.get(k) != v}
    gone = sorted(set(ALLOWLIST) - set(got))
    assert got == ALLOWLIST, (
        f"plan audit drift -- new/changed flags: {new}; "
        f"stale allowlist entries: {gone}"
    )
