"""bench.py contract smoke: the orchestrator must end with ONE JSON
line under the 1,900-char budget carrying the driver-record keys, and
the per-section child-process path must work end-to-end. Opt-in
(`pytest -m benchcontract`) -- it runs the whole sf0.001 suite.

This guards a FORMAT contract, not a host's speed: paths derive from
__file__ / the dataset layout (skip when absent), and the absolute
throughput floor is opt-in via SPARK_GRAFT_BENCH_EPS_FLOOR.
"""

import json
import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SF_DIR = os.environ.get("SPARK_GRAFT_SMOKE_SF_DIR",
                         "/root/testdata/sf0.001")


@pytest.mark.benchcontract
@pytest.mark.skipif(not os.path.isdir(_SF_DIR),
                    reason=f"dataset absent: {_SF_DIR}")
def test_bench_contract_line_parses_and_fits_budget():
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=_SF_DIR,
        SPARK_GRAFT_SF1_DIR="/nonexistent",
        SPARK_GRAFT_SF10_DIR="/nonexistent",
        SPARK_GRAFT_CPUS="8",
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(_REPO, "bench.py")],
        capture_output=True, text=True, timeout=1500, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    final = lines[-1]
    # the driver's record keeps the LAST 2,000 chars of output: the
    # contract line must survive that window with margin
    assert len(final) <= 1900, f"contract line {len(final)} chars"
    d = json.loads(final)
    assert d["metric"] == "headline_suite_seconds"
    assert d["unit"] == "sec"
    assert d["n_queries"] >= 80 and d["n_skipped"] == 0
    assert d["value"] > 0 and isinstance(d["queries"], dict)
    assert "gate_error" not in d and "ingest_error" not in d
    # format contract: eps present and positive; the BASELINE 2k floor
    # is a THIS-HOST property, asserted only when opted in
    assert d["streaming_ingest_eps"] > 0
    floor = float(os.environ.get("SPARK_GRAFT_BENCH_EPS_FLOOR", "0"))
    if floor:
        assert d["streaming_ingest_eps"] > floor
    # per-section evidence lines precede it
    sections = [json.loads(ln) for ln in lines[:-1]]
    assert any(s.get("scale_section") for s in sections)
