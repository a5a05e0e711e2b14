"""Registry ordering + driver-faithful checker canonicalization.

The external driver verifies the FIRST 50 registry entries; round 1 left
24 queries unverified because the registry was module-sequential. These
tests pin the contract: explicit 50-entry priority covering every operator
family, and a local checker strict enough to catch the round-1 failure
classes (DuckDB HUGEINT->float64 sums, array-typed output cells) before
the driver does.
"""

import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo/tools")

from real_time_fraud_detection_system_spark.operators import (
    DRIVER_SAMPLE,
    PRIORITY,
    _modules,
    all_oracles,
    all_queries,
)


def test_priority_is_exactly_the_sample_window():
    assert len(PRIORITY) == DRIVER_SAMPLE
    assert len(set(PRIORITY)) == DRIVER_SAMPLE


def test_first_50_queries_cover_every_family():
    names = list(all_queries())
    first = set(names[:DRIVER_SAMPLE])
    assert first == set(PRIORITY)
    for mod in _modules():
        fam = set(getattr(mod, "QUERIES", {}))
        if fam:
            assert fam & first, f"{mod.__name__} has no query in the sample window"


def test_every_query_has_an_oracle_in_same_order():
    q, o = all_queries(), all_oracles()
    assert set(q) == set(o)
    assert list(q)[:DRIVER_SAMPLE] == list(o)[:DRIVER_SAMPLE]


# --------------------------------------------------------------------------
# Driver-faithful canonicalizer: must FAIL the two round-1 failure classes.
from check_correctness import UnhashableCell, _canon_frame  # noqa: E402


def test_canon_rejects_array_cells():
    df = pd.DataFrame({"media_id": [1, 2], "samples": [[1, 2], [3, 4]]})
    with pytest.raises(UnhashableCell):
        _canon_frame(df)


def test_canon_detects_hugeint_float_drift():
    """Re-broken null_id_check: Spark int64 0 vs DuckDB HUGEINT->float64
    0.0 must NOT canonicalize equal (the round-1 driver hash mismatch)."""
    spark_side = pd.DataFrame({"null_ids": np.array([0], dtype=np.int64)})
    duck_side = pd.DataFrame({"null_ids": np.array([0.0], dtype=np.float64)})
    assert _canon_frame(spark_side) != _canon_frame(duck_side)


def test_canon_collapses_midnight_timestamp_to_date():
    import datetime

    a = pd.DataFrame({"d": [datetime.date(2024, 1, 7)]})
    b = pd.DataFrame({"d": [pd.Timestamp("2024-01-07 00:00:00")]})
    assert _canon_frame(a) == _canon_frame(b)
