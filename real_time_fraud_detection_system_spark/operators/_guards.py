"""Guard rails for the quadratic verification primitives.

``embedding_near_dup`` (all-pairs cosine) and ``dedup_ngram_jaccard``
(pairwise shingle join) are O(n^2) BY DESIGN -- they are the exactness
baselines that the bucketed scale paths (MinHash-LSH, SimHash, sign-LSH,
IVF) are validated against. Nobody should be able to point them at a full
100 TB corpus by accident, so both count their input first and refuse
above a configurable row bound.

Override per call (``max_rows=``) or process-wide via the
``SPARK_GRAFT_QUADRATIC_MAX_ROWS`` env var. The pre-count is one cheap
columnar scan -- irrelevant next to the join it protects against.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

# generous for verification samples, instant refusal for a real corpus
DEFAULT_MAX_ROWS = 100_000


class QuadraticGuardError(ValueError):
    """Input too large for an all-pairs verification primitive."""


def guard_quadratic(df: DataFrame, what: str, scale_path: str,
                    max_rows: int | None = None) -> None:
    bound = max_rows if max_rows is not None else int(
        os.environ.get("SPARK_GRAFT_QUADRATIC_MAX_ROWS", DEFAULT_MAX_ROWS)
    )
    n = df.count()
    if n > bound:
        raise QuadraticGuardError(
            f"{what}: {n} input rows exceeds the all-pairs bound of "
            f"{bound} (~{n * n:,} candidate pairs). This operator is the "
            f"quadratic verification primitive; use {scale_path} at scale, "
            f"or raise max_rows / SPARK_GRAFT_QUADRATIC_MAX_ROWS explicitly."
        )
