"""Python UDTFs (Spark 4 user-defined table functions) -- the §2.8
surface's table-function corner.

The engine's own operators deliberately avoid Python in the hot path
(see textops/corpusops: everything is codegen'd SQL), so the UDTF here
is the ESCAPE HATCH demonstration: when a user needs per-row
row-expanding logic Spark can't express, this is the supported shape --
``lateral join`` against a registered UDTF, with the per-row work in
plain Python. ``token_counts`` is the reference point because the
codegen'd equivalent exists (explode + groupBy), so the test can assert
the UDTF path is value-identical to the JVM path it would replace.
"""

from __future__ import annotations

try:  # pyspark >= 4 / 3.5
    from pyspark.sql.functions import udtf
except ImportError:  # pragma: no cover - older pyspark
    udtf = None  # type: ignore[assignment]


if udtf is not None:

    @udtf(returnType="token string, n int")
    class TokenCounts:
        """Per-input-row token histogram: yields one (token, count) row
        per distinct whitespace token. Deterministic output order
        (token asc) so downstream tests and LIMITs are stable."""

        def eval(self, text: str):  # noqa: A002
            if text is None:
                return
            counts: dict[str, int] = {}
            for tok in text.split(" "):
                if tok:
                    counts[tok] = counts.get(tok, 0) + 1
            for tok in sorted(counts):
                yield tok, counts[tok]

else:  # pragma: no cover
    TokenCounts = None  # type: ignore[assignment]


def register(spark) -> None:
    """Make the UDTFs callable from SQL (``token_counts(...)`` in a
    lateral join)."""
    if udtf is None:  # pragma: no cover
        raise RuntimeError("pyspark >= 3.5 required for UDTFs")
    spark.udtf.register("token_counts", TokenCounts)
