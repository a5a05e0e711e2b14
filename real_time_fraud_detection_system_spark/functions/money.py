"""Order-independent decimal aggregation.

``sum(double)`` is order-dependent: Spark's partial aggregation and
DuckDB's single-node sum add in different orders, and when the rounded
result lands within one ulp of a rounding boundary the engines disagree
in the last cent (observed: 1151116.28 vs 1151116.27 on q9 at sf0.001).
At 100 TB the same nondeterminism appears RUN TO RUN on one engine as
partitioning changes -- money aggregates must not depend on it.

Fix: fixed-point bookkeeping. Each row's value is rounded to an integer
number of ten-thousandths (inputs are 2-dp decimals, products of two
2-dp decimals are exactly 4-dp), summed as BIGINT -- exact and
order-independent -- and scaled back at the end. The SQL text is valid
and identical in Spark and DuckDB, so both engines compute the identical
result by construction.
"""

from __future__ import annotations

SCALE = 10_000  # ten-thousandths: exact for products of two 2-dp decimals


def cents_sql(expr: str, scale: int = SCALE) -> str:
    """Row-level integer fixed-point value of a decimal expression."""
    return f"CAST(round(({expr}) * {scale}, 0) AS BIGINT)"


def exact_sum(expr: str, ndigits: int = 2, scale: int = SCALE) -> str:
    """Order-independent sum of a decimal expression, rounded to ndigits.

    The final rounding ALSO happens in integer space: a 4-dp cents sum
    emitted at 2 dp lands on an exact half-cent boundary whenever the
    discarded digits are exactly 50, and `round(double, 2)` breaks the
    tie differently in Spark (HALF_UP on the shortest decimal repr) vs
    DuckDB (on the binary value). Integer half-up (`floor((s + half)/d)`)
    is unambiguous in both. The closing division uses an int literal --
    a bare `100.0` would be DECIMAL-typed in Spark and change the output
    formatting vs DuckDB's double."""
    d = scale // (10 ** ndigits)
    inner = f"sum({cents_sql(expr, scale)})"
    if d > 1:
        inner = f"floor(({inner} + {d // 2}) / {d})"
    return f"CAST({inner} AS DOUBLE) / {10 ** ndigits}"


def exact_ratio(num_expr: str, den_expr: str, ndigits: int = 6,
                scale: int = SCALE) -> str:
    """Order-independent ratio of two decimal sums (shares, rates)."""
    return (
        f"round(CAST(sum({cents_sql(num_expr, scale)}) AS DOUBLE)"
        f" / sum({cents_sql(den_expr, scale)}), {ndigits})"
    )
