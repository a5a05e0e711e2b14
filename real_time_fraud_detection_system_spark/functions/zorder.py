"""Morton (Z-order) key construction for multi-dimensional data layout.

Interleaving the bits of two dimensions gives a single sort key whose
contiguous ranges are 2-D tiles: files written in zkey order carry
TIGHT min/max footer statistics on BOTH dimensions, so a reader's
min/max pruning skips files for predicates on either one. A layout
sorted by one dimension (the usual time-ordered ingest) prunes only
that dimension -- every file spans the full range of the other.

This is the standard big-table layout trick (Delta/Iceberg OPTIMIZE
ZORDER BY); the reference has no storage layer beyond row-append
Postgres tables (services/fraud_service/app/main.py:137-156), so this
is part of the 100 TB posture surface the brief adds.

Everything is integer bit arithmetic generated as SQL text in both
dialects (Spark `shiftleft`/`&`/`|`, DuckDB `<<`), so the same key is
bit-identical across engines -- the oracle requirement.
"""

from __future__ import annotations

ZBITS = 16  # bits kept per dimension; the morton key is 2*ZBITS wide

# magic-number bit-spread masks for 16 -> 32-bit interleave
_SPREAD = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def _spread_expr(col: str, dialect: str) -> str:
    """Expression spreading the low 16 bits of ``col`` so bit i lands
    at position 2i (the classic magic-number Morton spread)."""
    e = f"(CAST({col} AS BIGINT) & 65535)"
    for sh, mask in _SPREAD:
        if dialect == "spark":
            e = f"((({e}) | shiftleft(({e}), {sh})) & {mask})"
        else:
            e = f"((({e}) | (({e}) << {sh})) & {mask})"
    return e


def morton2_expr(xcol: str, ycol: str, dialect: str = "spark") -> str:
    """32-bit Morton key of two 16-bit non-negative ints: x's bits at
    even positions, y's at odd. SQL text valid in the given dialect."""
    x = _spread_expr(xcol, dialect)
    y = _spread_expr(ycol, dialect)
    if dialect == "spark":
        return f"({x} | shiftleft({y}, 1))"
    return f"({x} | ({y} << 1))"


def norm16_expr(col: str, lo: str, hi: str, dialect: str = "spark") -> str:
    """Normalize ``col`` in [lo, hi] onto the 16-bit grid with pure
    integer arithmetic (Spark ``DIV`` / DuckDB ``//`` -- never float
    division). Hybrid form, branch chosen by the (constant-foldable)
    range: below 2^47 the multiply-first stretch (col-lo)*65536 /
    (range+1) maps any small range onto the full grid with the top
    value at 65535; at 2^47 and beyond that multiplication would
    silently wrap int64 (e.g. a >4.4-year microsecond timestamp span),
    producing garbage keys under Spark's non-ANSI arithmetic and
    engine-divergent negatives (DIV truncates, ``//`` floors), so the
    wide branch divides by width = range/65536 + 1 instead -- at that
    scale range >> 65536, so compression fills the grid on its own and
    the bucket provably stays < 65536 for ANY range."""
    div = "DIV" if dialect == "spark" else "//"
    rng = f"(CAST({hi} AS BIGINT) - CAST({lo} AS BIGINT))"
    off = f"(CAST({col} AS BIGINT) - CAST({lo} AS BIGINT))"
    mult = f"(({off} * 65536) {div} ({rng} + 1))"
    width = f"({rng} {div} 65536 + 1)"
    compress = f"({off} {div} {width})"
    # 2^47: the largest range whose offset * 65536 stays inside int64
    return (
        f"CAST(CASE WHEN {rng} < 140737488355328 THEN {mult}"
        f" ELSE {compress} END AS BIGINT)"
    )
