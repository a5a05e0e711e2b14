"""Text-analysis expression builders (token stats, shingles, hashing).

Everything here is a Catalyst expression (higher-order array functions,
md5, conv) -- fully codegen'd JVM execution, no Python UDFs. The same
semantics are mirrored in the operators' oracle SQL; constants live here
so both sides agree.

Cross-engine hashing: md5(<string>) produces identical lowercase hex in
Spark and DuckDB, so MinHash signatures (min over md5(seed || ':' ||
shingle)) and 16-bit token hashes (first 4 hex digits -> int) are
bit-identical across engines -- that is what makes the dedup family
oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Shared constants (imported by oracle SQL templates).
SHINGLE_N = 3
STOPWORDS = ("the", "a", "of", "and", "to", "in")
LANG_MARKERS = {
    # deterministic marker lists; preference order below breaks ties
    "en": ("the", "a", "of", "and", "to"),
    "es": ("el", "la", "de", "los", "que"),
    "fr": ("le", "les", "des", "une", "est"),
    "de": ("der", "die", "das", "und", "ist"),
    "zh": ("de5", "shi4", "le5", "zai4", "he2"),
}
LANG_ORDER = ("en", "es", "fr", "de", "zh")


def tokens(text_col: str = "text") -> Column:
    """Whitespace tokenization -- identical to DuckDB string_split."""
    return F.split(F.col(text_col), " ")


def sql_in_list(values) -> str:
    return ", ".join(f"'{v}'" for v in values)


def shingles_expr(toks_sql: str, n: int = SHINGLE_N) -> str:
    """Spark SQL expression: word n-gram shingles of a token array."""
    return (
        f"CASE WHEN size({toks_sql}) >= {n} "
        f"THEN transform(sequence(1, size({toks_sql}) - {n - 1}), "
        f"i -> concat_ws(' ', slice({toks_sql}, i, {n}))) "
        f"ELSE cast(array() AS array<string>) END"
    )


def duck_shingles_expr(toks_sql: str, n: int = SHINGLE_N) -> str:
    """DuckDB twin of shingles_expr (1-based inclusive list slicing)."""
    return (
        f"CASE WHEN len({toks_sql}) >= {n} "
        f"THEN list_transform(range(1, len({toks_sql}) - {n - 2}), "
        f"i -> array_to_string({toks_sql}[i:i+{n - 1}], ' ')) "
        f"ELSE [] END"
    )


def hex16_expr(tok_sql: str) -> str:
    """Spark SQL: first 16 bits of md5(token) as int."""
    return f"CAST(conv(substr(md5({tok_sql}), 1, 4), 16, 10) AS INT)"


def duck_hex16_expr(tok_sql: str) -> str:
    """DuckDB twin: hex-literal cast."""
    return f"CAST('0x' || substr(md5({tok_sql}), 1, 4) AS INT)"
