"""Operator registry: each submodule exposes QUERIES (name -> callable
taking (spark, sf_dir) -> DataFrame) and ORACLE (name -> DuckDB SQL).

``all_queries()`` / ``all_oracles()`` merge the registries for
``__spark_entry__``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _modules():
    from . import relational

    mods = [relational]
    for name in ("metrics", "dedup", "similarity", "textops", "sessionize", "multimodal", "windows", "temporal", "mlqueries", "tpch_extra", "skew", "anomaly"):
        try:
            mods.append(__import__(f"{__name__}.{name}", fromlist=[name]))
        except ImportError:
            pass
    return mods


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict = {}
    for mod in _modules():
        out.update(getattr(mod, "QUERIES", {}))
    return out


def all_oracles() -> dict[str, str]:
    out: dict = {}
    for mod in _modules():
        out.update(getattr(mod, "ORACLE", {}))
    return out
