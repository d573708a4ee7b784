"""Operator registry: every module contributes QUERIES (name → callable
(spark, sf_dir) → DataFrame) and ORACLE (name → DuckDB SQL)."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def all_queries() -> dict[str, QueryFn]:
    from . import relational

    out: dict[str, QueryFn] = {}
    for mod in _modules():
        out.update(mod.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _modules():
        out.update(mod.ORACLE)
    return out


def _modules():
    from . import relational

    mods = [relational]
    for name in (
        "relational_ext",
        "mapreduce_apps",
        "windows",
        "dedup",
        "similarity",
        "text",
        "multimodal",
        "analytics",
        "graph",
        "pipeline",
        "datapipe",
        "event_analytics",
        "search",
        "ml",
    ):
        try:
            mods.append(__import__(f"{__name__}.{name}", fromlist=[name]))
        except ImportError:
            pass
    return mods
