"""grapefruit_spark — a PySpark-native engine with the query and
data-processing capabilities of heyhalcyon/Grapefruit (MapleJuice),
re-expressed Spark-first, plus LLM-data-pipeline operators.

Public surface (lazy imports so `import grapefruit_spark` stays cheap
and never forces a SparkSession):

    from grapefruit_spark import get_spark, Sdfs, MapleJuicePipeline
    spark = get_spark()
    fs = Sdfs(spark, "/data/warehouse")
    from grapefruit_spark.operators import all_queries
    all_queries()["q1_pricing_summary"](spark, sf_dir)
"""

__version__ = "0.2.0"

__all__ = [
    "MapleJuicePipeline",
    "Sdfs",
    "get_spark",
    "juice",
    "maple",
    "pin",
    "table",
    "unpin",
]


def __getattr__(name: str):
    if name in ("get_spark",):
        from .session import get_spark

        return get_spark
    if name in ("Sdfs",):
        from .sdfs import Sdfs

        return Sdfs
    if name in ("maple", "juice", "MapleJuicePipeline"):
        from . import maplejuice

        return getattr(maplejuice, name)
    if name in ("pin", "unpin"):
        from . import reliability

        return getattr(reliability, name)
    if name in ("table",):
        from .catalog import table

        return table
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
