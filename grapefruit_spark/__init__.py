"""grapefruit_spark — a PySpark-native engine with the query and
data-processing capabilities of heyhalcyon/Grapefruit (MapleJuice),
re-expressed Spark-first, plus LLM-data-pipeline operators."""

__version__ = "0.1.0"
