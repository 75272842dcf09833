"""charlotte_spark — a PySpark-native analytics engine.

A from-scratch engine with the query and data-processing capabilities
of the reference streaming-ETL tool redhat-infosec/charlotte
(/root/reference), rebuilt Spark-first: DataFrame/SQL logical plans,
Catalyst/Tungsten physical execution, Structured Streaming ingest, and
an LLM-data-pipeline operator set (dedup, similarity, text analysis,
multimodal columns) designed for 100 TB scale.
"""

from .session import get_spark
from .registry import REGISTRY, load_all_queries, query

__all__ = ["get_spark", "REGISTRY", "load_all_queries", "query"]
