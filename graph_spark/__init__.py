"""graph_spark: a PySpark-native analytics engine with the query and
data-processing capabilities of the reference temporal-property-graph
system (SURVEY.md), rebuilt Spark-first for 100 TB scale."""

from .catalog import Catalog
from .engine import Engine
from .session import get_spark

__all__ = ["Catalog", "Engine", "get_spark"]
