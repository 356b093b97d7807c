"""PySpark-native analytics engine with the query and data-processing
capabilities of the hrik21/Data-Pipeline-for-Real-Time-Retail-Analytics
reference, re-expressed Spark-first (see SURVEY.md)."""

from .engine import Engine
from .session import get_spark

__all__ = ["Engine", "get_spark"]
__version__ = "0.1.0"
