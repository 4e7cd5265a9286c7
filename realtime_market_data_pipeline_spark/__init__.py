"""PySpark-native analytics engine with the query/data-processing surface of
``Sepheus7/realtime-market-data-pipeline`` (reference at /root/reference, MIT).

Design stance (SURVEY.md §7.0): everything is a DataFrame; each operator is a
pure ``DataFrame -> DataFrame`` function with an explicit schema contract,
usable identically in batch and Structured Streaming. No custom IR or planner —
Catalyst is the optimizer; physical strategy (broadcast vs sort-merge, partial
aggregation, whole-stage codegen, AQE) is left to Spark and steered only via
hints/partitioning where it matters at scale.
"""

from realtime_market_data_pipeline_spark.session import get_spark
from realtime_market_data_pipeline_spark.io import load_table, register_views, TABLES

__all__ = ["get_spark", "load_table", "register_views", "TABLES"]
__version__ = "0.1.0"
