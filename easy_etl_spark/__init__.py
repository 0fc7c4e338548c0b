"""easy_etl_spark — a PySpark-native analytics engine with the
capabilities of exit99/easy-etl, re-expressed Spark-first.

Public surface:
  - EtlPipeline: fluent staged ETL facade (reference API parity)
  - ParquetSink: append/upsert/drop-sync target table
  - session helpers: get_spark, register_views, load_table
  - operators: links (equi/as-of), dedup, similarity, text, windows
"""

from .pipeline import EtlPipeline
from .session import DEFAULT_SF_DIR, TABLES, get_spark, load_table, register_views, table_path
from .sources.sinks import ParquetSink

__all__ = [
    "EtlPipeline",
    "ParquetSink",
    "get_spark",
    "load_table",
    "register_views",
    "table_path",
    "TABLES",
    "DEFAULT_SF_DIR",
]
