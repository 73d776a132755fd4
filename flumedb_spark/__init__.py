"""flumedb_spark — a PySpark-native engine with the query and
data-processing capabilities of flumedb/flumedb (reference surveyed in
SURVEY.md), plus the large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal columns).

Core: an append-only Parquet log + incrementally-maintained materialized
views with read-after-write consistency — re-expressed on the Spark
DataFrame/Structured-Streaming stack rather than ported.
"""

from .engine import ClosedError, ExprMapper, Flume, GateTimeout, ViewHandle
from .log import LOG_SCHEMA, OffsetLog, ParquetLog, VersionedLog
from .session import get_spark
from .views.base import FlumeView
from .views.reduce import NativeStats, Reduce

__all__ = [
    "ClosedError",
    "GateTimeout",
    "ExprMapper",
    "Flume",
    "FlumeView",
    "LOG_SCHEMA",
    "NativeStats",
    "OffsetLog",
    "ParquetLog",
    "Reduce",
    "VersionedLog",
    "ViewHandle",
    "get_spark",
]

__version__ = "0.1.0"
