"""dbsync_spark — a PySpark-native change-data sync & analytics engine.

A brand-new engine with the query/data-processing capabilities of the
reference system (lou-yj/dbsync, a trigger-based real-time DB replication
tool): change-log ingestion, key-hash partitioned ordered apply
(last-writer-wins upsert/delete), condition filters, routing, multi-target
fan-out, status accounting, retry/blocking state machine, retention cleanup,
and monitoring — re-expressed Spark-first (DataFrame/SQL/Structured
Streaming), plus large-scale training-data operators (dedup, similarity
search, text analysis, multimodal plumbing).

Reference semantics are cited per-module as /root/reference file:line.
"""

__version__ = "0.1.0"

from dbsync_spark.session import get_spark  # noqa: F401
