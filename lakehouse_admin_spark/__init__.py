"""lakehouse_admin_spark — PySpark-native lakehouse analytics/admin engine.

A from-scratch rebuild of the capabilities of ``justtrackio/lakehouse-admin``
(reference studied read-only at /root/reference), re-expressed Spark-first:

- catalog / metadata browsing      -> Spark SQL over ledger metadata tables
- partition / snapshot analytics   -> DataFrame aggregations
- maintenance (compact/expire/...) -> distributed Spark jobs + ledger commits
- task queue / scheduling          -> driver-side state over a small table
- LLM-data-pipeline extensions     -> dedup, similarity, text analysis ops

Everything here derives from public knowledge only: the Apache Spark API and
the reference repo's observable behavior.
"""

__version__ = "0.1.0"

from lakehouse_admin_spark.session import get_spark  # noqa: F401
