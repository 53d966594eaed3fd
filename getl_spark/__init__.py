"""getl_spark — a PySpark-native CDC / incremental-ingest engine.

A from-scratch reimagination of the capabilities of josesaribeiro/getl
(Groovy single-JVM ETL) as an idiomatic Spark engine:

- change-event tail (binlog/WAL style) over a lake of source-code repos
- last-writer-wins dedup via window ranking on a monotonic ``seq``
- salted, key-partitioned MERGE INTO upserts (bucket-pruned copy-on-write)
- transactional schema evolution (add / widen / rename)
- exactly-once sink via idempotent epoch-stamped snapshot commits
- checkpoint resume (batch watermark + Structured Streaming)
- per-partition lineage and throughput metrics

All transform logic is DataFrame ops / vectorized Arrow UDFs — no
per-row Python anywhere in the hot path.

The lake layer (``getl_spark.lake``) is an Iceberg-style parquet +
JSON-manifest table format implemented locally because this sandbox has
no Iceberg runtime jar; its API (snapshots, MERGE builder, partition
spec, properties) mirrors Iceberg so a real Iceberg catalog is a
config swap in production.
"""

__version__ = "0.1.0"

from getl_spark.session import get_spark  # noqa: F401
