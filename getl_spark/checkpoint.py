"""Checkpoint / watermark manager — getl's SavePointManager reimagined.

Reference parity:
(/root/reference/src/main/groovy/getl/jdbc/SavePointManager.groovy)
- 4-column history table (source, type, time, value) :152-157 ->
  ``_checkpoints (pipeline, epoch, max_seq, committed_ts)``
- two save methods :131 — INSERT appends history (read = MAX :277) and
  MERGE keeps one row per pipeline, update guarded by ``value < new``
  :412 so stale saves never regress the watermark
- ``lastValue`` / ``saveValue`` / ``clearValue`` :264-421

The engine's exactly-once story is two-layered:
1. the target table's ``watermark.<pipeline>`` property is stamped in
   the SAME atomic commit as the data (merge idempotency guard) — that
   alone guarantees no double-apply;
2. this table is the durable, auditable watermark read at resume and
   the lineage anchor. Commit order per epoch: target -> lineage ->
   checkpoint; a crash between them is repaired on resume because the
   target merge is idempotent and bookkeeping is rewritten per epoch.
"""

from __future__ import annotations

from pyspark.sql import Row, SparkSession

from getl_spark.lake import LakeCatalog, PartitionSpec
from getl_spark.schema import parse_ddl

CHECKPOINT_SCHEMA = parse_ddl(
    "pipeline string, epoch bigint, max_seq bigint, committed_ts timestamp"
)


class CheckpointManager:
    def __init__(self, catalog: LakeCatalog, table_name: str = "_checkpoints", method: str = "INSERT"):
        if method not in ("INSERT", "MERGE"):
            raise ValueError("method must be INSERT or MERGE")
        self.method = method
        self.table = catalog.create_table(
            table_name, CHECKPOINT_SCHEMA, PartitionSpec.none(), if_not_exists=True
        )

    def last(self, spark: SparkSession, pipeline: str) -> Row | None:
        """Highest committed (epoch, max_seq) for a pipeline, or None."""
        self.table.refresh()
        if self.table.count_rows() == 0:
            return None
        rows = (
            self.table.read(spark)
            .filter(f"pipeline = '{pipeline}'")
            .orderBy("epoch", ascending=False)
            .limit(1)
            .collect()
        )
        return rows[0] if rows else None

    def save(self, spark: SparkSession, pipeline: str, epoch: int, max_seq: int) -> bool:
        """Advance the watermark; monotonic guard — a stale save
        (epoch <= committed) is refused, returns False."""
        prev = self.last(spark, pipeline)
        if prev is not None and prev.epoch >= epoch:
            return False
        row_df = spark.sql(
            f"SELECT '{pipeline}' AS pipeline, CAST({int(epoch)} AS BIGINT) AS epoch, "
            f"CAST({int(max_seq)} AS BIGINT) AS max_seq, current_timestamp() AS committed_ts"
        )
        if self.method == "INSERT":
            self.table.append(row_df, {"pipeline": pipeline, "epoch": epoch})
        else:  # MERGE: single row per pipeline, guarded update
            (
                self.table.merge(row_df)
                .on(["pipeline"])
                .when_matched_update(condition=f"t.max_seq < {int(max_seq)}")
                .when_not_matched_insert()
                .execute(spark)
            )
        return True

    def clear(self, spark: SparkSession, pipeline: str) -> None:
        """getl clearValue — drop a pipeline's watermark history."""
        self.table.delete_where(spark, f"pipeline = '{pipeline}'")

    def history(self, spark: SparkSession, pipeline: str | None = None):
        df = self.table.read(spark)
        return df.filter(f"pipeline = '{pipeline}'") if pipeline else df
