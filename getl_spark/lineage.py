"""Per-partition lineage + throughput metrics.

Reference parity: getl's row accounting (readRows/writeRows/updateRows,
/root/reference/src/main/groovy/getl/data/Dataset.groovy:877-892) and
ProcessTime rows/sec stats
(/root/reference/src/main/groovy/getl/stat/ProcessTime.groovy:157-175)
— recast as first-class rows in a ``_lineage`` lake table, one row per
(epoch, storage bucket): source offset range, event count, bytes,
apply latency (FIXTURES.md §5).

The aggregation runs over the epoch slice grouped by the target's
bucket transform — the same hash the MERGE shuffles on, so at scale
this agg piggybacks on data already clustered by bucket. Re-recording
an epoch (crash repair) first deletes that epoch's rows, keeping the
table idempotent per epoch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from getl_spark.lake import LakeCatalog, PartitionSpec
from getl_spark.schema import parse_ddl

LINEAGE_SCHEMA = parse_ddl(
    "epoch bigint, partition_id int, seq_min bigint, seq_max bigint, "
    "event_count bigint, bytes bigint, apply_latency_ms bigint"
)


class LineageRecorder:
    def __init__(self, catalog: LakeCatalog, table_name: str = "_lineage"):
        self.table = catalog.create_table(
            table_name, LINEAGE_SCHEMA, PartitionSpec.none(), if_not_exists=True
        )

    def compute(self, events: DataFrame, epoch: int, bucket_expr, latency_ms: int) -> DataFrame:
        return (
            events.groupBy(bucket_expr.cast("int").alias("partition_id"))
            .agg(
                F.min("seq").alias("seq_min"),
                F.max("seq").alias("seq_max"),
                F.count(F.lit(1)).alias("event_count"),
                F.coalesce(F.sum(F.length("content")), F.lit(0)).cast("bigint").alias("bytes"),
            )
            .select(
                F.lit(int(epoch)).cast("bigint").alias("epoch"),
                "partition_id",
                "seq_min",
                "seq_max",
                "event_count",
                "bytes",
                F.lit(int(latency_ms)).cast("bigint").alias("apply_latency_ms"),
            )
        )

    def record(self, spark: SparkSession, events: DataFrame, epoch: int, bucket_expr, latency_ms: int) -> None:
        self.table.refresh()
        if self.table.count_rows() > 0:
            existing = (
                self.table.read(spark).filter(f"epoch = {int(epoch)}").limit(1).count()
            )
            if existing:
                self.table.delete_where(spark, f"epoch = {int(epoch)}")
        self.table.append(self.compute(events, epoch, bucket_expr, latency_ms), {"epoch": epoch})

    def read(self, spark: SparkSession) -> DataFrame:
        self.table.refresh()
        return self.table.read(spark)
