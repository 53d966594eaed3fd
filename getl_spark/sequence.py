"""Surrogate-key sequence — getl Sequence reimagined for a cluster.

Reference parity: getl's Sequence caches a block of values from a DB
sequence client-side (cache=500 default,
/root/reference/src/main/groovy/getl/jdbc/Sequence.groovy:54,101-112).
Spark has no global sequence, and monotonically_increasing_id() is
NON-deterministic under task retry — so surrogate keys are
``row_number() OVER (ORDER BY business key) + persisted base``:
deterministic, dense, unique, and stable across resume (SURVEY §2.10).
The base offset lives in the lake table's properties and advances in
the same atomic metadata commit protocol as data.

Scale note: the global row_number is a single-partition sort of the
NEW rows only (per-batch thousands, not the table) — fine at any
table size; for very large batches use ``order_cols`` with
zipWithIndex-free two-phase ranking (repartitionByRange + partition
offsets), which ``assign_surrogate_keys(distributed=True)`` implements.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from getl_spark.lake.table import LakeTable


class SequenceGenerator:
    """next_block(n) -> starting value; persisted high-water mark in
    table properties (atomic commit, concurrent-safe via retry)."""

    def __init__(self, table: LakeTable, name: str = "sk"):
        self.table = table
        self.prop = f"sequence.{name}"

    def current(self) -> int:
        self.table.refresh()
        return int(self.table.properties.get(self.prop, "0"))

    def next_block(self, n: int) -> int:
        """Reserve n values; returns the first (1-based).

        CAS loop: the base is re-read from freshly-committed properties
        on every conflict (via transform_properties), so two concurrent
        callers can never reserve the same block — the earlier
        read-then-update version could re-apply a stale absolute value
        after a conflict and hand out duplicate keys."""
        claimed = {}

        def reserve(props: dict) -> dict:
            claimed["base"] = int(props.get(self.prop, "0"))
            return {self.prop: str(claimed["base"] + int(n))}

        self.table.transform_properties(reserve)
        return claimed["base"] + 1


def assign_surrogate_keys(
    df: DataFrame,
    base: int,
    order_cols: list[str],
    sk_col: str = "sk",
    distributed: bool = False,
) -> DataFrame:
    """Dense keys base, base+1, ... ordered by ``order_cols``."""
    if not distributed:
        w = Window.orderBy(*order_cols)
        return df.withColumn(sk_col, F.row_number().over(w) + F.lit(base - 1))
    # two-phase: rank within range partitions, then add partition offsets
    ranged = df.repartitionByRange(*order_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    w_in = Window.partitionBy("_pid").orderBy(*order_cols)
    ranked = ranged.withColumn("_rn", F.row_number().over(w_in))
    offsets = (
        ranked.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("_n"))
        .withColumn(
            "_off",
            F.coalesce(
                F.sum("_n").over(
                    Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("_pid", "_off")
    )
    return (
        ranked.join(F.broadcast(offsets), "_pid")
        .withColumn(sk_col, F.col("_rn") + F.col("_off") + F.lit(base - 1))
        .drop("_pid", "_rn", "_off")
    )
