"""Checkpoint / watermark manager — getl's SavePointManager reimagined.

Reference parity:
(/root/reference/src/main/groovy/getl/jdbc/SavePointManager.groovy)
- 4-column history table (source, type, time, value) :152-157 ->
  ``_checkpoints (pipeline, epoch, max_seq, committed_ts)``
- two save methods :131 — INSERT appends history (read = MAX :277) and
  MERGE keeps one row per pipeline, guarded by ``value < new`` :412 so
  stale saves never regress the watermark
- ``lastValue`` / ``saveValue`` / ``clearValue`` :264-421

The engine's exactly-once story is two-layered:
1. the target table's ``watermark.<pipeline>`` property is stamped in
   the SAME atomic commit as the data (merge idempotency guard) — that
   alone guarantees no double-apply;
2. this table is the durable, auditable watermark read at resume and
   the lineage anchor. Commit order per epoch: target -> lineage ->
   checkpoint; a crash between them is repaired on resume because the
   target merge is idempotent and bookkeeping is rewritten per epoch.

Perf: the table is tiny (one row per epoch), so reads/writes go
through pyarrow driver-side (read_pandas/append_pandas) — zero Spark
jobs on the per-epoch hot path.
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd

from getl_spark.lake import LakeCatalog, PartitionSpec
from getl_spark.schema import parse_ddl

CHECKPOINT_SCHEMA = parse_ddl(
    "pipeline string, epoch bigint, max_seq bigint, committed_ts timestamp"
)


@dataclass
class Watermark:
    pipeline: str
    epoch: int
    max_seq: int


class CheckpointManager:
    def __init__(self, catalog: LakeCatalog, table_name: str = "_checkpoints", method: str = "INSERT"):
        if method not in ("INSERT", "MERGE"):
            raise ValueError("method must be INSERT or MERGE")
        self.method = method
        self.table = catalog.create_table(
            table_name, CHECKPOINT_SCHEMA, PartitionSpec.none(), if_not_exists=True
        )

    def _pdf(self) -> pd.DataFrame:
        self.table.refresh()
        return self.table.read_pandas()

    def last(self, spark=None, pipeline: str = "tail") -> Watermark | None:
        """Highest committed (epoch, max_seq) for a pipeline, or None.
        (``spark`` kept for API compatibility; reads are driver-side.)"""
        pdf = self._pdf()
        mine = pdf[pdf["pipeline"] == pipeline]
        if mine.empty:
            return None
        row = mine.loc[mine["epoch"].idxmax()]
        return Watermark(pipeline, int(row["epoch"]), int(row["max_seq"]))

    def save(self, spark=None, pipeline: str = "tail", epoch: int = 0, max_seq: int = 0) -> bool:
        """Advance the watermark; monotonic guard — a stale save
        (epoch <= committed) is refused, returns False."""
        prev = self.last(pipeline=pipeline)
        if prev is not None and prev.epoch >= int(epoch):
            return False
        row = pd.DataFrame(
            {
                "pipeline": [pipeline],
                "epoch": pd.array([int(epoch)], dtype="int64"),
                "max_seq": pd.array([int(max_seq)], dtype="int64"),
                "committed_ts": [pd.Timestamp.now(tz="UTC")],
            }
        )
        if self.method == "INSERT":
            self.table.append_pandas(row, {"pipeline": pipeline, "epoch": int(epoch)})
        else:  # MERGE: single live row per pipeline, one atomic commit
            pdf = self._pdf()
            keep = pdf[pdf["pipeline"] != pipeline]
            merged = pd.concat([keep, row], ignore_index=True) if not keep.empty else row
            self.table.overwrite_pandas(
                merged, {"pipeline": pipeline, "epoch": int(epoch), "merge_mode": True}
            )
        return True

    def clear(self, spark=None, pipeline: str = "tail") -> None:
        """getl clearValue — drop a pipeline's watermark history."""
        keep = self._pdf()
        keep = keep[keep["pipeline"] != pipeline]
        self.table.overwrite_pandas(keep, {"cleared": pipeline})

    def history(self, spark, pipeline: str | None = None):
        self.table.refresh()
        df = self.table.read(spark)
        return df.filter(f"pipeline = '{pipeline}'") if pipeline else df
