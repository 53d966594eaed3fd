"""Last-writer-wins dedup — the north-rule core operator.

``row_number() OVER (PARTITION BY keys ORDER BY seq DESC, tiebreak
DESC) = 1`` collapses all change events for a key within a batch to
the single winning event.

Reference parity: getl collapses duplicates DB-side keeping Min(ID)
(first-writer, /root/reference/src/main/groovy/getl/files/Manager.groovy:891-932);
CDC needs last-writer, with total order pinned to (seq, commit)
(SURVEY §7.4 risk 2: ties impossible for unique seq, but the tiebreak
keeps the reduction deterministic if a source ever replays seqs).

Scale: the window shuffles by key once; the same hash partitioning is
what the downstream MERGE joins on, so AQE can reuse the exchange.
Skew on hot keys is not a concern here — the partition key (repo,
path) is fine-grained; repo-level heat spreads over many paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def lww_dedup(
    df: DataFrame,
    keys: list[str] | tuple[str, ...] = ("repo", "path"),
    order_col: str = "seq",
    tiebreak: str = "commit",
) -> DataFrame:
    """Keep only the winning (last) event per key."""
    w = Window.partitionBy(*keys).orderBy(F.desc(order_col), F.desc(tiebreak))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def first_writer_dedup(
    df: DataFrame,
    keys: list[str] | tuple[str, ...],
    order_col: str = "seq",
    tiebreak: str = "commit",
) -> DataFrame:
    """getl's Min(ID) first-writer variant (files/Manager.groovy:891-932)."""
    w = Window.partitionBy(*keys).orderBy(F.asc(order_col), F.asc(tiebreak))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
