"""Last-writer-wins dedup — the north-rule core operator.

Three physical strategies for the same semantics (winner per key =
max (order, tiebreak)):

- ``agg`` (default): ``groupBy(keys).agg(max_by(struct(*), struct(
  order, tiebreak)))`` — partial aggregation combines map-side, no
  sort, so the shuffle moves ~one row per (key, map partition)
  instead of every event. Strictly dominates the window form.
- ``broadcast``: valid when ``order_col`` is globally UNIQUE (our
  event log guarantees seq uniqueness): shuffle only (keys, order)
  to find winner order-values, broadcast them, and semi-join the raw
  stream — the wide rows (content ~KBs) are never shuffled at all.
  The winner set is per-epoch keys (small); guarded by a count cap
  with automatic fallback to ``agg``.
- ``window``: the textbook row_number form (kept for reference and
  cross-checking in tests).

Reference parity: getl collapses duplicates DB-side keeping Min(ID)
(first-writer, /root/reference/src/main/groovy/getl/files/Manager.groovy:891-932);
CDC needs last-writer with total order (seq, commit) — SURVEY §7.4
risk 2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _winner_struct(df: DataFrame, keys, order_col: str, tiebreak: str, reverse: bool):
    sign = -1 if reverse else 1
    # max_by with a struct ordering key: lexicographic (order, tiebreak)
    ord_key = F.struct(
        F.col(order_col).alias("o"),
        F.col(tiebreak).alias("t"),
    )
    if reverse:
        # min via max_by over negated bigint order; tiebreak flips via
        # the window fallback (first-writer is not on the hot path)
        w = Window.partitionBy(*keys).orderBy(F.asc(order_col), F.asc(tiebreak))
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    val = F.struct(*[F.col(c) for c in df.columns])
    out = df.groupBy(*keys).agg(F.max_by(val, ord_key).alias("_w"))
    return out.select("_w.*")


def lww_dedup(
    df: DataFrame,
    keys: list[str] | tuple[str, ...] = ("repo", "path"),
    order_col: str = "seq",
    tiebreak: str = "commit",
    strategy: str = "agg",
    broadcast_cap: int | None = 5_000_000,
) -> DataFrame:
    """Keep only the winning (last) event per key."""
    keys = list(keys)
    if strategy == "window":
        w = Window.partitionBy(*keys).orderBy(F.desc(order_col), F.desc(tiebreak))
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    if strategy == "broadcast":
        return _lww_broadcast(df, keys, order_col, tiebreak, broadcast_cap)
    return _winner_struct(df, keys, order_col, tiebreak, reverse=False)


def _lww_broadcast(
    df: DataFrame, keys: list[str], order_col: str, tiebreak: str, cap: int | None
) -> DataFrame:
    """Fast path for unique ``order_col``: the wide rows never shuffle.

    1. project (keys, order) — tiny rows — and aggregate the winning
       order value per key (partial agg, one small shuffle);
    2. broadcast the winner order-values and inner-join the raw stream
       on order_col: a broadcast hash join, zero shuffle of content.

    ``cap`` guards broadcast memory: when set (not None), an extra
    count job checks the winner-set size and falls back to the agg
    strategy above it. Callers that know their epoch key cardinality
    (the pipeline sizes epochs) pass cap=None and skip the count job —
    at 10^8-key epochs configure lww_strategy="agg" instead.
    """
    light = df.select(*keys, order_col).groupBy(*keys).agg(
        F.max(order_col).alias(order_col)
    )
    if cap is not None and light.count() > cap:
        return _winner_struct(df, keys, order_col, tiebreak, reverse=False)
    winners = F.broadcast(light.select(order_col))
    return df.join(winners, order_col, "inner")


def first_writer_dedup(
    df: DataFrame,
    keys: list[str] | tuple[str, ...],
    order_col: str = "seq",
    tiebreak: str = "commit",
) -> DataFrame:
    """getl's Min(ID) first-writer variant (files/Manager.groovy:891-932)."""
    return _winner_struct(df, list(keys), order_col, tiebreak, reverse=True)
