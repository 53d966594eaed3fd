"""Scale-adaptive input parallelism (optimization guide §2.5 / §6).

Small dimension-style tables (documents/embeddings at bench scale)
arrive as a single parquet file with ONE row group, so every scan-
rooted derivation — shingle explode + sha256 minhash, SimHash bit
aggregation, Arrow-batched bucket UDFs — runs as a single task on one
core no matter how many the session has: parquet row groups cannot be
split, so ``spark.sql.files.minPartitionNum`` produces empty splits
and does not help. :func:`widen_small_scan` restores parallelism by
round-robin repartitioning ONLY when

- the frame is scan-rooted (no shuffle exchange in its plan — a
  post-shuffle frame's parallelism is already governed by
  ``spark.sql.shuffle.partitions`` + AQE), and
- the scan's estimated split count is below the session's default
  parallelism (derived from input size, never a constant — on a real
  cluster a 100 TB input has orders of magnitude more splits than
  cores and this is a structural no-op).

The decision uses only driver-side metadata (plan string + file
listing); it never triggers a job. Non-local filesystems skip the size
probe conservatively (no behavior change vs. not calling this at all).
"""

from __future__ import annotations

import os
import urllib.parse

from pyspark.sql import DataFrame

_SHUFFLE_MARKERS = (
    "Exchange hashpartitioning",
    "Exchange rangepartitioning",
    "Exchange RoundRobinPartitioning",
    "Exchange SinglePartition",
    "AQEShuffleRead",
)

_OPEN_COST = 4 * 1024 * 1024  # spark.sql.files.openCostInBytes default


def _estimated_scan_splits(df: DataFrame) -> int | None:
    """Estimated number of scan splits for a scan-rooted frame, or
    None when it cannot be determined safely (complex plan, remote
    filesystem, no file source)."""
    try:
        qe = df._jdf.queryExecution()
        plan = df._sc._jvm.PythonSQLUtils.explainString(qe, "simple")
    except Exception:
        return None
    if any(m in plan for m in _SHUFFLE_MARKERS):
        return None
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    total = 0
    for f in files:
        parsed = urllib.parse.urlparse(f)
        if parsed.scheme not in ("file", ""):
            return None
        try:
            total += os.path.getsize(urllib.parse.unquote(parsed.path))
        except OSError:
            return None
    try:
        maxpb = int(df.sparkSession.conf.get("spark.sql.files.maxPartitionBytes"))
    except Exception:
        maxpb = 128 * 1024 * 1024
    packed = total + _OPEN_COST * len(files)
    return max(1, -(-packed // maxpb))


def widen_small_scan(df: DataFrame, factor: int = 1) -> DataFrame:
    """Round-robin repartition a scan-rooted frame up to the session
    default parallelism when its scan would otherwise produce fewer
    splits than cores. A no-op for post-shuffle frames, non-local /
    non-file sources, and inputs already wide enough."""
    est = _estimated_scan_splits(df)
    if est is None:
        return df
    target = df.sparkSession.sparkContext.defaultParallelism * factor
    if est >= target:
        return df
    return df.repartition(target)
