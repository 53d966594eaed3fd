"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)`` — flagship: a full CDC replay of a synthetic
  change-event log through the engine (LWW dedup -> salted bucket-
  pruned MERGE -> lineage -> checkpoint) returning the final target
  state.
- ``queries()`` / ``oracle_sql()`` — the SURVEY §2 operator inventory,
  implemented in getl_spark.queries with DuckDB oracles (checked
  locally via scripts/check_oracles.py).
"""

from __future__ import annotations

import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from getl_spark.events import generate_change_events
from getl_spark.pipeline import CDCPipeline
from getl_spark.queries import all_oracles, all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: replay a 20k-event synthetic change log end-to-end
    through the CDC engine; return the final target table state."""
    events = generate_change_events(spark, 20_000, n_keys=1_500, n_repos=40, seed=42)
    warehouse = tempfile.mkdtemp(prefix="getl_entry_wh_")
    pipe = CDCPipeline(spark, warehouse, num_buckets=16, write_salt=2)
    pipe.replay(events, epoch_size=5_000)
    return pipe.state()


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracles()
