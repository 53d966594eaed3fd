"""Structured Streaming tailer — the continuous form of the pipeline.

``readStream`` over the event-log directory with
``Trigger.AvailableNow`` (batch-incremental, the streaming analog of
getl's watermark polling loop, SURVEY §2.10 last row) and
``foreachBatch`` applying the same dedup -> merge -> lineage ->
checkpoint epoch logic. Two checkpoint layers cooperate:

- Spark's own checkpointLocation tracks source offsets (which files
  of the log have been consumed) — resume is automatic;
- the engine's epoch idempotency (target watermark property +
  _checkpoints) de-duplicates at-least-once batch redelivery: if a
  crash happens after the merge commit but before Spark records the
  batch, the re-delivered batch is skipped by the epoch guard.

foreachBatch's ``batch_id`` is monotonic per checkpointLocation, so it
IS the epoch. This is exactly the "readStream handles offsets, the
lake table replays the role of the history table" design of SURVEY
§3.3.

At cluster scale the same code tails a Kafka/binlog source: swap
``format("parquet")`` for ``format("kafka")`` + a from_json projection;
everything downstream is format-agnostic.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from getl_spark.events import EVENT_SCHEMA_DDL
from getl_spark.pipeline import CDCPipeline
from getl_spark.schema import parse_ddl


class StreamingTailer:
    def __init__(
        self,
        spark: SparkSession,
        warehouse: str,
        checkpoint_dir: str,
        name: str = "tail",
        num_buckets: int = 16,
        write_salt: int | str = 1,
        max_files_per_trigger: int | None = None,
        merge_mode: str = "cow",
        keep_snapshots: int | None = None,
        compact_every: int | None = None,
        dedup_store=None,
        dedup_column=None,
    ):
        """The always-on knobs pass straight through to the pipeline:
        ``write_salt="auto"`` (histogram-sized skew salt),
        ``keep_snapshots`` (bounded metadata), ``compact_every``
        (MOR delta folding), ``dedup_store`` (pre-merge near-dedup
        with persisted verdicts) — a long-running streaming tailer
        needs all of them. Micro-batch replays after a stream restart
        hit both the store's story filter and the merge's epoch
        watermark, so the composed stage stays exactly-once."""
        self.spark = spark
        self.checkpoint_dir = checkpoint_dir
        self.max_files_per_trigger = max_files_per_trigger
        self.pipeline = CDCPipeline(
            spark,
            warehouse,
            name=name,
            num_buckets=num_buckets,
            write_salt=write_salt,
            merge_mode=merge_mode,
            keep_snapshots=keep_snapshots,
            compact_every=compact_every,
            dedup_store=dedup_store,
            dedup_column=dedup_column,
        )

    def run_available_now(self, event_log_path: str) -> int:
        """Consume everything currently in the log, then stop.
        Returns the number of micro-batches applied this run."""
        reader = (
            self.spark.readStream.format("parquet")
            .schema(parse_ddl(EVENT_SCHEMA_DDL))
        )
        if self.max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", self.max_files_per_trigger)
        stream = reader.load(event_log_path)

        applied = {"n": 0}

        def apply_batch(batch_df, batch_id: int):
            res = self.pipeline.apply_epoch(batch_df, int(batch_id))
            if res.applied:
                applied["n"] += 1

        q = (
            stream.writeStream.foreachBatch(apply_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return applied["n"]

    def state(self):
        return self.pipeline.state()


def windowed_event_counts(
    spark: SparkSession,
    event_log_path: str,
    checkpoint_dir: str,
    output_path: str,
    window_duration: str = "10 minutes",
    watermark: str = "5 minutes",
    max_files_per_trigger: int | None = 1,
) -> None:
    """Event-time windowed aggregation with a late-data watermark —
    the canonical Structured Streaming shape for time-bucketed rollups
    over the change stream.

    ``withWatermark(event_ts)`` bounds state: a (window, op) group is
    held only until the watermark passes the window end, then emitted
    exactly once (append mode) and its state dropped — constant memory
    at any stream length. Rows arriving later than the watermark are
    discarded by contract. In AvailableNow mode the watermark advances
    between micro-batches, so ``max_files_per_trigger=1`` makes the
    backfill behave like the live stream (one batch per log file).
    """
    from pyspark.sql import functions as F

    reader = spark.readStream.format("parquet").schema(parse_ddl(EVENT_SCHEMA_DDL))
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.load(event_log_path)
    agg = (
        stream.withWatermark("event_ts", watermark)
        .groupBy(F.window("event_ts", window_duration).alias("w"), "op")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max("seq").alias("max_seq"),
            F.sum(F.length("content")).alias("bytes"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "op",
            "n",
            "max_seq",
            "bytes",
        )
    )
    q = (
        agg.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stateful_repo_stats(
    spark: SparkSession,
    event_log_path: str,
    checkpoint_dir: str,
    output_path: str,
) -> None:
    """Custom stateful streaming operator: running per-repo counters
    maintained across micro-batches via ``applyInPandasWithState``
    (the north-star "custom stateful operators" surface; getl has no
    streaming at all — its closest analog is the Flow row-accounting
    counters, /root/reference/src/main/groovy/getl/data/Dataset.groovy:877-892).

    State per repo: (events_seen, last_seq, bytes). Emits one row per
    repo per micro-batch with the UPDATED running totals. Arrow-batched
    — the per-group pandas frame is the whole group's batch slice,
    never row-at-a-time.
    """
    import pandas as pd

    from getl_spark.events import EVENT_SCHEMA_DDL

    out_schema = "repo string, events_seen bigint, last_seq bigint, bytes bigint"
    state_schema = "events_seen bigint, last_seq bigint, bytes bigint"

    def update(key, pdfs, state):
        repo = key[0]
        n, last, by = state.get if state.exists else (0, 0, 0)
        for pdf in pdfs:
            n += len(pdf)
            if len(pdf):
                last = max(last, int(pdf["seq"].max()))
                by += int(pdf["content"].fillna("").str.len().sum())
        state.update((n, last, by))
        yield pd.DataFrame(
            {"repo": [repo], "events_seen": [n], "last_seq": [last], "bytes": [by]}
        )

    stream = (
        spark.readStream.format("parquet")
        .schema(parse_ddl(EVENT_SCHEMA_DDL))
        .load(event_log_path)
    )
    updated = stream.groupBy("repo").applyInPandasWithState(
        update, out_schema, state_schema, "update", "NoTimeout"
    )
    # parquet sinks don't accept update mode -> foreachBatch append
    q = (
        updated.writeStream.foreachBatch(
            lambda df, _bid: df.write.mode("append").parquet(output_path)
        )
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
