"""Structured Streaming tailer: availableNow consumption, kill/resume
mid-replay with identical final sha256 (BASELINE.md resumability row)."""

import os

import pytest

from getl_spark.events import generate_change_events, write_event_log
from getl_spark.oracle import assert_final_state_matches, reduce_events
from getl_spark.streaming import StreamingTailer

N = 3000


@pytest.fixture(scope="module")
def log_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("evlog"))
    ev = generate_change_events(spark, N, n_keys=200, n_repos=6, seed=11)
    write_event_log(ev, d, partitions=6)
    return d


@pytest.fixture(scope="module")
def oracle_final(spark, log_dir):
    return reduce_events(spark.read.parquet(log_dir).toPandas())


def test_stream_available_now_matches_oracle(spark, tmp_warehouse, log_dir, oracle_final):
    tailer = StreamingTailer(
        spark,
        os.path.join(tmp_warehouse, "wh"),
        os.path.join(tmp_warehouse, "ckpt"),
        num_buckets=8,
        max_files_per_trigger=2,
    )
    n = tailer.run_available_now(log_dir)
    assert n >= 2, "maxFilesPerTrigger=2 over 6 files should yield >= 2 micro-batches"
    assert_final_state_matches(
        tailer.state().drop("_epoch").toPandas(), oracle_final
    )


def test_stream_resume_after_kill(spark, tmp_warehouse, log_dir, oracle_final):
    wh = os.path.join(tmp_warehouse, "wh")
    ck = os.path.join(tmp_warehouse, "ckpt")

    # phase 1: consume only part of the log (simulate a killed tailer
    # by capping the run to the first micro-batch via an exception)
    tailer1 = StreamingTailer(spark, wh, ck, num_buckets=8, max_files_per_trigger=2)

    class Stop(Exception):
        pass

    orig = tailer1.pipeline.apply_epoch
    calls = {"n": 0}

    def crashing(batch_df, epoch, schema_changes=None):
        if calls["n"] >= 1:
            raise Stop("simulated crash")
        calls["n"] += 1
        return orig(batch_df, epoch, schema_changes)

    tailer1.pipeline.apply_epoch = crashing
    with pytest.raises(Exception):
        tailer1.run_available_now(log_dir)
    partial_rows = tailer1.pipeline.target.count_rows()
    assert partial_rows > 0

    # phase 2: fresh tailer over the same warehouse + checkpoint dir
    tailer2 = StreamingTailer(spark, wh, ck, num_buckets=8, max_files_per_trigger=2)
    tailer2.run_available_now(log_dir)
    assert_final_state_matches(
        tailer2.state().drop("_epoch").toPandas(), oracle_final
    )

    # re-run once more: nothing new to consume, state unchanged
    v = tailer2.pipeline.target.version
    tailer3 = StreamingTailer(spark, wh, ck, num_buckets=8)
    tailer3.run_available_now(log_dir)
    tailer3.pipeline.target.refresh()
    assert tailer3.pipeline.target.version == v


def test_windowed_counts_with_watermark(spark, log_dir, tmp_path):
    """Event-time windowed agg: every (window, op) group the watermark
    closed must match the batch groupBy over the full log exactly, and
    the append-mode sink must emit each window at most once.

    The fixture log is rewritten time-ordered across files (a real
    binlog/WAL tail arrives roughly in event-time order; a hash-split
    log would make 5/6 of rows arrive past the watermark and be
    dropped — which is correct watermark semantics, but not what this
    test pins)."""
    import glob as _glob
    import os as _os
    import time as _time

    from pyspark.sql import functions as F

    from getl_spark.streaming import windowed_event_counts

    ordered = str(tmp_path / "ordered_log")
    full = spark.read.parquet(log_dir)
    lo, hi = 0, full.agg(F.max("seq")).collect()[0][0]
    step = (hi + 5) // 6
    for k in range(6):
        (
            full.filter((F.col("seq") > k * step) & (F.col("seq") <= (k + 1) * step))
            .coalesce(1)
            .write.mode("append")
            .parquet(ordered)
        )
    # FileStreamSource consumes oldest-modification-first: force strictly
    # ascending mod times in seq order (writes above may share a second)
    parts = sorted(_glob.glob(f"{ordered}/part-*.parquet"), key=_os.path.getmtime)
    base = _time.time() - 600
    for i, p in enumerate(parts):
        _os.utime(p, (base + i, base + i))

    out = str(tmp_path / "winout")
    ckpt = str(tmp_path / "winckpt")
    windowed_event_counts(
        spark, ordered, ckpt, out, window_duration="10 minutes", watermark="5 minutes"
    )
    got = spark.read.parquet(out)
    rows = got.collect()
    assert len(rows) > 0, "watermark never closed a window (need >1 micro-batch)"
    # append mode: one emission per (window, op)
    assert got.groupBy("window_start", "op").count().filter("count > 1").count() == 0
    # closed windows match the batch oracle
    oracle = (
        spark.read.parquet(log_dir)
        .withColumn("op", F.col("op"))
        .groupBy(F.window("event_ts", "10 minutes").alias("w"), "op")
        .agg(F.count(F.lit(1)).alias("n"), F.max("seq").alias("max_seq"))
        .select(F.col("w.start").alias("window_start"), "op", "n", "max_seq")
    )
    o = {(r.window_start, r.op): (r.n, r.max_seq) for r in oracle.collect()}
    for r in rows:
        assert o[(r.window_start, r.op)] == (r.n, r.max_seq)


def test_stream_mor_with_always_on_knobs(spark, tmp_warehouse, log_dir, oracle_final):
    """Streaming tailer in MOR mode with the always-on knobs: auto
    salt, per-batch compaction cadence, bounded snapshot history —
    state still matches the oracle and metadata stays bounded."""
    tailer = StreamingTailer(
        spark,
        os.path.join(tmp_warehouse, "wh_mor"),
        os.path.join(tmp_warehouse, "ckpt_mor"),
        num_buckets=8,
        max_files_per_trigger=2,
        merge_mode="mor",
        write_salt="auto",
        keep_snapshots=4,
        compact_every=2,
    )
    tailer.run_available_now(log_dir)
    assert_final_state_matches(
        tailer.state().drop("_epoch").toPandas(), oracle_final
    )
    t = tailer.pipeline.target
    assert len(t.meta["snapshots"]) <= 5
    assert t.properties["write.salt"].isdigit()


def test_stream_compaction_and_lagging_consumer_interleave(spark, tmp_warehouse, tmp_path):
    """Live MOR tailer with an auto-compaction cadence + a LAGGING
    downstream incremental_sync consumer whose catch-up range crosses
    the compaction overwrite: the on_non_append='rebuild' path must
    converge mid-stream, and the chain must resume incrementally
    afterwards (VERDICT r3 item 9 — the pieces existed, the combined
    scenario is pinned here)."""
    from pyspark.sql import functions as F

    from getl_spark.dedup import lww_dedup
    from getl_spark.events import generate_change_events
    from getl_spark.lake import LakeCatalog, PartitionSpec
    from getl_spark.pipeline import incremental_sync
    from getl_spark.schema import parse_ddl

    d = str(tmp_path / "evlog")
    ev = generate_change_events(spark, 1200, n_keys=80, n_repos=5, seed=23).cache()

    def emit(lo, hi):
        ev.filter((F.col("seq") > lo) & (F.col("seq") <= hi)).repartitionByRange(
            2, "seq"
        ).write.mode("append").parquet(d)

    tailer = StreamingTailer(
        spark,
        os.path.join(tmp_warehouse, "wh"),
        os.path.join(tmp_warehouse, "ckpt"),
        num_buckets=4,
        merge_mode="mor",
        compact_every=1,  # every applied micro-batch folds deltas (overwrite snapshot)
    )
    src = tailer.pipeline.target

    cat = LakeCatalog(os.path.join(tmp_warehouse, "derived"))
    live = cat.create_table(
        "live_paths", parse_ddl("repo string, n bigint"), PartitionSpec.none(),
        primary_key=["repo"],
    )

    def transform(delta, target):
        agg = delta.filter(~F.col("_deleted")).groupBy("repo").agg(
            F.count(F.lit(1)).alias("n")
        )
        return (
            target.merge(agg)
            .when_matched_update(set={"n": "t.n + s.n"})
            .when_not_matched_insert()
        )

    def rebuild(full, target):
        resolved = lww_dedup(full, ["repo", "path"], "_seq", "commit", strategy="agg")
        agg = resolved.filter(~F.col("_deleted")).groupBy("repo").agg(
            F.count(F.lit(1)).alias("n")
        )
        return (
            target.merge(agg)
            .when_matched_update(set={"n": "s.n"})
            .when_not_matched_insert()
        )

    def oracle_live_counts(hi):
        pdf = reduce_events(ev.filter(F.col("seq") <= hi).toPandas())
        return pdf.groupby("repo").size().to_dict()

    # phase 1: stream + consumer in lockstep
    emit(0, 400)
    assert tailer.run_available_now(d) >= 1
    incremental_sync(spark, src, live, transform, name="lag",
                     on_non_append="rebuild", rebuild_transform=rebuild)

    # phase 2: the stream runs AHEAD (two more batches, each followed by
    # an auto-compaction overwrite) while the consumer lags behind
    emit(400, 800)
    tailer.run_available_now(d)
    emit(800, 1200)
    tailer.run_available_now(d)
    src.refresh()
    assert any(
        s["operation"] == "overwrite" for s in src.meta["snapshots"]
    ), "compact_every cadence must have produced an overwrite snapshot"

    # the lagging consumer's range now crosses compactions: the default
    # mode errors, the rebuild path converges
    with pytest.raises(ValueError, match="rebuild"):
        incremental_sync(spark, src, live, transform, name="lag")
    res = incremental_sync(spark, src, live, transform, name="lag",
                           on_non_append="rebuild", rebuild_transform=rebuild)
    assert res.get("rebuild") and not res.get("skipped")
    got = {r.repo: r.n for r in live.read(spark).collect() if r.n > 0}
    assert got == oracle_live_counts(1200)

    # phase 3: the chain resumes INCREMENTALLY after the rebuild as
    # long as no compaction lands inside the consumed range
    tailer2 = StreamingTailer(
        spark, os.path.join(tmp_warehouse, "wh"),
        os.path.join(tmp_warehouse, "ckpt"), num_buckets=4, merge_mode="mor",
    )  # no compact_every: next batch appends only
    ev2 = generate_change_events(spark, 1300, n_keys=80, n_repos=5, seed=23).filter(
        "seq > 1200"
    )
    ev2.repartitionByRange(1, "seq").write.mode("append").parquet(d)
    tailer2.run_available_now(d)
    res2 = incremental_sync(spark, src, live, transform, name="lag",
                            on_non_append="rebuild", rebuild_transform=rebuild)
    assert not res2.get("skipped") and not res2.get("rebuild")
