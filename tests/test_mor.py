"""Merge-on-read mode: O(epoch) appends + LWW-resolving reads must
produce the identical final state as copy-on-write."""

import pytest

from getl_spark.events import generate_change_events
from getl_spark.oracle import assert_final_state_matches, reduce_events
from getl_spark.pipeline import CDCPipeline

N = 4000
EPOCH = 1000


@pytest.fixture(scope="module")
def event_df(spark):
    df = generate_change_events(spark, N, n_keys=250, n_repos=8, seed=7)
    df.cache().count()
    return df


@pytest.fixture(scope="module")
def oracle_final(event_df):
    return reduce_events(event_df.toPandas())


def state_pdf(pipe):
    return pipe.state().drop("_epoch").toPandas()


def test_mor_replay_matches_oracle(spark, tmp_warehouse, event_df, oracle_final):
    pipe = CDCPipeline(spark, tmp_warehouse, num_buckets=8, merge_mode="mor")
    results = pipe.replay(event_df, EPOCH)
    assert all(r.applied for r in results)
    assert_final_state_matches(state_pdf(pipe), oracle_final)
    # delta files accumulated: raw row count exceeds resolved keys
    assert pipe.target.count_rows() > pipe.state().count()


def test_mor_rerun_exactly_once_and_resume(spark, tmp_warehouse, event_df, oracle_final):
    pipe = CDCPipeline(spark, tmp_warehouse, num_buckets=8, merge_mode="mor")
    pipe.replay(event_df, EPOCH, stop_after_epoch=1)
    # reload: mode comes from the table property, not the constructor
    pipe2 = CDCPipeline(spark, tmp_warehouse, num_buckets=8)
    assert pipe2.merge_mode == "mor"
    resumed = pipe2.replay(event_df, EPOCH)
    assert [r.epoch for r in resumed] == [2, 3]
    v = pipe2.target.version
    assert pipe2.replay(event_df, EPOCH) == []
    assert pipe2.target.version == v
    assert_final_state_matches(state_pdf(pipe2), oracle_final)


def test_mor_compaction_preserves_state(spark, tmp_warehouse, event_df, oracle_final):
    pipe = CDCPipeline(spark, tmp_warehouse, num_buckets=8, merge_mode="mor")
    pipe.replay(event_df, EPOCH)
    raw_before = pipe.target.count_rows()
    pipe.compact()
    pipe.target.refresh()
    assert pipe.target.count_rows() < raw_before  # one row per key now
    assert_final_state_matches(state_pdf(pipe), oracle_final)
    # applying more events after compaction still works
    more = generate_change_events(spark, N, n_keys=250, n_repos=8, seed=7)
    assert pipe.replay(more, EPOCH) == []  # all epochs committed already


def test_mor_cow_identical_final_state(spark, tmp_warehouse, event_df):
    import os

    cow = CDCPipeline(spark, os.path.join(tmp_warehouse, "cow"), num_buckets=8, merge_mode="cow")
    mor = CDCPipeline(spark, os.path.join(tmp_warehouse, "mor"), num_buckets=8, merge_mode="mor")
    cow.replay(event_df, EPOCH)
    mor.replay(event_df, EPOCH)
    assert_final_state_matches(state_pdf(mor), state_pdf(cow))


def _ev(spark, rows):
    from getl_spark.events import EVENT_SCHEMA_DDL
    from getl_spark.schema import parse_ddl

    # (seq, op, repo, path, commit, lang, content, event_ts)
    return spark.createDataFrame(
        [
            (seq, op, repo, path, f"c{seq:039d}", "py", content, None)
            for (seq, op, repo, path, content) in rows
        ],
        parse_ddl(EVENT_SCHEMA_DDL),
    )


def test_mor_purge_tombstones_does_not_resurrect_deleted_keys(spark, tmp_warehouse):
    """The stale-row hazard: an uncompacted delta still holds a
    non-tombstone row at lower _seq for a deleted key; physically
    deleting the tombstone would make it the LWW winner again.
    purge_tombstones must compact first in MOR mode."""
    pipe = CDCPipeline(spark, tmp_warehouse, num_buckets=4, merge_mode="mor")
    pipe.apply_epoch(_ev(spark, [(1, "I", "r1", "a.py", "v1"), (2, "I", "r1", "b.py", "keep")]), 0)
    pipe.apply_epoch(_ev(spark, [(3, "U", "r1", "a.py", "v2")]), 1)  # stale delta row
    pipe.apply_epoch(_ev(spark, [(4, "D", "r1", "a.py", "")]), 2)  # tombstone delta
    assert {r.path for r in pipe.state().collect()} == {"b.py"}
    pipe.purge_tombstones(older_than_seq=100)
    got = {r.path for r in pipe.state().collect()}
    assert got == {"b.py"}, f"deleted key resurrected: {got}"
    # tombstone physically gone
    assert pipe.state(include_tombstones=True).filter("_deleted").count() == 0


def test_mor_delta_append_after_schema_evolution(spark, tmp_warehouse):
    """MOR delta appends must cast to the target schema: after
    add_column the fill is a TYPED null (void columns break parquet),
    and after widen the delta's physical types match the schema_id it
    is recorded under."""
    pipe = CDCPipeline(spark, tmp_warehouse, num_buckets=4, merge_mode="mor")
    pipe.apply_epoch(_ev(spark, [(1, "I", "r1", "a.py", "v1")]), 0)
    pipe.apply_epoch(
        _ev(spark, [(2, "I", "r1", "b.py", "v1")]),
        1,
        schema_changes=[{"change": "add_column", "column_name": "rev", "new_type": "int", "seq": 2}],
    )
    pipe.apply_epoch(
        _ev(spark, [(3, "U", "r1", "a.py", "v2")]),
        2,
        schema_changes=[{"change": "widen_column", "column_name": "rev", "new_type": "bigint", "seq": 3}],
    )
    st = pipe.state()
    assert dict(st.dtypes)["rev"] == "bigint"
    rows = {r.path: (r.content, r.rev) for r in st.collect()}
    assert rows == {"a.py": ("v2", None), "b.py": ("v1", None)}
    # compaction still converges post-evolution
    pipe.compact()
    assert {r.path for r in pipe.state().collect()} == {"a.py", "b.py"}


def test_mor_rename_alignment_on_delta_path(spark, tmp_warehouse):
    """rename_column + MOR: later events still emitting the pre-rename
    name must align and append cleanly (the CoW path's
    _align_source_columns also guards the delta path)."""
    pipe = CDCPipeline(spark, tmp_warehouse, num_buckets=4, merge_mode="mor")
    pipe.apply_epoch(_ev(spark, [(1, "I", "r1", "a.py", "v1")]), 0)
    pipe.apply_epoch(
        _ev(spark, [(2, "U", "r1", "a.py", "v2")]),
        1,
        schema_changes=[
            {"change": "rename_column", "column_name": "lang", "new_name": "language", "seq": 2}
        ],
    )
    st = pipe.state()
    assert "language" in st.columns and "lang" not in st.columns
    rows = {r.path: (r.content, r.language) for r in st.collect()}
    assert rows == {"a.py": ("v2", "py")}


import pytest as _pytest


@_pytest.mark.parametrize("mode", ["cow", "mor"])
def test_random_epoch_assignment_converges(spark, tmp_warehouse, mode):
    """The convergence claim behind tombstones + the per-arm
    `s._seq > t._seq` guard: micro-batch contents are NOT seq-ordered
    (a streaming tailer's file-listing order is not contractual), so
    events land in epochs in arbitrary order — the final state must
    still equal the oracle's LWW reduction."""
    import os

    from pyspark.sql import functions as F

    ev = generate_change_events(spark, 3000, n_keys=200, n_repos=6, seed=23)
    oracle = reduce_events(ev.toPandas())
    sliced = ev.withColumn("_e", F.pmod(F.xxhash64("seq", F.lit(77)), F.lit(4)))
    pipe = CDCPipeline(
        spark, os.path.join(tmp_warehouse, mode), num_buckets=8, merge_mode=mode
    )
    for e in range(4):
        pipe.apply_epoch(sliced.filter(F.col("_e") == e).drop("_e"), e)
    assert_final_state_matches(state_pdf(pipe), oracle)


def test_incremental_chained_derived_table(spark, tmp_warehouse):
    """Medallion-style chaining: a derived per-repo counter table fed
    from the target's append-only MOR snapshots via read_incremental,
    merged with an expression set-map (t.n + s.n) under snapshot-id
    idempotency — each target snapshot's delta is applied exactly once
    even if the consumer re-runs."""
    import os

    from getl_spark.lake import LakeCatalog, PartitionSpec
    from getl_spark.schema import parse_ddl
    from pyspark.sql import functions as F

    pipe = CDCPipeline(spark, os.path.join(tmp_warehouse, "src"), num_buckets=4, merge_mode="mor")
    cat = LakeCatalog(os.path.join(tmp_warehouse, "derived"))
    counts = cat.create_table(
        "repo_counts", parse_ddl("repo string, n bigint"), PartitionSpec.none(),
        primary_key=["repo"],
    )

    from getl_spark.pipeline import incremental_sync

    def transform(delta, target):
        agg = delta.groupBy("repo").agg(F.count(F.lit(1)).alias("n"))
        return (
            target.merge(agg)  # ON defaults to the primary key
            .when_matched_update(set={"n": "t.n + s.n"})
            .when_not_matched_insert()
        )

    def sync_derived():
        return incremental_sync(spark, pipe.target, counts, transform, name="derived")

    pipe.apply_epoch(_ev(spark, [(1, "I", "r1", "a.py", "x"), (2, "I", "r2", "b.py", "y")]), 0)
    sync_derived()
    pipe.apply_epoch(_ev(spark, [(3, "U", "r1", "a.py", "x2"), (4, "I", "r1", "c.py", "z")]), 1)
    res = sync_derived()
    assert not res.get("skipped")
    got = {r.repo: r.n for r in counts.read(spark).collect()}
    assert got == {"r1": 3, "r2": 1}
    # re-running the consumer with no new target snapshot is a no-op
    assert sync_derived().get("skipped")
    got2 = {r.repo: r.n for r in counts.read(spark).collect()}
    assert got2 == got


def test_incremental_sync_recovers_after_compaction(spark, tmp_warehouse):
    """Maintenance wedge recovery: compact() writes an overwrite
    snapshot, so the naive consumer would raise forever on every
    future range. on_non_append='rebuild' catches up from a full
    snapshot, advances the watermark atomically, and subsequent
    incremental syncs work again."""
    import os

    from getl_spark.lake import LakeCatalog, PartitionSpec
    from getl_spark.pipeline import incremental_sync
    from getl_spark.schema import parse_ddl
    from pyspark.sql import functions as F

    pipe = CDCPipeline(spark, os.path.join(tmp_warehouse, "src"), num_buckets=4, merge_mode="mor")
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
        # full-state rebuild: resolved live-path count per repo
        from getl_spark.dedup import lww_dedup

        resolved = lww_dedup(full, ["repo", "path"], "_seq", "commit", strategy="agg")
        agg = resolved.filter(~F.col("_deleted")).groupBy("repo").agg(
            F.count(F.lit(1)).alias("n")
        )
        return (
            target.merge(agg)
            .when_matched_update(set={"n": "s.n"})
            .when_not_matched_insert()
        )

    pipe.apply_epoch(_ev(spark, [(1, "I", "r1", "a.py", "x"), (2, "I", "r2", "b.py", "y")]), 0)
    incremental_sync(spark, pipe.target, live, transform, name="c")
    pipe.compact()  # overwrite snapshot lands mid-chain
    pipe.apply_epoch(_ev(spark, [(3, "I", "r1", "c.py", "z")]), 1)
    # default mode: instructive error, not a silent wrong answer
    import pytest as _p

    with _p.raises(ValueError, match="rebuild"):
        incremental_sync(spark, pipe.target, live, transform, name="c")
    res = incremental_sync(
        spark, pipe.target, live, transform, name="c",
        on_non_append="rebuild", rebuild_transform=rebuild,
    )
    assert res.get("rebuild") and not res.get("skipped")
    got = {r.repo: r.n for r in live.read(spark).collect()}
    assert got == {"r1": 2, "r2": 1}
    # chain resumes incrementally after the rebuild
    pipe.apply_epoch(_ev(spark, [(4, "I", "r2", "d.py", "w")]), 2)
    res2 = incremental_sync(spark, pipe.target, live, transform, name="c")
    assert not res2.get("skipped") and not res2.get("rebuild")
    got2 = {r.repo: r.n for r in live.read(spark).collect()}
    assert got2 == {"r1": 2, "r2": 2}


def test_compact_every_bounds_delta_files(spark, tmp_warehouse):
    """MOR auto-compaction cadence: reads stay O(resolved table), not
    O(epochs), and the state still matches the oracle."""
    import os

    from getl_spark.events import generate_change_events
    from getl_spark.oracle import reduce_events

    ev = generate_change_events(spark, 4000, n_keys=200, n_repos=6, seed=13)
    auto = CDCPipeline(
        spark, os.path.join(tmp_warehouse, "auto"), num_buckets=4,
        merge_mode="mor", compact_every=2,
    )
    plain = CDCPipeline(
        spark, os.path.join(tmp_warehouse, "plain"), num_buckets=4,
        merge_mode="mor",
    )
    auto.replay(ev, 500)   # 8 epochs -> compactions after 2,4,6,8
    plain.replay(ev, 500)
    n_auto = len(auto.target.current_files())
    n_plain = len(plain.target.current_files())
    assert n_auto < n_plain, (n_auto, n_plain)
    oracle = reduce_events(ev.toPandas())
    assert_final_state_matches(state_pdf(auto), oracle)
    # resume across a compaction is still exactly-once
    auto2 = CDCPipeline(
        spark, os.path.join(tmp_warehouse, "auto"), num_buckets=4,
        merge_mode="mor", compact_every=2,
    )
    assert auto2.replay(ev, 500) == []
