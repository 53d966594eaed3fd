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
