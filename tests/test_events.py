"""Event-generator guarantees (FIXTURES.md §2)."""

import pytest
from pyspark.sql import functions as F

from getl_spark.events import content_expr, generate_change_events


@pytest.fixture(scope="module")
def events(spark):
    df = generate_change_events(spark, 5000, n_keys=300, n_repos=10, seed=42)
    df.cache().count()
    return df


def test_seq_unique_and_monotonic_range(spark, events):
    n = events.count()
    assert n == 5000
    assert events.select("seq").distinct().count() == n
    mm = events.agg(F.min("seq"), F.max("seq")).collect()[0]
    assert mm[0] == 1 and mm[1] == 5000


def test_deterministic(spark, events):
    again = generate_change_events(spark, 5000, n_keys=300, n_repos=10, seed=42)
    h1 = events.select(F.sha2(F.concat_ws("|", *events.columns), 256).alias("h"))
    h2 = again.select(F.sha2(F.concat_ws("|", *again.columns), 256).alias("h"))
    assert h1.exceptAll(h2).count() == 0 and h2.exceptAll(h1).count() == 0


def test_first_event_per_key_is_insert(spark, events):
    from pyspark.sql import Window

    w = Window.partitionBy("repo", "path").orderBy("seq")
    firsts = (
        events.withColumn("rn", F.row_number().over(w)).filter("rn = 1").select("op").distinct()
    )
    assert [r.op for r in firsts.collect()] == ["I"]


def test_lifecycle_ops_follow_live_keys(spark, events):
    """U never directly follows a D for the same key (D kills the key;
    the next non-dup event is a re-insert). Dup re-deliveries may
    repeat the D itself — that's the documented at-least-once noise."""
    from pyspark.sql import Window

    w = Window.partitionBy("repo", "path").orderBy("seq")
    chk = events.withColumn("prev_op", F.lag("op").over(w))
    bad = chk.filter((F.col("prev_op") == "D") & (F.col("op") == "U")).count()
    assert bad == 0


def test_delete_carries_null_content_and_ratios(spark, events):
    ops = {r["op"]: r["n"] for r in events.groupBy("op").agg(F.count("*").alias("n")).collect()}
    assert events.filter("op = 'D' AND content IS NOT NULL").count() == 0
    assert events.filter("op <> 'D' AND content IS NULL").count() == 0
    assert ops["I"] > 0 and ops["U"] > 0 and ops["D"] > 0
    assert ops["U"] > ops["D"]  # ~60/30/10-ish mix


def test_duplicate_delivery_present(spark, events):
    """~5% of events re-deliver the key's previous event: same commit,
    different seq."""
    dups = (
        events.groupBy("repo", "path", "commit", "op")
        .agg(F.count("*").alias("n"))
        .filter("n > 1")
        .count()
    )
    assert dups > 0


def test_content_is_pure_function_of_key_commit(spark, events):
    regen = events.filter("op <> 'D'").withColumn(
        "content2", content_expr(F.col("repo"), F.col("path"), F.col("commit"))
    )
    assert regen.filter("content <> content2").count() == 0


def test_skew_exists(spark, events):
    """zipf-ish: hottest repo takes a disproportionate share."""
    top = events.groupBy("repo").count().orderBy(F.desc("count")).limit(1).collect()[0]
    n_repos = events.select("repo").distinct().count()
    assert top["count"] > 2 * (5000 / n_repos)


def test_event_ts_derived_from_seq(spark, events):
    bad = events.filter(
        F.unix_timestamp("event_ts") != (F.lit(1700000000) + F.col("seq"))
    ).count()
    assert bad == 0


def test_murmur3_matches_spark_hash(spark):
    """_identity_route's partition routing rests on _murmur3_int being
    exactly Spark's Murmur3 int hash (seed 42) — pin it against
    F.hash over a value sample including negatives and extremes."""
    from getl_spark.events import _identity_route, _murmur3_int

    vals = list(range(0, 64)) + [2**31 - 1, -(2**31), -1, -17, 987654321]
    df = spark.createDataFrame([(v,) for v in vals], "v int").select(
        "v", F.hash("v").alias("h")
    )
    got = {r.v: r.h for r in df.collect()}
    assert all(got[v] == _murmur3_int(v) for v in vals)
    # and the lookup inverts the partitioner for a few sizes
    for p in (1, 4, 21, 64):
        lut = _identity_route(p)
        assert [_murmur3_int(x) % p for x in lut] == list(range(p))


def test_event_log_files_are_tight_seq_blocks(spark, tmp_path):
    """The identity-routed layout must keep write_event_log's contract:
    each parquet file covers one contiguous seq range, no overlaps —
    this is what lets replay's epoch slices prune whole files."""
    import glob

    import pyarrow.parquet as pq

    from getl_spark.events import generate_change_events, write_event_log

    ev = generate_change_events(spark, 8000, n_keys=400, n_repos=16, seed=11, partitions=8)
    path = str(tmp_path / "log")
    write_event_log(ev, path)
    ranges = []
    for f in glob.glob(path + "/*.parquet"):
        md = pq.read_metadata(f)
        stats = [md.row_group(i).column(0).statistics for i in range(md.num_row_groups)]
        assert md.schema[0].name == "seq"
        ranges.append((min(s.min for s in stats), max(s.max for s in stats)))
    ranges.sort()
    assert ranges[0][0] == 1 and ranges[-1][1] == 8000
    assert all(ranges[i][1] < ranges[i + 1][0] for i in range(len(ranges) - 1))
