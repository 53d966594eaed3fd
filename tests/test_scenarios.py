"""getl-equivalence scenarios from FIXTURES.md §6:
tie-break total order, driver-proto mixed-type composite-key MERGE,
crash-repair between target commit and bookkeeping, incremental
key-range reads."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from getl_spark.dedup import first_writer_dedup, lww_dedup
from getl_spark.lake import LakeCatalog, PartitionSpec
from getl_spark.pipeline import CDCPipeline
from getl_spark.schema import parse_ddl
from getl_spark.events import generate_change_events
from getl_spark.oracle import assert_final_state_matches, reduce_events


# ----------------------------------------------------------- tie-break
def test_lww_tiebreak_duplicated_seq(spark):
    """FIXTURES §2: duplicated seq pins the (seq, commit) total order —
    higher commit wins among equal seqs, in every strategy."""
    rows = [
        (10, "U", "r", "p", "aaaa", "py", "old"),
        (10, "U", "r", "p", "zzzz", "py", "new"),  # same seq, higher commit
        (9, "U", "r", "p", "mmmm", "py", "older"),
    ]
    df = spark.createDataFrame(
        rows, "seq bigint, op string, repo string, path string, commit string, lang string, content string"
    )
    for strategy in ("agg", "window"):
        w = lww_dedup(df, ("repo", "path"), "seq", "commit", strategy=strategy).collect()
        assert len(w) == 1 and w[0].commit == "zzzz", strategy
    f = first_writer_dedup(df, ("repo", "path"), "seq", "commit").collect()
    assert len(f) == 1 and f[0].commit == "mmmm"


# ------------------------------------- driver-proto type round-trip
PROTO_DDL = (
    "id1 bigint, id2 timestamp, name string, description string, "
    "value decimal(12,2), double double, date date, flag boolean, "
    "text string, data binary, uniqueid string"
)


def test_proto_mixed_type_composite_key_merge(spark, tmp_warehouse):
    """JDBCDriverProto's canonical table (composite PK bigint+timestamp,
    decimal/double/date/bool/binary/uuid columns) through create ->
    insert -> merge-update -> delete -> type round-trip
    (/root/reference/src/test/groovy/getl/jdbc/JDBCDriverProto.groovy:66-86,
    550-573)."""
    cat = LakeCatalog(tmp_warehouse)
    t = cat.create_table("proto", parse_ddl(PROTO_DDL), PartitionSpec.bucket(4, "id1"))

    def mk(rows):
        return spark.createDataFrame(rows, parse_ddl(PROTO_DDL))

    import datetime as dt
    from decimal import Decimal

    ts1 = dt.datetime(2024, 1, 1, 12, 0, 0)
    ts2 = dt.datetime(2024, 1, 2, 12, 0, 0)
    base = [
        (1, ts1, "n1", "d1", Decimal("12.34"), 1.5, dt.date(2024, 1, 1), True, "t1", b"\x01\x02", "u1"),
        (2, ts2, "n2", "d2", Decimal("56.78"), 2.5, dt.date(2024, 1, 2), False, "t2", b"\x03", "u2"),
    ]
    t.append(mk(base))

    # round-trip fidelity
    got = {r.id1: r for r in t.read(spark).collect()}
    assert got[1].value == Decimal("12.34") and got[1].flag is True
    assert bytes(got[2].data) == b"\x03" and got[2].date == dt.date(2024, 1, 2)

    # composite-key MERGE: update (1, ts1), insert (3, ts1), delete (2, ts2)
    changes = mk(
        [
            (1, ts1, "n1v2", "d1v2", Decimal("99.99"), 9.9, dt.date(2024, 2, 1), False, "t1v2", b"\xff", "u1"),
            (3, ts1, "n3", "d3", Decimal("0.01"), 0.1, dt.date(2024, 3, 1), True, "t3", b"\x00", "u3"),
            (2, ts2, None, None, None, None, None, None, None, None, "u2"),
        ]
    ).withColumn("op", F.when(F.col("id1") == 2, F.lit("D")).otherwise(F.lit("U")))
    res = (
        t.merge(changes)
        .on(["id1", "id2"])
        .when_matched_delete("s.op = 'D'")
        .when_matched_update()
        .when_not_matched_insert("s.op <> 'D'")
        .execute(spark)
    )
    assert res["stats"] == {"deleted": 1, "updated": 1, "inserted": 1}
    final = {r.id1: r for r in t.read(spark).collect()}
    assert set(final) == {1, 3}
    assert final[1].value == Decimal("99.99") and final[1].name == "n1v2"


# --------------------------------------------- crash-repair bookkeeping
def test_repair_after_crash_between_target_and_checkpoint(spark, tmp_warehouse):
    """SURVEY §7.4 risk 1: commit order is target -> lineage ->
    checkpoint. Simulate a crash after the target merge committed but
    before bookkeeping: resume must skip the data merge (idempotent),
    rewrite lineage for the epoch, and save the checkpoint."""
    ev = generate_change_events(spark, 2000, n_keys=150, n_repos=5, seed=21)
    ev.cache().count()
    pipe = CDCPipeline(spark, tmp_warehouse, num_buckets=8)
    pipe.replay(ev, 1000)

    # wind bookkeeping back to simulate the crash: drop epoch-1 rows
    pipe.checkpoints.clear(spark, "tail")
    pipe.checkpoints.save(spark, "tail", 0, 1000)
    lin = pipe.lineage.read_pandas()
    pipe.lineage.table.overwrite_pandas(lin[lin["epoch"] == 0], {"rewound": True})
    assert pipe.target.properties["watermark.tail"] == "1"  # data already has epoch 1

    v_data_files = {f["path"] for f in pipe.target.current_files()}
    pipe2 = CDCPipeline(spark, tmp_warehouse, num_buckets=8)
    results = pipe2.replay(ev, 1000)
    assert [r.epoch for r in results] == [1]
    assert results[0].applied is False, "data merge must be skipped (idempotent)"
    pipe2.target.refresh()
    assert {f["path"] for f in pipe2.target.current_files()} == v_data_files, "no data rewrite"
    # bookkeeping repaired
    assert pipe2.checkpoints.last(spark, "tail").epoch == 1
    lin2 = pipe2.lineage.read_pandas()
    assert set(lin2["epoch"]) == {0, 1}
    assert int(lin2[lin2["epoch"] == 1]["event_count"].sum()) == 1000
    assert_final_state_matches(
        pipe2.state().drop("_epoch").toPandas(), reduce_events(ev.toPandas())
    )


# ------------------------------------------------- tombstone lifecycle
def test_tombstones_visible_then_purged(spark, tmp_warehouse):
    ev = generate_change_events(spark, 2000, n_keys=100, n_repos=4, seed=31)
    ev.cache().count()
    pipe = CDCPipeline(spark, tmp_warehouse, num_buckets=8)
    pipe.replay(ev, 1000)
    with_t = pipe.state(include_tombstones=True)
    n_tomb = with_t.filter("_deleted").count()
    assert n_tomb > 0, "the event mix contains deletes -> tombstones exist"
    live = pipe.state().count()
    pipe.purge_tombstones(older_than_seq=10_000)
    pipe.target.refresh()
    assert pipe.state(include_tombstones=True).filter("_deleted").count() == 0
    assert pipe.state().count() == live, "purge must not touch live rows"
    assert_final_state_matches(
        pipe.state().drop("_epoch").toPandas(), reduce_events(ev.toPandas())
    )


# -------------------------------------- incremental key-range epochs
def test_incremental_ranges_equal_one_shot(spark, tmp_warehouse):
    """FIXTURES §6 row 1: 3 seq ranges -> 3 epochs == one-shot replay."""
    ev = generate_change_events(spark, 3000, n_keys=200, n_repos=6, seed=41)
    ev.cache().count()
    import os

    p3 = CDCPipeline(spark, os.path.join(tmp_warehouse, "w3"), num_buckets=8)
    p3.replay(ev, 1000)  # 3 epochs
    p1 = CDCPipeline(spark, os.path.join(tmp_warehouse, "w1"), num_buckets=8)
    p1.replay(ev, 3000)  # 1 epoch
    a = p3.state().drop("_epoch").toPandas()
    b = p1.state().drop("_epoch").toPandas()
    assert_final_state_matches(a, b)
    # each epoch's lineage covers exactly its range
    lin = p3.lineage.read_pandas()
    for e in range(3):
        sub = lin[lin["epoch"] == e]
        assert sub["seq_min"].min() > e * 1000 and sub["seq_max"].max() <= (e + 1) * 1000


def test_round4_end_to_end_landing_zone_pipeline(spark, tmp_warehouse, tmp_path):
    """Integration of the round-4 surfaces as a realistic landing-zone
    flow: (1) upstream drops mixed-format CSV change files; (2) the
    operational copier moves them into a landing dir exactly-once;
    (3) the CSV reads with per-field formats; (4) a schema_policy
    pipeline ingests them — including a column that appears
    mid-stream; (5) processed files are archived (move semantics);
    (6) a rerun of every step is a no-op."""
    import os

    from getl_spark.filecopy import copy_files, list_files
    from getl_spark.schema import parse_ddl
    from getl_spark.sources import read_csv

    drop = tmp_path / "drop"
    # two change files; the second adds a 'stars' column and uses the
    # same per-field date format for a tz-naive business date
    (drop / "b1").mkdir(parents=True)
    (drop / "b1" / "changes.csv").write_text(
        "seq;op;repo;path;commit;lang;content;d\n"
        "1;I;r1;a.py;c1;py;alpha;02/01/2024\n"
        "2;I;r1;b.py;c2;py;beta;03/01/2024\n"
        "3;I;r2;c.py;c3;py;gamma;04/01/2024\n"
    )
    (drop / "b2").mkdir(parents=True)
    (drop / "b2" / "changes.csv").write_text(
        "seq;op;repo;path;commit;lang;content;d;stars\n"
        "4;U;r1;a.py;c4;py;alpha2;05/01/2024;7\n"
        "5;D;r1;b.py;c5;py;;06/01/2024;0\n"
    )
    landing = str(tmp_path / "landing")

    # (2) copy drop -> landing, exactly-once via story
    res1 = copy_files(spark, str(drop), "{batch}/changes.csv", [landing])
    assert res1.count() == 2
    story = res1.filter(F.col("ok")).select("filepath")
    assert copy_files(spark, str(drop), "{batch}/changes.csv", [landing], story=story).count() == 0

    # (3)+(4) read each batch with per-field formats, ingest with the
    # implicit schema policy (stars appears in batch 2 only)
    pipe = CDCPipeline(spark, tmp_warehouse, num_buckets=4, schema_policy="merge")
    for e, batch in enumerate(["b1", "b2"]):
        sch = "seq bigint, op string, repo string, path string, commit string, lang string, content string, d date"
        if batch == "b2":
            sch += ", stars int"
        df = read_csv(
            spark, os.path.join(landing, batch, "changes.csv"),
            schema=parse_ddl(sch), field_delimiter=";",
            field_formats={"d": "dd/MM/yyyy"},
        )
        pipe.apply_epoch(df, e)
    state = {(r.repo, r.path): r for r in pipe.state().collect()}
    assert set(state) == {("r1", "a.py"), ("r2", "c.py")}  # b.py deleted
    assert state[("r1", "a.py")].content == "alpha2"
    assert state[("r1", "a.py")].stars == 7
    assert state[("r2", "c.py")].stars is None  # pre-policy row
    assert str(state[("r2", "c.py")].d) == "2024-01-04"
    cols = pipe.target.schema().fieldNames()
    assert "stars" in cols and "op" not in cols and "seq" not in cols

    # (4b) replaying a committed epoch is a no-op (exactly-once)
    df2 = read_csv(
        spark, os.path.join(landing, "b1", "changes.csv"),
        schema=parse_ddl("seq bigint, op string, repo string, path string, commit string, lang string, content string, d date"),
        field_delimiter=";", field_formats={"d": "dd/MM/yyyy"},
    )
    assert not pipe.apply_epoch(df2, 0).applied

    # (5) archive processed landing files with move semantics
    archive = str(tmp_path / "archive")
    moved = copy_files(spark, landing, "{batch}/changes.csv", [archive], delete_source=True)
    assert moved.count() == 2 and moved.toPandas()["ok"].all()
    assert list_files(spark, landing, "{batch}/changes.csv").count() == 0
    assert os.path.exists(os.path.join(archive, "b2", "changes.csv"))
