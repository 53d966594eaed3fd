"""applyInPandasWithState operator + XML source."""

import os

from getl_spark.events import generate_change_events, write_event_log
from getl_spark.schema import parse_ddl
from getl_spark.sources import read_xml
from getl_spark.streaming import stateful_repo_stats


def test_stateful_repo_stats_running_totals(spark, tmp_warehouse):
    log = os.path.join(tmp_warehouse, "log")
    out = os.path.join(tmp_warehouse, "out")
    ck = os.path.join(tmp_warehouse, "ck")
    ev = generate_change_events(spark, 2000, n_keys=100, n_repos=4, seed=61)
    write_event_log(ev, log, partitions=4)
    stateful_repo_stats(spark, log, ck, out)
    res = spark.read.parquet(out)
    # the LAST emission per repo carries the full running totals
    from pyspark.sql import functions as F

    final = res.groupBy("repo").agg(
        F.max("events_seen").alias("n"), F.max("last_seq").alias("mx")
    )
    expected = ev.groupBy("repo").agg(
        F.count(F.lit(1)).alias("n"), F.max("seq").alias("mx")
    )
    diff = final.exceptAll(expected).count() + expected.exceptAll(final).count()
    assert diff == 0


def test_read_xml_rowtag_fields(spark, tmp_path):
    p = tmp_path / "data.xml"
    p.write_text(
        """<catalog>
  <book id="1"><title>Spark</title><price>10.5</price></book>
  <book id="2"><title>Groovy</title><price>7.25</price></book>
</catalog>"""
    )
    df = read_xml(
        spark, str(tmp_path), "book", parse_ddl("id int, title string, price double")
    )
    rows = sorted([(r.id, r.title, r.price) for r in df.collect()])
    assert rows == [(1, "Spark", 10.5), (2, "Groovy", 7.25)]
