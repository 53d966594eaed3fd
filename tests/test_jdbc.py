"""JDBC passthrough (reference: jdbc/JDBCDriver.groovy sqlForDataset
:1249-1296 and openWrite :1795-2006) — tested against a REAL embedded
Derby database (bundled with Spark), not just option plumbing: the
where/order/limit pushdown, fetchSize, partitioned parallel scans,
arbitrary-query sources, and batched writes all execute DB-side.

Derby normalizes unquoted identifiers to UPPERCASE while Spark's JDBC
writer creates case-preserving quoted columns — the tests use
uppercase column names like a native Derby user would.
"""

import tempfile

import pytest

from getl_spark.sources import jdbc_select_sql, read_jdbc, write_jdbc

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby(spark):
    db = tempfile.mkdtemp(prefix="getl_derby_") + "/db"
    url = f"jdbc:derby:{db};create=true"
    df = spark.createDataFrame(
        [(i, f"name{i}", i * 10) for i in range(1, 21)],
        "ID int, NAME string, SCORE int",
    )
    write_jdbc(df, url, "people", mode="overwrite", batch_size=500, driver=DRIVER)
    return url


def test_jdbc_select_sql_shapes():
    assert jdbc_select_sql("t") == "SELECT * FROM t"
    assert (
        jdbc_select_sql("t", ["a", "b"], "a > 1", ["b DESC"], 5)
        == "SELECT a, b FROM t WHERE a > 1 ORDER BY b DESC FETCH FIRST 5 ROWS ONLY"
    )


def test_jdbc_read_pushdown_where_order_limit(spark, derby):
    out = read_jdbc(
        spark, derby, table="people", fields=["ID", "NAME"],
        where="SCORE > 50", order=["ID DESC"], limit=5,
        fetch_size=100, driver=DRIVER,
    )
    assert [r.ID for r in out.collect()] == [20, 19, 18, 17, 16]
    assert out.columns == ["ID", "NAME"]  # projection pushed, not local


def test_jdbc_partitioned_parallel_scan(spark, derby):
    par = read_jdbc(
        spark, derby, table="people", partition_column="ID",
        lower_bound=1, upper_bound=21, num_partitions=4, driver=DRIVER,
    )
    assert par.rdd.getNumPartitions() == 4
    assert par.count() == 20


def test_jdbc_query_source_and_append(spark, derby):
    q = read_jdbc(
        spark, derby, query="SELECT COUNT(*) AS N FROM people", driver=DRIVER
    )
    n0 = q.collect()[0].N
    extra = spark.createDataFrame(
        [(100, "x", 1), (101, "y", 2)], "ID int, NAME string, SCORE int"
    )
    write_jdbc(extra, derby, "people", mode="append", driver=DRIVER)
    assert read_jdbc(spark, derby, table="people", driver=DRIVER).count() == n0 + 2


def test_jdbc_arg_validation(spark):
    with pytest.raises(ValueError, match="exactly one"):
        read_jdbc(spark, "jdbc:derby:x", table="t", query="SELECT 1")
    with pytest.raises(ValueError, match="exactly one"):
        read_jdbc(spark, "jdbc:derby:x")


def test_jdbc_limit_with_partitioning_rejected(spark):
    with pytest.raises(ValueError, match="partition_column"):
        read_jdbc(
            spark, "jdbc:derby:x", table="t", limit=10,
            partition_column="ID", lower_bound=0, upper_bound=100,
            num_partitions=4,
        )
