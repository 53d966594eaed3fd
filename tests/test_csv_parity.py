"""CSVDriverTest parity scenarios (reference
src/test/groovy/getl/csv/CSVDriverTest.groovy): escaped cells with
embedded quotes/newlines (:243-273), nullAsValue round-trip (:432-470),
custom row delimiter (:300-327)."""

import glob

from pyspark.sql import functions as F

from getl_spark.schema import parse_ddl
from getl_spark.sources import read_csv, write_csv


def test_escaped_cells_with_quotes_and_newline_roundtrip(spark, tmp_path):
    """testEscapeCsv: a TEXT cell holding quotes, an apostrophe, a
    comma and a newline survives write->read byte-identically."""
    nasty = '123"456\'789,\nabc'
    df = spark.createDataFrame(
        [(1, '123"456\'789"', None, nasty)],
        "id int, name string, value int, text string",
    )
    out = str(tmp_path / "esc")
    write_csv(df, out, escaped=True, null_as_value="<NULL>")
    back = read_csv(
        spark, out,
        schema=parse_ddl("id int, name string, value int, text string"),
        escaped=True, null_as_value="<NULL>", multi_line=True,
    )
    r = back.collect()[0]
    assert r.id == 1
    assert r.name == '123"456\'789"'
    assert r.value is None
    assert r.text == nasty


def test_null_as_value_roundtrip(spark, tmp_path):
    """testNullValue: typed columns with missing values write the
    marker and read back as NULLs; present values survive, including a
    string cell that IS quoted quotes."""
    df = spark.createDataFrame(
        [
            (1, "one", 1, '"string"', "2019-12-31", 123.45, True),
            (2, "two", None, None, None, None, None),
        ],
        "id int, name string, v1 int, v2 string, v3 string, v4 double, v5 boolean",
    ).select(
        "id", "name", "v1", "v2",
        F.to_date("v3").alias("v3"),
        F.col("v4").cast("decimal(12,2)").alias("v4"),
        "v5",
    )
    out = str(tmp_path / "nulls")
    write_csv(df, out, null_as_value="<NULL>")
    raw = ""
    for f in glob.glob(out + "/*.csv"):
        raw += open(f).read()
    assert "<NULL>" in raw
    back = read_csv(
        spark, out,
        schema=parse_ddl(
            "id int, name string, v1 int, v2 string, v3 date, v4 decimal(12,2), v5 boolean"
        ),
        null_as_value="<NULL>",
    )
    rows = {r.id: r for r in back.collect()}
    assert rows[1].v2 == '"string"' and str(rows[1].v3) == "2019-12-31"
    assert float(rows[1].v4) == 123.45 and rows[1].v5 is True
    assert rows[2].v1 is None and rows[2].v2 is None and rows[2].v3 is None
    assert rows[2].v4 is None and rows[2].v5 is None


def test_row_delimiter_crlf_roundtrip(spark, tmp_path):
    """testRowDelimiter: write with '\\r\\n' line endings, verify the
    bytes, read back both with explicit lineSep and via the reader's
    auto-detection."""
    df = spark.createDataFrame(
        [(1, "name 1"), (2, "name 2"), (3, "name 3")], "id int, name string"
    ).coalesce(1)
    out = str(tmp_path / "crlf")
    write_csv(df, out, header=False, row_delimiter="\r\n")
    raw = b""
    for f in sorted(glob.glob(out + "/*.csv")):
        raw += open(f, "rb").read()
    assert raw.count(b"\r\n") == 3 and b"1,name 1\r\n" in raw
    sch = parse_ddl("id int, name string")
    auto = read_csv(spark, out, schema=sch, header=False)
    assert sorted(r.id for r in auto.collect()) == [1, 2, 3]
    assert {r.name for r in auto.collect()} == {"name 1", "name 2", "name 3"}
