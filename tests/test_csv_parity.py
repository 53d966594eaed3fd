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


def test_getl_schema_file_ogg_style_cdc_load(spark, tmp_path):
    """LoadOGGTest parity: a getl .schema JSON (Field list) drives the
    CSV read — schema AND per-field formats — so a GoldenGate-style
    change export loads without hand-written DDL. The real reference
    descriptor (57 fields) must parse; the data rows are synthesized
    in its shape (pipe-delimited, <NULL> markers, quoted strings,
    yyyy-MM-dd:HH:mm:ss secondary datetime format)."""
    import json
    import os

    from getl_spark.schema import load_getl_schema

    ref = "/root/reference/src/test/resources/csv/ogg.dsv.schema"
    if os.path.exists(ref):
        sch, fmts = load_getl_schema(ref)
        names = sch.fieldNames()
        assert names[:5] == ["operation", "timestamp", "scn", "file_num", "file_row"]
        assert dict(zip(names, [f.dataType.simpleString() for f in sch.fields]))[
            "scn"
        ] == "bigint"
        assert fmts["timestamp"] == {"format": "yyyy-MM-dd HH:mm:ss.SSS", "lenient": True}

    # self-contained mini descriptor in the same format
    schema_file = str(tmp_path / "cdc.dsv.schema")
    with open(schema_file, "w") as fh:
        json.dump(
            {
                "fields": [
                    {"name": "OPERATION", "type": "STRING", "length": 1},
                    {"name": "TIMESTAMP", "type": "DATETIME",
                     "format": "yyyy-MM-dd HH:mm:ss.SSS"},
                    {"name": "SCN", "type": "BIGINT"},
                    {"name": "STRT", "type": "DATETIME",
                     "format": "yyyy-MM-dd:HH:mm:ss"},
                    {"name": "AMT", "type": "NUMERIC", "length": 12, "precision": 2},
                    {"name": "N_BLK", "type": "NUMERIC"},
                ]
            },
            fh,
        )
    data = str(tmp_path / "cdc.dsv")
    with open(data, "w") as fh:
        # micro-fraction timestamp exercises the lenient fallback
        fh.write('"I"|"2018-04-16 00:01:11.011125"|"13116676799789"|"2018-04-15:23:50:56"|"12.50"|0\n')
        fh.write('"U"|"2018-04-16 00:01:22.125"|"13116676799804"|"2018-04-16:00:00:23"|<NULL>|13884421\n')
    df = read_csv(
        spark, data, schema_file=schema_file, header=False,
        field_delimiter="|", null_as_value="<NULL>",
    )
    rows = sorted(df.collect(), key=lambda r: r.scn)
    assert [r.operation for r in rows] == ["I", "U"]
    assert rows[0].scn == 13116676799789
    assert str(rows[0].strt) == "2018-04-15 23:50:56"
    assert str(rows[0].timestamp) == "2018-04-16 00:01:11.011125"  # lenient fractions
    assert str(rows[1].timestamp) == "2018-04-16 00:01:22.125000"
    assert float(rows[0].amt) == 12.5 and rows[1].amt is None
    assert rows[1].n_blk == 13884421.0


def test_getl_schema_file_save_load_roundtrip(tmp_path):
    """saveSchema inverse: Spark schema + formats -> getl JSON -> back,
    identical schema and formats."""
    from getl_spark.schema import load_getl_schema, save_getl_schema

    sch = parse_ddl(
        "id bigint, name string not null, amt decimal(12,2), ok boolean, "
        "d date, ts timestamp, payload binary"
    )
    fmts = {"d": "dd/MM/yyyy", "ts": "yyyy-MM-dd HH:mm:ss.SSS", "ok": "Y|N"}
    p = str(tmp_path / "t.schema")
    save_getl_schema(sch, p, fmts)
    back, back_fmts = load_getl_schema(p)
    assert [f.dataType.simpleString() for f in back.fields] == [
        f.dataType.simpleString() for f in sch.fields
    ]
    assert back.fieldNames() == [n.lower() for n in sch.fieldNames()]
    assert back["name"].nullable is False and back["id"].nullable is True
    # datetime formats come back lenient (getl ParseDate semantics)
    assert back_fmts == {
        "d": "dd/MM/yyyy",
        "ts": {"format": "yyyy-MM-dd HH:mm:ss.SSS", "lenient": True},
        "ok": "Y|N",
    }


def test_getl_schema_numeric_format_grouped_parse(spark, tmp_path):
    """ADVICE r4: a getl .schema NUMERIC format like '#,##0.00' must
    actually drive the parse (strip grouping separators) instead of
    being recorded and ignored — ignored, '1,234.56' NULLed out and
    was miscounted as a corrupt row."""
    import json

    from getl_spark.schema import load_getl_schema
    from getl_spark.sources import read_csv, write_csv

    sp = tmp_path / "n.schema"
    sp.write_text(json.dumps({"fields": [
        {"name": "id", "type": "INTEGER"},
        {"name": "amt", "type": "NUMERIC", "length": 12, "precision": 2,
         "format": "#,##0.00"},
    ]}))
    sch, fmts = load_getl_schema(str(sp))
    assert fmts["amt"]["grouping_separator"] == ","
    csv = tmp_path / "n.csv"
    csv.write_text('id,amt\n1,"1,234.56"\n2,"12.00"\n')
    df = read_csv(spark, str(csv), schema=sch, field_formats=fmts)
    got = {r["id"]: str(r["amt"]) for r in df.collect()}
    assert got == {1: "1234.56", 2: "12.00"}
    # write side round-trips the grouped shape
    out = tmp_path / "out"
    write_csv(df, str(out), field_formats=fmts)
    body = "".join(
        p.read_text() for p in out.glob("*.csv")
    )
    assert "1,234.56" in body


def test_getl_schema_numeric_format_unsupported_raises(tmp_path):
    """An exotic DecimalFormat pattern (currency/percent) raises at
    load time instead of silently corrupting every cell."""
    import json

    import pytest

    from getl_spark.schema import load_getl_schema

    sp = tmp_path / "bad.schema"
    sp.write_text(json.dumps({"fields": [
        {"name": "amt", "type": "NUMERIC", "length": 10, "precision": 2,
         "format": "¤#,##0.00"},
    ]}))
    with pytest.raises(ValueError, match="unsupported NUMERIC format"):
        load_getl_schema(str(sp))
