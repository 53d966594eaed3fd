"""File sources/sinks with getl-style options.

Reference parity:
- CSV reader options (quote/fieldDelimiter/rowDelimiter/header/
  escaped/nullAsValue, per-field formats, gzip),
  /root/reference/src/main/groovy/getl/csv/CSVDriver.groovy:68-72,
  100-345 -> spark.read.csv options (PERMISSIVE mode + corrupt-record
  column replaces getl's error rows);
- CSV split-file output (isSplit/splitSize),
  CSVDriver.groovy write section -> maxRecordsPerFile / repartition;
- JSON rootNode + per-field alias extraction,
  /root/reference/src/main/groovy/getl/json/JSONDriver.groovy:92-203
  -> multiLine read + explode along the root path + getField aliases;
- file-mask listing with typed mask variables,
  /root/reference/src/main/groovy/getl/utils/Path.groovy:200-230 and
  files/Manager.buildList :763-948 -> glob read + input_file_name()
  + regexp_extract columns (distributed listing instead of the
  reference's threaded walker + embedded H2 buffer).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

CORRUPT_COL = "_corrupt_record"


def _formatted_parse_expr(raw, field, spec):
    """JVM-side per-field cell parser (getl's SuperCSV CellProcessor
    chain, csv/CSVDriver.groovy:189-331, as Catalyst expressions).

    ``spec`` is a format string (date/timestamp pattern, or
    ``'true_tok|false_tok'`` for booleans) or a dict with optional
    ``format`` / ``decimal_separator`` keys. All conversions use
    try_* forms so a malformed cell yields NULL (then surfaces through
    the corrupt-row accounting) instead of an ANSI-mode throw."""
    if isinstance(spec, str):
        spec = {"format": spec}
    fmt = spec.get("format")
    dec_sep = spec.get("decimal_separator")
    t = field.dataType.typeName()
    if t == "date":
        # no try_to_date builtin: parse as timestamp (try form), then the
        # timestamp->date cast is parse-free and safe under ANSI
        return F.try_to_timestamp(raw, F.lit(fmt or "yyyy-MM-dd")).cast("date")
    if t == "timestamp":
        strict = F.try_to_timestamp(raw, F.lit(fmt or "yyyy-MM-dd HH:mm:ss"))
        if spec.get("lenient"):
            # getl's ParseDate is lenient about fractional-second width
            # (an OGG export declares .SSS but carries 6 digits) — with
            # lenient=True a declared-pattern miss falls back to
            # Spark's native literal parser. OPT-IN only: by default a
            # cell violating its declared format stays NULL and lands
            # in the corrupt-row accounting like every other field.
            return F.coalesce(strict, raw.try_cast("timestamp"))
        return strict
    if t == "boolean":
        tok_t, tok_f = (fmt or "1|0").split("|", 1)
        return (
            F.when(F.lower(raw) == tok_t.lower(), F.lit(True))
            .when(F.lower(raw) == tok_f.lower(), F.lit(False))
            .otherwise(F.lit(None).cast("boolean"))
        )
    if t in ("decimal", "double", "float", "integer", "long", "short", "byte"):
        v = raw
        grp_sep = spec.get("grouping_separator")
        if grp_sep is None and dec_sep and dec_sep != ".":
            # '1.234,56' style: the grouping char is implicitly '.'
            grp_sep = "."
        if grp_sep:
            v = F.translate(v, grp_sep, "")
        if dec_sep and dec_sep != ".":
            v = F.regexp_replace(v, re.escape(dec_sep), ".")
        return v.try_cast(field.dataType)
    if t == "string":
        # getl TIME fields map to string (documented decision) — the
        # declared format describes the lexical shape, nothing to parse
        return raw
    raise ValueError(
        f"field_formats: unsupported target type {field.dataType.simpleString()} "
        f"for field '{field.name}'"
    )


def _formatted_write_expr(col, field, spec):
    """Write-side formatter (getl FmtDate/FmtNumber/FmtBool)."""
    if isinstance(spec, str):
        spec = {"format": spec}
    fmt = spec.get("format")
    dec_sep = spec.get("decimal_separator")
    t = field.dataType.typeName()
    if t in ("date", "timestamp"):
        return F.date_format(col, fmt or ("yyyy-MM-dd" if t == "date" else "yyyy-MM-dd HH:mm:ss"))
    if t == "boolean":
        tok_t, tok_f = (fmt or "1|0").split("|", 1)
        return F.when(col, F.lit(tok_t)).when(~col, F.lit(tok_f))
    if t in ("decimal", "double", "float", "integer", "long", "short", "byte"):
        grp_sep = spec.get("grouping_separator")
        if grp_sep:
            # DecimalFormat-style grouped output: format_number emits
            # ',' grouping + '.' decimal with the fraction width fixed
            # to the pattern's post-decimal digit count; one translate
            # maps both separator chars simultaneously (',' and '.'
            # can swap roles without clobbering each other). With no
            # decimal part in the pattern, frac comes from the column
            # itself — a decimal's declared scale, 0 for integrals —
            # so format_number never silently rounds fractional digits
            # away; fractional floats without a pattern keep full
            # precision via the ungrouped path below.
            if fmt and "." in fmt:
                frac = len(fmt.split(".", 1)[1])
            elif t == "decimal":
                frac = field.dataType.scale
            elif t in ("integer", "long", "short", "byte"):
                frac = 0
            else:
                raise ValueError(
                    "field_formats: grouping_separator on a "
                    f"{field.dataType.simpleString()} field '{field.name}' "
                    "needs an explicit pattern with a decimal part "
                    "(e.g. '#,##0.00') — the fraction width is otherwise "
                    "unbounded and grouped output would have to round"
                )
            s = F.translate(
                F.format_number(col, frac), ",.", grp_sep + (dec_sep or ".")
            )
        else:
            s = col.cast("string")
            if dec_sep and dec_sep != ".":
                s = F.regexp_replace(s, r"\.", re.escape(dec_sep))
        return s
    raise ValueError(
        f"field_formats: unsupported source type {field.dataType.simpleString()} "
        f"for field '{field.name}'"
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    header: bool = True,
    field_delimiter: str = ",",
    quote_str: str = '"',
    escaped: bool = False,
    null_as_value: str | None = None,
    date_format: str | None = None,
    timestamp_format: str | None = None,
    keep_corrupt_rows: bool = False,
    validate_rows: bool = True,
    field_formats: dict | None = None,
    row_delimiter: str | None = None,
    multi_line: bool = False,
    schema_file: str | None = None,
) -> DataFrame:
    """getl CSVDataset.eachRow. PERMISSIVE mode: malformed rows land in
    ``_corrupt_record`` (the errors-dataset pattern) instead of failing
    the read. ``validate_rows=False`` skips malformed-row detection for
    a cache-free streaming scan (bulk-ingest fast path)."""
    # Corrupt-row handling must stay PERMISSIVE + corrupt-record column
    # in BOTH paths: DROPMALFORMED looks attractive (no cache) but its
    # count() pushdown skips parsing and counts raw lines — wrong row
    # accounting, unacceptable for a CDC engine (measured on Spark 4).
    # Spark refuses plans whose scan references ONLY the corrupt column
    # (QUERY_ONLY_CORRUPT_RECORD_COLUMN), and neither the columnPruning
    # option nor spark.sql.csv.parser.columnPruning.enabled lifts that
    # in Spark 4, so filtering on corruptness requires the documented
    # cache barrier. Scale note: for bulk ingest where malformed rows
    # are impossible/ignorable, pass validate_rows=False to get a
    # cache-free streaming scan (null-padded short rows kept, parse
    # failures null out the affected fields).
    r = (
        spark.read.option("header", header)
        .option("sep", field_delimiter)
        .option("quote", quote_str)
        .option("escape", "\\" if escaped else quote_str)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    if null_as_value is not None:
        r = r.option("nullValue", null_as_value)
    if date_format:
        r = r.option("dateFormat", date_format)
    if timestamp_format:
        r = r.option("timestampFormat", timestamp_format)
    if row_delimiter is not None:
        # getl rowDelimiter; Spark reads only accept 1-char lineSep, but
        # '\r\n' files parse fine with the default auto-detection
        r = r.option("lineSep", row_delimiter)
    if multi_line:
        # quoted cells containing row delimiters (getl escaped TEXT
        # round-trip) need the whole-file parser
        r = r.option("multiLine", True)
    if schema_file is not None:
        # getl autoSchema/schemaFileName: the JSON Field-list file
        # supplies both the schema and the per-field cell formats;
        # explicit arguments override. With an explicit schema the
        # file's formats are restricted to ITS fields, so projecting a
        # subset of a wide descriptor works.
        from getl_spark.schema import load_getl_schema

        file_schema, file_formats = load_getl_schema(schema_file)
        if schema is None:
            schema = file_schema
        else:
            present = set(schema.fieldNames())
            file_formats = {k: v for k, v in file_formats.items() if k in present}
        file_formats.update(field_formats or {})
        field_formats = file_formats
    fmt_fields = dict(field_formats or {})
    if fmt_fields and schema is None:
        raise ValueError("field_formats requires an explicit schema")
    if schema is not None:
        scan_schema = schema
        if fmt_fields:
            unknown = sorted(set(fmt_fields) - set(schema.fieldNames()))
            if unknown:
                raise ValueError(f"field_formats names unknown fields: {unknown}")
            # mixed-format cells can't push into the scan (Spark's CSV
            # options are global) — scan them as STRING, then convert
            # with per-field Catalyst exprs (all JVM-side, codegen'd)
            from pyspark.sql.types import StringType, StructField

            scan_schema = StructType(
                [
                    StructField(f.name, StringType(), True) if f.name in fmt_fields else f
                    for f in schema.fields
                ]
            )

        def convert(df, corrupt_aware: bool):
            parsed = {
                name: _formatted_parse_expr(F.col(name), schema[name], spec)
                for name, spec in fmt_fields.items()
            }
            if corrupt_aware:
                # a cell that fails its per-field parse (raw non-null,
                # parsed null) marks the row corrupt, same accounting
                # as a scan-level malformed row. The recorded payload
                # is a JSON map of the FORMATTED fields' cells — those
                # were scanned as STRING, so the values are the actual
                # source bytes (other columns were already type-coerced
                # by the scan; re-serializing them would fabricate a
                # line that never existed in the file)
                fail = None
                for name in fmt_fields:
                    c = F.col(name).isNotNull() & parsed[name].isNull()
                    fail = c if fail is None else (fail | c)
                raw_cells = F.to_json(F.struct(*[F.col(n) for n in fmt_fields]))
                df = df.withColumn(
                    CORRUPT_COL, F.coalesce(F.col(CORRUPT_COL), F.when(fail, raw_cells))
                )
            out = [parsed[f.name].alias(f.name) if f.name in parsed else F.col(f.name) for f in schema.fields]
            if corrupt_aware:
                out.append(F.col(CORRUPT_COL))
            return df.select(*out)

        if not validate_rows:
            df = r.schema(scan_schema).csv(path)  # cache-free bulk path
            return convert(df, corrupt_aware=False) if fmt_fields else df
        # the corrupt-record column must be IN the schema for
        # PERMISSIVE mode to populate it; add it internally
        aug = scan_schema
        if CORRUPT_COL not in scan_schema.fieldNames():
            aug = StructType(list(scan_schema.fields)).add(CORRUPT_COL, "string")
        df = r.schema(aug).csv(path).cache()
        if fmt_fields:
            df = convert(df, corrupt_aware=True)
        if not keep_corrupt_rows:
            df = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
        return df
    return r.option("inferSchema", True).csv(path)


def write_csv(
    df: DataFrame,
    path: str,
    header: bool = True,
    field_delimiter: str = ",",
    is_gz_file: bool = False,
    split_size: int | None = None,
    mode: str = "overwrite",
    field_formats: dict | None = None,
    null_as_value: str | None = None,
    row_delimiter: str | None = None,
    quote_str: str = '"',
    escaped: bool = False,
) -> None:
    """getl CSV write incl. isSplit/splitSize portions (split ->
    maxRecordsPerFile), isGzFile (-> gzip codec), and per-field output
    formats (FmtDate/FmtNumber/FmtBool cell processors,
    csv/CSVDriver.groovy:189-331 -> date_format/when exprs)."""
    if field_formats:
        sch = {f.name: f for f in df.schema.fields}
        unknown = sorted(set(field_formats) - set(sch))
        if unknown:
            raise ValueError(f"field_formats names unknown fields: {unknown}")
        df = df.select(
            *[
                _formatted_write_expr(F.col(c), sch[c], field_formats[c]).alias(c)
                if c in field_formats
                else F.col(c)
                for c in df.columns
            ]
        )
    w = (
        df.write.option("header", header)
        .option("sep", field_delimiter)
        .option("quote", quote_str)
        .option("escape", "\\" if escaped else quote_str)
        .mode(mode)
    )
    if null_as_value is not None:
        # getl nullAsValue write side: NULL cells serialize as a marker
        # the matching read option turns back into NULL
        w = w.option("nullValue", null_as_value)
    if row_delimiter is not None:
        w = w.option("lineSep", row_delimiter)
    if is_gz_file:
        w = w.option("compression", "gzip")
    if split_size:
        w = w.option("maxRecordsPerFile", split_size)
    w.csv(path)


def read_json(
    spark: SparkSession,
    path: str,
    root_node: str | None = None,
    aliases: dict[str, str] | None = None,
    multi_line: bool = True,
    schema: StructType | None = None,
) -> DataFrame:
    """getl JSONDataset: ``rootNode`` path (dot-separated; arrays along
    the way are exploded) then per-field ``alias`` extraction exprs."""
    r = spark.read.option("multiLine", multi_line)
    df = r.schema(schema).json(path) if schema is not None else r.json(path)
    if root_node and root_node != ".":
        cur = df
        for part in root_node.split("."):
            field_type = dict(zip(cur.schema.fieldNames(), cur.schema.fields))[part].dataType
            col = F.explode(part) if field_type.typeName() == "array" else F.col(part)
            cur = cur.select(col.alias("_node"))
            cur = cur.select("_node.*")
        df = cur
    if aliases:
        df = df.select(*[F.expr(e).alias(name) for name, e in aliases.items()])
    return df


def read_xml(
    spark: SparkSession,
    path: str,
    row_tag: str,
    schema: StructType,
) -> DataFrame:
    """getl XMLDriver (/root/reference/src/main/groovy/getl/xml/XMLDriver.groovy):
    rootNode-style extraction of repeated ``row_tag`` elements.

    No spark-xml jar in this image, so files are read whole
    (``wholetext``) and parsed per-partition with the stdlib
    ElementTree inside mapInPandas — Arrow-batched, one parse per
    file, never per-row Python/JVM hops. Fields are matched by child
    tag name or attribute name against ``schema``.
    """
    from typing import Iterator

    import pandas as pd

    names = schema.fieldNames()

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import xml.etree.ElementTree as ET

        for pdf in batches:
            rows = []
            for content in pdf["value"]:
                root = ET.fromstring(content)
                for el in root.iter(row_tag):
                    row = {}
                    for n in names:
                        child = el.find(n)
                        if child is not None:
                            row[n] = child.text
                        elif n in el.attrib:
                            row[n] = el.attrib[n]
                        else:
                            row[n] = None
                    rows.append(row)
            yield pd.DataFrame(rows, columns=names)

    raw = spark.read.format("text").option("wholetext", True).load(path)
    str_schema = StructType.fromJson(
        {
            "type": "struct",
            "fields": [
                {"name": n, "type": "string", "nullable": True, "metadata": {}}
                for n in names
            ],
        }
    )
    parsed = raw.mapInPandas(parse, str_schema)
    return parsed.select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields]
    )


_XLSX_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_XLSX_RNS = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
_XLSX_RELNS = "{http://schemas.openxmlformats.org/package/2006/relationships}"


def _xlsx_rows(content: bytes, sheet) -> list[list]:
    """Parse one .xlsx (ZIP + SpreadsheetML) with the stdlib only;
    returns rows as lists of strings (numbers/bools in their lexical
    form). Handles shared strings, inline strings, booleans, and
    sheet selection by 1-based index or name via workbook rels."""
    import io
    import xml.etree.ElementTree as ET
    import zipfile

    z = zipfile.ZipFile(io.BytesIO(content))
    shared: list[str] = []
    if "xl/sharedStrings.xml" in z.namelist():
        sst = ET.fromstring(z.read("xl/sharedStrings.xml"))
        for si in sst.findall(f"{_XLSX_NS}si"):
            shared.append("".join(t.text or "" for t in si.iter(f"{_XLSX_NS}t")))
    wb = ET.fromstring(z.read("xl/workbook.xml"))
    rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
    rel_map = {
        r.get("Id"): r.get("Target") for r in rels.findall(f"{_XLSX_RELNS}Relationship")
    }
    sheets = wb.find(f"{_XLSX_NS}sheets").findall(f"{_XLSX_NS}sheet")
    if isinstance(sheet, int):
        chosen = sheets[sheet - 1]
    else:
        try:
            chosen = next(s for s in sheets if s.get("name") == sheet)
        except StopIteration:
            raise ValueError(
                f"sheet {sheet!r} not found; have {[s.get('name') for s in sheets]}"
            ) from None
    target = rel_map[chosen.get(f"{_XLSX_RNS}id")]
    if not target.startswith("xl/"):
        target = "xl/" + target.lstrip("/")
    sh = ET.fromstring(z.read(target))
    rows: list[list] = []
    for row_el in sh.iter(f"{_XLSX_NS}row"):
        cells: dict[int, str | None] = {}
        for c in row_el.findall(f"{_XLSX_NS}c"):
            ref = c.get("r") or ""
            letters = "".join(ch for ch in ref if ch.isalpha())
            idx = 0
            for ch in letters:
                idx = idx * 26 + (ord(ch.upper()) - 64)
            idx = max(idx - 1, len(cells))
            t = c.get("t", "n")
            if t == "inlineStr":
                is_el = c.find(f"{_XLSX_NS}is")
                v = (
                    "".join(tt.text or "" for tt in is_el.iter(f"{_XLSX_NS}t"))
                    if is_el is not None
                    else None
                )
            else:
                v_el = c.find(f"{_XLSX_NS}v")
                v = v_el.text if v_el is not None else None
                if v is not None and t == "s":
                    v = shared[int(v)]
                elif v is not None and t == "b":
                    v = "true" if v in ("1", "true") else "false"
            cells[idx] = v
        if cells:
            width = max(cells) + 1
            rows.append([cells.get(i) for i in range(width)])
    return rows


def read_excel(
    spark: SparkSession,
    path: str,
    sheet: int | str = 1,
    header: bool = True,
    skip_rows: int = 0,
    schema: StructType | None = None,
) -> DataFrame:
    """getl ExcelDriver (/root/reference/excel/ExcelDriver.groovy:52-220:
    listName / header / offset options).

    No POI/openpyxl in this image — but .xlsx is ZIP + XML, so files
    are scanned with Spark's ``binaryFile`` source and parsed
    per-partition with stdlib zipfile+ElementTree inside mapInPandas
    (the XML-source pattern at read_xml above): Arrow-batched, one
    parse per file, distributed across executors. All cells surface as
    strings; pass ``schema`` to name and cast columns positionally
    (A, B, C...). Without a schema, the first file's header row is
    read once for column names (a one-file schema-inference job, the
    CSV inferSchema analog).
    """
    from typing import Iterator

    import pandas as pd

    raw = spark.read.format("binaryFile").load(path)
    if schema is not None:
        names = schema.fieldNames()
    else:
        first = raw.select("content").limit(1).collect()
        if not first:
            raise ValueError(f"no files match {path}")
        head_rows = _xlsx_rows(bytes(first[0][0]), sheet)[skip_rows:]
        if not head_rows:
            raise ValueError("cannot infer columns from an empty sheet")
        if header:
            names = [str(v) if v is not None else f"c{i}" for i, v in enumerate(head_rows[0])]
        else:
            names = [f"c{i}" for i in range(len(head_rows[0]))]

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for content in pdf["content"]:
                rows = _xlsx_rows(bytes(content), sheet)[skip_rows:]
                if header:
                    rows = rows[1:]
                data = [
                    [(None if v is None else str(v)) for v in (r + [None] * len(names))[: len(names)]]
                    for r in rows
                ]
                yield pd.DataFrame(data, columns=names, dtype=object)

    str_schema = StructType.fromJson(
        {
            "type": "struct",
            "fields": [
                {"name": n, "type": "string", "nullable": True, "metadata": {}}
                for n in names
            ],
        }
    )
    parsed = raw.select("content").mapInPandas(parse, str_schema)
    if schema is not None:
        return parsed.select(
            *[F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields]
        )
    return parsed


_MASK_VAR = re.compile(r"\{(\w+)\}")


def jdbc_select_sql(
    table: str,
    fields: list[str] | None = None,
    where: str | None = None,
    order: list[str] | None = None,
    limit: int | None = None,
) -> str:
    """The getl-style SELECT a JDBC scan pushes to the database
    (reference: sqlForDataset,
    /root/reference/src/main/groovy/getl/jdbc/JDBCDriver.groovy:1249-1296):
    projection + WHERE + ORDER BY run database-side, not in Spark.
    LIMIT uses ANSI ``FETCH FIRST n ROWS ONLY`` (SQL:2008 — Derby,
    Postgres, Oracle 12c+; override per-dialect via ``query=`` if a
    database lacks it)."""
    sel = ", ".join(fields) if fields else "*"
    sql = f"SELECT {sel} FROM {table}"
    if where:
        sql += f" WHERE {where}"
    if order:
        sql += " ORDER BY " + ", ".join(order)
    if limit is not None:
        sql += f" FETCH FIRST {int(limit)} ROWS ONLY"
    return sql


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str | None = None,
    query: str | None = None,
    fields: list[str] | None = None,
    where: str | None = None,
    order: list[str] | None = None,
    limit: int | None = None,
    fetch_size: int | None = None,
    driver: str | None = None,
    user: str | None = None,
    password: str | None = None,
    partition_column: str | None = None,
    lower_bound=None,
    upper_bound=None,
    num_partitions: int | None = None,
    options: dict | None = None,
) -> DataFrame:
    """JDBC table scan with getl's read options (ReadSpec.where/order,
    /root/reference/src/main/groovy/getl/jdbc/opts/ReadSpec.groovy:73;
    QueryDataset for arbitrary SQL). Projection/WHERE/ORDER/LIMIT are
    folded into the pushed query so the database does the filtering;
    ``partition_column`` + bounds + ``num_partitions`` give the
    parallel range-partitioned scan (one connection per Spark
    partition — the scale path for big tables), and ``fetch_size``
    maps to the driver's row-batch size (getl fetchSize)."""
    if (table is None) == (query is None):
        raise ValueError("exactly one of table= or query= is required")
    if limit is not None and partition_column is not None:
        # each Spark partition re-executes the inner query with its own
        # range predicate appended; without a total order the database
        # may pick a DIFFERENT limit-set per execution, so the union is
        # not any consistent result — refuse instead of corrupting
        raise ValueError(
            "limit= cannot be combined with partition_column=: the "
            "FETCH FIRST subquery re-executes per partition and is not "
            "stable across executions — drop the limit or read unpartitioned"
        )
    pushed = query or jdbc_select_sql(table, fields, where, order, limit)
    needs_subquery = query is not None or any(
        v is not None for v in (fields, where, order, limit)
    )
    dbtable = f"({pushed}) getl_q" if needs_subquery else table
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", dbtable)
    for k, v in {
        "driver": driver,
        "user": user,
        "password": password,
        "fetchsize": fetch_size,
        "partitionColumn": partition_column,
        "lowerBound": lower_bound,
        "upperBound": upper_bound,
        "numPartitions": num_partitions,
    }.items():
        if v is not None:
            reader = reader.option(k, v)
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    return reader.load()


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batch_size: int | None = None,
    isolation_level: str | None = None,
    truncate: bool = False,
    driver: str | None = None,
    user: str | None = None,
    password: str | None = None,
    options: dict | None = None,
) -> None:
    """JDBC bulk write (getl openWrite/bulkLoad,
    /root/reference/src/main/groovy/getl/jdbc/JDBCDriver.groovy:1795-2006):
    Spark's JDBC sink batches inserts per partition — ``batch_size``
    maps to getl's batchSize (JDBC addBatch chunking),
    ``isolation_level`` to the write transaction level, and
    ``truncate=True`` keeps the table's DDL on overwrite."""
    writer = df.write.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in {
        "driver": driver,
        "user": user,
        "password": password,
        "batchsize": batch_size,
        "isolationLevel": isolation_level,
        "truncate": str(truncate).lower() if truncate else None,
    }.items():
        if v is not None:
            writer = writer.option(k, v)
    for k, v in (options or {}).items():
        writer = writer.option(k, v)
    writer.mode(mode).save()


def _format_to_regex(fmt: str) -> str:
    """Date/number format pattern -> digit-shaped regex (getl generates
    a per-variable pattern from the declared format,
    utils/Path.groovy:236-280). Java-pattern quoted literals are
    honored: ``yyyy-MM-dd'T'HH:mm`` matches a literal T, and ``''``
    inside quotes is one quote character."""
    out, i, n = [], 0, len(fmt)
    while i < n:
        ch = fmt[i]
        if ch == "'":
            j = i + 1
            lit = []
            while j < n:
                if fmt[j] == "'":
                    if j + 1 < n and fmt[j + 1] == "'":
                        lit.append("'")
                        j += 2
                        continue
                    break
                lit.append(fmt[j])
                j += 1
            out.append(re.escape("".join(lit) or "'"))  # '' alone == literal quote
            i = j + 1
        elif ch in "yMdHmsS":
            out.append(r"\d")
            i += 1
        else:
            out.append(re.escape(ch))
            i += 1
    return "".join(out)


_VAR_TYPE_DEFAULT_FMT = {"date": "yyyy-MM-dd", "datetime": "yyyy-MM-dd HH:mm:ss"}


def mask_to_regex(mask: str, var_types: dict | None = None) -> tuple[str, list[str]]:
    """Compile a getl file mask (``{region}/{date}/file_{num}.csv``)
    into a regex with one group per variable (Path.compile,
    /root/reference/src/main/groovy/getl/utils/Path.groovy:200-230).

    ``var_types`` optionally types variables the way getl's
    ``Path.variable`` does: ``{"num": "int", "date": ("date",
    "yyyyMMdd")}`` — typed variables match a constrained pattern
    (digits for ints, the format's shape for dates), so paths that
    can't carry the declared type never match at all."""
    names = _MASK_VAR.findall(mask)
    pattern = re.escape(mask)
    for n in names:
        spec = (var_types or {}).get(n)
        if spec:
            t, fmt = spec if isinstance(spec, tuple) else (spec, None)
            if t in ("date", "datetime", "time"):
                grp = _format_to_regex(fmt or _VAR_TYPE_DEFAULT_FMT.get(t, "HH:mm:ss"))
            elif t in ("int", "integer", "bigint", "long"):
                grp = r"\d+"
            else:
                grp = r"[^/]+"
            group = f"({grp})"
        else:
            group = r"([^/]+)"
        pattern = pattern.replace(re.escape("{%s}" % n), group, 1)
    pattern = pattern.replace(re.escape("*"), r"[^/]*")
    return pattern, names


def apply_mask_var_types(df: DataFrame, names: list[str], var_types: dict | None) -> DataFrame:
    """Cast extracted mask-variable columns to their declared types and
    DROP rows whose values don't parse (getl buildList excludes paths
    whose variables fail their type/format — Manager.groovy:763-948):
    a regex-shaped-but-invalid value like month 13 is not a match."""
    for n in names:
        spec = (var_types or {}).get(n)
        if not spec:
            continue
        t, fmt = spec if isinstance(spec, tuple) else (spec, None)
        if t == "date":
            c = F.try_to_timestamp(
                F.col(n), F.lit(fmt or _VAR_TYPE_DEFAULT_FMT["date"])
            ).cast("date")
        elif t == "datetime":
            c = F.try_to_timestamp(F.col(n), F.lit(fmt or _VAR_TYPE_DEFAULT_FMT["datetime"]))
        elif t in ("int", "integer", "bigint", "long"):
            c = F.col(n).try_cast("bigint" if t in ("bigint", "long") else "int")
        elif t == "time":
            # TIME maps to string (documented decision) but still
            # VALIDATES: a shape-matching-but-invalid value (99:99:99)
            # must exclude the path, same as dates
            valid = F.try_to_timestamp(F.col(n), F.lit(fmt or "HH:mm:ss"))
            c = F.when(valid.isNotNull(), F.col(n))
        else:
            continue
        df = df.withColumn(n, c).filter(F.col(n).isNotNull())
    return df


def read_with_mask_vars(
    spark: SparkSession,
    base_dir: str,
    mask: str,
    format: str = "csv",
    var_types: dict | None = None,
    **reader_kwargs,
) -> DataFrame:
    """Read files matching a mask, adding each mask variable as a typed
    column extracted from the file path (the buildList mask-variable
    table, files/Manager.groovy:763-948) plus ``_file`` provenance.
    ``var_types`` types the variables (``{"num": "int", "date":
    ("date", "yyyyMMdd")}``): typed columns come back as their Spark
    type and files whose path values don't parse are EXCLUDED, getl's
    buildList filtering."""
    pattern, names = mask_to_regex(mask, var_types)
    glob = _MASK_VAR.sub("*", mask)
    reader = getattr(spark.read, format)
    df = reader(f"{base_dir}/{glob}", **reader_kwargs)
    df = df.withColumn("_file", F.input_file_name())
    full_pattern = f".*/{pattern}$"
    if var_types:
        # the typed regex itself filters: a path whose var doesn't even
        # SHAPE-match extracts as '' and is dropped below
        df = df.filter(F.col("_file").rlike(full_pattern))
    for i, n in enumerate(names, start=1):
        df = df.withColumn(n, F.regexp_extract(F.col("_file"), full_pattern, i))
    return apply_mask_var_types(df, names, var_types)


def already_ingested_filter(
    df: DataFrame, story: DataFrame, on: list[str]
) -> DataFrame:
    """Story-table exactly-once: drop rows whose key already appears in
    the ingest log (left_anti; files/Manager.groovy:936-948)."""
    return df.join(story.select(*on).distinct(), on, "left_anti")
