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
) -> DataFrame:
    """getl CSVDataset.eachRow. PERMISSIVE mode: malformed rows land in
    ``_corrupt_record`` (the errors-dataset pattern) instead of failing
    the read."""
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
    if schema is not None:
        # the corrupt-record column must be IN the schema for PERMISSIVE
        # mode to populate it; add it internally, strip it on request
        aug = schema
        if CORRUPT_COL not in schema.fieldNames():
            aug = StructType(list(schema.fields)).add(CORRUPT_COL, "string")
        df = r.schema(aug).csv(path)
    else:
        df = r.option("inferSchema", True).csv(path)
    if CORRUPT_COL in df.columns:
        # Spark refuses plans referencing ONLY the corrupt column over a
        # raw CSV scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN); the documented
        # pattern is to cache the parsed frame before filtering on it.
        df = df.cache()
        if not keep_corrupt_rows:
            df = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    return df


def write_csv(
    df: DataFrame,
    path: str,
    header: bool = True,
    field_delimiter: str = ",",
    is_gz_file: bool = False,
    split_size: int | None = None,
    mode: str = "overwrite",
) -> None:
    """getl CSV write incl. isSplit/splitSize portions (split ->
    maxRecordsPerFile) and isGzFile (-> gzip codec)."""
    w = df.write.option("header", header).option("sep", field_delimiter).mode(mode)
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


_MASK_VAR = re.compile(r"\{(\w+)\}")


def mask_to_regex(mask: str) -> tuple[str, list[str]]:
    """Compile a getl file mask (``{region}/{date}/file_{num}.csv``)
    into a regex with one group per variable (Path.compile,
    /root/reference/src/main/groovy/getl/utils/Path.groovy:200-230)."""
    names = _MASK_VAR.findall(mask)
    pattern = re.escape(mask)
    for n in names:
        pattern = pattern.replace(re.escape("{%s}" % n), r"([^/]+)")
    pattern = pattern.replace(re.escape("*"), r"[^/]*")
    return pattern, names


def read_with_mask_vars(
    spark: SparkSession,
    base_dir: str,
    mask: str,
    format: str = "csv",
    **reader_kwargs,
) -> DataFrame:
    """Read files matching a mask, adding each mask variable as a typed
    column extracted from the file path (the buildList mask-variable
    table, files/Manager.groovy:763-948) plus ``_file`` provenance."""
    pattern, names = mask_to_regex(mask)
    glob = _MASK_VAR.sub("*", mask)
    reader = getattr(spark.read, format)
    df = reader(f"{base_dir}/{glob}", **reader_kwargs)
    df = df.withColumn("_file", F.input_file_name())
    full_pattern = f".*/{pattern}$"
    for i, n in enumerate(names, start=1):
        df = df.withColumn(n, F.regexp_extract(F.col("_file"), full_pattern, i))
    return df


def already_ingested_filter(
    df: DataFrame, story: DataFrame, on: list[str]
) -> DataFrame:
    """Story-table exactly-once: drop rows whose key already appears in
    the ingest log (left_anti; files/Manager.groovy:936-948)."""
    return df.join(story.select(*on).distinct(), on, "left_anti")
