"""Flow — getl's copy/writeTo/process engine as declarative transforms.

Reference parity (/root/reference/src/main/groovy/getl/proc/Flow.groovy):
- ``copy`` with auto column-map + rename syntax
  ``[dest: "src;format=...;convert=true"]`` (:122-144 map parse,
  :161-276 GenerateMap codegen) -> :func:`copy_rows` builds a select
  list of cast/to_date/alias exprs — Catalyst codegen replaces getl's
  compiled Groovy closures;
- unmapped dest fields get typed NULLs (:237; GenerationUtils
  EMPTY_<TYPE> :42-54) -> ``lit(None).cast(t)``;
- assert-based row rejection into an errors dataset with an ``error``
  column (saveErrors, :413,510-520,553-563) -> :func:`validate_rows`
  splits valid/rejects declaratively (never throws per-row);
- ``excludeFields`` / ``notConverted`` (:318-323) -> parameters.

The whole Flow is ONE Spark job: map/convert = select, dest write =
the caller's writer (LakeTable.append / MERGE / parquet).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DateType, StructType, TimestampType


@dataclass
class MapRule:
    source: str | None  # None -> dest gets typed NULL
    format: str | None = None
    convert: bool = True


def parse_map(spec: dict[str, str]) -> dict[str, MapRule]:
    """Parse getl's map syntax: {dest: "src;format=yyyy-MM-dd;convert=false"}.
    An empty string value maps dest to NULL (getl Flow.groovy:231-238)."""
    out: dict[str, MapRule] = {}
    for dest, rule in spec.items():
        parts = [p.strip() for p in str(rule).split(";")]
        src = parts[0] or None
        fmt, conv = None, True
        for p in parts[1:]:
            k, _, v = p.partition("=")
            if k.strip().lower() == "format":
                fmt = v.strip()
            elif k.strip().lower() == "convert":
                conv = v.strip().lower() != "false"
        out[dest.lower()] = MapRule(src.lower() if src else None, fmt, conv)
    return out


def _convert(col, dtype, fmt: str | None):
    """Type-conversion matrix (GenerationUtils.GenerateConvertValue,
    /root/reference/src/main/groovy/getl/utils/GenerationUtils.groovy:158-430):
    string->date/timestamp honor format patterns; everything else casts."""
    if isinstance(dtype, DateType) and fmt:
        return F.to_date(col, fmt)
    if isinstance(dtype, TimestampType) and fmt:
        return F.to_timestamp(col, fmt)
    if fmt and dtype.simpleString() == "string":
        return F.date_format(col, fmt)
    return col.cast(dtype)


def copy_rows(
    source: DataFrame,
    dest_schema: StructType,
    mapping: dict[str, str] | None = None,
    exclude_fields: list[str] | None = None,
    not_converted: bool = False,
) -> DataFrame:
    """getl Flow.copy's column stage: auto-map by (case-insensitive)
    name, apply rename/format rules, fill unmapped dests with typed
    NULLs, cast everything to the dest schema."""
    rules = parse_map(mapping or {})
    exclude = {c.lower() for c in (exclude_fields or [])}
    src_cols = {c.lower(): c for c in source.columns}
    exprs = []
    for f in dest_schema.fields:
        name = f.name.lower()
        if name in exclude:
            exprs.append(F.lit(None).cast(f.dataType).alias(f.name))
            continue
        rule = rules.get(name, MapRule(name if name in src_cols else None))
        if rule.source is None or rule.source not in src_cols:
            exprs.append(F.lit(None).cast(f.dataType).alias(f.name))
            continue
        col = F.col(src_cols[rule.source])
        if not_converted or not rule.convert:
            exprs.append(col.alias(f.name))
        else:
            exprs.append(_convert(col, f.dataType, rule.format).alias(f.name))
    return source.select(*exprs)


def validate_rows(
    df: DataFrame, checks: list[tuple[str, str]]
) -> tuple[DataFrame, DataFrame]:
    """Assert-based rejection, set-oriented: ``checks`` is a list of
    (condition_sql, message). Returns (valid, errors) where errors
    carries the original columns + an ``error`` column listing every
    failed assertion (getl's errorsDataset with the assertion text,
    Flow.groovy:553-563 / Dataset.groovy:858-872)."""
    err_col = F.concat_ws(
        "; ",
        *[
            F.when(~F.expr(cond), F.lit(msg))
            for cond, msg in checks
        ],
    )
    flagged = df.withColumn("error", err_col)
    valid = flagged.filter(F.col("error") == "").drop("error")
    errors = flagged.filter(F.col("error") != "")
    return valid, errors


def lookup(
    probe: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    select: list[str] | None = None,
    strategy: str = "HASH",
    how: str = "left",
) -> DataFrame:
    """getl ``Dataset.lookup`` (/root/reference/src/main/groovy/getl/
    data/Dataset.groovy:1141-1183): enrich rows by probing a keyed
    dataset. getl materializes the dimension as a driver-side
    HashMap/TreeMap; the cluster equivalent is a broadcast hash join —
    the dimension ships once per executor, the probe side streams with
    no shuffle.

    - strategy='HASH'  -> broadcast hash join, no ordering contract
      (getl's LookupStrategy.HASH / HashMap).
    - strategy='ORDER' -> result additionally ordered by the key
      (getl's LookupStrategy.ORDER / TreeMap iteration order).
    ``select`` restricts which dimension columns are attached.
    """
    if strategy not in ("HASH", "ORDER"):
        raise ValueError("strategy must be 'HASH' or 'ORDER'")
    keys = [on] if isinstance(on, str) else list(on)
    d = dim.select(*keys, *select) if select is not None else dim
    out = probe.join(F.broadcast(d), keys, how)
    return out.orderBy(*keys) if strategy == "ORDER" else out


def generate_rows(df: DataFrame, fn, schema: StructType | str) -> DataFrame:
    """getl ``Flow.writeTo``/``rowsTo`` free-form row generation
    (/root/reference/src/main/groovy/getl/proc/Flow.groovy:679-818):
    a generator that emits 0..M output rows per input batch (the UDTF
    shape). ``fn(pandas.DataFrame) -> pandas.DataFrame`` runs over
    Arrow batches via mapInPandas — vectorized, never per-row Python.
    """
    if isinstance(schema, str):
        from getl_spark.schema import parse_ddl

        schema = parse_ddl(schema)

    def gen(batches):
        for pdf in batches:
            out = fn(pdf)
            if out is not None and len(out):
                yield out

    return df.mapInPandas(gen, schema)


def write_all_to(df: DataFrame, sinks: list[tuple]) -> None:
    """Filtered multicast (MultipleDataset,
    /root/reference/src/main/groovy/getl/transform/MutlipleDatasetDriver.groovy:107-135):
    ``sinks`` is [(condition_sql | None, writer_fn)]. One upstream
    computation when the caller persists df first."""
    for cond, writer in sinks:
        writer(df.filter(F.expr(cond)) if cond else df)
