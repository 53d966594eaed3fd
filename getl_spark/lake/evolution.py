"""Transactional schema evolution: add / widen / rename columns.

Reference parity: getl's ``updateFields`` MERGE / MERGE_EXISTS policies
(/root/reference/src/main/groovy/getl/data/Dataset.groovy:449-485) and
the implicit-conversion whitelist ``Field.IsConvertibleType``
(/root/reference/src/main/groovy/getl/data/Field.groovy:478-510).

Each evolution commits a new schema version in table metadata — data
files are NOT rewritten. Readers upgrade old files lazily via
:func:`upgrade_exprs` (add -> typed null, widen -> cast, rename ->
alias), the same lazy-metadata evolution Iceberg performs with field
IDs.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType

from getl_spark.schema import parse_type

# Safe widenings, mirroring the reference's conversion whitelist
# (int/numeric -> bigint; numeric/int/bigint -> double; -> decimal; -> string).
_WIDEN_OK = {
    ("tinyint", "smallint"),
    ("tinyint", "int"),
    ("tinyint", "bigint"),
    ("smallint", "int"),
    ("smallint", "bigint"),
    ("int", "bigint"),
    ("int", "double"),
    ("int", "decimal"),
    ("bigint", "double"),
    ("bigint", "decimal"),
    ("tinyint", "double"),
    ("tinyint", "decimal"),
    ("smallint", "double"),
    ("smallint", "decimal"),
    ("float", "double"),
    ("tinyint", "string"),
    ("smallint", "string"),
    ("int", "string"),
    ("bigint", "string"),
    ("float", "string"),
    ("double", "string"),
    ("boolean", "string"),
    ("date", "string"),
    ("timestamp", "string"),
    ("date", "timestamp"),
    ("decimal", "decimal"),  # integer-digit and scale must not shrink (checked below)
    ("decimal", "double"),
    ("decimal", "string"),
}


def _base(typename: str) -> str:
    return typename.split("(")[0]


def check_widen(old_type: str, new_type: str) -> None:
    # normalize both sides through the parser so "long"=="bigint" etc.
    old_s = parse_type(old_type).simpleString()
    new_s = parse_type(new_type).simpleString()
    if old_s == new_s:
        return
    if (_base(old_s), _base(new_s)) not in _WIDEN_OK:
        raise ValueError(f"illegal widen {old_type} -> {new_type}")
    if _base(old_s) == "decimal" and _base(new_s) == "decimal":
        # decimal(p,s) widens only if neither the integer digits (p-s)
        # nor the scale shrink — otherwise the cast silently loses data
        op, osc = map(int, old_s[old_s.index("(") + 1 : -1].split(","))
        np_, nsc = map(int, new_s[new_s.index("(") + 1 : -1].split(","))
        if nsc < osc or (np_ - nsc) < (op - osc):
            raise ValueError(
                f"illegal decimal narrow {old_type} -> {new_type} "
                f"(integer digits {op - osc}->{np_ - nsc}, scale {osc}->{nsc})"
            )


def evolve_schema(schema: StructType, change: dict) -> StructType:
    """Pure function: apply one add/widen/rename op to a StructType."""
    fields = list(schema.fields)
    op = change["op"]
    if op == "add":
        if change["column"] in schema.fieldNames():
            raise ValueError(f"column {change['column']} already exists")
        fields.append(
            StructField(
                change["column"],
                parse_type(change["type"]),
                bool(change.get("nullable", True)),
            )
        )
    elif op == "widen":
        idx = schema.fieldNames().index(change["column"])
        old = fields[idx]
        check_widen(old.dataType.simpleString(), change["type"])
        fields[idx] = StructField(old.name, parse_type(change["type"]), old.nullable)
    elif op == "rename":
        if change["new_name"] in schema.fieldNames():
            raise ValueError(f"column {change['new_name']} already exists")
        idx = schema.fieldNames().index(change["column"])
        old = fields[idx]
        fields[idx] = StructField(change["new_name"], old.dataType, old.nullable)
    elif op == "drop":
        if change["column"] not in schema.fieldNames():
            raise ValueError(f"column {change['column']} does not exist")
        fields = [f for f in fields if f.name != change["column"]]
        if not fields:
            raise ValueError("cannot drop the last column")
    else:
        raise ValueError(f"unknown evolution op {op}")
    return StructType(fields)


def apply_evolution(table, change: dict) -> int:
    """Commit one evolution op as a new schema version. Returns new
    schema id. Idempotent: a change whose result equals the current
    schema (e.g. a widen replayed after a crash-resume of an epoch
    whose watermark already committed) is a no-op — without this,
    every replay of the same epoch appends a duplicate schema version
    and evolution-log entry."""
    while True:
        new_schema = evolve_schema(table.schema(), change)
        if new_schema == table.schema():
            return table.current_schema_id
        new_sid = table.current_schema_id + 1
        new_meta = json.loads(json.dumps(table.meta))
        new_meta["schemas"][str(new_sid)] = json.loads(new_schema.json())
        new_meta["current_schema_id"] = new_sid
        entry = dict(change)
        entry["result_schema_id"] = new_sid
        new_meta["evolution_log"].append(entry)
        if table._try_commit(new_meta):
            return new_sid
        table.refresh()


def upgrade_exprs(table, from_sid: int, to_sid: int) -> list:
    """Column exprs that upgrade a file written at schema ``from_sid``
    so it reads as schema ``to_sid``."""
    exprs = {name: F.col(name) for name in table.schema(from_sid).fieldNames()}
    for entry in table.meta["evolution_log"]:
        rid = int(entry["result_schema_id"])
        if rid <= from_sid or rid > to_sid:
            continue
        op = entry["op"]
        if op == "add":
            exprs[entry["column"]] = F.lit(None).cast(entry["type"])
        elif op == "widen":
            exprs[entry["column"]] = exprs[entry["column"]].cast(entry["type"])
        elif op == "rename":
            exprs[entry["new_name"]] = exprs.pop(entry["column"])
        elif op == "drop":
            # pop, don't just ignore: if the name is later re-added, the
            # re-added column must read NULL from pre-drop files, not
            # resurrect the old column's values
            exprs.pop(entry["column"], None)
    target = table.schema(to_sid)
    return [exprs[f.name].cast(f.dataType).alias(f.name) for f in target.fields]
