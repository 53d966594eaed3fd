"""Config-file registry — getl's ConfigFiles/ConfigSlurper recast.

Reference parity (behavior, not code):
- JSON config files with a ``vars`` section, deep-merged across
  multiple files, ``${var}`` macro substitution in every string value
  (/root/reference/src/main/groovy/getl/config/ConfigFiles.groovy,
  ConfigSlurper.groovy; merge + vars semantics in
  utils/Config.groovy:177-268);
- named connections and datasets a script refers to by NAME instead
  of embedding paths/credentials
  (config-driven registration in lang/Getl.groovy).

Spark-first shape: a config names DataFrames. ``register`` turns every
``tables`` entry into a Spark temp view (and merges config ``vars``
into the scripter's variable scope), so a getl user's
"script + config" pair ports as the same two files.

Config document shape (all sections optional)::

    {
      "vars":        {"region": "emea", "landing": "/data/in"},
      "connections": {"wh":   {"type": "lake", "warehouse": "/data/wh"},
                      "crm":  {"type": "jdbc", "url": "jdbc:...", ...}},
      "tables": {
        "orders_raw": {"format": "csv", "path": "${landing}/orders.csv",
                        "options": {"header": true}},
        "orders":     {"connection": "wh", "table": "orders"},
        "events":     {"format": "parquet", "path": "/data/events"},
        "crm_accounts": {"connection": "crm", "table": "accounts"}
      },
      "managers":    {"zone": {"type": "sftp", "host": "..."}}
    }
"""

from __future__ import annotations

import json
import re

from pyspark.sql import DataFrame, SparkSession

_MACRO = re.compile(r"\$\{([A-Za-z_][A-Za-z0-9_.]*)\}")


def _deep_merge(base: dict, over: dict) -> dict:
    """getl MapUtils.MergeMap: nested dicts merge key-wise, scalars and
    lists from the later file win."""
    out = dict(base)
    for k, v in over.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


class ConfigRegistry:
    """Named connections/tables/managers from JSON config files."""

    def __init__(self, content: dict | None = None):
        self.content: dict = content or {}
        self.content.setdefault("vars", {})

    # -- loading -----------------------------------------------------
    @classmethod
    def load(cls, *paths: str, ext_vars: dict | None = None) -> "ConfigRegistry":
        """Load one or more JSON config files (later files deep-merge
        over earlier ones — getl's ``filename = "a.json;b.json"``),
        then apply ``${var}`` substitution using the merged ``vars``
        section with ``ext_vars`` overriding (getl job args win over
        file vars)."""
        merged: dict = {}
        for p in paths:
            for single in str(p).split(";"):
                single = single.strip()
                if not single:
                    continue
                with open(single) as fh:
                    merged = _deep_merge(merged, json.load(fh))
        reg = cls(merged)
        reg.content["vars"] = {**reg.content.get("vars", {}), **(ext_vars or {})}
        reg.content = reg._eval(reg.content)
        return reg

    def _eval(self, node):
        """Recursive ${var} macro substitution in string values.
        A whole-string macro referencing a non-string var keeps the
        var's type (getl EvalMacroString passes objects through)."""
        vars_ = self.content.get("vars", {})
        if isinstance(node, dict):
            return {k: (v if k == "vars" else self._eval(v)) for k, v in node.items()}
        if isinstance(node, list):
            return [self._eval(v) for v in node]
        if isinstance(node, str):
            whole = _MACRO.fullmatch(node)
            if whole and whole.group(1) in vars_:
                return vars_[whole.group(1)]

            def sub(m):
                name = m.group(1)
                if name not in vars_:
                    raise KeyError(f"config: undefined var ${{{name}}}")
                return str(vars_[name])

            return _MACRO.sub(sub, node)
        return node

    # -- lookups -----------------------------------------------------
    @property
    def vars(self) -> dict:
        return self.content.get("vars", {})

    def connection(self, name: str) -> dict:
        try:
            return self.content["connections"][name]
        except KeyError:
            raise KeyError(f"config: unknown connection {name!r}") from None

    def manager(self, name: str) -> dict:
        """An fsmanagers spec by name (for copyfiles-style jobs)."""
        try:
            return self.content["managers"][name]
        except KeyError:
            raise KeyError(f"config: unknown manager {name!r}") from None

    def table_names(self) -> list[str]:
        return sorted(self.content.get("tables", {}))

    def table(self, spark: SparkSession, name: str) -> DataFrame:
        """Resolve a named table to a DataFrame. Through-a-connection
        entries (``connection``/``table``) hit lake or JDBC; direct
        entries (``format``/``path``) read files with the matching
        getl-parity reader so per-field formats/schema files apply."""
        spec = self.content.get("tables", {}).get(name)
        if spec is None:
            raise KeyError(f"config: unknown table {name!r}")
        if "connection" in spec:
            conn = self.connection(spec["connection"])
            kind = conn.get("type")
            if kind == "lake":
                from getl_spark.lake import LakeCatalog

                return LakeCatalog(conn["warehouse"]).load_table(
                    spec.get("table", name)
                ).read(spark)
            if kind == "jdbc":
                from getl_spark.sources import read_jdbc

                jdbc_kw = {
                    k: conn[k]
                    for k in ("driver", "user", "password", "fetch_size", "options")
                    if k in conn
                }
                jdbc_kw.update(
                    {
                        k: spec[k]
                        for k in ("fields", "where", "order", "limit", "query")
                        if k in spec
                    }
                )
                if "query" in jdbc_kw:
                    return read_jdbc(spark, conn["url"], **jdbc_kw)
                return read_jdbc(
                    spark, conn["url"], spec.get("table", name), **jdbc_kw
                )
            raise ValueError(f"config: unknown connection type {kind!r}")
        fmt = spec.get("format", "parquet")
        path = spec["path"]
        opts = dict(spec.get("options", {}))
        if fmt == "parquet":
            return spark.read.options(**opts).parquet(path)
        if fmt == "csv":
            from getl_spark.sources import read_csv

            if "schema_file" in spec:
                opts["schema_file"] = spec["schema_file"]
            return read_csv(spark, path, **opts)
        if fmt == "json":
            from getl_spark.sources import read_json

            return read_json(spark, path, **opts)
        raise ValueError(f"config: unknown table format {fmt!r}")

    # -- Spark wiring ------------------------------------------------
    def register(self, spark: SparkSession, names: list[str] | None = None) -> list[str]:
        """Create a temp view per named table; returns the names. A
        script then refers to config tables exactly like lake views.

        Registration MATERIALIZES each table's DataFrame (a JDBC entry
        connects to fetch its schema), so pass ``names`` to register
        only what the job uses — the script CLI does this by scanning
        the script text for config table names."""
        out = []
        for name in names if names is not None else self.table_names():
            self.table(spark, name).createOrReplaceTempView(name)
            out.append(name)
        return out
