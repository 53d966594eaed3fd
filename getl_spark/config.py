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
import threading

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


class Repository:
    """In-session named-object repository — getl's programmatic
    registration + per-thread cloning (``lang/Getl.groovy:491-551``,
    ``data/Dataset.groovy:1332-1352``) recast Spark-first.

    Layers PROGRAMMATIC registrations over an optional file-backed
    :class:`ConfigRegistry` (programmatic wins on name collision, the
    way getl job code overrides config files). What needs cloning
    differs from getl: DataFrames and the SparkSession are thread-safe
    for job submission (no ``writeSynch`` analog needed), but file
    managers hold live sockets (FTP/SFTP control connections), so
    :meth:`manager_for_thread` hands each worker thread its OWN
    connected instance — the in-session analog of the per-task
    ``build_manager(spec)`` the Spark executors already do.
    """

    def __init__(self, registry: "ConfigRegistry | None" = None):
        self.registry = registry
        self._connections: dict = {}
        self._tables: dict = {}
        self._managers: dict = {}
        self._thread_mgrs: dict = {}
        self._lock = threading.Lock()

    # -- programmatic registration (name -> spec or live DataFrame) --
    def register_connection(self, name: str, spec: dict) -> None:
        self._connections[name] = dict(spec)

    def register_table(self, name: str, table: "DataFrame | dict") -> None:
        """A live DataFrame (registered as-is) or a spec dict in the
        ConfigRegistry ``tables`` shape."""
        self._tables[name] = table

    def register_manager(self, name: str, spec: dict) -> None:
        self._managers[name] = dict(spec)

    # -- lookup (programmatic first, then config files) --------------
    def connection(self, name: str) -> dict:
        if name in self._connections:
            return self._connections[name]
        if self.registry is not None:
            return self.registry.connection(name)
        raise KeyError(f"repository: unknown connection {name!r}")

    def table(self, spark: SparkSession, name: str) -> DataFrame:
        t = self._tables.get(name)
        if isinstance(t, DataFrame):
            return t
        if t is not None:  # spec dict: resolve through a registry view
            sub = ConfigRegistry(
                {
                    "tables": {name: t},
                    "connections": {**(
                        self.registry.content.get("connections", {})
                        if self.registry is not None
                        else {}
                    ), **self._connections},
                }
            )
            return sub.table(spark, name)
        if self.registry is not None:
            return self.registry.table(spark, name)
        raise KeyError(f"repository: unknown table {name!r}")

    def manager_spec(self, name: str) -> dict:
        if name in self._managers:
            return self._managers[name]
        if self.registry is not None:
            return self.registry.manager(name)
        raise KeyError(f"repository: unknown manager {name!r}")

    def table_names(self) -> list[str]:
        file_names = self.registry.table_names() if self.registry else []
        return sorted(set(file_names) | set(self._tables))

    def register(self, spark: SparkSession, names: list[str] | None = None) -> list[str]:
        """Temp view per named table (programmatic + file), same
        contract as :meth:`ConfigRegistry.register` — a SQLScripter
        script then refers to repository tables by name."""
        out = []
        for name in names if names is not None else self.table_names():
            self.table(spark, name).createOrReplaceTempView(name)
            out.append(name)
        return out

    # -- per-thread stateful objects ---------------------------------
    def manager_for_thread(self, name: str):
        """A connected FileManager owned by the CALLING thread. Two
        threads never share a control connection (getl clones
        connections per Executor thread for the same reason); repeat
        calls from one thread reuse its instance."""
        from getl_spark.fsmanagers import build_manager

        key = (name, threading.get_ident())
        with self._lock:
            m = self._thread_mgrs.get(key)
            if m is None:
                m = build_manager(self.manager_spec(name))
                self._thread_mgrs[key] = m
        m.connect()
        return m

    def close_all(self) -> None:
        """Close every thread's managers (driver-side cleanup)."""
        with self._lock:
            mgrs, self._thread_mgrs = list(self._thread_mgrs.values()), {}
        for m in mgrs:
            try:
                m.close()
            except Exception:
                pass

    def clone(self) -> "Repository":
        """Isolated copy for a worker thread: shares the (immutable
        after load) file registry, deep-copies the programmatic spec
        maps so the thread can re-register without racing the parent;
        live DataFrames are shared (thread-safe), live managers are
        NOT carried over (each clone builds its own on first use)."""
        import copy

        r = Repository(self.registry)
        r._connections = copy.deepcopy(self._connections)
        r._managers = copy.deepcopy(self._managers)
        r._tables = {
            k: (v if isinstance(v, DataFrame) else copy.deepcopy(v))
            for k, v in self._tables.items()
        }
        return r

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close_all()
        return False
