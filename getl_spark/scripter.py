"""SQLScripter — getl's SQL mini-language over spark.sql.

Reference parity (statement-for-statement):
/root/reference/src/main/groovy/getl/jdbc/SQLScripter.groovy
- ``{var}`` substitution (case-insensitive; lists render as
  newline-joined blocks; null renders as ``null``) :163-196
- command classification SET / ECHO / FOR SELECT / IF / ERROR / EXIT
  / LOAD_POINT / SAVE_POINT / BEGIN BLOCK / SELECT / UPDATE :199-250
- ``/*:label*/`` result capture (rows for SELECT, rowcount for
  UPDATE) :238-245, 343-364
- FOR SELECT ... END FOR row loop with a nested scripter whose vars
  seed from the parent (changes do NOT propagate back) :391-441
- IF <cond> ... END IF via ``SELECT 1 WHERE <cond>`` :216-218, 445+
- LOAD_POINT/SAVE_POINT point management mapped onto
  :class:`~getl_spark.checkpoint.CheckpointManager`
  (SavePointManager.groovy) :276-335

Control flow (FOR/IF/SET) is inherently driver-side in getl too —
the loop query is control-flow-sized (a list of partitions, dates,
table names), never the data path; the statements it drives are
full distributed Spark jobs. BEGIN BLOCK deviates by necessity:
Spark has no multi-statement procedural blocks, so the block's
statements run sequentially without interpretation.
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession


class SQLScriptError(RuntimeError):
    """Raised by the ERROR statement or a malformed script."""


def _scan_quoted(s: str, i: int) -> int:
    """Index of the closing quote for the span opening at ``s[i]``
    (one of ``'``, ``"``, backtick), honoring doubled-quote escapes."""
    q, j, n = s[i], i + 1, len(s)
    while j < n:
        if s[j] == q:
            if j + 1 < n and s[j + 1] == q:
                j += 2
                continue
            break
        j += 1
    return j


def split_statements(script: str) -> list[str]:
    """Split on ``;`` respecting quoted spans (single/double quotes,
    backtick identifiers), ``--`` line comments and ``/* */`` block
    comments."""
    out, buf = [], []
    i, n = 0, len(script)
    while i < n:
        c = script[i]
        if c in "'\"`":
            j = _scan_quoted(script, i)
            buf.append(script[i : j + 1])
            i = j + 1
        elif script.startswith("--", i):
            j = script.find("\n", i)
            j = n if j == -1 else j
            buf.append(script[i:j])
            i = j
        elif script.startswith("/*", i):
            j = script.find("*/", i + 2)
            j = n - 2 if j == -1 else j
            buf.append(script[i : j + 2])
            i = j + 2
        elif c == ";":
            out.append("".join(buf).strip())
            buf = []
            i += 1
        else:
            buf.append(c)
            i += 1
    last = "".join(buf).strip()
    if last:
        out.append(last)
    return [s for s in out if s]


def _strip_comments(sql: str) -> str:
    """Remove ``--`` and ``/* */`` comments OUTSIDE quoted spans
    (single/double quotes and backtick identifiers — a literal like
    ``'a--b'`` or an identifier like ``\\`a--b\\`` must survive);
    ``/*:label*/`` capture markers are preserved."""
    out = []
    i, n = 0, len(sql)
    while i < n:
        c = sql[i]
        if c in "'\"`":
            j = _scan_quoted(sql, i)
            out.append(sql[i : j + 1])
            i = j + 1
        elif sql.startswith("--", i):
            j = sql.find("\n", i)
            i = n if j == -1 else j
        elif sql.startswith("/*", i) and not sql.startswith("/*:", i):
            j = sql.find("*/", i + 2)
            i = n if j == -1 else j + 2
        else:
            out.append(c)
            i += 1
    return "".join(out).strip()


class SQLScripter:
    """Run a getl SQL script against a SparkSession.

    ``catalog`` (a :class:`~getl_spark.lake.LakeCatalog`) is required
    for LOAD_POINT/SAVE_POINT and, when given, has its tables
    registered as temp views before the run (QueryDataset parity).
    """

    def __init__(
        self,
        spark: SparkSession,
        vars: dict | None = None,
        ext_vars: dict | None = None,
        catalog=None,
        echo=None,
    ):
        self.spark = spark
        self.vars: dict = dict(vars or {})
        self.ext_vars: dict = dict(ext_vars or {})
        self.catalog = catalog
        self.echo = echo or (lambda msg: print(f"ECHO: {msg}"))
        self.echoed: list[str] = []
        self.row_count = 0
        self.script: str | None = None
        self._exit = False

    # ------------------------------------------------------------- plumbing
    @property
    def all_vars(self) -> dict:
        return {**self.vars, **self.ext_vars}

    def load_file(self, path: str, encoding: str = "utf-8") -> None:
        with open(path, encoding=encoding) as f:
            self.script = f.read()

    def _substitute(self, sql: str) -> str:
        by_lower = {k.lower(): v for k, v in self.all_vars.items()}

        def repl(m):
            name = m.group(1).lower()
            if name not in by_lower:
                return m.group(0)
            v = by_lower[name]
            if v is None:
                return "null"
            if isinstance(v, (list, tuple)):
                return "\n" + "\n".join(str(x) for x in v) + "\n"
            return str(v)

        return re.sub(r"\{([A-Za-z0-9._-]+)\}", repl, sql)

    # ------------------------------------------------------------------ run
    def run(self, script: str | None = None) -> "SQLScripter":
        if script is not None:
            self.script = script
        if not self.script or not self.script.strip():
            raise SQLScriptError("no script to run")
        self._exit = False
        st = split_statements(self.script)
        i = 0
        while i < len(st) and not self._exit:
            i = self._exec_one(st, i)
        return self

    def _exec_one(self, st: list[str], i: int) -> int:
        raw = self._substitute(st[i])
        cs = _strip_comments(raw)
        low = cs.lower()
        if not cs:
            return i + 1
        if low.startswith("set") and re.match(r"(?is)^set\s", cs):
            self._do_set(re.sub(r"(?is)^\s*set\s", "", cs, count=1))
            return i + 1
        if re.match(r"(?is)^echo(\s|$)", cs):
            msg = re.sub(r"(?is)^\s*echo\s?", "", cs, count=1).strip()
            self.echoed.append(msg)
            self.echo(msg)
            return i + 1
        if re.match(r"(?is)^for\s+(select|with)\s", cs):
            return self._do_for(st, i, re.sub(r"(?is)^\s*for\s", "", cs, count=1))
        if re.match(r"(?is)^if\s", cs):
            return self._do_if(st, i, re.sub(r"(?is)^\s*if\s", "", cs, count=1))
        if re.match(r"(?is)^error(\s|$)", cs):
            raise SQLScriptError(re.sub(r"(?is)^\s*error\s?", "", cs, count=1).strip())
        if re.match(r"(?is)^exit$", cs):
            self._exit = True
            return i + 1
        if re.match(r"(?is)^load_point\s", cs):
            self._do_load_point(cs)
            return i + 1
        if re.match(r"(?is)^save_point\s", cs):
            self._do_save_point(cs)
            return i + 1
        if re.match(r"(?is)^begin\s+block$", cs):
            return self._do_block(st, i)
        # plain SELECT/UPDATE statement, optional /*:label*/ capture
        label = None
        body = raw.strip()
        m = re.match(r"(?s)^\s*/\*\s*:\s*([A-Za-z0-9._-]+)\s*\*/\s*(.*)$", body)
        if m:
            label, body = m.group(1).lower(), m.group(2)
        body_cs = _strip_comments(body)
        if re.match(r"(?is)^(select|with)\s", body_cs):
            rows = [r.asDict() for r in self.spark.sql(body_cs).collect()]
            if label:
                self.vars[label] = rows
        else:
            df = self.spark.sql(body_cs)
            rc = 0
            if "num_affected_rows" in df.columns:
                got = df.collect()
                rc = int(got[0][0]) if got else 0
            self.row_count += rc
            if label:
                self.vars[label] = rc
        return i + 1

    # ------------------------------------------------------------- commands
    def _do_set(self, query: str) -> None:
        rows = self.spark.sql(query).limit(1).collect()
        if rows:
            for k, v in rows[0].asDict().items():
                self.vars[k.lower()] = v

    def _find_end(self, st: list[str], i: int, open_pat: str, close_pat: str) -> int:
        depth = 1
        for j in range(i + 1, len(st)):
            s = _strip_comments(self._substitute(st[j]))
            if re.match(open_pat, s):
                depth += 1
            elif re.match(close_pat, s):
                depth -= 1
                if depth == 0:
                    return j
        raise SQLScriptError(f"missing closing statement for {st[i][:40]!r}")

    def _do_for(self, st: list[str], i: int, query: str) -> int:
        end = self._find_end(
            st, i, r"(?is)^for\s+(select|with)\s", r"(?is)^end\s+for$"
        )
        # the separator goes on its OWN line: a statement ending in a
        # `--` line comment must not swallow the `;`
        body = "\n;\n".join(st[i + 1 : end])
        # the loop query is control flow (partition lists, dates) —
        # driver-sized by contract, same as getl's eachRow here
        rows = self.spark.sql(query).collect()
        for row in rows:
            child = SQLScripter(
                self.spark,
                vars={**self.vars, **{k.lower(): v for k, v in row.asDict().items()}},
                ext_vars=self.ext_vars,
                catalog=self.catalog,
                echo=self.echo,
            )
            child.run(body)
            self.echoed.extend(child.echoed)
            self.row_count += child.row_count
            if child._exit:
                self._exit = True
                break
        return end + 1

    def _do_if(self, st: list[str], i: int, cond: str) -> int:
        end = self._find_end(st, i, r"(?is)^if\s", r"(?is)^end\s+if$")
        hit = self.spark.sql(f"SELECT 1 AS result WHERE {cond}").limit(1).collect()
        if hit:
            body = "\n;\n".join(st[i + 1 : end])
            sub = split_statements(body)
            j = 0
            while j < len(sub) and not self._exit:
                j = self._exec_one(sub, j)
        return end + 1

    def _do_block(self, st: list[str], i: int) -> int:
        end = self._find_end(st, i, r"(?is)^begin\s+block$", r"(?is)^end\s+block$")
        for s in st[i + 1 : end]:
            self.spark.sql(_strip_comments(self._substitute(s)))
        return end + 1

    def _point_manager(self, table: str, method: str):
        from getl_spark.checkpoint import CheckpointManager

        if self.catalog is None:
            raise SQLScriptError("LOAD_POINT/SAVE_POINT require a catalog")
        return CheckpointManager(self.catalog, table_name=table, method=method.upper())

    def _do_load_point(self, cs: str) -> None:
        m = re.match(
            r"(?is)^load_point\s+([a-z0-9_.]+)\s+to\s+([a-z0-9_]+)\s+with\s+(insert|merge)\s*$",
            cs,
        )
        if not m:
            raise SQLScriptError(f"bad LOAD_POINT syntax: {cs!r}")
        point, var, method = m.group(1), m.group(2).lower(), m.group(3)
        parts = point.split(".")
        table, point_name = ".".join(parts[:-1]), parts[-1]
        if not table:
            raise SQLScriptError("LOAD_POINT needs <table>.<point>")
        pm = self._point_manager(table, method)
        last = pm.last(pipeline=point_name)
        self.vars[var] = None if last is None else last.max_seq

    def _do_save_point(self, cs: str) -> None:
        m = re.match(
            r"(?is)^save_point\s+([a-z0-9_.]+)\s+from\s+([a-z0-9_]+)\s+with\s+(insert|merge)\s*$",
            cs,
        )
        if not m:
            raise SQLScriptError(f"bad SAVE_POINT syntax: {cs!r}")
        point, var, method = m.group(1), m.group(2).lower(), m.group(3)
        value = self.all_vars.get(var)
        if value is None:
            raise SQLScriptError(f"variable {var!r} has empty value for SAVE_POINT")
        parts = point.split(".")
        table, point_name = ".".join(parts[:-1]), parts[-1]
        if not table:
            raise SQLScriptError("SAVE_POINT needs <table>.<point>")
        pm = self._point_manager(table, method)
        last = pm.last(pipeline=point_name)
        # getl parity: SavePointManager guards MERGE saves with
        # `value < new` and INSERT reads take MAX — a smaller value
        # must never regress what LOAD_POINT returns
        if last is not None and int(value) <= last.max_seq:
            return
        epoch = 0 if last is None else last.epoch + 1
        pm.save(pipeline=point_name, epoch=epoch, max_seq=int(value))
