"""Operational file copy/move/clean — getl's FileCopier/FileCleaner.

Reference parity:
- multi-destination copy with rename masks + destination path masks
  (/root/reference/src/main/groovy/getl/proc/FileCopier.groovy:49-130);
- ``segmented`` sharding — each file routed to ONE destination by a
  hash of mask-variable fields (FileCopier.groovy:131-135,221-266);
- retry attempts (proc/sub/FileListProcessing.groovy:96-100,396-411);
- story-table exactly-once skip of already-processed files
  (files/Manager.groovy:936-948);
- FileCleaner removal pass (proc/FileCleaner.groovy).

Spark-first shape: the LISTING is a distributed walk (first-level
subtrees fan out over executors via mapInPandas — the reference uses a
threaded walker + embedded H2 buffer), the PLAN is pure DataFrame
expressions (mask-variable extraction, rename/destination templates,
segment hash), and the COPY is an Arrow-batched mapInPandas where each
row is a self-contained work unit (one source file + its full
destination list), so delete-after-copy (move semantics) is safe per
task with no cross-task coordination. Results come back as a status
DataFrame — feed it to a story table for exactly-once reruns.

Remote filesystems: every operation goes through the
:mod:`getl_spark.fsmanagers` protocol (getl's files/Manager family —
local POSIX, pyarrow-backed HDFS, FTP, SFTP). Pass picklable manager
SPECS (``src_manager`` / ``dest_manager`` / ``manager`` dicts); each
executor task builds its own connection from the spec — live handles
never cross the closure boundary, and a local->SFTP or HDFS->local
move is the same two-spec plan.

This is per-partition imperative I/O — the one place the brief allows
mapInPandas over imperative logic, because no Catalyst operator moves
bytes between filesystems.
"""

from __future__ import annotations

import os
import posixpath
import re

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from getl_spark.fsmanagers import LocalFileManager, build_manager
from getl_spark.schema import parse_ddl
from getl_spark.sources import mask_to_regex

_MASK_VAR = re.compile(r"\{([A-Za-z_][A-Za-z0-9_]*)\}")

LIST_SCHEMA_DDL = (
    "filepath string, filename string, filenameonly string, "
    "fileextonly string, filedate timestamp, filesize bigint, relpath string"
)

COPY_RESULT_DDL = (
    "filepath string, dest string, bytes bigint, attempts int, "
    "ok boolean, error string"
)


def _norm_base(base_dir: str, manager: dict | None) -> str:
    """Local managers address OS paths (abspath keeps the historical
    contract); remote managers address their own namespace verbatim."""
    if manager is None or manager.get("type", "local") == "local":
        return os.path.abspath(base_dir)
    return base_dir.rstrip("/")


def list_files(
    spark: SparkSession,
    base_dir: str,
    mask: str = "*",
    var_types: dict | None = None,
    fanout_depth: int = 2,
    manager: dict | None = None,
) -> DataFrame:
    """Distributed file listing with getl's typed mask variables.

    Directories down to ``fanout_depth`` levels are enumerated on the
    driver (cheap listdirs) and parallelized; each task either lists
    one directory's direct files or walks one depth-``fanout_depth``
    subtree — so a tree whose data concentrates under one first-level
    directory still fans out across executors instead of serializing
    on a single straggler task. Emits one row per file matching the
    compiled mask regex. Columns: the getl built-ins (filepath,
    filename, filenameonly, fileextonly, filedate, filesize, relpath)
    plus one column per ``{var}`` in the mask — string by default,
    typed (with non-parsing paths excluded) when ``var_types``
    declares a type/format, mirroring ``Path.variable`` + buildList
    filtering.

    ``manager`` is an fsmanagers spec dict (None = local POSIX); each
    walker task opens its own connection, so a remote landing zone is
    listed by N independent sessions, not one serial crawler.
    """
    import pandas as pd

    from getl_spark.sources import apply_mask_var_types

    pattern, names = mask_to_regex(mask, var_types)
    rx = re.compile(pattern + "$")
    base = _norm_base(base_dir, manager)

    # (relpath, mode): "files" rows list one dir's direct files;
    # "tree" rows own a whole subtree. Levels above the fan-out depth
    # become files-only rows so no file is listed twice.
    roots: list[tuple[str, str]] = [("", "files")]
    with build_manager(manager) as mgr:
        frontier = [""]
        for lvl in range(max(int(fanout_depth), 1)):
            nxt: list[str] = []
            for r in frontier:
                d = mgr.join(base, r) if r else base
                try:
                    entries = mgr.list_dir(d)
                except (FileNotFoundError, NotADirectoryError, OSError):
                    continue
                subs = [
                    (mgr.join(r, e.name) if r else e.name)
                    for e in sorted(entries, key=lambda x: x.name)
                    if e.is_dir
                ]
                if lvl < fanout_depth - 1:
                    roots += [(s, "files") for s in subs]
                    nxt += subs
                else:
                    roots += [(s, "tree") for s in subs]
            frontier = nxt
    roots_df = spark.createDataFrame(
        roots, "root string, mode string"
    ).repartition(max(len(roots), 1))

    schema = parse_ddl(LIST_SCHEMA_DDL)
    for n in names:
        schema = schema.add(n, "string")
    out_cols = [f.name for f in schema.fields]
    mgr_spec = manager

    def walk(batches):
        with build_manager(mgr_spec) as m:
            rel_fn = os.path.relpath if isinstance(m, LocalFileManager) else posixpath.relpath
            for pdf in batches:
                rows = []
                for root, mode in zip(pdf["root"], pdf["mode"]):
                    top = m.join(base, root) if root else base

                    def entries_of(top=top, mode=mode):
                        # generator wrapper: m.walk() raises lazily at
                        # ITERATION time, so the skip-on-error guard
                        # must wrap the loop, not just the call (a root
                        # replaced by a file between driver enumeration
                        # and task execution otherwise kills the job)
                        try:
                            if mode == "files":
                                yield (top, [e for e in m.list_dir(top) if not e.is_dir])
                            else:
                                yield from m.walk(top)
                        except (FileNotFoundError, NotADirectoryError, OSError):
                            return

                    for dirpath, files in entries_of():
                        for fe in files:
                            full = m.join(dirpath, fe.name) if dirpath else fe.name
                            rel = rel_fn(full, base) if base else full
                            mrx = rx.fullmatch(rel)
                            if not mrx:
                                continue
                            only, _, ext = fe.name.rpartition(".")
                            if not only:
                                only, ext = fe.name, ""
                            row = {
                                "filepath": full,
                                "filename": fe.name,
                                "filenameonly": only,
                                "fileextonly": ext,
                                # floor to us: Spark timestamps are
                                # microsecond precision and Arrow refuses
                                # a lossy ns->us cast
                                "filedate": pd.Timestamp(fe.mtime, unit="s").floor("us"),
                                "filesize": int(fe.size),
                                "relpath": rel,
                            }
                            row.update(dict(zip(names, mrx.groups())))
                            rows.append(row)
                yield pd.DataFrame(rows, columns=out_cols)

    return apply_mask_var_types(roots_df.mapInPandas(walk, schema), names, var_types)


def render_mask(template: str, df_columns: list[str]) -> Column:
    """Compile a getl path/rename template (``{var}`` substitution,
    Path.generateFileName) into one concat expression. ``{filedate}``
    renders as yyyyMMdd_HHmmss (FileCopier's filedate variable)."""
    parts: list[Column] = []
    pos = 0
    for m in _MASK_VAR.finditer(template):
        if m.start() > pos:
            parts.append(F.lit(template[pos : m.start()]))
        var = m.group(1)
        if var not in df_columns:
            raise ValueError(f"rename/destination mask references unknown variable {{{var}}}")
        col = F.col(var)
        if var == "filedate":
            col = F.date_format(col, "yyyyMMdd_HHmmss")
        parts.append(col.cast("string"))
        pos = m.end()
    if pos < len(template):
        parts.append(F.lit(template[pos:]))
    return F.concat(*parts) if len(parts) > 1 else parts[0]


def copy_files(
    spark: SparkSession,
    base_dir: str,
    mask: str,
    destinations: list[str],
    dest_path_mask: str | None = None,
    rename_mask: str | None = None,
    segmented_by: list[str] | None = None,
    delete_source: bool = False,
    number_attempts: int = 3,
    time_between_attempts: float = 0.1,
    story: DataFrame | None = None,
    files: DataFrame | None = None,
    src_manager: dict | None = None,
    dest_manager: dict | None = None,
    status_dir: str | None = None,
) -> DataFrame:
    """Copy (or move, ``delete_source=True``) every file matching
    ``mask`` under ``base_dir``.

    - no ``segmented_by``: every file goes to EVERY destination
      (multicast operational copy);
    - with ``segmented_by``: each file goes to exactly ONE destination,
      chosen by hash of those mask-variable columns modulo
      len(destinations) — getl's ``segmented`` sharding for parallel
      downstream loads;
    - ``dest_path_mask``/``rename_mask`` are getl templates over the
      mask variables + built-ins (filename, filenameonly, fileextonly,
      filedate, filesize); defaults preserve the relative path and name;
    - each copy retries up to ``number_attempts`` times; a file's
      source is deleted only after ALL its destinations succeeded;
    - ``story`` (a previous run's successful results) makes the rerun
      exactly-once: with a ``dest`` column the skip is PER
      (file, destination) — a multi-destination run where one
      destination failed retries exactly the failed destination; with
      only a ``filepath`` column the whole file is skipped.

    Returns one row per (file, destination): COPY_RESULT_DDL. Persist
    the ``ok`` rows into your story table to complete the loop.

    ``src_manager``/``dest_manager`` are fsmanagers spec dicts (None =
    local POSIX); destination paths are in the DEST manager's
    namespace, so local->SFTP, HDFS->local and FTP->FTP moves are the
    same plan with different specs. All destinations share one dest
    manager per task.
    """
    if not destinations:
        raise ValueError("at least one destination is required")
    lst = (
        files
        if files is not None
        else list_files(spark, base_dir, mask, manager=src_manager)
    )
    story_dests = None
    if story is not None:
        if "dest" in story.columns:
            # per-destination story: subtract completed destinations
            # from each file's work list AFTER the plan computes them
            story_dests = story.groupBy("filepath").agg(
                F.collect_set("dest").alias("_done")
            )
        else:
            lst = lst.join(story.select("filepath").distinct(), "filepath", "left_anti")

    if dest_path_mask:
        subdir = render_mask(dest_path_mask, lst.columns)
    else:
        # default: preserve the relative directory; a file directly in
        # base has no '/' so the strip leaves relpath unchanged — blank
        # it. (Custom masks skip this guard: a rendered value that
        # happens to EQUAL the relpath is still a real directory.)
        subdir = F.regexp_replace("relpath", r"/[^/]*$", "")
        subdir = F.when(subdir == F.col("relpath"), F.lit("")).otherwise(subdir)
    name = render_mask(rename_mask, lst.columns) if rename_mask else F.col("filename")
    rel_target = F.concat_ws("/", F.nullif(subdir, F.lit("")), name)

    if segmented_by:
        seg = F.pmod(F.xxhash64(*segmented_by), F.lit(len(destinations))).cast("int")
        dests = F.element_at(
            F.array(*[F.lit(d.rstrip("/")) for d in destinations]), seg + F.lit(1)
        )
        dest_col = F.array(F.concat(dests, F.lit("/"), rel_target))
    else:
        dest_col = F.array(
            *[
                F.concat(F.lit(d.rstrip("/") + "/"), rel_target)
                for d in destinations
            ]
        )

    plan = lst.select("filepath", "filesize", dest_col.alias("dests"))
    if story_dests is not None:
        plan = (
            plan.join(story_dests, "filepath", "left")
            .withColumn(
                "dests",
                F.array_except(
                    "dests", F.coalesce("_done", F.array().cast("array<string>"))
                ),
            )
            .filter(F.size("dests") > 0)
            .drop("_done")
        )
    plan = plan.repartition(max(spark.sparkContext.defaultParallelism, 1), "filepath")

    attempts_n, sleep_s, do_delete = int(number_attempts), float(time_between_attempts), bool(delete_source)
    src_spec, dst_spec = src_manager, dest_manager

    def execute(batches):
        import time as _t

        import pandas as pd

        # one connection pair per task (reference: FileCopier's
        # per-thread manager clones); the copy itself is
        # write-to-dot-temp + rename in EVERY backend, so a reader (or
        # a crash) never observes a torn destination file. Stale temps
        # ('.<name>.__copying_<pid>') match no ordinary mask and clean
        # up via clean_files(mask='.*__copying_*').
        with build_manager(src_spec) as src, build_manager(dst_spec) as dst:
            for pdf in batches:
                rows = []
                for fp, size, dests in zip(pdf["filepath"], pdf["filesize"], pdf["dests"]):
                    all_ok = True
                    for dest in dests:
                        attempt, err = 0, None
                        while attempt < attempts_n:
                            attempt += 1
                            try:
                                src.copy_to(fp, dst, dest)
                                err = None
                                break
                            except Exception as e:  # transient errors retry (OSError, ftplib/ssh errors)
                                err = f"{type(e).__name__}: {e}"
                                if attempt < attempts_n:
                                    # a dropped control connection would
                                    # otherwise poison every remaining
                                    # attempt (connect() is a no-op on a
                                    # live handle) — drop both sessions so
                                    # the next attempt reconnects lazily
                                    for m in (src, dst):
                                        try:
                                            m.close()
                                        except Exception:
                                            pass
                                    _t.sleep(sleep_s)
                        ok = err is None
                        all_ok = all_ok and ok
                        rows.append(
                            {"filepath": fp, "dest": dest, "bytes": int(size),
                             "attempts": attempt, "ok": ok, "error": err}
                        )
                    if do_delete and all_ok:
                        try:
                            src.delete(fp)
                        except Exception:
                            pass  # already gone — move is idempotent
                yield pd.DataFrame(
                    rows, columns=["filepath", "dest", "bytes", "attempts", "ok", "error"]
                )

    return _run_eager(plan.mapInPandas(execute, parse_ddl(COPY_RESULT_DDL)), status_dir)


def _run_eager(df: DataFrame, status_dir: str | None = None) -> DataFrame:
    """Execute a side-effectful file-operation plan exactly once, NOW.

    A lazy return would (a) do nothing until the caller happens to run
    an action and (b) redo every copy/delete on each subsequent action
    (mapInPandas re-executes per job). The results are written to a
    DURABLE temp parquet dir and the return value is a read of that:
    persist() would pin them too, but a lost cache block (executor
    death) silently recomputes — and recomputing a copy/delete after
    delete_source already removed the files re-reports moved files as
    failures. A parquet read can only ever re-read bytes, never re-run
    the I/O. The status stays distributed (never collected to the
    driver — a million-file run returns a million status rows)."""
    import atexit
    import shutil
    import tempfile

    spark = df.sparkSession
    if status_dir is None:
        # local-mode default. On a MULTI-MACHINE cluster pass
        # status_dir= (all file-op entry points forward it): executors
        # write their part files relative to the cluster's default FS,
        # so the directory must live on storage every node shares
        # (HDFS/S3/NFS) — a driver-local temp dir is only shared in
        # local mode.
        status_dir = tempfile.mkdtemp(prefix="getl_spark_filestatus_")
        atexit.register(shutil.rmtree, status_dir, ignore_errors=True)
    out_dir = status_dir
    df.write.mode("overwrite").parquet(out_dir)
    # explicit schema: an all-skipped run writes zero part files and a
    # bare read of the empty dir cannot infer one
    return spark.read.schema(df.schema).parquet(out_dir)


def process_files(
    spark: SparkSession,
    base_dir: str,
    mask: str,
    fn,
    output_ddl: str,
    story: DataFrame | None = None,
    files: DataFrame | None = None,
    manager: dict | None = None,
    status_dir: str | None = None,
) -> DataFrame:
    """FileProcessing: run a user function on every matched file,
    distributed (proc/FileProcessing.groovy — getl's per-file closure
    with the attrs of the listing row).

    ``fn(row: dict) -> dict | list[dict] | None`` receives one listing
    row (filepath + built-ins + mask variables, plain Python values)
    per file on an executor and returns output row(s) conforming to
    ``output_ddl`` (None -> file skipped). A two-argument ``fn(row,
    mgr)`` additionally receives the task's connected FileManager
    (getl hands its processing closure the manager the same way), so
    the user code reads remote files without its own connection
    plumbing. Arrow-batched around the per-file calls; the function
    itself is user I/O (that is the point of the operator), so keep
    byte-heavy work inside it. Executes eagerly, exactly once per
    file — like copy/clean, a user fn that archives or deletes must
    not rerun on every action."""
    import inspect

    import pandas as pd

    lst = (
        files
        if files is not None
        else list_files(spark, base_dir, mask, manager=manager)
    )
    if story is not None:
        lst = lst.join(story.select("filepath").distinct(), "filepath", "left_anti")
    schema = parse_ddl(output_ddl)
    out_cols = [f.name for f in schema.fields]
    mgr_spec = manager
    wants_mgr = len(inspect.signature(fn).parameters) >= 2

    def execute(batches):
        with build_manager(mgr_spec) as m:
            for pdf in batches:
                rows = []
                for rec in pdf.to_dict("records"):
                    res = fn(rec, m) if wants_mgr else fn(rec)
                    if res is None:
                        continue
                    rows.extend(res if isinstance(res, list) else [res])
                yield pd.DataFrame(rows, columns=out_cols)

    return _run_eager(
        lst.repartition(max(spark.sparkContext.defaultParallelism, 1)).mapInPandas(
            execute, schema
        ),
        status_dir,
    )


def clean_files(
    spark: SparkSession,
    base_dir: str,
    mask: str,
    older_than_ts: float | None = None,
    story: DataFrame | None = None,
    files: DataFrame | None = None,
    manager: dict | None = None,
    status_dir: str | None = None,
) -> DataFrame:
    """FileCleaner: distributed removal of files matching ``mask``
    (optionally only those modified before ``older_than_ts`` unix
    seconds, or only those recorded in ``story`` — clean exactly what
    a copier run has safely landed). Returns (filepath, ok, error).
    ``manager`` is an fsmanagers spec dict (None = local POSIX)."""
    import pandas as pd

    lst = (
        files
        if files is not None
        else list_files(spark, base_dir, mask, manager=manager)
    )
    if older_than_ts is not None:
        lst = lst.filter(F.col("filedate").cast("double") < float(older_than_ts))
    if story is not None:
        lst = lst.join(story.select("filepath").distinct(), "filepath", "left_semi")
    mgr_spec = manager

    def execute(batches):
        with build_manager(mgr_spec) as m:
            for pdf in batches:
                rows = []
                for fp in pdf["filepath"]:
                    try:
                        m.delete(fp)
                        rows.append({"filepath": fp, "ok": True, "error": None})
                    except Exception as e:
                        rows.append(
                            {"filepath": fp, "ok": False, "error": f"{type(e).__name__}: {e}"}
                        )
                yield pd.DataFrame(rows, columns=["filepath", "ok", "error"])

    return _run_eager(
        lst.select("filepath")
        .repartition(max(spark.sparkContext.defaultParallelism, 1))
        .mapInPandas(execute, parse_ddl("filepath string, ok boolean, error string")),
        status_dir,
    )
