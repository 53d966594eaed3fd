"""MERGE INTO builder — bucket-pruned copy-on-write upsert.

API mirrors Iceberg/Delta's merge builder::

    (table.merge(source_df)
          .on(["repo", "path"])
          .when_matched_delete("s.op = 'D'")
          .when_matched_update()
          .when_not_matched_insert("s.op <> 'D'")
          .idempotency(pipeline="tail", epoch=k)
          .execute(spark))

Reference parity: getl's row-wise MERGE ``openWrite(operation: MERGE)``
(/root/reference/src/main/groovy/getl/jdbc/JDBCDriver.groovy:1795-2006)
and set-based ``unionDataset``/``unionDatasetMerge`` (:2160-2268) —
both become one declarative join + bucket overwrite here; the extra
``condition`` ANDed into the ON clause (:2164) maps to the per-clause
condition strings.

Physical plan at scale:
1. Touched buckets are computed from the source keys (a partial-agg
   distinct over <= num_buckets values — tiny shuffle).
2. Only those buckets' data files are scanned (manifest pruning);
   at 100 TB this turns a full-table rewrite into a rewrite of the
   few TB that actually changed.
3. The join is a full_outer on the merge keys; AQE handles skew
   (skew-join splitting) and picks broadcast when the source slice is
   small. Both sides are effectively co-partitioned by bucket.
4. Changed buckets are rewritten; unchanged files carry forward by
   reference. Commit is O(metadata).

Exactly-once: ``idempotency(pipeline, epoch)`` consults the table's
``watermark.<pipeline>`` property (stamped in the same atomic commit
as the data) — re-applying an already-committed epoch is a no-op,
the CopyTest 81->0 pattern
(/root/reference/src/test/groovy/getl/lang/CopyTest.groovy:156-176).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.observation import Observation


class MergeValidationError(RuntimeError):
    """A post-write invariant check failed; the merge was aborted
    before commit (no snapshot was produced, fresh files removed)."""


class MergeBuilder:
    def __init__(self, table, source: DataFrame):
        self.table = table
        self.source = source
        self._keys: list[str] = []
        self._matched_delete = None  # condition str/Column or False
        self._matched_update = None  # (set_map|None, condition)
        self._not_matched_insert = None  # (values|None, condition)
        self._pipeline: str | None = None
        self._epoch: int | None = None
        self._summary: dict = {}
        self._touched: list[int] | None = None
        self._expected_src_rows: int | None = None

    def on(self, keys: list[str]) -> "MergeBuilder":
        self._keys = list(keys)
        return self

    def when_matched_delete(self, condition: str | None = None) -> "MergeBuilder":
        self._matched_delete = condition if condition is not None else "true"
        return self

    def when_matched_update(self, set: dict | None = None, condition: str | None = None) -> "MergeBuilder":
        self._matched_update = (set, condition if condition is not None else "true")
        return self

    def when_not_matched_insert(self, condition: str | None = None, values: dict | None = None) -> "MergeBuilder":
        self._not_matched_insert = (values, condition if condition is not None else "true")
        return self

    def idempotency(self, pipeline: str, epoch: int) -> "MergeBuilder":
        self._pipeline, self._epoch = pipeline, int(epoch)
        return self

    def touched_buckets(self, buckets: list[int]) -> "MergeBuilder":
        """Caller already knows the touched partition buckets (e.g. from
        a lineage aggregation over the same batch) — skip the
        discovery job."""
        self._touched = [int(b) for b in buckets]
        return self

    def expect_source_rows(self, n: int) -> "MergeBuilder":
        """Post-write invariant: the merge must consume exactly ``n``
        source rows, observed on the write action itself (zero extra
        jobs — guide §1.2: don't add passes for checks a running pass
        can carry). A mismatch aborts before commit with
        :class:`MergeValidationError` so the caller can fall back to a
        slower-but-safe plan. Used by CDCPipeline's broadcast LWW fast
        path, whose precondition is one winner row per key."""
        self._expected_src_rows = int(n)
        return self

    def with_summary(self, summary: dict) -> "MergeBuilder":
        self._summary.update(summary)
        return self

    # ------------------------------------------------------------------ exec
    def execute(self, spark: SparkSession, max_conflict_retries: int = 5) -> dict:
        """Run the merge; on a genuine same-bucket commit conflict
        (another writer rewrote one of our buckets first — disjoint
        buckets rebase without conflict at the commit layer), refresh
        the table and RE-EXECUTE the whole merge against the new
        snapshot: the join re-reads the winner's state, and the
        seq-guarded arms keep the outcome convergent. The optimistic-
        concurrency retry Iceberg performs, at the operation level."""
        from getl_spark.lake.table import CommitConflict

        for attempt in range(max_conflict_retries + 1):
            try:
                return self._execute_once(spark)
            except CommitConflict:
                if attempt == max_conflict_retries:
                    raise
                self.table.refresh()

    def _execute_once(self, spark: SparkSession) -> dict:
        t = self.table
        if not self._keys:
            # fall back to the table's declared primary key (getl
            # Field.isKey parity — stored by create_table)
            pk = t.properties.get("primary.key")
            if pk:
                self._keys = [k.strip() for k in pk.split(",")]
        if not self._keys:
            raise ValueError("merge requires .on(keys) or a table primary key")
        if self._pipeline is not None:
            wm = t.properties.get(f"watermark.{self._pipeline}")
            if wm is not None and int(wm) >= self._epoch:
                return {"skipped": True, "reason": f"epoch {self._epoch} <= watermark {wm}"}

        spec = t.partition_spec
        src = self.source
        if spec.kind == "bucket":
            if self._touched is not None:
                touched = self._touched
            else:
                touched = [
                    r[0]
                    for r in src.select(spec.bucket_expr().alias("_b")).distinct().collect()
                ]
            if not touched:
                return {"skipped": True, "reason": "empty source"}
            tgt = t.read(spark, buckets=touched)
        else:
            touched = None
            tgt = t.read(spark)

        sch = t.schema()  # parsed once: schema() rebuilds from JSON per call
        tcols = sch.fieldNames()
        scols = set(src.columns)

        # Pick the upsert join strategy deliberately (guide §3.1), never
        # by estimate: Catalyst's size estimate for a source that is
        # itself a join output can be wildly low, making AQE broadcast
        # a multi-hundred-MB side (measured: a 15s driver-side
        # hash-relation build per epoch). Default is a shuffled-hash
        # join BUILT ON THE SOURCE side: the epoch slice is the smaller
        # side of a steady-state CDC merge, its per-partition build is
        # bounded by epoch_size / shuffle partitions, and skipping both
        # SMJ sorts saved ~12% of replay wall at bench scale. AQE skew
        # splitting still applies. Tables whose epochs rival the target
        # in size (or with single giant keys) can pin
        # properties["merge.join"]="merge" to force sort-merge, which
        # spills gracefully.
        join_hint = t.properties.get("merge.join", "shuffle_hash")
        if join_hint not in ("shuffle_hash", "merge"):
            raise ValueError("merge.join must be 'shuffle_hash' or 'merge'")
        if join_hint == "shuffle_hash":
            tj = tgt.withColumn("_t_ex", F.lit(True)).alias("t")
            sj = src.withColumn("_s_ex", F.lit(True)).hint("shuffle_hash").alias("s")
        else:
            tj = tgt.withColumn("_t_ex", F.lit(True)).hint("merge").alias("t")
            sj = src.withColumn("_s_ex", F.lit(True)).hint("merge").alias("s")
        cond = None
        for k in self._keys:
            c = F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}"))
            cond = c if cond is None else (cond & c)
        j = tj.join(sj, cond, "full_outer")

        t_ex = F.coalesce(F.col("t._t_ex"), F.lit(False))
        s_ex = F.coalesce(F.col("s._s_ex"), F.lit(False))
        matched = t_ex & s_ex

        false_lit = F.lit(False)

        def cond_expr(c: str):
            # three-valued logic guard: a clause condition evaluating
            # to NULL must mean "clause does not fire", never "drop
            # the row silently" (the final filter would exclude a
            # NULL _del row without counting it as deleted)
            return F.coalesce(F.expr(c), F.lit(False))

        del_hit = (matched & cond_expr(self._matched_delete)) if self._matched_delete else false_lit
        if self._matched_update:
            upd_set, upd_cond = self._matched_update
            upd_hit = matched & cond_expr(upd_cond) & ~del_hit
        else:
            upd_set, upd_hit = None, false_lit
        if self._not_matched_insert:
            ins_vals, ins_cond = self._not_matched_insert
            ins_hit = (~t_ex) & s_ex & cond_expr(ins_cond)
        else:
            ins_vals, ins_hit = None, false_lit

        def src_value(c: str, override: dict | None):
            if override and c in override:
                v = override[c]
                return F.expr(v) if isinstance(v, str) else v
            if c in scols:
                return F.col(f"s.{c}")
            return F.lit(None).cast(sch[c].dataType)

        def upd_value(c: str):
            """Delta/Iceberg semantics: with a set map, only the named
            columns change — everything else RETAINS the target value
            (a partial update must not clobber unmentioned columns with
            source values or NULLs). Without a set map it's a full-row
            update from the source."""
            if upd_set is None:
                return src_value(c, None)
            if c in upd_set:
                v = upd_set[c]
                return F.expr(v) if isinstance(v, str) else v
            return F.col(f"t.{c}")

        out_cols = []
        for c in tcols:
            upd_v = upd_value(c)
            ins_v = src_value(c, ins_vals)
            out_cols.append(
                F.when(upd_hit, upd_v)
                .when(ins_hit, ins_v)
                .otherwise(F.col(f"t.{c}"))
                .cast(sch[c].dataType)
                .alias(c)
            )

        obs = Observation()
        flagged = j.withColumn("_del", del_hit).withColumn("_upd", upd_hit).withColumn(
            "_ins", ins_hit
        ).withColumn("_keep_t", t_ex)
        flagged = flagged.observe(
            obs,
            F.sum(F.col("_del").cast("long")).alias("deleted"),
            F.sum(F.col("_upd").cast("long")).alias("updated"),
            F.sum(F.col("_ins").cast("long")).alias("inserted"),
            F.sum(s_ex.cast("long")).alias("src_rows"),
        )
        result = flagged.filter((~F.col("_del")) & (F.col("_keep_t") | F.col("_ins"))).select(
            *out_cols
        )

        props = (
            {f"watermark.{self._pipeline}": str(self._epoch)} if self._pipeline is not None else None
        )
        # idempotency must hold through the commit layer's REBASE paths
        # too (a disjoint-bucket rebase does not re-execute the merge):
        # the precondition re-checks the watermark on every attempt
        pre = None
        if self._pipeline is not None:
            wm_key, epoch = f"watermark.{self._pipeline}", self._epoch

            def pre(meta):
                wm = meta["properties"].get(wm_key)
                return wm is None or int(wm) < epoch

        summary = dict(self._summary)
        if self._epoch is not None:
            summary["epoch"] = self._epoch
            summary["pipeline"] = self._pipeline
        from getl_spark.lake.table import CommitSkipped

        validate = None
        if self._expected_src_rows is not None:
            expected = self._expected_src_rows

            def validate(_new_files):
                # the write action is complete here, so the observed
                # metrics are available without any extra job
                got = obs.get.get("src_rows")
                got = int(got) if got is not None else 0
                if got != expected:
                    raise MergeValidationError(
                        f"merge consumed {got} source rows, expected {expected}"
                    )

        try:
            if touched is not None:
                # overwrite_buckets deletes its fresh files on abort
                snap = t.overwrite_buckets(
                    result, touched, summary, props, precondition=pre, validate=validate
                )
            else:
                new = t._write_data_files(result.select(*tcols), "merge")
                try:
                    if validate is not None:
                        validate(new)
                    snap = t._commit_snapshot("overwrite", new, summary, props, precondition=pre)
                except Exception:
                    import os

                    for f in new:  # never became visible — don't leak orphans
                        try:
                            os.remove(os.path.join(t.location, f["path"]))
                        except OSError:
                            pass
                    raise
        except CommitSkipped:
            return {
                "skipped": True,
                "reason": f"epoch {self._epoch} committed concurrently",
            }
        # src_rows is an internal validation metric, not part of the
        # public stats contract
        stats = {k: v for k, v in obs.get.items() if k != "src_rows"}
        return {"snapshot": snap, "stats": stats, "skipped": False, "touched_buckets": touched}
