"""Incremental near-dedup — the story pattern applied to dedup.

No 100-TB pipeline re-dedups its corpus from scratch per ingest: the
MinHash LSH index rows of every document ever seen persist in a lake
table, and each new batch is (a) banded once, (b) joined against the
standing index + itself for candidates, (c) Jaccard-verified, (d)
appended to the index. Cost per batch is O(new docs + touched
buckets), not O(corpus) — and as of round 6 the implementation
actually delivers that bound on the contract path:

- **Story filter / monotonic guard** read NO data at all: every
  append stamps ``max_doc_id`` into its snapshot summary, so the
  high-watermark is driver-side metadata (the same mechanism as the
  CDC checkpoint). Already-committed ids are skipped by
  ``id > watermark`` — zero Spark jobs. A replayed batch whose ids
  sit below the watermark is distinguished from a monotonicity
  violation by a membership probe against the docs table pruned to
  the batch ids' storage buckets (manifest pruning; runs only on
  replays).
- **Candidate join** touches only TOUCHED buckets: the new batch's
  distinct ``(band_id, band_hash)`` set is broadcast and the stored
  index is left-semi filtered on it — a map-side filter, so the
  stored side is never shuffled — after a manifest-level prune to
  the storage buckets those keys hash to. The cap window and the
  pair join then see O(new + touched-bucket) rows. Per-bucket counts
  stay exact because the semi filter keeps WHOLE buckets (the filter
  key IS the bucket key), so no separate bucket-stats table is
  needed for `_cap_buckets` correctness.
- **Crash heal** is metadata-triggered: each batch carries a token
  stamped into every table's summary; a docs/winnow snapshot whose
  token never reached the index table marks a crashed tail, and only
  then does the heal anti-join run — against a bucket-pruned,
  id-range-filtered read. Tails resolve by TOKEN only: either the
  crash was between one call's appends (same token reaches the index
  on replay) or a replay whose input span covers the tail's inferred
  id range stamps it into the index commit's ``heals`` list. The
  index watermark moving past a tail's ids proves nothing — a later
  batch commits without reprocessing the tail — so the story filter
  treats ids inside a pending tail's range as REPROCESSABLE (they
  pass the docs-membership probe yet were never judged). The hot
  path runs no heal scan at all.

Reference analog: getl's story-table exactly-once skip
(/root/reference/src/main/groovy/getl/files/Manager.groovy:936-948)
applied to content identity instead of file names.

Equality contract (pinned by test): with ingest-ordered doc ids
(every new batch's ids are larger than all stored ids) and
``max_bucket=None``, the union of ``add_batch`` outputs over any
batch split equals the one-shot ``near_dedup_minhash(union,
transitive=False)`` kept set — because the pairwise drop rule ("drop
the higher id of each verified pair") never lets a later doc evict an
earlier one, and the banded candidate join over (stored + new) index
rows reproduces exactly the one-shot join's pairs that touch a new
doc. Dropped docs' signatures stay in the index on purpose: the
one-shot pair set includes pairs whose lower id was itself dropped,
so the incremental index must too. The touched-bucket pruning does
not perturb this: a pair whose higher id is new lives, by
definition, in a bucket the new batch touches, and the semi filter
keeps every stored member of each touched bucket.

With ``max_bucket`` set, exact equality weakens to a one-sided
guarantee: incremental is STRICTLY MORE AGGRESSIVE (a pair is judged
when its higher id arrives, before the bucket can cross the cap, so
incremental finds every pair the one-shot capped run finds, plus
pairs whose bucket only later became degenerate). The cap is part of
the store's pinned config, so batches can't silently mix caps.

``require_monotonic=False`` is the compatibility escape hatch: ids
below the watermark are then legitimate new docs, so the story
filter falls back to an anti-join against the standing index's id
column (range-pruned to the batch's id span, but still a scan of the
index id column — linear, documented). The O(new + touched) bound
is a property of the contract path, as is batch==one-shot equality.

Stores written before round 6 lack the summary stamps; they are
detected (any data snapshot missing ``max_doc_id``/``batch``) and
serviced through the same legacy scan path.

Maintenance & retention contract: an always-on ingest appends a file
per touched bucket and a snapshot per batch, forever. ``compact()``
folds small files bucket-locally, ``expire(keep_last)`` bounds
snapshot metadata, and ``prune_dropped(before_doc_id)`` reclaims the
band rows / texts / fingerprints of long-dropped docs (their verdict
rows are kept, so replay recovery still works). All three stamp a
maintenance marker into their snapshot summaries so the watermark
reader skips them — they never flip a store onto the legacy path.
Retention defaults keep everything: dropped docs' signatures are part
of the equality contract above, so pruning them is an explicit,
documented trade (see :meth:`DedupStore.prune_dropped`). ``expire``
must keep at least the deepest crash-replay window you need — a
crashed tail is only healable while its batch stamps are visible —
and if every stamped append expires, the store safely (if slowly)
falls back to the membership anti-join path rather than trusting a
blank watermark.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from getl_spark.functions.dedupe import (
    _cap_buckets,
    jaccard_verify,
    minhash_banded_rows,
)
from getl_spark.lake import LakeCatalog, PartitionSpec
from getl_spark.schema import parse_ddl


def _is_maintenance(summ: dict) -> bool:
    """Compaction / retention-prune / delete snapshots rewrite or drop
    EXISTING rows only — they introduce no new doc ids, so the
    append-summary watermarks stay valid across them and they must not
    flip the store onto the legacy scan path."""
    return bool(
        summ.get("compaction") or summ.get("maintenance") or summ.get("delete_where")
    )


def _data_summaries(table) -> list[dict]:
    """Summaries of snapshots that added rows (appends with content) —
    plus ZERO-row appends that carry a ``batch`` token: a judged batch
    whose banded/vector rows happen to be empty still stamps its done
    marker and ``heals`` claims through its summary, and skipping it
    would leave its tail pending (and heal scans running) forever
    (ADVICE r7 #3). Creation, unstamped empty-replay, and maintenance
    snapshots don't count."""
    out = []
    for snap in table.meta["snapshots"]:
        summ = snap.get("summary") or {}
        if _is_maintenance(summ):
            continue
        if snap.get("operation") == "append" and (
            summ.get("added_rows", 0) > 0 or "batch" in summ
        ):
            out.append(summ)
    return out


def _watermark(table, key: str) -> tuple[int | None, bool]:
    """(high-watermark, modern) from snapshot summaries — no scan.

    ``modern`` is False when any data-bearing snapshot lacks the
    watermark/token stamps (store written before round 6, or the
    table was compacted by a rewrite that added rows) — callers then
    fall back to the legacy scan path.
    """
    hi, modern = None, True
    for snap in table.meta["snapshots"]:
        summ = snap.get("summary") or {}
        if _is_maintenance(summ):
            continue
        # zero-row appends count when stamped (see _data_summaries):
        # their batch WAS judged, so the watermark must advance past it
        if summ.get("added_rows", 0) <= 0 and "batch" not in summ:
            continue
        if snap.get("operation") != "append":
            modern = False
            continue
        m = summ.get(key)
        if m is None or "batch" not in summ:
            modern = False
            continue
        m = int(m)
        if hi is None or m > hi:
            hi = m
    return hi, modern


def _pending_tails(prior, done, key: str) -> list[dict]:
    """Data summaries committed to ``prior`` whose batch token never
    reached ``done`` — crashed batches whose replay hasn't completed
    yet. Pure metadata.

    A tail is resolved by TOKEN only: either its own token reached
    ``done`` (the crash happened between the two appends of one call),
    or a later ``done`` append lists it in its ``heals`` stamp (the
    replay that reprocessed the crashed batch ran under a fresh token
    and declares which tails it covered). The done-side watermark is
    deliberately NOT consulted: a later batch's commit advances the
    watermark past a crashed tail's ids without reprocessing them, so
    "done_hi >= tail hi" proves nothing (the round-6 code inferred
    resolution from exactly that and silently swallowed such tails on
    replay).

    Each tail carries the EXACT id ranges its append added: every
    stamped append records ``id_ranges`` — the driver-side list of
    ``[lo, hi]`` spans its effective (non-committed-before) ids
    occupied; usually one span, several when the append itself
    reprocessed earlier tails. Appends from round-6 stores lack the
    stamp; their single range is then inferred as ``(prev_hi, hi]``
    from the preceding data summaries' watermarks — a conservative
    superset, exact under the monotonic-id contract except that it
    may reach below the batch's true lo into id space no committed
    batch occupies (harmless: carving empty id space out of the
    membership probe changes nothing).
    """
    done_toks, stamped_committed = set(), []
    for s in _data_summaries(done):
        done_toks.add(s.get("batch"))
        done_toks.update(s.get("heals") or [])
        # STAMPED committed spans only — legacy inferred ranges are a
        # superset guess and must not shrink a tail (ADVICE r7 #1)
        stamped_committed.extend(s.get("id_ranges") or [])
    tails, prev_hi = [], None
    for s in _data_summaries(prior):
        tok = s.get("batch")
        hi = s.get(key)
        ranges = s.get("id_ranges")
        if ranges is None and hi is not None:
            lo = None if prev_hi is None else prev_hi + 1
            ranges = [[lo, int(hi)]]
        if hi is not None:
            hi = int(hi)
            prev_hi = hi if prev_hi is None else max(prev_hi, hi)
        if tok is None or tok in done_toks or not ranges:
            continue
        if stamped_committed:
            # A replay that only PARTIALLY covered this tail (crash,
            # then restart with a smaller epoch size) committed a SLICE
            # of its ids under its own token + id_ranges stamp. Those
            # ids are judged and done: subtract every stamped committed
            # span so (a) the reprocess carve-out shrinks to the truly
            # uncovered remainder — re-including them would re-append
            # their band/vector rows and break cap exactness — and (b)
            # a tail whose every range is covered resolves outright
            # instead of forcing heal scans on all future batches.
            shrunk = []
            for l, h in ranges:
                if h is None:
                    shrunk.append([l, h])
                    continue
                shrunk.extend(_subtract_ranges(l, h, stamped_committed))
            if not shrunk:
                continue  # fully covered by stamped commits — resolved
            ranges = shrunk
        tails.append({"batch": tok, "hi": hi, "ranges": ranges})
    return tails


def _reprocess_cond(tails: list[dict], id_expr):
    """Column predicate selecting ids inside any pending tail's id
    ranges — these LOOK committed to a membership probe against the
    tail's table but were never judged/marked done, so the story
    filter must treat them as reprocessable, not as replays. None when
    there are no usable tails."""
    cond = None
    for t in tails:
        for lo, hi in t["ranges"]:
            if hi is None:
                continue
            c = id_expr <= F.lit(int(hi))
            if lo is not None:
                c = c & (id_expr >= F.lit(int(lo)))
            cond = c if cond is None else (cond | c)
    return cond


def _overlapping(tails: list[dict], lo: int, hi: int) -> list[dict]:
    return [
        t for t in tails
        if any(
            h is not None and int(h) >= lo and (l is None or int(l) <= hi)
            for l, h in t["ranges"]
        )
    ]


def _healed_tokens(tails: list[dict], lo: int, hi: int) -> list[str]:
    """Tails whose every id range is fully covered by this batch's
    input span [lo, hi] — the replay contract resubmits whole batches,
    so span coverage is the metadata-only proxy for "this run
    reprocessed that crashed batch". Stamped as ``heals`` on the done
    table's append; a partially-covering run claims nothing and the
    tail stays pending (safe: its ranges keep being reprocessable)."""
    out = []
    for t in tails:
        # a legacy (round-6, unstamped) first-batch tail has lo=None —
        # its true lower edge is unknowable from metadata, so require
        # the batch to at least START at or below the tail's hi: a
        # disjoint higher batch (lo > hi) reprocesses none of the
        # tail's ids and must not claim it healed (the whole-batch
        # replay contract makes lo <= hi the honest metadata proxy)
        ok = all(
            h is not None
            and int(h) <= hi
            and (lo <= int(l) if l is not None else lo <= int(h))
            for l, h in t["ranges"]
        )
        if ok:
            out.append(t["batch"])
    return out


def _committed_ranges(done, key: str) -> list[list[int | None]]:
    """``[lo, hi]`` id spans the ``done`` table's data summaries claim
    as committed — stamped ``id_ranges`` where present, else inferred
    as ``(prev_hi, hi]`` like :func:`_pending_tails`. Pure metadata;
    used to stamp exact-gap ranges on the non-monotonic path."""
    out, prev_hi = [], None
    for s in _data_summaries(done):
        hi = s.get(key)
        ranges = s.get("id_ranges")
        if ranges is None and hi is not None:
            lo = None if prev_hi is None else prev_hi + 1
            ranges = [[lo, int(hi)]]
        if hi is not None:
            hi = int(hi)
            prev_hi = hi if prev_hi is None else max(prev_hi, hi)
        out.extend(ranges or [])
    return out


def _subtract_ranges(lo: int, hi: int, committed: list) -> list[list[int]]:
    """``[lo, hi]`` minus the committed spans — the exact id gaps a
    non-monotonic batch's surviving (anti-joined) rows can occupy.
    Stamping these instead of the raw hull keeps the ``id_ranges``
    contract (``ranges never claim committed ids``) on the
    require_monotonic=False path: a crash there must not leave a tail
    whose reprocess carve-out swallows other batches' committed ids."""
    spans = [[None if lo is None else int(lo), int(hi)]]
    for cl, ch in committed:
        if ch is None:
            continue
        ch = int(ch)
        cl = int(cl) if cl is not None else None
        nxt = []
        for sl, sh in spans:
            # sl None = unbounded below (legacy inferred tail range)
            if (sl is not None and ch < sl) or (cl is not None and cl > sh):
                nxt.append([sl, sh])
                continue
            if cl is not None and (sl is None or cl > sl):
                nxt.append([sl, min(sh, cl - 1)])
            if ch < sh:
                nxt.append([ch + 1, sh])
        spans = nxt
        if not spans:
            break
    return sorted(spans, key=lambda r: (r[0] is not None, r[0] or 0, r[1]))


def _effective_ranges(
    clipped: bool, lo_raw: int, hi_raw: int, watermark, tails: list[dict]
) -> list[list[int]]:
    """Driver-side ``[lo, hi]`` spans of the ids an add_batch call will
    actually process: the above-watermark span plus the slices of
    pending-tail ranges the input covers. Stamped as ``id_ranges`` so
    a crash after THIS append leaves a tail whose ranges never claim
    committed ids (a committed batch can sit between two pending
    tails — a single [min, max] span would swallow it)."""
    if not clipped:
        return [[int(lo_raw), int(hi_raw)]]
    out = []
    if hi_raw > watermark:
        out.append([int(watermark) + 1, int(hi_raw)])
    for t in _overlapping(tails, lo_raw, hi_raw):
        for l, h in t["ranges"]:
            if h is None or int(h) < lo_raw or (l is not None and int(l) > hi_raw):
                continue
            lo_eff = int(lo_raw) if l is None else max(int(l), int(lo_raw))
            out.append([lo_eff, min(int(h), int(hi_raw))])
    return sorted(out)


def _storage_buckets(df: DataFrame, table) -> list[int]:
    """Distinct storage buckets the rows of ``df`` hash to under the
    table's own partition transform — the driver-side input to
    ``table.read(buckets=...)`` manifest pruning (same mechanism as
    AnnIndex._buckets_for_cells). One small job over ``df``; at most
    ``num_buckets`` values come back."""
    spec = table.partition_spec
    assert spec.kind == "bucket"
    rows = df.select(spec.bucket_expr().cast("int").alias("_b")).distinct().collect()
    return sorted({int(r["_b"]) for r in rows})


def _plan_string(df: DataFrame) -> str:
    """Physical-plan text for a not-yet-executed DataFrame (used by
    the pruning assertions in tests); best-effort."""
    try:
        jqe = df._jdf.queryExecution()
        jvm = df.sparkSession._jvm
        mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
        return jqe.explainString(mode)
    except Exception:
        return ""


class DedupStore:
    """Persisted MinHash LSH index + document texts in a lake
    warehouse. One store per (num_hashes, bands, shingle_words,
    hash_fn, threshold) configuration — the parameters are fixed at
    creation and written into the index table's first snapshot summary
    so a mismatched reopen fails loudly instead of silently mixing
    incompatible signatures.

    ``num_buckets`` sizes the storage bucketing that manifest pruning
    keys on; at corpus scale it should be large enough that one
    batch's band keys touch a small fraction of buckets (thousands on
    a real cluster — default 64 here). Reopening an existing store
    keeps the table's own stored spec.

    After each ``add_batch`` call, ``last_batch_stats`` holds the
    pruning evidence for that batch: which story path ran, how many
    index files the candidate join read vs the table total, the
    physical plan of the stored-side semi filter, and whether a heal
    scan was needed.
    """

    def __init__(
        self,
        warehouse: str,
        num_hashes: int = 64,
        bands: int = 16,
        shingle_words: int = 3,
        threshold: float = 0.7,
        hash_fn: str = "xxhash64",
        max_bucket: int | None = None,
        num_buckets: int = 64,
        winnow: dict | None = None,
    ):
        self.cfg = {
            "num_hashes": int(num_hashes), "bands": int(bands),
            "shingle_words": int(shingle_words), "threshold": float(threshold),
            "hash_fn": hash_fn,
            "max_bucket": None if max_bucket is None else int(max_bucket),
            "winnow": None if winnow is None else {
                "k": int(winnow.get("k", 8)),
                "w": int(winnow.get("w", 4)),
                "min_shared": int(winnow.get("min_shared", 2)),
            },
        }
        self.max_bucket = max_bucket
        self.last_batch_stats: dict = {}
        cat = LakeCatalog(warehouse)
        self.index = cat.create_table(
            "_dedup_index",
            parse_ddl("doc_id bigint, band_id int, band_hash string"),
            PartitionSpec.bucket(num_buckets, "band_hash"),
            if_not_exists=True,
        )
        self.docs = cat.create_table(
            "_dedup_docs",
            parse_ddl("doc_id bigint, text string"),
            PartitionSpec.bucket(num_buckets, "doc_id"),
            if_not_exists=True,
        )
        # persisted VERDICTS: one row per dropped doc (and which lower
        # id it duplicated). Committed between the docs and index
        # appends, so by the time the index commit marks a batch done —
        # the point at which the story filter starts skipping its ids —
        # every verdict of that batch is durable, and a replayed epoch
        # can recover its kept set via :meth:`rejected_of` instead of
        # re-judging (the CDC pre-merge composition relies on this).
        self.rejects = cat.create_table(
            "_dedup_rejects",
            parse_ddl("doc_id bigint, dup_of bigint"),
            PartitionSpec.bucket(num_buckets, "doc_id"),
            if_not_exists=True,
        )
        # optional second candidate generator: winnowed (MOSS)
        # fingerprints catch shared boilerplate SPANS that global
        # Jaccard banding misses — complementary, same capped-equi-join
        # scale shape. Its index persists beside the MinHash one.
        self.winnow_index = None
        if self.cfg["winnow"] is not None:
            self.winnow_index = cat.create_table(
                "_dedup_winnow",
                parse_ddl("doc_id bigint, h bigint"),
                PartitionSpec.bucket(num_buckets, "h"),
                if_not_exists=True,
            )
        for snap in self.index.meta["snapshots"]:
            summ = snap.get("summary", {})
            if "num_hashes" not in summ:
                continue  # creation / unrelated snapshot
            mismatch = {
                k: (summ.get(k), self.cfg[k])
                for k in self.cfg
                if summ.get(k) != self.cfg[k]
            }
            if mismatch:
                raise ValueError(
                    f"DedupStore config mismatch vs existing index: {mismatch}"
                )
            break

    @classmethod
    def open(cls, warehouse: str) -> "DedupStore":
        """Reopen an existing store under its OWN stored configuration
        (every index append stamps the full cfg into its snapshot
        summary) — maintenance jobs (compact/expire/prune) shouldn't
        have to repeat ingest parameters they can get wrong. Raises if
        the warehouse has no ingested dedup index to read a spec from."""
        cat = LakeCatalog(warehouse)
        if not cat.table_exists("_dedup_index"):
            raise ValueError(f"no dedup store at {warehouse!r}")
        for snap in cat.load_table("_dedup_index").meta["snapshots"]:
            summ = snap.get("summary") or {}
            if "num_hashes" in summ:
                return cls(
                    warehouse,
                    num_hashes=summ["num_hashes"],
                    bands=summ["bands"],
                    shingle_words=summ["shingle_words"],
                    threshold=summ["threshold"],
                    hash_fn=summ["hash_fn"],
                    max_bucket=summ.get("max_bucket"),
                    winnow=summ.get("winnow"),
                )
        raise ValueError(
            f"dedup store at {warehouse!r} has no ingested batch to read "
            "its configuration from — pass the parameters explicitly"
        )

    def corpus_size(self) -> int:
        return self.docs.count_rows()

    def add_batch(
        self,
        spark: SparkSession,
        docs: DataFrame,
        text_col: str = "text",
        id_col: str = "doc_id",
        require_monotonic: bool = True,
    ) -> DataFrame:
        """Dedup ``docs`` against the standing corpus + themselves;
        persist their signatures; return the KEPT new docs (original
        columns). Re-submitting already-indexed ids is a no-op for
        them (story semantics). See the module docstring for the
        per-batch cost contract and how each scan is pruned."""
        self.index.refresh()
        self.docs.refresh()
        self.rejects.refresh()
        if self.winnow_index is not None:
            self.winnow_index.refresh()
        stats = self.last_batch_stats = {"heal": False}
        have_index = self.index.count_rows() > 0  # manifest stats, no scan
        hi_index, modern = _watermark(self.index, "max_doc_id")
        if modern:
            _, modern = _watermark(self.docs, "max_doc_id")
        if have_index and hi_index is None:
            # rows exist but no stamped append snapshot is visible —
            # expire_snapshots dropped them all. The fast path would
            # skip the story filter and re-ingest replayed ids; fall
            # back to the true membership anti-join instead.
            modern = False
        fast = modern and require_monotonic

        did = F.col(id_col).cast("bigint")
        row = docs.agg(F.min(did).alias("lo"), F.max(did).alias("hi")).collect()[0]
        lo_raw, hi_raw = row["lo"], row["hi"]
        if lo_raw is None:  # empty input
            stats["story_path"] = "empty"
            return docs

        d = docs
        tails = _pending_tails(self.docs, self.index, "max_doc_id") if modern else []
        reproc = _reprocess_cond(tails, did)
        if have_index and fast:
            stats["story_path"] = "watermark"
            if hi_index is not None and lo_raw <= hi_index:
                # replay (ids already committed), a crashed tail being
                # replayed (ids committed to DOCS but never judged —
                # their batch token never reached the index), or a
                # monotonicity violation (ids never seen). The
                # membership probe tests the docs table (bucketed by
                # doc_id, prunable) while the done marker is the INDEX
                # commit, so ids inside a pending tail's range pass the
                # probe despite being un-judged — they are carved out
                # as reprocessable BEFORE the probe and kept in ``d``.
                committed = did <= hi_index
                if reproc is not None:
                    committed = committed & ~reproc
                old_ids = d.filter(committed).select(did.alias("doc_id"))
                db = _storage_buckets(old_ids, self.docs)
                if db:
                    present = self.docs.read(spark, buckets=db).select("doc_id")
                    # prune_dropped reclaims dropped docs' rows from the
                    # docs table but KEEPS their verdict rows — a
                    # replayed batch containing pruned ids must still
                    # read as committed, so the probe accepts ids from
                    # either table (both bucketed by doc_id)
                    if self.rejects.count_rows() > 0:
                        rb = _storage_buckets(old_ids, self.rejects)
                        present = present.unionByName(
                            self.rejects.read(spark, buckets=rb).select("doc_id")
                        )
                    missing = (
                        old_ids.join(present, "doc_id", "left_anti").limit(1).collect()
                    )
                    if missing:
                        raise ValueError(
                            f"add_batch: new ids must exceed all stored ids for the "
                            f"batch==incremental equality contract (new min {lo_raw} "
                            f"<= stored max {hi_index}); pass "
                            "require_monotonic=False to override"
                        )
                keep = did > hi_index
                if reproc is not None:
                    keep = keep | reproc
                d = d.filter(keep)
            if (
                hi_index is not None
                and hi_raw <= hi_index
                and not _overlapping(tails, lo_raw, hi_raw)
            ):
                # full replay of committed batches, no crashed tail in
                # range — story no-op (d is already filtered empty)
                stats["story_path"] = "watermark-replay-noop"
                return d
        anti_span = None
        if have_index and not fast:
            # legacy / non-monotonic path: true membership anti-join,
            # range-pruned to the batch's id span (equality join — ids
            # outside [lo, hi] can't match; still a scan of the index
            # id column, see module docstring)
            stats["story_path"] = "anti-join"
            indexed_ids = (
                self.index.read(spark)
                .select(F.col("doc_id"))
                .filter((F.col("doc_id") >= lo_raw) & (F.col("doc_id") <= hi_raw))
                .distinct()
                .withColumnRenamed("doc_id", "_did")
            )
            d = d.withColumn("_did", did).join(indexed_ids, "_did", "left_anti").drop("_did")
            row = d.agg(F.min(did).alias("lo"), F.max(did).alias("hi")).collect()[0]
            anti_span = (row["lo"], row["hi"])
            if require_monotonic:
                hi = hi_index
                if not modern:
                    hi = self.index.read(spark).agg(F.max("doc_id")).collect()[0][0]
                lo = anti_span[0]
                if lo is not None and hi is not None and lo <= hi:
                    raise ValueError(
                        f"add_batch: new ids must exceed all stored ids for the "
                        f"batch==incremental equality contract (new min {lo} <= "
                        f"stored max {hi}); pass require_monotonic=False to "
                        "override"
                    )
        elif not have_index:
            stats["story_path"] = "first-batch"

        batch_tok = uuid.uuid4().hex[:12]
        clipped = fast and hi_index is not None and lo_raw <= hi_index
        if anti_span is not None:
            # exact-gap stamp: the anti-join already removed committed
            # ids, but the SURVIVORS' hull may still straddle other
            # batches' committed spans (an unordered batch can wrap
            # around them) — subtract the done table's committed ranges
            # so a crash here never leaves a tail claiming them
            eff = (
                []
                if anti_span[0] is None
                else _subtract_ranges(
                    anti_span[0], anti_span[1],
                    _committed_ranges(self.index, "max_doc_id"),
                )
            )
        else:
            eff = _effective_ranges(clipped, lo_raw, hi_raw, hi_index, tails)
        # heal anti-joins below filter to [batch_lo, batch_hi] — must
        # cover reprocessed tail ids, which sit below the watermark
        batch_lo = min((r[0] for r in eff), default=lo_raw)
        batch_hi = hi_raw
        stamp = {
            "op": "add_batch", "batch": batch_tok,
            "max_doc_id": int(batch_hi), "id_ranges": eff,
        }
        healed = _healed_tokens(tails, int(lo_raw), int(hi_raw))
        if healed:
            # The heals stamp is a metadata CLAIM derived from input
            # SPAN coverage. Verify it against rows before trusting it:
            # the crashed batch's ids are durable in the docs table
            # (its append succeeded), so any of them missing from this
            # input means the whole-batch replay contract was violated
            # — stamping the heal would permanently mark un-judged ids
            # as committed (silent under-dedup, ADVICE r7 #2). Drop
            # ALL heal claims in that case: the tails stay pending
            # (still reprocessable — safe) and a conforming replay
            # heals them later. Runs only on the rare crash-replay path.
            claim_tails = [t for t in tails if t["batch"] in set(healed)]
            claim_cond = _reprocess_cond(claim_tails, F.col("doc_id"))
            if claim_cond is not None:
                stored_tail_ids = (
                    self.docs.read(spark).select("doc_id").filter(claim_cond)
                )
                missing = stored_tail_ids.join(
                    docs.select(did.alias("doc_id")), "doc_id", "left_anti"
                ).limit(1).collect()
                if missing:
                    stats["heal_claims_dropped"] = list(healed)
                    healed = []
        if healed:
            stats["healed_tails"] = list(healed)

        new_banded = minhash_banded_rows(
            d, text_col, id_col,
            self.cfg["num_hashes"], self.cfg["bands"],
            self.cfg["shingle_words"], self.cfg["hash_fn"],
        ).select(did.alias("doc_id"), "band_id", "band_hash").persist()
        new_ids = new_banded.select("doc_id").distinct()

        if have_index:
            # touched-bucket pruning: manifest-prune the scan to the
            # storage buckets the new band keys hash to, then broadcast
            # the key set and left-semi filter map-side — the stored
            # side is never shuffled, and the cap window + pair join
            # below see only touched buckets' rows (whole buckets, so
            # the cap's per-bucket counts stay exact).
            new_keys = new_banded.select("band_id", "band_hash").distinct()
            sb = _storage_buckets(new_keys, self.index)
            files = self.index.current_files()
            sbset = set(sb)
            stats.update(
                index_files_total=len(files),
                index_files_read=sum(1 for f in files if f["bucket"] in sbset),
                index_buckets_total=len({f["bucket"] for f in files}),
                index_buckets_read=len(sb),
            )
            stored_touched = self.index.read(spark, buckets=sb).join(
                F.broadcast(new_keys), ["band_id", "band_hash"], "left_semi"
            )
            stats["stored_semi_plan"] = _plan_string(stored_touched)
            all_banded = stored_touched.unionByName(new_banded)
        else:
            all_banded = new_banded
        capped = _cap_buckets(all_banded, ["band_id", "band_hash"], self.max_bucket)
        a, b = capped.alias("a"), capped.alias("b")
        pairs = (
            a.join(
                b,
                (F.col("a.band_id") == F.col("b.band_id"))
                & (F.col("a.band_hash") == F.col("b.band_hash"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
            # only pairs whose HIGHER id is new can drop anything new;
            # old x old pairs were judged in earlier batches
            .join(new_ids.withColumnRenamed("doc_id", "b_id"), "b_id", "left_semi")
            .distinct()
        )

        new_fp = None
        if self.winnow_index is not None:
            from getl_spark.functions.text import winnow as _winnow

            wc = self.cfg["winnow"]
            new_fp = (
                _winnow(d, text_col, id_col, k=wc["k"], w=wc["w"],
                        hash_fn=self.cfg["hash_fn"])
                .select(did.alias("doc_id"), "h")
                .distinct()
                .persist()
            )
            have_fp = self.winnow_index.count_rows() > 0
            wheal = (
                bool(_pending_tails(self.winnow_index, self.index, "max_doc_id"))
                if modern
                else have_fp
            )
            if have_fp:
                fp_keys = new_fp.select("h").distinct()
                sbw = _storage_buckets(fp_keys, self.winnow_index)
                stored_fp = self.winnow_index.read(spark, buckets=sbw).join(
                    F.broadcast(fp_keys), ["h"], "left_semi"
                )
                if wheal:
                    # healing replay: the tail's winnow rows are
                    # committed here AND recomputed in new_fp — drop
                    # the stored copies so the per-bucket cap and the
                    # _shared >= min_shared gate count each (doc, h)
                    # row once, matching the clean run
                    stored_fp = stored_fp.join(
                        F.broadcast(new_ids), "doc_id", "left_anti"
                    )
                all_fp = stored_fp.unionByName(new_fp)
            else:
                all_fp = new_fp
            all_fp = _cap_buckets(all_fp, ["h"], self.max_bucket)
            fa, fb = all_fp.alias("a"), all_fp.alias("b")
            wpairs = (
                fa.join(
                    fb,
                    (F.col("a.h") == F.col("b.h"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")),
                )
                .groupBy(
                    F.col("a.doc_id").alias("a_id"),
                    F.col("b.doc_id").alias("b_id"),
                )
                .agg(F.count(F.lit(1)).alias("_shared"))
                .filter(F.col("_shared") >= wc["min_shared"])
                .select("a_id", "b_id")
                .join(new_ids.withColumnRenamed("doc_id", "b_id"), "b_id", "left_semi")
            )
            pairs = pairs.unionByName(wpairs).distinct()

        # verify on texts of exactly the docs the pairs touch; old
        # docs' texts come from a read pruned to the touched ids'
        # storage buckets (pairs is persisted — the candidate join
        # runs once, here, for the bucket collection)
        pairs = pairs.persist()
        new_texts = d.select(did.alias("doc_id"), F.col(text_col).alias("text"))
        touched = (
            pairs.select(F.col("a_id").alias("doc_id"))
            .unionByName(pairs.select(F.col("b_id").alias("doc_id")))
            .distinct()
        )
        old_touched = touched.join(new_ids, "doc_id", "left_anti")
        tb = _storage_buckets(old_touched, self.docs)
        if tb:
            old_texts = self.docs.read(spark, buckets=tb).join(
                old_touched, "doc_id", "left_semi"
            )
            texts = old_texts.unionByName(new_texts)
        else:
            texts = new_texts
        texts = texts.join(touched, "doc_id", "left_semi")
        verified = jaccard_verify(
            texts, pairs, "text", "doc_id", self.cfg["shingle_words"],
            self.cfg["threshold"],
        )
        dropped = verified.select(F.col("b_id").alias("_drop")).distinct()
        kept = d.join(dropped, did == F.col("_drop"), "left_anti")
        # verdict rows: each dropped doc with the smallest lower id it
        # verified against (deterministic representative)
        reject_rows = verified.groupBy(F.col("b_id").alias("doc_id")).agg(
            F.min("a_id").alias("dup_of")
        )

        # persist AFTER computing, DOCS FIRST then INDEX: the index commit
        # is the batch's "done" marker (the story filter keys on it), so
        # a crash before it means the whole batch reprocesses — and the
        # heal anti-join below de-duplicates a partial docs-only commit.
        # The heal runs ONLY when snapshot metadata shows a crashed tail
        # (a docs/winnow batch token that never reached the index).
        texts_to_add = new_texts
        # legacy fallback keys on the DOCS table (the one being healed):
        # an unstamped store whose first batch crashed after the docs
        # append has an empty index but populated docs — gating on
        # have_index would re-append those texts (ADVICE r6 #2)
        heal = bool(tails) if modern else self.docs.count_rows() > 0
        if heal:
            stats["heal"] = True
            # bucket + range pruning are both safe here regardless of
            # path: the anti-join is an equality on doc_id, so rows in
            # other storage buckets / outside the batch's id span can
            # never match
            hb = _storage_buckets(new_ids, self.docs)
            already = (
                self.docs.read(spark, buckets=hb)
                .select("doc_id")
                .filter((F.col("doc_id") >= batch_lo) & (F.col("doc_id") <= batch_hi))
            )
            texts_to_add = new_texts.join(already, "doc_id", "left_anti")
        self.docs.append(texts_to_add, dict(stamp))
        if new_fp is not None:
            fp_to_add = new_fp
            # wheal computed once above, where the candidate join
            # de-duplicated the stored side with the same condition
            if wheal:
                # the winnow table buckets by h (content key), not
                # doc_id — but a replayed crashed batch re-fingerprints
                # the SAME texts, so any existing row with a doc_id in
                # the batch range carries an h from this batch's own
                # key set: prune the heal read to those keys' storage
                # buckets (``sbw`` when the candidate path computed it)
                wb = _storage_buckets(new_fp.select("h").distinct(), self.winnow_index)
                wfiles = self.winnow_index.current_files()
                wset = set(wb)
                stats.update(
                    winnow_heal_files_total=len(wfiles),
                    winnow_heal_files_read=sum(1 for f in wfiles if f["bucket"] in wset),
                )
                already_fp = (
                    self.winnow_index.read(spark, buckets=wb)
                    .select("doc_id")
                    .filter((F.col("doc_id") >= batch_lo) & (F.col("doc_id") <= batch_hi))
                    .distinct()
                )
                fp_to_add = new_fp.join(already_fp, "doc_id", "left_anti")
            self.winnow_index.append(fp_to_add, dict(stamp))
        rej_to_add = reject_rows
        rheal = bool(_pending_tails(self.rejects, self.index, "max_doc_id")) \
            if modern else self.rejects.count_rows() > 0
        if rheal:
            rb = _storage_buckets(new_ids, self.rejects)
            already_rej = (
                self.rejects.read(spark, buckets=rb)
                .select("doc_id")
                .filter((F.col("doc_id") >= batch_lo) & (F.col("doc_id") <= batch_hi))
            )
            rej_to_add = reject_rows.join(already_rej, "doc_id", "left_anti")
        self.rejects.append(rej_to_add, dict(stamp))
        # the index commit is the done marker; a replay that covered
        # crashed tails declares them healed here, under ITS token —
        # _pending_tails resolves tails by token only, never by the
        # watermark having moved past them
        idx_stamp = {**stamp, **self.cfg}
        if healed:
            idx_stamp["heals"] = list(healed)
        self.index.append(new_banded, idx_stamp)
        new_banded.unpersist()
        pairs.unpersist()
        if new_fp is not None:
            new_fp.unpersist()
        return kept

    def rejected_of(
        self, spark: SparkSession, ids: DataFrame, id_col: str = "doc_id"
    ) -> DataFrame:
        """(doc_id, dup_of) for the subset of ``ids`` the store has
        dropped — a bucket-pruned read of the persisted verdicts, valid
        for any mix of new and previously-ingested ids. This is how a
        replayed CDC epoch recovers its kept set without re-judging:
        verdicts commit BEFORE the index's done marker, so any id the
        story filter skips already has its verdict durable."""
        self.rejects.refresh()
        idf = ids.select(F.col(id_col).cast("bigint").alias("doc_id")).distinct()
        if self.rejects.count_rows() == 0:  # manifest stats, no scan
            return idf.limit(0).withColumn("dup_of", F.lit(None).cast("bigint"))
        rb = _storage_buckets(idf, self.rejects)
        return self.rejects.read(spark, buckets=rb).join(idf, "doc_id", "left_semi")

    # -- maintenance -------------------------------------------------
    def _tables(self):
        out = {"index": self.index, "docs": self.docs, "rejects": self.rejects}
        if self.winnow_index is not None:
            out["winnow"] = self.winnow_index
        return out

    def compact(self, spark: SparkSession) -> dict:
        """Small-file compaction across the store's tables: every
        ``add_batch`` appends a file per touched bucket, and both the
        candidate join and the bucket-pruned verdict/heal reads pay
        per-file overhead — fold periodically (bucket-local binpack;
        compaction snapshots are transparent to the watermark story
        filter). Returns files before/after per table."""
        out = {}
        for name, t in self._tables().items():
            t.refresh()
            before = len(t.current_files())
            t.compact(spark)
            t.refresh()
            out[name] = {"files_before": before, "files_after": len(t.current_files())}
        return out

    def expire(self, keep_last: int = 8) -> dict:
        """Bound snapshot metadata: an always-on ingest otherwise grows
        every table's snapshot list O(batches) and each commit rewrites
        it (O(batches^2) on disk over time). Keeps the newest
        ``keep_last`` snapshots per table — the watermark/token stamps
        of expired snapshots are no longer visible, so keep at least as
        many as the deepest crash-replay window you need (a tail can
        only be healed while its stamps are still in the kept list)."""
        return {
            name: t.expire_snapshots(keep_last)
            for name, t in self._tables().items()
        }

    def remove_orphans(self, older_than_seconds: float = 3600) -> dict:
        """Delete data files referenced by NO snapshot across the
        store's tables — a crashed add_batch (between writing files and
        committing) leaves its files behind forever otherwise. Same
        mtime grace period as the lake tables' own
        ``remove_orphan_files``; files deleted per table returned."""
        return {
            name: t.remove_orphan_files(older_than_seconds)
            for name, t in self._tables().items()
        }

    def prune_dropped(self, spark: SparkSession, before_doc_id: int) -> dict:
        """RETENTION: reclaim the heavy state (band rows, texts,
        winnow fingerprints) of docs that were DROPPED with
        ``doc_id < before_doc_id``. Their verdict rows in
        ``_dedup_rejects`` are KEPT — one tiny row per dropped doc —
        so ``rejected_of`` replay recovery still works at any depth.

        Dropped docs' signatures stay in the index BY DESIGN (module
        docstring: the one-shot pair set includes pairs whose lower id
        was itself dropped), so pruning trades storage for a bounded,
        one-sided equality change: a future doc whose ONLY verified
        match is a pruned dropped doc will now be KEPT (the one-shot
        run over the full history would have dropped it). Kept docs
        are untouched — pairs against them are unaffected. Choose
        ``before_doc_id`` older than any content you expect to recur.
        """
        before = int(before_doc_id)
        self.rejects.refresh()
        old = (
            self.rejects.read(spark)
            .filter(F.col("doc_id") < before)
            .select("doc_id")
            .persist()
        )
        stamp = {"maintenance": "prune_dropped", "before_doc_id": before}
        out = {"pruned_docs": old.count()}
        try:
            if out["pruned_docs"] == 0:
                return out
            for name, t in self._tables().items():
                if name == "rejects":
                    continue
                t.refresh()
                # docs (and nothing else) is bucketed by doc_id, so its
                # rewrite prunes to the dropped ids' buckets; the index
                # and winnow tables bucket by content keys — a dropped
                # doc's rows spread across buckets, so those rewrites
                # touch every bucket holding any such row (heavyweight,
                # like compaction — a periodic job, never per-batch)
                if name == "docs":
                    bks = _storage_buckets(old, t)
                    keep = t.read(spark, buckets=bks).join(
                        old, "doc_id", "left_anti"
                    )
                    t.overwrite_buckets(keep, bks, dict(stamp))
                else:
                    keep = t.read(spark).join(old, "doc_id", "left_anti")
                    t.overwrite_all(keep, dict(stamp))
            return out
        finally:
            old.unpersist()


class EmbDedupStore:
    """Incremental EMBEDDING near-dedup — :class:`DedupStore`'s shape
    applied to vectors: every vector's hyperplane-LSH bucket rows
    (same integer-exact math as
    :func:`getl_spark.functions.simsearch.embedding_near_dups`)
    persist in a lake table beside the vectors themselves; a new batch
    is bucketed once, joined against the standing index + itself for
    candidates, exact-cosine verified, and appended. Per-batch cost is
    O(new vectors + touched buckets), not O(corpus) — via the same
    watermark story filter, broadcast-semi touched-bucket pruning, and
    token-triggered heal as the text store (module docstring).

    Same contracts as the text store: with ingest-ordered ids and
    ``max_bucket=None`` the union of ``add_batch`` outputs equals the
    one-shot pairwise drop over ``embedding_near_dups`` pairs; with a
    cap the incremental run is strictly more aggressive (pairs are
    judged before their bucket can cross the cap). The VECTORS table
    commit is the batch's done marker (bucket index + verdicts
    appended first, healed on replay when a crashed tail is
    detected). Verdicts persist in ``_embdedup_rejects`` and surface
    through :meth:`rejected_of`, so this store composes into the CDC
    pipeline's pre-merge stage with the same replay-recovery
    guarantees as :class:`DedupStore`.
    """

    def __init__(
        self,
        warehouse: str,
        dim: int,
        threshold: float = 0.95,
        n_bits: int = 12,
        n_tables: int = 4,
        seed: int = 99,
        max_bucket: int | None = 1000,
        num_buckets: int = 64,
    ):
        self.cfg = {
            "dim": int(dim), "threshold": float(threshold),
            "n_bits": int(n_bits), "n_tables": int(n_tables),
            "seed": int(seed),
            "max_bucket": None if max_bucket is None else int(max_bucket),
        }
        self.max_bucket = max_bucket
        self.last_batch_stats: dict = {}
        cat = LakeCatalog(warehouse)
        self.buckets = cat.create_table(
            "_embdedup_buckets",
            parse_ddl("vec_id bigint, tbl int, bucket bigint"),
            PartitionSpec.bucket(num_buckets, "bucket"),
            if_not_exists=True,
        )
        self.vectors = cat.create_table(
            "_embdedup_vectors",
            parse_ddl("vec_id bigint, embedding array<double>"),
            PartitionSpec.bucket(num_buckets, "vec_id"),
            if_not_exists=True,
        )
        # persisted VERDICTS, mirroring DedupStore._dedup_rejects: one
        # row per dropped vector with the smallest lower id it exact-
        # cosine-verified against. Committed BEFORE the vectors append
        # (the done marker), so by the time the story filter starts
        # skipping a batch's ids every verdict of that batch is durable
        # and a replayed CDC epoch recovers its kept set via
        # :meth:`rejected_of` instead of re-judging.
        self.rejects = cat.create_table(
            "_embdedup_rejects",
            parse_ddl("vec_id bigint, dup_of bigint"),
            PartitionSpec.bucket(num_buckets, "vec_id"),
            if_not_exists=True,
        )
        for snap in self.buckets.meta["snapshots"]:
            summ = snap.get("summary", {})
            if "n_bits" not in summ:
                continue
            mismatch = {
                k: (summ.get(k), self.cfg[k])
                for k in self.cfg
                if summ.get(k) != self.cfg[k]
            }
            if mismatch:
                raise ValueError(
                    f"EmbDedupStore config mismatch vs existing index: {mismatch}"
                )
            break

    @classmethod
    def open(cls, warehouse: str) -> "EmbDedupStore":
        """Reopen under the store's own stored configuration (same
        contract as :meth:`DedupStore.open` — every buckets append
        stamps the full cfg)."""
        cat = LakeCatalog(warehouse)
        if not cat.table_exists("_embdedup_buckets"):
            raise ValueError(f"no embedding dedup store at {warehouse!r}")
        for snap in cat.load_table("_embdedup_buckets").meta["snapshots"]:
            summ = snap.get("summary") or {}
            if "n_bits" in summ:
                return cls(
                    warehouse,
                    dim=summ["dim"],
                    threshold=summ["threshold"],
                    n_bits=summ["n_bits"],
                    n_tables=summ["n_tables"],
                    seed=summ["seed"],
                    max_bucket=summ.get("max_bucket"),
                )
        raise ValueError(
            f"embedding dedup store at {warehouse!r} has no ingested batch "
            "to read its configuration from — pass the parameters explicitly"
        )

    def corpus_size(self) -> int:
        return self.vectors.count_rows()

    def add_batch(
        self,
        spark: SparkSession,
        vectors: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        require_monotonic: bool = True,
    ) -> DataFrame:
        """Dedup ``vectors`` against the standing corpus + themselves;
        persist their bucket rows + vectors; return the KEPT new rows
        (original columns)."""
        from getl_spark.functions.simsearch import _bucketed, cosine

        self.buckets.refresh()
        self.vectors.refresh()
        self.rejects.refresh()
        stats = self.last_batch_stats = {"heal": False}
        have_vecs = self.vectors.count_rows() > 0
        have_idx = self.buckets.count_rows() > 0
        hi_vec, modern = _watermark(self.vectors, "max_vec_id")
        if modern:
            _, modern = _watermark(self.buckets, "max_vec_id")
        if have_vecs and hi_vec is None:
            # stamped appends all expired — same guard as DedupStore:
            # never run the watermark fast path blind on a non-empty
            # corpus, use the membership anti-join instead
            modern = False
        fast = modern and require_monotonic

        vid = F.col(id_col).cast("bigint")
        row = vectors.agg(F.min(vid).alias("lo"), F.max(vid).alias("hi")).collect()[0]
        lo_raw, hi_raw = row["lo"], row["hi"]
        if lo_raw is None:
            stats["story_path"] = "empty"
            return vectors

        d = vectors
        tails = _pending_tails(self.buckets, self.vectors, "max_vec_id") if modern else []
        reproc = _reprocess_cond(tails, vid)
        anti_span = None
        if have_vecs and fast:
            stats["story_path"] = "watermark"
            if hi_vec is not None and lo_raw <= hi_vec:
                # ids of a crashed tail (bucket rows committed, vectors
                # append — the done marker — never reached) sit below a
                # later batch's watermark on replay; carve them out as
                # reprocessable instead of failing the membership probe
                committed = vid <= hi_vec
                if reproc is not None:
                    committed = committed & ~reproc
                old_ids = d.filter(committed).select(vid.alias("vec_id"))
                vb = _storage_buckets(old_ids, self.vectors)
                if vb:
                    present = self.vectors.read(spark, buckets=vb).select("vec_id")
                    # prune_dropped reclaims dropped vectors but keeps
                    # their verdict rows — replayed batches containing
                    # pruned ids must still read as committed
                    if self.rejects.count_rows() > 0:
                        rb = _storage_buckets(old_ids, self.rejects)
                        present = present.unionByName(
                            self.rejects.read(spark, buckets=rb).select("vec_id")
                        )
                    missing = (
                        old_ids.join(present, "vec_id", "left_anti").limit(1).collect()
                    )
                    if missing:
                        raise ValueError(
                            f"add_batch: new ids must exceed all stored ids (new min "
                            f"{lo_raw} <= stored max {hi_vec}); pass "
                            "require_monotonic=False to override"
                        )
                keep = vid > hi_vec
                if reproc is not None:
                    keep = keep | reproc
                d = d.filter(keep)
            if (
                hi_vec is not None
                and hi_raw <= hi_vec
                and not _overlapping(tails, lo_raw, hi_raw)
            ):
                stats["story_path"] = "watermark-replay-noop"
                return d
        elif have_vecs:
            stats["story_path"] = "anti-join"
            stored_ids = (
                self.vectors.read(spark)
                .select("vec_id")
                .filter((F.col("vec_id") >= lo_raw) & (F.col("vec_id") <= hi_raw))
                .withColumnRenamed("vec_id", "_vid")
            )
            d = d.withColumn("_vid", vid).join(stored_ids, "_vid", "left_anti").drop("_vid")
            row = d.agg(F.min(vid).alias("lo"), F.max(vid).alias("hi")).collect()[0]
            anti_span = (row["lo"], row["hi"])
            if require_monotonic:
                hi = hi_vec
                if not modern:
                    hi = self.vectors.read(spark).agg(F.max("vec_id")).collect()[0][0]
                lo = anti_span[0]
                if lo is not None and hi is not None and lo <= hi:
                    raise ValueError(
                        f"add_batch: new ids must exceed all stored ids (new min "
                        f"{lo} <= stored max {hi}); pass require_monotonic=False "
                        "to override"
                    )
        else:
            stats["story_path"] = "first-batch"

        batch_tok = uuid.uuid4().hex[:12]
        clipped = fast and hi_vec is not None and lo_raw <= hi_vec
        if anti_span is not None:
            # exact-gap stamp (see DedupStore.add_batch): the survivors'
            # hull may straddle committed spans on the non-monotonic
            # path — never stamp ranges that claim committed ids
            eff = (
                []
                if anti_span[0] is None
                else _subtract_ranges(
                    anti_span[0], anti_span[1],
                    _committed_ranges(self.vectors, "max_vec_id"),
                )
            )
        else:
            eff = _effective_ranges(clipped, lo_raw, hi_raw, hi_vec, tails)
        batch_lo = min((r[0] for r in eff), default=lo_raw)
        batch_hi = hi_raw
        stamp = {
            "op": "add_batch", "batch": batch_tok,
            "max_vec_id": int(batch_hi), "id_ranges": eff,
        }
        healed = _healed_tokens(tails, int(lo_raw), int(hi_raw))
        if healed:
            # same row-level verification of the span-derived heal
            # claim as the text store (ADVICE r7 #2): the crashed
            # batch's ids are durable in the buckets table
            claim_tails = [t for t in tails if t["batch"] in set(healed)]
            claim_cond = _reprocess_cond(claim_tails, F.col("vec_id"))
            if claim_cond is not None:
                stored_tail_ids = (
                    self.buckets.read(spark).select("vec_id").filter(claim_cond)
                )
                missing = stored_tail_ids.join(
                    vectors.select(vid.alias("vec_id")), "vec_id", "left_anti"
                ).limit(1).collect()
                if missing:
                    stats["heal_claims_dropped"] = list(healed)
                    healed = []
        if healed:
            stats["healed_tails"] = list(healed)

        new_b = _bucketed(
            d, id_col, vec_col, "vec_id",
            self.cfg["dim"], self.cfg["n_bits"], self.cfg["n_tables"],
            self.cfg["seed"],
        ).select(F.col("vec_id").cast("bigint"), "tbl", "bucket").persist()
        new_ids = new_b.select("vec_id").distinct()

        if have_idx:
            new_keys = new_b.select("tbl", "bucket").distinct()
            sb = _storage_buckets(new_keys, self.buckets)
            files = self.buckets.current_files()
            sbset = set(sb)
            stats.update(
                index_files_total=len(files),
                index_files_read=sum(1 for f in files if f["bucket"] in sbset),
                index_buckets_total=len({f["bucket"] for f in files}),
                index_buckets_read=len(sb),
            )
            stored_touched = self.buckets.read(spark, buckets=sb).join(
                F.broadcast(new_keys), ["tbl", "bucket"], "left_semi"
            )
            stats["stored_semi_plan"] = _plan_string(stored_touched)
            if tails or not modern:
                # healing replay: a crashed tail's bucket rows are
                # committed here AND recomputed in new_b — drop the
                # stored copies so _cap_buckets counts each row once
                # (double-counting can push a bucket over max_bucket
                # and diverge the kept set from the clean run's)
                stored_touched = stored_touched.join(
                    F.broadcast(new_ids), "vec_id", "left_anti"
                )
            all_b = stored_touched.unionByName(new_b)
        else:
            all_b = new_b
        capped = _cap_buckets(all_b, ["tbl", "bucket"], self.max_bucket)
        a, b = capped.alias("a"), capped.alias("b")
        pairs = (
            a.join(
                b,
                (F.col("a.tbl") == F.col("b.tbl"))
                & (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col("a.vec_id") < F.col("b.vec_id")),
            )
            .select(F.col("a.vec_id").alias("a_id"), F.col("b.vec_id").alias("b_id"))
            .join(new_ids.withColumnRenamed("vec_id", "b_id"), "b_id", "left_semi")
            .distinct()
            .persist()
        )

        new_vecs = d.select(
            vid.alias("vec_id"),
            F.col(vec_col).cast("array<double>").alias("embedding"),
        )
        touched = (
            pairs.select(F.col("a_id").alias("vec_id"))
            .unionByName(pairs.select(F.col("b_id").alias("vec_id")))
            .distinct()
        )
        old_touched = touched.join(new_ids, "vec_id", "left_anti")
        tb = _storage_buckets(old_touched, self.vectors)
        if tb:
            old_vecs = self.vectors.read(spark, buckets=tb).join(
                old_touched, "vec_id", "left_semi"
            )
            vecs = old_vecs.unionByName(new_vecs)
        else:
            vecs = new_vecs
        vecs = vecs.join(touched, "vec_id", "left_semi")
        av = vecs.select(F.col("vec_id").alias("a_id"), F.col("embedding").alias("a_vec"))
        bv = vecs.select(F.col("vec_id").alias("b_id"), F.col("embedding").alias("b_vec"))
        verified = (
            pairs.join(av, "a_id")
            .join(bv, "b_id")
            .filter(
                F.round(cosine(F.col("a_vec"), F.col("b_vec")), 4)
                >= self.cfg["threshold"]
            )
            .select("a_id", "b_id")
        )
        dropped = verified.select(F.col("b_id").alias("_drop")).distinct()
        kept = d.join(dropped, vid == F.col("_drop"), "left_anti")
        # verdict rows: each dropped vector with the smallest lower id
        # it verified against (deterministic representative)
        reject_rows = verified.groupBy(F.col("b_id").alias("vec_id")).agg(
            F.min("a_id").alias("dup_of")
        )

        # bucket index first, vectors last — the vectors commit is the
        # done marker the story filter keys on; a crashed tail (bucket
        # rows whose token never reached the vectors table) triggers
        # the heal anti-join on the NEXT run, detected from metadata
        b_to_add = new_b
        heal = bool(tails) if modern else have_idx
        if heal:
            stats["heal"] = True
            # the buckets table buckets by the hash value, not vec_id —
            # but a replayed crashed batch re-buckets the SAME vectors,
            # so existing rows with a vec_id in the batch range carry
            # (tbl, bucket) keys from this batch's own key set: prune
            # the heal read to those keys' storage buckets
            hb = _storage_buckets(new_b.select("tbl", "bucket").distinct(), self.buckets)
            hfiles = self.buckets.current_files()
            hset = set(hb)
            stats.update(
                heal_files_total=len(hfiles),
                heal_files_read=sum(1 for f in hfiles if f["bucket"] in hset),
            )
            already = (
                self.buckets.read(spark, buckets=hb)
                .select("vec_id")
                .filter((F.col("vec_id") >= batch_lo) & (F.col("vec_id") <= batch_hi))
                .distinct()
            )
            b_to_add = new_b.join(already, "vec_id", "left_anti")
        self.buckets.append(b_to_add, {**stamp, **self.cfg})
        rej_to_add = reject_rows
        rheal = bool(_pending_tails(self.rejects, self.vectors, "max_vec_id")) \
            if modern else self.rejects.count_rows() > 0
        if rheal:
            rb = _storage_buckets(new_ids, self.rejects)
            already_rej = (
                self.rejects.read(spark, buckets=rb)
                .select("vec_id")
                .filter((F.col("vec_id") >= batch_lo) & (F.col("vec_id") <= batch_hi))
            )
            rej_to_add = reject_rows.join(already_rej, "vec_id", "left_anti")
        self.rejects.append(rej_to_add, dict(stamp))
        # the vectors commit is the done marker; replays covering
        # crashed tails declare them healed here (same contract as the
        # text store's index commit)
        vec_stamp = dict(stamp)
        if healed:
            vec_stamp["heals"] = list(healed)
        self.vectors.append(new_vecs, vec_stamp)
        new_b.unpersist()
        pairs.unpersist()
        return kept

    def rejected_of(
        self, spark: SparkSession, ids: DataFrame, id_col: str = "vec_id"
    ) -> DataFrame:
        """(vec_id, dup_of) for the subset of ``ids`` the store has
        dropped — a bucket-pruned read of the persisted verdicts, valid
        for any mix of new and previously-ingested ids (same replay-
        recovery contract as :meth:`DedupStore.rejected_of`: verdicts
        commit BEFORE the vectors done-marker). Batches ingested by a
        pre-round-7 store predate the verdicts table and return no
        rows — re-ingest or treat those epochs as all-kept."""
        self.rejects.refresh()
        idf = ids.select(F.col(id_col).cast("bigint").alias("vec_id")).distinct()
        if self.rejects.count_rows() == 0:  # manifest stats, no scan
            return idf.limit(0).withColumn("dup_of", F.lit(None).cast("bigint"))
        rb = _storage_buckets(idf, self.rejects)
        return self.rejects.read(spark, buckets=rb).join(idf, "vec_id", "left_semi")

    # -- maintenance (same contract as DedupStore.compact/expire) ----
    def _tables(self):
        return {
            "buckets": self.buckets,
            "vectors": self.vectors,
            "rejects": self.rejects,
        }

    def compact(self, spark: SparkSession) -> dict:
        out = {}
        for name, t in self._tables().items():
            t.refresh()
            before = len(t.current_files())
            t.compact(spark)
            t.refresh()
            out[name] = {"files_before": before, "files_after": len(t.current_files())}
        return out

    def expire(self, keep_last: int = 8) -> dict:
        return {
            name: t.expire_snapshots(keep_last)
            for name, t in self._tables().items()
        }

    def remove_orphans(self, older_than_seconds: float = 3600) -> dict:
        return {
            name: t.remove_orphan_files(older_than_seconds)
            for name, t in self._tables().items()
        }

    def prune_dropped(self, spark: SparkSession, before_vec_id: int) -> dict:
        """RETENTION, mirroring :meth:`DedupStore.prune_dropped`:
        reclaim the bucket rows and vectors of DROPPED vecs with
        ``vec_id < before_vec_id``; their verdict rows are KEPT so
        ``rejected_of`` replay recovery works at any depth. Same
        documented one-sided equality change: a future vector whose
        ONLY verified match was pruned will now be kept."""
        before = int(before_vec_id)
        self.rejects.refresh()
        old = (
            self.rejects.read(spark)
            .filter(F.col("vec_id") < before)
            .select("vec_id")
            .persist()
        )
        stamp = {"maintenance": "prune_dropped", "before_vec_id": before}
        out = {"pruned_vecs": old.count()}
        try:
            if out["pruned_vecs"] == 0:
                return out
            for name, t in self._tables().items():
                if name == "rejects":
                    continue
                t.refresh()
                # vectors buckets by vec_id (prunable rewrite); the
                # bucket index buckets by the hash value — its rewrite
                # touches every bucket holding any dropped row
                # (heavyweight, periodic, never per-batch)
                if name == "vectors":
                    bks = _storage_buckets(old, t)
                    keep = t.read(spark, buckets=bks).join(
                        old, "vec_id", "left_anti"
                    )
                    t.overwrite_buckets(keep, bks, dict(stamp))
                else:
                    keep = t.read(spark).join(old, "vec_id", "left_anti")
                    t.overwrite_all(keep, dict(stamp))
            return out
        finally:
            old.unpersist()
