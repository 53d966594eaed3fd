"""Incremental near-dedup — the story pattern applied to dedup.

No 100-TB pipeline re-dedups its corpus from scratch per ingest: the
MinHash LSH index rows of every document ever seen persist in a lake
table, and each new batch is (a) banded once, (b) joined against the
standing index + itself for candidates, (c) Jaccard-verified, (d)
appended to the index. Cost per batch is O(new docs + touched
buckets), not O(corpus).

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
so the incremental index must too.

With ``max_bucket`` set, exact equality weakens to a one-sided
guarantee: incremental is STRICTLY MORE AGGRESSIVE (a pair is judged
when its higher id arrives, before the bucket can cross the cap, so
incremental finds every pair the one-shot capped run finds, plus
pairs whose bucket only later became degenerate). The cap is part of
the store's pinned config, so batches can't silently mix caps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from getl_spark.functions.dedupe import (
    _cap_buckets,
    jaccard_verify,
    minhash_banded_rows,
)
from getl_spark.lake import LakeCatalog, PartitionSpec
from getl_spark.schema import parse_ddl


class DedupStore:
    """Persisted MinHash LSH index + document texts in a lake
    warehouse. One store per (num_hashes, bands, shingle_words,
    hash_fn, threshold) configuration — the parameters are fixed at
    creation and written into the index table's first snapshot summary
    so a mismatched reopen fails loudly instead of silently mixing
    incompatible signatures."""

    def __init__(
        self,
        warehouse: str,
        num_hashes: int = 64,
        bands: int = 16,
        shingle_words: int = 3,
        threshold: float = 0.7,
        hash_fn: str = "xxhash64",
        max_bucket: int | None = None,
        num_buckets: int = 32,
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
        them (story semantics)."""
        d = docs.withColumn("_did", F.col(id_col).cast("bigint"))
        self.index.refresh()
        self.docs.refresh()
        # the INDEX commit is the LAST step of a batch, so an id present
        # there is fully committed — the story filter and the monotonic
        # guard both key on it. Ids present in docs but missing from the
        # index are a partial crash; they reprocess (and the docs append
        # below anti-joins so they don't duplicate).
        have_index = self.index.count_rows() > 0
        have_docs = self.docs.count_rows() > 0
        if have_index:
            indexed_ids = self.index.read(spark).select(
                F.col("doc_id").alias("_did")
            ).distinct()
            d = d.join(indexed_ids, "_did", "left_anti")
        d = d.drop("_did")

        if require_monotonic and have_index:
            hi = self.index.read(spark).agg(F.max("doc_id")).collect()[0][0]
            lo = d.agg(F.min(F.col(id_col).cast("bigint"))).collect()[0][0]
            if lo is not None and hi is not None and lo <= hi:
                raise ValueError(
                    f"add_batch: new ids must exceed all stored ids for the "
                    f"batch==incremental equality contract (new min {lo} <= "
                    f"stored max {hi}); pass require_monotonic=False to "
                    "override"
                )

        new_banded = minhash_banded_rows(
            d, text_col, id_col,
            self.cfg["num_hashes"], self.cfg["bands"],
            self.cfg["shingle_words"], self.cfg["hash_fn"],
        ).select(F.col(id_col).cast("bigint").alias("doc_id"), "band_id", "band_hash")

        if have_index:
            stored_banded = self.index.read(spark)
            all_banded = stored_banded.unionByName(new_banded)
        else:
            all_banded = new_banded
        # the cap window sees stored+new rows. With max_bucket=None
        # (the equality contract's precondition) this reproduces the
        # one-shot pair set exactly. With a cap, incremental dedup is
        # STRICTLY MORE AGGRESSIVE than one-shot: a pair is judged when
        # its higher id arrives, at which point the bucket holds a
        # subset of its final membership — so every pair the one-shot
        # run finds under the cap is found here too, plus pairs whose
        # bucket only later crossed the cap (see class docstring).
        capped = _cap_buckets(all_banded, ["band_id", "band_hash"], self.max_bucket)
        new_ids = new_banded.select("doc_id").distinct()
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
                .select(F.col(id_col).cast("bigint").alias("doc_id"), "h")
                .distinct()
            )
            self.winnow_index.refresh()
            have_fp = self.winnow_index.count_rows() > 0
            all_fp = (
                self.winnow_index.read(spark).unionByName(new_fp)
                if have_fp
                else new_fp
            )
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

        # verify on texts of exactly the docs the pairs touch
        new_texts = d.select(
            F.col(id_col).cast("bigint").alias("doc_id"), F.col(text_col).alias("text")
        )
        texts = (
            self.docs.read(spark).unionByName(new_texts) if have_docs else new_texts
        )
        touched = (
            pairs.select(F.col("a_id").alias("doc_id"))
            .unionByName(pairs.select(F.col("b_id").alias("doc_id")))
            .distinct()
        )
        texts = texts.join(touched, "doc_id", "left_semi")
        verified = jaccard_verify(
            texts, pairs, "text", "doc_id", self.cfg["shingle_words"],
            self.cfg["threshold"],
        )
        dropped = verified.select(F.col("b_id").alias("_drop")).distinct()
        kept = d.join(
            dropped, F.col(id_col).cast("bigint") == F.col("_drop"), "left_anti"
        )

        # persist AFTER computing, DOCS FIRST then INDEX: the index commit
        # is the batch's "done" marker (the story filter keys on it), so
        # a crash before it means the whole batch reprocesses — and the
        # docs anti-join below heals a partial docs-only commit without
        # duplicating rows. A crash before either append = the batch
        # never happened.
        texts_to_add = new_texts
        if have_docs:
            texts_to_add = new_texts.join(
                self.docs.read(spark).select("doc_id"), "doc_id", "left_anti"
            )
        self.docs.append(texts_to_add, {"op": "add_batch"})
        if new_fp is not None:
            fp_to_add = new_fp
            if self.winnow_index.count_rows() > 0:
                fp_to_add = new_fp.join(
                    self.winnow_index.read(spark).select("doc_id").distinct(),
                    "doc_id",
                    "left_anti",
                )
            self.winnow_index.append(fp_to_add, {"op": "add_batch"})
        self.index.append(new_banded, {"op": "add_batch", **self.cfg})
        return kept


class EmbDedupStore:
    """Incremental EMBEDDING near-dedup — :class:`DedupStore`'s shape
    applied to vectors: every vector's hyperplane-LSH bucket rows
    (same integer-exact math as
    :func:`getl_spark.functions.simsearch.embedding_near_dups`)
    persist in a lake table beside the vectors themselves; a new batch
    is bucketed once, joined against the standing index + itself for
    candidates, exact-cosine verified, and appended. Per-batch cost is
    O(new vectors + touched buckets), not O(corpus).

    Same contracts as the text store: with ingest-ordered ids and
    ``max_bucket=None`` the union of ``add_batch`` outputs equals the
    one-shot pairwise drop over ``embedding_near_dups`` pairs; with a
    cap the incremental run is strictly more aggressive (pairs are
    judged before their bucket can cross the cap). The VECTORS table
    commit is the batch's done marker (bucket index appended first,
    anti-joined to heal partial crashes).
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
        num_buckets: int = 32,
    ):
        self.cfg = {
            "dim": int(dim), "threshold": float(threshold),
            "n_bits": int(n_bits), "n_tables": int(n_tables),
            "seed": int(seed),
            "max_bucket": None if max_bucket is None else int(max_bucket),
        }
        self.max_bucket = max_bucket
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

        d = vectors.withColumn("_vid", F.col(id_col).cast("bigint"))
        self.buckets.refresh()
        self.vectors.refresh()
        have_vecs = self.vectors.count_rows() > 0
        have_idx = self.buckets.count_rows() > 0
        if have_vecs:
            d = d.join(
                self.vectors.read(spark).select(F.col("vec_id").alias("_vid")),
                "_vid",
                "left_anti",
            )
        d = d.drop("_vid")

        if require_monotonic and have_vecs:
            hi = self.vectors.read(spark).agg(F.max("vec_id")).collect()[0][0]
            lo = d.agg(F.min(F.col(id_col).cast("bigint"))).collect()[0][0]
            if lo is not None and hi is not None and lo <= hi:
                raise ValueError(
                    f"add_batch: new ids must exceed all stored ids (new min "
                    f"{lo} <= stored max {hi}); pass require_monotonic=False "
                    "to override"
                )

        new_b = _bucketed(
            d, id_col, vec_col, "vec_id",
            self.cfg["dim"], self.cfg["n_bits"], self.cfg["n_tables"],
            self.cfg["seed"],
        ).select(F.col("vec_id").cast("bigint"), "tbl", "bucket")
        all_b = (
            self.buckets.read(spark).unionByName(new_b) if have_idx else new_b
        )
        capped = _cap_buckets(all_b, ["tbl", "bucket"], self.max_bucket)
        new_ids = new_b.select("vec_id").distinct()
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
        )

        new_vecs = d.select(
            F.col(id_col).cast("bigint").alias("vec_id"),
            F.col(vec_col).cast("array<double>").alias("embedding"),
        )
        vecs = (
            self.vectors.read(spark).unionByName(new_vecs)
            if have_vecs
            else new_vecs
        )
        touched = (
            pairs.select(F.col("a_id").alias("vec_id"))
            .unionByName(pairs.select(F.col("b_id").alias("vec_id")))
            .distinct()
        )
        vecs = vecs.join(touched, "vec_id", "left_semi")
        av = vecs.select(F.col("vec_id").alias("a_id"), F.col("embedding").alias("a_vec"))
        bv = vecs.select(F.col("vec_id").alias("b_id"), F.col("embedding").alias("b_vec"))
        dropped = (
            pairs.join(av, "a_id")
            .join(bv, "b_id")
            .filter(
                F.round(cosine(F.col("a_vec"), F.col("b_vec")), 4)
                >= self.cfg["threshold"]
            )
            .select(F.col("b_id").alias("_drop"))
            .distinct()
        )
        kept = d.join(
            dropped, F.col(id_col).cast("bigint") == F.col("_drop"), "left_anti"
        )

        # bucket index first (anti-joined to heal a partial crash),
        # vectors last — the vectors commit is the done marker the
        # story filter and the monotonic guard key on
        b_to_add = new_b
        if have_idx:
            b_to_add = new_b.join(
                self.buckets.read(spark).select("vec_id").distinct(),
                "vec_id",
                "left_anti",
            )
        self.buckets.append(b_to_add, {"op": "add_batch", **self.cfg})
        self.vectors.append(new_vecs, {"op": "add_batch"})
        return kept
