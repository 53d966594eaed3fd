"""Persisted IVF-flat ANN index: build once, probe many.

:func:`getl_spark.functions.simsearch.ivf_topk` re-assigns the whole
corpus to cells on every call — right for a one-shot query, wrong for
a similarity SERVICE over a standing corpus. ``AnnIndex`` materializes
the assignment in a lake table bucketed BY CELL, so a probe batch
reads only the probed cells' buckets (manifest pruning — the scan
never touches the other ~n_centroids-n_probe/n_centroids of the
corpus on disk), and new vectors append with the stored centroids
(no rebuild).

100-TB shape:
- build: one training sample job + one assignment pass + one bucketed
  write (all distributed; centroids are a tiny sidecar JSON);
- probe: cells-for-queries is a driver-size computation on the query
  batch; the corpus side is a bucket-pruned scan + broadcast-query
  re-rank — cost tracks n_probe/n_centroids of the corpus;
- append: assignment with the STORED centroids keeps cells disjoint
  and probes correct for the grown corpus (recall drifts only as the
  data distribution drifts — retrain by rebuilding).

Reference note: the reference has no ANN machinery; this is part of
the brief's training-data-pipeline surface (SURVEY "beyond the
reference" rows) built on the same lake primitives as the CDC tables.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from getl_spark.functions.simsearch import (
    _ivf_cells_udf,
    cosine,
    int_centroids,
    train_centroids,
)
from getl_spark.lake import LakeCatalog, PartitionSpec
from getl_spark.schema import parse_ddl


class AnnIndex:
    def __init__(
        self,
        warehouse: str,
        name: str = "_ann_index",
        dim: int | None = None,
        n_centroids: int = 64,
        seed: int = 7,
    ):
        if dim is None:
            raise ValueError("AnnIndex requires dim explicitly")
        self.dim, self.n_centroids, self.seed = int(dim), int(n_centroids), int(seed)
        self.warehouse, self.name = warehouse, name
        self.catalog = LakeCatalog(warehouse)
        self.table = self.catalog.create_table(
            name,
            parse_ddl("cell int, vec_id bigint, embedding array<double>"),
            PartitionSpec.bucket(self.n_centroids, "cell"),
            if_not_exists=True,
        )
        self._cent_path = os.path.join(warehouse, f"{name}.centroids.json")
        self.centroids: list[list[int]] | None = None
        if os.path.exists(self._cent_path):
            with open(self._cent_path) as fh:
                doc = json.load(fh)
            if doc["dim"] != self.dim or doc["n_centroids"] != self.n_centroids:
                raise ValueError(
                    f"AnnIndex config mismatch vs stored index: stored "
                    f"dim={doc['dim']} n_centroids={doc['n_centroids']}, "
                    f"requested dim={self.dim} n_centroids={self.n_centroids}"
                )
            self.centroids = doc["centroids"]

    # -- building ----------------------------------------------------
    def build(
        self,
        spark: SparkSession,
        corpus: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        train: bool = True,
        sample_size: int = 16384,
        train_iters: int = 10,
    ) -> int:
        """(Re)build the index: train/derive centroids, assign every
        corpus vector to its cell, overwrite the table. Returns the
        indexed row count."""
        if train:
            cents = train_centroids(
                corpus, self.n_centroids, id_col, vec_col,
                sample_size=sample_size, iters=train_iters, seed=self.seed,
            )
        else:
            cents = int_centroids(self.dim, self.n_centroids, self.seed)
        # centroids first (sidecar), then data: a crash in between
        # leaves an empty-but-probeable index, never rows without the
        # centroids that define their cells
        tmp = self._cent_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(
                {"dim": self.dim, "n_centroids": self.n_centroids,
                 "seed": self.seed, "trained": bool(train), "centroids": cents},
                fh,
            )
        os.replace(tmp, self._cent_path)
        self.centroids = cents
        rows = self._assigned(corpus, id_col, vec_col)
        self.table.overwrite_all(rows, {"op": "ann_build", "trained": bool(train)})
        self.table.refresh()
        return self.table.count_rows()

    def append(
        self,
        spark: SparkSession,
        vectors: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> int:
        """Index new vectors with the STORED centroids (no rebuild);
        returns the number appended."""
        self._require_built()
        rows = self._assigned(vectors, id_col, vec_col)
        n = rows.count()
        self.table.append(rows, {"op": "ann_append", "rows": n})
        return n

    def _assigned(self, df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
        assign = _ivf_cells_udf(self.centroids, 1)
        return df.select(
            assign(F.col(vec_col))[0].cast("int").alias("cell"),
            F.col(id_col).cast("bigint").alias("vec_id"),
            F.col(vec_col).alias("embedding"),
        )

    def _require_built(self):
        if self.centroids is None:
            raise ValueError(f"AnnIndex {self.name!r} is not built yet")

    # -- probing -----------------------------------------------------
    def _buckets_for_cells(self, spark: SparkSession, cells: list[int]) -> list[int]:
        """cell -> storage bucket via the table's own transform
        (pmod(xxhash64(cell), N)); a tiny driver-size job because
        xxhash64 lives JVM-side."""
        if not cells:
            return []
        cdf = spark.createDataFrame([(int(c),) for c in cells], "cell int")
        rows = cdf.select(
            self.table.partition_spec.bucket_expr().cast("int").alias("b")
        ).distinct().collect()
        return sorted({r["b"] for r in rows})

    def search(
        self,
        spark: SparkSession,
        queries: DataFrame,
        k: int = 5,
        n_probe: int = 4,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> DataFrame:
        """Top-k per query: (query_id, neighbor_id, score). The corpus
        scan is PRUNED to the buckets holding the probed cells; the
        query side (ids + vectors + probed cells) is broadcast."""
        self._require_built()
        probe = _ivf_cells_udf(self.centroids, int(n_probe))
        q = queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("q_vec"),
            probe(F.col(vec_col)).alias("_cells"),
        )
        qcells = q.select("query_id", F.explode("_cells").alias("cell"))
        # the probe batch is the SMALL side: its distinct cell list is
        # metadata-sized (<= n_centroids) and drives manifest pruning
        cells = sorted({r["cell"] for r in qcells.select("cell").distinct().collect()})
        buckets = self._buckets_for_cells(spark, cells)
        self.table.refresh()
        corpus = (
            self.table.read(spark, buckets=buckets)
            # hash collisions can co-locate unprobed cells in a kept
            # bucket; the residual filter restores exact cell pruning
            .filter(F.col("cell").isin([int(c) for c in cells]))
        )
        cand = (
            F.broadcast(qcells)
            .join(corpus, "cell")
            .filter(F.col("vec_id") != F.col("query_id"))
            .select("query_id", F.col("vec_id").alias("neighbor_id"), "embedding")
            .dropDuplicates(["query_id", "neighbor_id"])
        )
        qv = F.broadcast(q.select("query_id", "q_vec"))
        scored = cand.join(qv, "query_id").select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_vec"), F.col("embedding")), 4).alias("score"),
        )
        from pyspark.sql import Window

        w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
        return (
            scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= int(k))
            .drop("rnk")
        )

    # -- maintenance -------------------------------------------------
    def compact(self, spark: SparkSession) -> dict:
        """Small-file compaction for append-heavy indexes: each
        ``append`` adds a file per touched bucket, and probe latency
        tracks files-per-probed-bucket — fold them periodically (the
        lake's binpack rewrite; bucket-local, so untouched cells'
        files are not rewritten)."""
        self.table.refresh()
        return self.table.compact(spark)

    def stats(self, spark: SparkSession) -> dict:
        """Operational shape of the index: rows, occupied cells, data
        files, and the max files behind any single bucket (the probe
        latency driver compact() resets)."""
        self._require_built()
        self.table.refresh()
        files = list(self.table.current_files())
        per_bucket: dict[int, int] = {}
        for f in files:
            b = f.get("bucket")
            per_bucket[b] = per_bucket.get(b, 0) + 1
        cells = self.table.read(spark).select("cell").distinct().count()
        return {
            "rows": self.table.count_rows(),
            "cells_occupied": cells,
            "n_centroids": self.n_centroids,
            "data_files": len(files),
            "max_files_per_bucket": max(per_bucket.values(), default=0),
            "trained": bool(self.centroids is not None),
        }
