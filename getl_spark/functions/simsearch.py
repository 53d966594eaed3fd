"""Similarity search over embedding columns (array<float>).

- :func:`cosine_topk` — exact brute-force top-k: the correctness
  baseline. Dot product / norms via F.aggregate + F.zip_with (JVM,
  codegen) — no Python in the loop. Queries are broadcast, so the
  big side streams once with no shuffle.
- :func:`lsh_topk` — the scale path: random-hyperplane LSH buckets
  (sign bits of h fixed pseudo-random projections, seeded by
  xxhash64 — deterministic, no stored model); candidates share a
  bucket, then exact re-rank. At 100 TB this turns top-k from a full
  scan per query into a bucket probe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a, b):
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """Exact top-k neighbors per query: (query_id, neighbor_id, score).

    Physical plan: broadcast(queries) nested-loop — corpus scanned
    once, no shuffle until the tiny per-query top-k aggregation.
    """
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
        )
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        q.crossJoin(c)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), round_digits).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .drop("rnk")
    )


def _hyperplane_bits(vec_col, dim: int, n_bits: int, seed: int = 99):
    """Sign bits of `n_bits` pseudo-random projections. The projection
    matrix entries are deterministic xxhash64-derived values in
    [-0.5, 0.5) — reproducible on any cluster with no side state."""
    def proj(b):
        weighted = F.zip_with(
            vec_col,
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda v, i: v
            * (
                F.pmod(F.xxhash64(i, F.lit(b), F.lit(seed)), F.lit(1000)) / 1000.0
                - 0.5
            ),
        )
        return F.aggregate(weighted, F.lit(0.0), lambda acc, v: acc + v)

    bits = [F.when(proj(b) >= 0, F.lit(1)).otherwise(F.lit(0)) for b in range(n_bits)]
    out = F.lit(0).cast("long")
    for i, bit in enumerate(bits):
        out = out + (bit.cast("long") * F.lit(1 << i))
    return out


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    n_bits: int = 8,
    n_tables: int = 4,
) -> DataFrame:
    """Approximate top-k: candidates from any of ``n_tables``
    random-hyperplane hash tables, exact cosine re-rank on candidates.

    Recall/cost dial: more tables -> higher recall, more candidates.
    """
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])

    def bucketed(df, prefix):
        return df.select(
            F.col(id_col).alias(f"{prefix}_id"),
            F.col(vec_col).alias(f"{prefix}_vec"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(t).alias("tbl"),
                            _hyperplane_bits(F.col(vec_col), dim, n_bits, seed=99 + t).alias(
                                "bucket"
                            ),
                        )
                        for t in range(n_tables)
                    ]
                )
            ).alias("h"),
        ).select(f"{prefix}_id", f"{prefix}_vec", "h.tbl", "h.bucket")

    qb = F.broadcast(bucketed(queries, "q"))
    cb = bucketed(corpus, "c")
    cands = (
        qb.join(cb, ["tbl", "bucket"])
        .filter(F.col("c_id") != F.col("q_id"))
        .select(
            F.col("q_id").alias("query_id"),
            F.col("c_id").alias("neighbor_id"),
            "q_vec",
            "c_vec",
        )
        .distinct()
    )
    scored = cands.select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("q_vec"), F.col("c_vec")), 4).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .drop("rnk")
    )
