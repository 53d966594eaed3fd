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

import hashlib

import pandas as pd  # noqa: F401 — resolves pandas_udf type hints under PEP 563

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
    from getl_spark.partitioning import widen_small_scan

    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
        )
    )
    # the per-(query, corpus-row) cosine folds run in the corpus scan
    # stage — widen a small single-file corpus so they parallelize
    c = widen_small_scan(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    )
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


def int_hyperplanes(dim: int, n_bits: int, seed: int) -> list[list[int]]:
    """Deterministic integer hyperplane matrix (entries in [-500, 500]),
    derived from sha256 — reproducible on any cluster with no side
    state, and expressible as literal arrays in an ANSI-SQL oracle."""
    planes = []
    for b in range(n_bits):
        row = []
        for i in range(dim):
            h = int.from_bytes(
                hashlib.sha256(f"{seed}:{b}:{i}".encode()).digest()[:8], "big"
            )
            row.append(h % 1001 - 500)
        planes.append(row)
    return planes


def quantize_vec(vec_col):
    """floor(v * 1024) as bigint: an exact integer grid. 1024 is a
    power of two, so the scaling never rounds the mantissa — any engine
    computing floor(double * 1024) lands on the identical integer, and
    every downstream dot product is exact integer arithmetic
    (order-independent, no float-summation drift)."""
    return F.transform(vec_col, lambda v: F.floor(v * F.lit(1024.0)).cast("long"))


def _bucket_col(vec_col, planes: list[list[int]]):
    """LSH bucket id: bit b = sign of <quantized vec, integer plane b>.
    Column-expression reference form (interpreted HOFs — used for
    cross-validation; the hot path is _all_buckets_udf)."""
    q = quantize_vec(vec_col)
    out = F.lit(0).cast("long")
    for bi, row in enumerate(planes):
        lit_row = F.array(*[F.lit(w).cast("long") for w in row])
        dot = F.aggregate(
            F.zip_with(q, lit_row, lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        out = out + F.when(dot >= 0, F.lit(1 << bi)).otherwise(F.lit(0)).cast("long")
    return out


def _all_buckets_udf(planes_by_table: list[list[list[int]]]):
    """Arrow-batched bucket computation: ALL tables' buckets in one
    numpy pass per batch. Spark evaluates higher-order-function
    lambdas interpreted, so the column form costs
    n_tables*n_bits*dim lambda steps per row; here it's one exact
    int64 matmul (floor(v*1024) grid x integer hyperplanes — identical
    values to _bucket_col and to the DuckDB oracle, since integer
    arithmetic has no summation-order sensitivity). Returns
    array<bigint> of length n_tables."""
    import numpy as np

    mats = [np.array(p, dtype=np.int64) for p in planes_by_table]  # (bits, dim)
    powers = [1 << np.arange(m.shape[0], dtype=np.int64) for m in mats]

    @F.pandas_udf("array<bigint>")
    def f(vecs: pd.Series) -> pd.Series:
        arr = np.array(vecs.tolist(), dtype=np.float64)  # (n, dim)
        q = np.floor(arr * 1024.0).astype(np.int64)
        per_table = [
            ((q @ m.T >= 0).astype(np.int64) * pw).sum(axis=1)
            for m, pw in zip(mats, powers)
        ]
        return pd.Series(list(np.stack(per_table, axis=1)))

    return f


def _bucketed(df: DataFrame, id_col: str, vec_col: str, out_id: str,
              dim: int, n_bits: int, n_tables: int, seed: int) -> DataFrame:
    """(out_id, tbl, bucket) rows — one UDF call per row, posexplode
    over the per-table bucket array."""
    from getl_spark.partitioning import widen_small_scan

    planes = [int_hyperplanes(dim, n_bits, seed + t) for t in range(n_tables)]
    udf = _all_buckets_udf(planes)
    # Arrow UDF batches are per-partition — widen a 1-split corpus scan
    return widen_small_scan(df.select(id_col, vec_col)).select(
        F.col(id_col).alias(out_id), udf(F.col(vec_col)).alias("_bs")
    ).select(out_id, F.posexplode("_bs").alias("tbl", "bucket"))


def _cap_vec_buckets(banded: DataFrame, max_bucket: int | None) -> DataFrame:
    """LSH hygiene for the vector paths — same rationale as
    dedupe._cap_buckets: a hot (tbl, bucket) of b vectors emits b^2/2
    candidate pairs from the self-join, and near-dup corpora are
    EXACTLY the ones with dense clusters, so an uncapped bucket goes
    quadratic at corpus scale. Oversized buckets carry low signal
    (vectors that collide with thousands of others under every
    hyperplane discriminate nothing); standard LSH practice drops
    them. The window count shuffles on the join key, so AQE reuses
    the exchange — the cap costs no extra shuffle round."""
    if max_bucket is None:
        return banded
    w = Window.partitionBy("tbl", "bucket")
    return (
        banded.withColumn("_bsz", F.count(F.lit(1)).over(w))
        .filter(F.col("_bsz") <= max_bucket)
        .drop("_bsz")
    )


def auto_n_bits(n_rows: int, target_bucket: int = 8,
                lo: int = 6, hi: int = 24) -> int:
    """Size the hyperplane count so the EXPECTED bucket occupancy is
    ~``target_bucket`` (2^n_bits buckets per table): n_bits=6 means 64
    buckets at ANY corpus size — fine at 10^4 vectors, quadratic death
    at 10^9. Clamped to [lo, hi] (past ~24 bits recall decays faster
    than bucket sizes shrink; add tables instead)."""
    import math

    if n_rows <= 0:
        return lo
    return max(lo, min(hi, math.ceil(math.log2(max(n_rows / target_bucket, 2.0)))))


def embedding_near_dups(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    n_bits: int | None = None,
    n_tables: int = 4,
    seed: int = 99,
    max_bucket: int | None = 1000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a_id < b_id, score >=
    threshold): hyperplane-LSH self-join proposes candidates (never
    all-pairs — two near-identical vectors agree on every hyperplane
    sign with high probability, so they share a bucket in some table),
    then exact cosine verifies. Same integer-exact bucket math as
    lsh_topk, so the operator is oracle-checkable.

    Scale hygiene: ``n_bits=None`` (default) auto-sizes the bucket
    count from a corpus count (one cheap aggregate) via
    :func:`auto_n_bits`, and ``max_bucket`` drops degenerate hot
    buckets before the self-join (see :func:`_cap_vec_buckets`) — with
    both disabled a single dense cluster makes the candidate stage
    quadratic long before the verify filter runs."""
    if dim is None:
        raise ValueError("embedding_near_dups requires dim explicitly")
    if n_bits is None:
        n_bits = auto_n_bits(corpus.select(id_col).count())
    # The bucket self-join below is EXPLOSIVE: output pairs are
    # quadratic in bucket occupancy while its input is tiny (ids +
    # bucket ints), so AQE — which sizes post-shuffle partitions by
    # INPUT bytes — coalesces the join stage to one task and the
    # whole candidate stream serializes on one core (observed at
    # sf1.0: 7.5M pairs from a 1-task stage, 2.4s of a 6s query).
    # Two measured fixes (guide §2.5, §3.1):
    # 1. an explicit-count repartition on the join keys (exempt from
    #    AQE coalescing) placed BELOW the cap window — same keys, so
    #    the plan still has exactly ONE exchange, now at fixed width;
    # 2. a shuffled-hash hint: the default strategy broadcasts the
    #    tiny build side, which DUPLICATES the whole scan→UDF→window
    #    pipeline into the broadcast build and pays a per-task
    #    relation cost; SHJ lets both sides REUSE the single exchange.
    # Width = half the cores (min 8): the sweep at sf0.1/sf1.0 put
    # the knee there — pair generation is ~3 µs/pair, so a handful of
    # tasks saturates it, while every extra partition re-pays the
    # probe-side fixed cost. Derived from defaultParallelism, not a
    # local constant.
    sc = corpus.sparkSession.sparkContext
    n_parts = max(8, sc.defaultParallelism // 2)
    banded = _cap_vec_buckets(
        _bucketed(corpus, id_col, vec_col, "_id", dim, n_bits, n_tables, seed)
        .repartition(n_parts, "tbl", "bucket"),
        max_bucket,
    )
    a, b = banded.alias("a"), banded.alias("b").hint("shuffle_hash")
    cand = (
        a.join(
            b,
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("a_id"), F.col("b._id").alias("b_id"))
        # Rebalance the candidate stream before the verify joins: pair
        # counts per LSH bucket are quadratically skewed, and fusing
        # the verify into the bucket-join stage measured 5x slower
        # (stragglers, guide §2.5). A plain hash repartition gives the
        # same uniform partitions as a pre-verify distinct WITHOUT two
        # aggregation passes over all candidates (measured ~40% faster
        # end-to-end); the few % multi-table duplicate pairs score
        # identically and collapse in the post-filter distinct below.
        .repartition("a_id", "b_id")
    )
    # per-vector norms are computed ONCE per side (2N folds) instead of
    # twice per pair — same FP op order as cosine(), scores bit-equal
    av = corpus.select(
        F.col(id_col).alias("a_id"),
        F.col(vec_col).alias("a_vec"),
        norm(F.col(vec_col)).alias("a_norm"),
    )
    bv = corpus.select(
        F.col(id_col).alias("b_id"),
        F.col(vec_col).alias("b_vec"),
        norm(F.col(vec_col)).alias("b_norm"),
    )
    score = F.round(
        dot(F.col("a_vec"), F.col("b_vec")) / (F.col("a_norm") * F.col("b_norm")), 4
    )
    # guide §4.4, applied to a plain expression: the threshold filter
    # would otherwise be pushed into the attach-join condition AND
    # re-evaluated in the output project — the dot fold then runs
    # TWICE per candidate pair (observed in the plan as two zip_with
    # evals). A nondeterministic identity pins the score to a single
    # materialized evaluation: shuffle() of a 1-element array is
    # value-exact but cannot be constant-folded or pushed through
    # (a rand()-based always-true guard WAS folded away by the
    # optimizer, restoring the double evaluation).
    score = F.shuffle(F.array(score)).getItem(0)
    return (
        cand.join(av, "a_id")
        .join(bv, "b_id")
        .select("a_id", "b_id", score.alias("score"))
        .filter(F.col("score") >= threshold)
        .distinct()
    )


def int_centroids(dim: int, n_centroids: int, seed: int) -> list[list[int]]:
    """Deterministic integer centroid matrix (entries in [-500, 500]),
    same sha256 derivation as :func:`int_hyperplanes` — reproducible on
    any cluster with no stored model, expressible as SQL literals.

    These are RANDOM coarse centroids: IVF-flat's plan shape (assign
    base vectors to one cell, probe the query's nearest cells) without
    a k-means training pass. Training better centroids is a drop-in
    refinement — swap this function for stored k-means output; nothing
    downstream changes."""
    cents = []
    for c in range(n_centroids):
        row = []
        for i in range(dim):
            h = int.from_bytes(
                hashlib.sha256(f"ivf:{seed}:{c}:{i}".encode()).digest()[:8], "big"
            )
            row.append(h % 1001 - 500)
        cents.append(row)
    return cents


def train_centroids(
    corpus: DataFrame,
    n_centroids: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_size: int = 16384,
    iters: int = 10,
    seed: int = 7,
) -> list[list[int]]:
    """Spherical k-means coarse centroids for :func:`ivf_topk`,
    trained on a deterministic sample and quantized to the same
    integer grid as the assignment math.

    Scale shape: ONE bounded job (hash-ordered sample of
    ``sample_size`` vectors to the driver — k-means on a sample is the
    standard IVF training recipe; FAISS trains on ~256 vectors per
    centroid), then pure numpy Lloyd iterations. Assignment downstream
    is argmax integer dot; for that to equal nearest-centroid the
    centroid norms must be equal, so centroids are L2-normalized
    (spherical k-means — the right objective for cosine retrieval)
    before quantizing as round(c * 1024): every centroid lands on the
    int grid with ~equal norm and the integer dot stays exact.

    Deterministic end-to-end: the sample is ordered by xxhash64(id)
    (no partition-order sensitivity), init is k-means++ under a seeded
    generator, ties in assignment break by lowest cell index."""
    import numpy as np

    pdf = (
        corpus.select(
            F.col(vec_col).alias("v"),
            F.xxhash64(F.col(id_col).cast("string")).alias("h"),
        )
        .orderBy("h")
        .limit(int(sample_size))
        .toPandas()
    )
    X = np.array(pdf["v"].tolist(), dtype=np.float64)
    if len(X) == 0:
        raise ValueError("train_centroids: empty corpus")
    norms = np.linalg.norm(X, axis=1)
    X = X[norms > 0] / norms[norms > 0, None]
    k = min(int(n_centroids), len(X))
    rng = np.random.default_rng(seed)
    # k-means++ init on the unit sphere (distance = 1 - cos)
    cents = [X[rng.integers(len(X))]]
    for _ in range(1, k):
        d = 1.0 - np.max(np.stack([X @ c for c in cents]), axis=0)
        d = np.clip(d, 1e-12, None)
        cents.append(X[rng.choice(len(X), p=d / d.sum())])
    C = np.stack(cents)
    for _ in range(int(iters)):
        assign = np.argmax(X @ C.T, axis=1)  # ties -> lowest cell
        for c in range(k):
            m = X[assign == c]
            if len(m):
                v = m.sum(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    C[c] = v / n
    if k < int(n_centroids):  # degenerate tiny corpus: pad with sha cells
        pad = int_centroids(X.shape[1], int(n_centroids) - k, seed + 1)
        padn = np.array(pad, dtype=np.float64)
        padn = padn / np.linalg.norm(padn, axis=1, keepdims=True)
        C = np.vstack([C, padn])
    return np.round(C * 1024.0).astype(np.int64).tolist()


def _ivf_cells_udf(centroids: list[list[int]], n_probe: int):
    """Arrow-batched cell assignment: one exact int64 matmul per batch
    against all centroids, then the ``n_probe`` best cells per vector
    by (dot desc, cell asc). Integer dot products (floor(v*1024) grid x
    integer centroids) are order-independent and bit-identical to the
    DuckDB oracle's double arithmetic (every partial sum is an exact
    integer < 2^53)."""
    import numpy as np

    mat = np.array(centroids, dtype=np.int64)  # (C, dim)

    @F.pandas_udf("array<int>")
    def f(vecs: pd.Series) -> pd.Series:
        import numpy as np

        arr = np.array(vecs.tolist(), dtype=np.float64)
        q = np.floor(arr * 1024.0).astype(np.int64)
        scores = q @ mat.T  # (n, C) exact int64
        idx = np.arange(mat.shape[0], dtype=np.int64)
        order = np.lexsort(
            (np.broadcast_to(idx, scores.shape), -scores), axis=1
        )[:, :n_probe]
        return pd.Series([row.astype("int32") for row in order])

    return f


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 7,
    centroids: list[list[int]] | None = None,
    train: bool = False,
    sample_size: int = 16384,
    train_iters: int = 10,
) -> DataFrame:
    """IVF-flat approximate top-k (the coarse-quantization ANN scale
    path, complementing the hyperplane-LSH tables of :func:`lsh_topk`):
    every corpus vector is ASSIGNED to its single nearest cell (argmax
    integer dot against the centroid matrix), each query PROBES its
    ``n_probe`` nearest cells, candidates are the corpus vectors in
    probed cells, exact cosine re-ranks them.

    Scale shape: the corpus partitions into ``n_centroids`` disjoint
    cells — a probe touches n_probe/n_centroids of the data instead of
    scanning it; raising ``n_probe`` dials recall toward exact at
    linear cost. Ids-only through the cell join (wide vectors never
    shuffle); the query side is broadcast.

    Centroid source (same integer-exact assignment for all three):
    ``centroids=`` uses a stored matrix; ``train=True`` runs sampled
    spherical k-means (:func:`train_centroids` — materially better
    recall at equal n_probe, one bounded sample job); the default is
    the sha-derived random matrix (no model, no training pass,
    expressible as SQL literals for cross-engine oracles).
    """
    if dim is None:
        raise ValueError("ivf_topk requires dim explicitly")
    if centroids is not None:
        cents = centroids
    elif train:
        cents = train_centroids(
            corpus, n_centroids, id_col, vec_col,
            sample_size=sample_size, iters=train_iters, seed=seed,
        )
    else:
        cents = int_centroids(dim, n_centroids, seed)
    from getl_spark.partitioning import widen_small_scan

    assign = _ivf_cells_udf(cents, 1)
    probe = _ivf_cells_udf(cents, n_probe)
    cb = widen_small_scan(corpus.select(id_col, vec_col)).select(
        F.col(id_col).alias("neighbor_id"), assign(F.col(vec_col))[0].alias("cell")
    )
    qb = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), probe(F.col(vec_col)).alias("_cells")
        ).select("query_id", F.explode("_cells").alias("cell"))
    )
    cand_ids = (
        qb.join(cb, "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    qv = F.broadcast(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    )
    cv = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        cand_ids.join(qv, "query_id")
        .join(cv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), 4).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .drop("rnk")
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    n_bits: int = 8,
    n_tables: int = 4,
    seed: int = 99,
    max_bucket: int | None = None,
) -> DataFrame:
    """Approximate top-k: candidates from any of ``n_tables``
    random-hyperplane hash tables, exact cosine re-rank on candidates.

    Recall/cost dial: more tables -> higher recall, more candidates.
    ``dim`` is required: inferring it would be a hidden driver-side
    collect on the corpus. ``max_bucket`` (optional) drops degenerate
    corpus-side buckets — a hot bucket probed by any query re-ranks
    its whole membership, so at corpus scale cap it (the dropped
    vectors are the least discriminative ones) or raise ``n_bits``.
    """
    if dim is None:
        raise ValueError(
            "lsh_topk requires dim explicitly (inferring it would collect from the corpus)"
        )

    # ids-only through the bucket join + distinct (wide vectors never
    # shuffle); vectors re-attached afterwards, query side broadcast.
    qb = F.broadcast(_bucketed(queries, id_col, vec_col, "q_id", dim, n_bits, n_tables, seed))
    cb = _cap_vec_buckets(
        _bucketed(corpus, id_col, vec_col, "c_id", dim, n_bits, n_tables, seed),
        max_bucket,
    )
    cand_ids = (
        qb.join(cb, ["tbl", "bucket"])
        .filter(F.col("c_id") != F.col("q_id"))
        .select(
            F.col("q_id").alias("query_id"), F.col("c_id").alias("neighbor_id")
        )
        .distinct()
    )
    qv = F.broadcast(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    )
    cv = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        cand_ids.join(qv, "query_id")
        .join(cv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), 4).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .drop("rnk")
    )
