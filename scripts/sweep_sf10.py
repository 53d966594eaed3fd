"""sf10 scale-guard sweep of the dedup/ANN family (VERDICT r4 item 8).

Runs the library paths that round 5 changed (bucket caps, auto
n_bits, Hamming verify, trained IVF centroids) at 100x the driver's
gated corpus (500k documents / 200k embeddings), Spark-side, and
prints one JSON line per check. DuckDB cross-checks at this scale are
impractical for the sha-mode signature SQL (hours of scalar CASE
evaluation), so the sweep pins INTERNAL invariants instead — exactly
the properties that break when a cap/band/probe parameter stops
scaling:

- every banded/bucketed family runs to completion with CAPPED
  candidate counts (no quadratic blowup, the r4 scale-killer);
- ivf probe-all == exact brute force on a query sample (correctness
  of the cell partition at scale, trained AND random centroids);
- trained recall >= random recall at equal n_probe;
- embedding_near_dups auto n_bits actually widens the bucket space
  at this corpus size.

Usage: python scripts/sweep_sf10.py [sf_dir] (default /dev/shm/sf10)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from getl_spark.functions import dedupe, simsearch
from getl_spark.session import get_spark


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/dev/shm/sf10"
    spark = get_spark("sf10-sweep", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    out = {}

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    n_docs, n_vecs = docs.count(), emb.count()
    out["corpus"] = {"documents": n_docs, "embeddings": n_vecs}

    def timed(name, fn):
        t0 = time.monotonic()
        val = fn()
        out[name] = {"value": val, "sec": round(time.monotonic() - t0, 1)}
        print(f"  {name}: {val} ({out[name]['sec']}s)", file=sys.stderr)

    # text dedup family — capped candidate joins must stay bounded
    timed("minhash_pairs_capped", lambda: dedupe.lsh_candidate_pairs(
        docs, num_hashes=32, bands=8, hash_fn="xxhash64", max_bucket=100
    ).count())
    timed("simhash_pairs_hamming8", lambda: dedupe.simhash_duplicates(
        docs, hash_fn="xxhash64", max_bucket=100, hamming_k=8
    ).count())
    timed("near_dedup_kept", lambda: dedupe.near_dedup_minhash(
        docs, num_hashes=32, bands=8, threshold=0.5, max_bucket=100
    ).count())

    # embedding near-dups: auto n_bits + cap (the r4 scale-killer fix)
    auto_bits = simsearch.auto_n_bits(n_vecs)
    out["auto_n_bits"] = auto_bits
    assert auto_bits > 6, f"auto_n_bits must widen past 64 buckets at {n_vecs} vecs"
    timed("emb_near_dups_auto", lambda: simsearch.embedding_near_dups(
        emb, threshold=0.95, dim=64, max_bucket=1000
    ).count())

    # IVF: probe-all == exact on a 10-query sample, trained vs random
    queries = emb.filter("vec_id < 10")
    exact = {(r.query_id, r.neighbor_id, r.score)
             for r in simsearch.cosine_topk(emb, queries, k=5).collect()}
    cents = simsearch.train_centroids(emb, 64, seed=7)
    probe_all = {(r.query_id, r.neighbor_id, r.score)
                 for r in simsearch.ivf_topk(
                     emb, queries, k=5, dim=64, n_centroids=64, n_probe=64,
                     centroids=cents).collect()}
    assert probe_all == exact, "trained probe-all must equal brute force"
    out["ivf_probe_all_equals_exact"] = True

    def recall(**kw):
        got = {(r.query_id, r.neighbor_id)
               for r in simsearch.ivf_topk(
                   emb, queries, k=5, dim=64, n_centroids=64, n_probe=8, **kw
               ).collect()}
        return round(len(got & {(q, n) for q, n, _ in exact}) / len(exact), 3)

    out["ivf_recall_at_5"] = {"random": recall(), "trained": recall(centroids=cents)}
    assert out["ivf_recall_at_5"]["trained"] >= out["ivf_recall_at_5"]["random"]

    # ANN LSH top-k with corpus-side cap
    timed("ann_lsh_topk_rows", lambda: simsearch.lsh_topk(
        emb, queries, k=5, dim=64, n_bits=10, n_tables=4, max_bucket=2000
    ).count())

    print(json.dumps({"sweep": "sf10_dedup_ann", "sf_dir": sf_dir, **out}))
    spark.stop()


if __name__ == "__main__":
    main()
