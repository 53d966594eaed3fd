"""Deterministic scale-factor data generator (sf1+ oracle sweeps).

The driver ships sf0.001/0.01/0.1 read-only (TESTDATA.md); sweeping the
oracle suite at sf1 (VERDICT r3 item 3) needs a local 10x dataset with
the SAME schemas and distribution character:

- orders span 1995-2001 (the set-op split at 1998 stays non-vacuous)
- documents carry exact + near duplicates and shared-boilerplate spans
  (the dedup oracles must have organic positives)
- embeddings form 10 gaussian clusters (ANN/near-dup structure)
- events carry JSON props with key "k"

Spark-vs-DuckDB oracles compare both engines on the SAME parquet, so
the generator need not byte-match the driver's — only be deterministic
(seeded numpy, single-process writes) and structurally faithful.

Usage:
    python scripts/gen_sf.py /tmp/sf1 10        # 10x sf0.1 == sf1
    python scripts/gen_sf.py /tmp/sf0.1x 1      # sanity: sf0.1-sized
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# sf0.1 row counts (TESTDATA.md); `scale` multiplies these
BASE = {
    "customer": 15_000,
    "supplier": 1_000,
    "part": 20_000,
    "orders": 150_000,
    "lineitem": 600_000,
    "events": 100_000,
    "documents": 5_000,
    "embeddings": 2_000,
}

VOCAB = (
    "spark line column order small sort fast value scan batch part a the "
    "query agg table hash big merge group stream filter key join vector "
    "slow customer cache shuffle plan skew salt codec page row disk "
    "driver executor stage task broadcast exchange codegen predicate prune "
    "bucket manifest snapshot commit epoch lineage watermark checkpoint "
    "tombstone delta compact orphan segment shard replica quorum ledger "
    "vectorized arrow pandas parquet footer stats bloom dictionary rle "
    "grammar token corpus shingle winnow fingerprint jaccard cosine "
    "cluster centroid probe recall precision latency throughput spill "
    "memory buffer pool heap offload tier cold warm hot fresh stale"
).split()


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows")


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    scale = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(42)
    n = {k: int(v * scale) for k, v in BASE.items()}

    # -- dimension tables (fixed size at every sf, like TPC-H)
    _write(out_dir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
    }))
    _write(out_dir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    nc = n["customer"]
    _write(out_dir, "customer", pa.table({
        "c_custkey": pa.array(range(nc), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(nc)],
        "c_nationkey": pa.array(rng.integers(0, 25, nc), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-999, 9999, nc), 2),
        "c_mktsegment": np.array(
            ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
        )[rng.integers(0, 5, nc)],
    }))

    ns = n["supplier"]
    _write(out_dir, "supplier", pa.table({
        "s_suppkey": pa.array(range(ns), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(ns)],
        "s_nationkey": pa.array(rng.integers(0, 25, ns), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-999, 9999, ns), 2),
    }))

    npart = n["part"]
    adj = ["large", "hot", "blue", "dim", "thin", "red", "pale", "mint"]
    noun = ["ring", "bolt", "case", "drum", "pin", "tube", "coil", "cap"]
    _write(out_dir, "part", pa.table({
        "p_partkey": pa.array(range(npart), pa.int64()),
        "p_name": [f"{adj[i % 8]} {noun[(i // 8) % 8]}" for i in range(npart)],
        "p_brand": [f"Brand#{int(b)}" for b in rng.integers(1, 26, npart)],
        "p_type": np.array(["ECONOMY", "LARGE", "MEDIUM", "SMALL", "STANDARD"])[
            rng.integers(0, 5, npart)
        ],
        "p_size": pa.array(rng.integers(1, 51, npart), pa.int32()),
        "p_retailprice": np.round(900 + np.arange(npart) * 0.1 % 1100, 2),
    }))

    no = n["orders"]
    # dates span 1995-01-01 .. 2001-12-31 (2557 days) — uniform, so the
    # 1998 set-op split keeps both branches populated at any sf
    day0 = np.datetime64("1995-01-01")
    odates = day0 + rng.integers(0, 2557, no).astype("timedelta64[D]")
    _write(out_dir, "orders", pa.table({
        "o_orderkey": pa.array(range(no), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, nc, no), pa.int64()),
        "o_orderstatus": np.array(["O", "F", "P"])[rng.integers(0, 3, no)],
        "o_totalprice": np.round(rng.uniform(900, 450_000, no), 2),
        "o_orderdate": pa.array(odates.astype("datetime64[us]")),
        "o_orderpriority": np.array(
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
        )[rng.integers(0, 5, no)],
    }))

    nl = n["lineitem"]
    sdates = day0 + rng.integers(0, 2557, nl).astype("timedelta64[D]")
    _write(out_dir, "lineitem", pa.table({
        "l_orderkey": pa.array(rng.integers(0, no, nl), pa.int64()),
        "l_partkey": pa.array(rng.integers(0, npart, nl), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, ns, nl), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, nl), pa.int32()),
        "l_quantity": rng.integers(1, 51, nl).astype("float64"),
        "l_extendedprice": np.round(rng.uniform(900, 100_000, nl), 2),
        "l_discount": np.round(rng.integers(0, 11, nl) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, nl) / 100.0, 2),
        "l_returnflag": np.array(["A", "N", "R"])[rng.integers(0, 3, nl)],
        "l_linestatus": np.array(["F", "O"])[rng.integers(0, 2, nl)],
        "l_shipdate": pa.array(sdates.astype("datetime64[us]")),
    }))

    ne = n["events"]
    ts0 = np.datetime64("2024-01-01T00:00:00", "us")
    gaps = rng.integers(1_000_000, 60_000_000, ne)  # 1-60s in us
    _write(out_dir, "events", pa.table({
        "event_id": pa.array(range(ne), pa.int64()),
        "ts": pa.array(ts0 + np.cumsum(gaps).astype("timedelta64[us]")),
        "user_id": pa.array(rng.integers(0, max(ne // 50, 10), ne), pa.int64()),
        "event_type": np.array(["click", "view", "purchase", "signup", "error"])[
            rng.integers(0, 5, ne)
        ],
        "value": np.round(rng.uniform(0, 500, ne), 2),
        "props": [f'{{"k": {int(k)}}}' for k in rng.integers(0, 100, ne)],
    }))

    nd = n["documents"]
    langs = np.array(["en"] * 90 + ["de"] * 4 + ["fr"] * 3 + ["zh"] * 3)
    boiler = "copyright holder grants permission to use this software without fee"
    texts: list[str] = []
    for i in range(nd):
        nw = int(rng.integers(12, 60))
        words = [VOCAB[j] for j in rng.integers(0, len(VOCAB), nw)]
        t = " ".join(words)
        r = i % 1000
        if r == 1:
            t = texts[-1]  # exact duplicate of the previous doc
        elif r == 3:
            # near duplicate: previous doc with a few words swapped
            w = texts[-1].split()
            for p in rng.integers(0, len(w), max(len(w) // 10, 1)):
                w[int(p)] = VOCAB[int(rng.integers(0, len(VOCAB)))]
            t = " ".join(w)
        elif r in (5, 6, 7):
            t = boiler + " " + t  # shared-boilerplate-span cluster
        texts.append(t)
    _write(out_dir, "documents", pa.table({
        "doc_id": pa.array(range(nd), pa.int64()),
        "text": texts,
        "lang": langs[rng.integers(0, len(langs), nd)],
        "source": [f"src{int(s)}" for s in rng.integers(0, 20, nd)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    nv = n["embeddings"]
    dim, k = 64, 10
    centroids = rng.normal(0, 1, (k, dim))
    labels = rng.integers(0, k, nv)
    # noise comparable to the cluster signal: in-cluster cosine ~0.45,
    # so clusters shape ANN recall without every in-cluster pair being
    # a near-duplicate (0.15 noise made cos~0.8 and turned the sf1
    # near-dup sweep into an n^2-positives stress test — which passed,
    # but is not a realistic corpus)
    vecs = centroids[labels] * 0.3 + rng.normal(0, 0.32, (nv, dim))
    # seed exact-scale near-dups: every 200th vector is a tiny
    # perturbation of its predecessor (embedding near-dup positives)
    for i in range(1, nv, 200):
        vecs[i] = vecs[i - 1] + rng.normal(0, 0.002, dim)
        labels[i] = labels[i - 1]
    _write(out_dir, "embeddings", pa.table({
        "vec_id": pa.array(range(nv), pa.int64()),
        "embedding": pa.array(
            [v.astype(np.float32) for v in vecs], pa.list_(pa.float32())
        ),
        "label": pa.array(labels, pa.int32()),
    }))
    print(f"wrote {out_dir} at scale {scale} (sf{0.1 * scale:g})")


if __name__ == "__main__":
    main()
