"""Per-query isolation bench (guide §1.4) — NOT the driver artifact.

Times each bench-path query separately (same .count() methodology as
the frozen bench.py, min-of-N), optionally with the noop sink for
sink-free isolation, and writes .explain("formatted") for every query
to plans/<tag>/<name>_<suffix>.txt so plan claims are auditable.

Usage:
  python bench_extra.py [--sf-dir D] [--trials N] [--plans-tag r08]
                        [--suffix before|after] [--queries a,b,c]
                        [--noop] [--skip-plans]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from getl_spark.session import get_spark


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"))
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--plans-tag", default="r08")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--queries", default="")
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--skip-plans", action="store_true")
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("getl-spark-bench-extra", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    from getl_spark.functions import dedupe as _dd
    from getl_spark.functions import simsearch as _ss
    from getl_spark.queries import all_queries

    sf_dir = args.sf_dir
    qs = all_queries()
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    builders = {
        name: (lambda n=name: qs[n](spark, sf_dir))
        for name in (
            "tpch_q1", "shipping_priority", "segment_revenue", "cdc_lww_latest",
            "cdc_final_state", "story_anti_join", "window_running", "fingerprint",
            "dedup_exact", "minhash_lsh_pairs", "simhash_pairs", "simsearch_topk",
            "emb_near_dups",
        )
    }
    builders["minhash_lsh_pairs_prod"] = lambda: _dd.lsh_candidate_pairs(
        docs, num_hashes=32, bands=8, hash_fn="xxhash64", max_bucket=100
    )
    builders["simhash_pairs_prod"] = lambda: _dd.simhash_duplicates(
        docs, hash_fn="xxhash64", max_bucket=100, hamming_k=8
    )

    selected = [q.strip() for q in args.queries.split(",") if q.strip()] or list(builders)
    plans_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", args.plans_tag)
    os.makedirs(plans_dir, exist_ok=True)

    out = {}
    for name in selected:
        build = builders[name]
        if not args.skip_plans:
            df = build()
            with open(os.path.join(plans_dir, f"{name}_{args.suffix}.txt"), "w") as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        best = None
        for t in range(args.trials):
            spark.sparkContext.setJobDescription(f"{name} trial {t}")
            df = build()
            t0 = time.monotonic()
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            sec = time.monotonic() - t0
            best = sec if best is None else min(best, sec)
            spark.sparkContext.setJobDescription(None)
        out[name] = round(best, 3)
        print(f"  {name}: {out[name]}s", file=sys.stderr)

    print(json.dumps({"sf_dir": sf_dir, "noop": args.noop, "trials": args.trials,
                      "queries": out, "total": round(sum(out.values()), 3)}))
    spark.stop()


if __name__ == "__main__":
    main()
