"""Per-batch cost of the incremental dedup store vs standing-corpus
size (VERDICT r5 #1 done-criterion).

The O(new + touched buckets) contract says: ingesting the SAME-SIZED
batch must cost roughly the same whether the standing index holds S or
10S documents — the standing-index scan is semi-filtered map-side to
the batch's own band-hash buckets before anything shuffles, so batch
cost tracks the batch, not the corpus. The pre-round-6 design instead
shuffled the full index per batch (linear-per-batch).

Method: one store, fixed batch size B. Grow the standing corpus by
repeated add_batch; record each batch's wall seconds and the store's
own pruning evidence (index files read vs total). Flat-cost evidence =
sec(batch @ standing 10S) / sec(batch @ standing S) ~ 1, while
files_total grows ~10x. A tail fraction of each batch is near-dup of
earlier content so the verify stage stays exercised.

Usage: python scripts/dedupstore_bench.py [batch_size] [n_batches]
[--compact-every N] (defaults 5000 x 11 -> standing grows 5k..55k).
``--compact-every N`` runs compact() + expire() after every N batches
— the drift that remains WITHOUT it is file/snapshot metadata growth
(one file per touched bucket per batch, snapshot list O(batches)),
which is precisely what the maintenance surface reclaims. Writes one
JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from getl_spark.dedupstore import DedupStore  # noqa: E402
from getl_spark.session import get_spark  # noqa: E402

WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo "
    "lima mike november oscar papa quebec romeo sierra tango uniform victor "
    "whiskey xray yankee zulu"
).split()


def synth_batch(spark, start_id: int, n: int, dup_frac: float = 0.02):
    """Deterministic synthetic docs: 20 words drawn by hashing the doc
    id (no RNG -> reproducible across runs); a ``dup_frac`` tail
    near-duplicates doc (id - n) so cross-batch candidates exist."""
    ids = spark.range(start_id, start_id + n).withColumnRenamed("id", "doc_id")
    word = lambda i: F.element_at(  # noqa: E731
        F.lit(WORDS),
        ((F.xxhash64(F.col("doc_id") * 31 + i) % 26 + 26) % 26 + 1).cast("int"),
    )
    text = F.concat_ws(" ", *[word(i) for i in range(20)])
    n_dup = int(n * dup_frac)
    base = ids.withColumn("text", text)
    if n_dup == 0 or start_id == 0:
        return base
    # near-dup tail: same 20 words as doc_id-n with one word appended
    dup_src = F.col("doc_id") - F.lit(n)
    word_of = lambda c, i: F.element_at(  # noqa: E731
        F.lit(WORDS),
        ((F.xxhash64(c * 31 + i) % 26 + 26) % 26 + 1).cast("int"),
    )
    dup_text = F.concat_ws(" ", *[word_of(dup_src, i) for i in range(20)], F.lit("tail"))
    return base.withColumn(
        "text",
        F.when(F.col("doc_id") >= start_id + n - n_dup, dup_text).otherwise(
            F.col("text")
        ),
    )


def main():
    argv, args, compact_every = sys.argv[1:], [], None
    i = 0
    while i < len(argv):
        if argv[i] == "--compact-every":
            compact_every = int(argv[i + 1])
            i += 2
        else:
            args.append(argv[i])
            i += 1
    batch = int(args[0]) if args else 5000
    n_batches = int(args[1]) if len(args) > 1 else 11
    tmp = tempfile.mkdtemp(
        prefix="getl_ddbench_",
        dir="/dev/shm" if os.path.isdir("/dev/shm") else None,
    )
    spark = get_spark("dedupstore-bench", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    spark.sparkContext.setLogLevel("ERROR")
    try:
        store = DedupStore(
            os.path.join(tmp, "wh"),
            num_hashes=64, bands=16, threshold=0.7, max_bucket=200,
        )
        rows = []
        for b in range(n_batches):
            df = synth_batch(spark, b * batch, batch)
            t0 = time.monotonic()
            kept = store.add_batch(spark, df).count()
            sec = time.monotonic() - t0
            st = store.last_batch_stats
            rows.append(
                {
                    "standing_before": b * batch,
                    "sec": round(sec, 2),
                    "kept": kept,
                    "index_files_read": st.get("index_files_read"),
                    "index_files_total": st.get("index_files_total"),
                }
            )
            if compact_every and (b + 1) % compact_every == 0:
                t0 = time.monotonic()
                store.compact(spark)
                store.expire(keep_last=8)
                rows[-1]["maintenance_sec"] = round(time.monotonic() - t0, 2)
        # flat-cost evidence: compare the same-size batch early vs late
        # (skip batch 0: empty-store fast path; skip batch 1: JIT warm)
        early = min(r["sec"] for r in rows[1:3])
        late = min(r["sec"] for r in rows[-2:])
        growth = rows[-1]["standing_before"] / max(rows[1]["standing_before"], 1)
        print(
            json.dumps(
                {
                    "metric": "dedupstore_add_batch_flat_cost",
                    "batch_size": batch,
                    "batches": rows,
                    "sec_early": early,
                    "sec_late": late,
                    "late_over_early": round(late / early, 3),
                    "standing_growth": growth,
                    "unit": "sec",
                }
            )
        )
    finally:
        spark.stop()
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
