"""Cost of the CDC x dedup composition: replay the SAME event log with
and without the DedupStore pre-merge stage and report the overhead.

The pre-merge stage minhash-bands every epoch's winner I/U content
against the standing store (getl Flow + story composition recast to
content identity), so the fair question is what that costs on top of
the bare replay — per event, at the same epoch sizes the headline
uses. Writes one JSON line.

Usage: python scripts/pipeline_dedup_bench.py [n_events] [n_epochs]
(defaults 500000 x 4, local[$SPARK_GRAFT_CPUS or 32], tmpfs).

Sweep mode (VERDICT r6 #3 — fixed-cost amortization): pass a comma
list of epoch COUNTS as the second argument (e.g. ``2000000 16,4,1``)
to replay the same generated log at several epoch sizes and print one
JSON line per size. The per-epoch fixed cost of the composed stage
(story metadata, banding job setup, store commits) amortizes with
epoch size, so the overhead factor must fall monotonically as epochs
get larger — the same mechanism already proven for bare replay in the
8->32 scaling pair.

``--emb``: compose an :class:`EmbDedupStore` instead of the text
store. The event log gains a deterministic 16-dim embedding derived
JVM-side from the content (xxhash64 per dimension, identical content
=> identical vector, cosine 1.0) BEFORE it is written, so the bare
and composed runs read byte-identical input and the overhead isolates
the store stage, not column derivation.
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

from getl_spark.dedupstore import DedupStore, EmbDedupStore  # noqa: E402
from getl_spark.events import (  # noqa: E402
    generate_change_events,
    read_event_log,
    write_event_log,
)
from getl_spark.pipeline import CDCPipeline  # noqa: E402
from getl_spark.session import get_spark  # noqa: E402


EMB_DIM = 16


def main():
    argv = [a for a in sys.argv[1:] if a != "--emb"]
    emb = "--emb" in sys.argv[1:]
    n_events = int(argv[0]) if len(argv) > 0 else 500_000
    epoch_counts = [int(x) for x in (argv[1] if len(argv) > 1 else "4").split(",")]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    tmp = tempfile.mkdtemp(
        prefix="getl_pdbench_",
        dir="/dev/shm" if os.path.isdir("/dev/shm") else None,
    )
    spark = get_spark("pipeline-dedup-bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    try:
        log = os.path.join(tmp, "log")
        ev = generate_change_events(
            spark, n_events, n_keys=max(n_events // 20, 1000),
            n_repos=max(n_events // 1000, 8), seed=42, partitions=cpus * 2,
        )
        if emb:
            # identical content => identical vector (cosine 1.0); the
            # column rides in the LOG so both runs read the same bytes
            ev = ev.withColumn(
                "embedding",
                F.array(*[
                    (F.pmod(F.xxhash64("content", F.lit(i)), F.lit(1000))
                     / 500.0 - 1.0)
                    for i in range(EMB_DIM)
                ]),
            )
        write_event_log(ev, log)

        def run(with_store: bool, trial: int, epoch_size: int) -> tuple[float, dict]:
            wh = os.path.join(tmp, f"wh_{with_store}_{trial}")
            if not with_store:
                store = None
            elif emb:
                store = EmbDedupStore(
                    os.path.join(wh, "_store"), dim=EMB_DIM, threshold=0.999,
                    n_bits=12, n_tables=4, max_bucket=1000,
                )
            else:
                store = DedupStore(os.path.join(wh, "_store"), num_hashes=32,
                                   bands=16, threshold=0.7, max_bucket=200)
            pipe = CDCPipeline(
                spark, wh, num_buckets=32, write_salt=2, dedup_store=store
            )
            t0 = time.monotonic()
            pipe.replay(read_event_log(spark, log), epoch_size=epoch_size)
            sec = time.monotonic() - t0
            info = {"rows": pipe.target.count_rows()}
            if store is not None:
                info["corpus"] = store.corpus_size()
                info["rejects"] = store.rejects.count_rows()
            shutil.rmtree(wh, ignore_errors=True)
            return sec, info

        for n_epochs in epoch_counts:
            epoch_size = (n_events + n_epochs - 1) // n_epochs
            base = min(run(False, t, epoch_size)[0] for t in range(2))
            sec1, info1 = run(True, 0, epoch_size)
            sec2, info2 = run(True, 1, epoch_size)
            withd, info = (sec1, info1) if sec1 < sec2 else (sec2, info2)
            print(
                json.dumps(
                    {
                        "metric": "cdc_dedup_composition_overhead",
                        "mode": "embedding" if emb else "text",
                        "events": n_events,
                        "epochs": n_epochs,
                        "epoch_size": epoch_size,
                        "replay_sec_bare": round(base, 2),
                        "replay_sec_with_dedup": round(withd, 2),
                        "overhead_factor": round(withd / base, 3),
                        "eps_bare": round(n_events / base, 1),
                        "eps_with_dedup": round(n_events / withd, 1),
                        "docs_indexed": info.get("corpus"),
                        "docs_rejected": info.get("rejects"),
                        "unit": "sec",
                    }
                ),
                flush=True,
            )
    finally:
        spark.stop()
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
