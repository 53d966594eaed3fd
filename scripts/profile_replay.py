"""Per-job profile of the bench replay path (guide §1) — NOT the driver
artifact. Generates the same 2M-event log as bench.py, replays it
(CoW and MOR) with the same parameters, then reads per-job wall times
from the Spark UI REST API so the epoch cost decomposes into its
actual jobs.

Usage: python scripts/profile_replay.py [--events N] [--epochs N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from getl_spark.events import generate_change_events, read_event_log, write_event_log
from getl_spark.pipeline import CDCPipeline
from getl_spark.session import get_spark


def jobs_since(ui, app_id, min_job_id):
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/jobs?status=succeeded") as r:
        jobs = json.loads(r.read())
    out = []
    for j in jobs:
        if j["jobId"] < min_job_id:
            continue
        from datetime import datetime

        fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
        t0 = datetime.strptime(j["submissionTime"], fmt)
        t1 = datetime.strptime(j["completionTime"], fmt)
        out.append(
            (
                j["jobId"],
                (t1 - t0).total_seconds(),
                j.get("description") or j["name"],
                j["numTasks"],
            )
        )
    return sorted(out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=2_000_000)
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--mode", default="cow", choices=["cow", "mor"])
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        "getl-spark-profile", cpus=cpus, extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    ui = sc.uiWebUrl
    app_id = sc.applicationId

    tmp = tempfile.mkdtemp(prefix="getl_profile_")
    n = args.events
    ev = generate_change_events(
        spark, n, n_keys=max(n // 20, 1000), n_repos=max(n // 1000, 8), seed=42,
        partitions=cpus * 2,
    )
    log_path = os.path.join(tmp, "event_log")
    t0 = time.monotonic()
    write_event_log(ev, log_path)
    print(f"gen: {time.monotonic() - t0:.2f}s", flush=True)

    epoch_size = (n + args.epochs - 1) // args.epochs
    for trial in range(2):
        # mark the job-id watermark so we only report this trial's jobs
        probe = sc.parallelize([0], 1).count()  # noqa: F841
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/jobs") as r:
            min_id = max(j["jobId"] for j in json.loads(r.read())) + 1
        wh = os.path.join(tmp, f"wh_{args.mode}_t{trial}")
        kw = {"merge_mode": "mor"} if args.mode == "mor" else {}
        t0 = time.monotonic()
        pipe = CDCPipeline(spark, wh, num_buckets=32, write_salt=2, **kw)
        rs = pipe.replay(read_event_log(spark, log_path), epoch_size=epoch_size)
        if args.mode == "mor":
            pipe.compact()
        wall = time.monotonic() - t0
        print(f"\n=== {args.mode} trial {trial}: wall {wall:.2f}s, epochs "
              f"{[r.latency_ms for r in rs]}", flush=True)
        jobs = jobs_since(ui, app_id, min_id)
        total = sum(d for _, d, _, _ in jobs)
        print(f"  {len(jobs)} jobs, sum of job walls {total:.2f}s "
              f"(gaps/driver = {wall - total:.2f}s)")
        for jid, dur, desc, ntasks in jobs:
            if dur >= 0.15:
                print(f"  job {jid:4d} {dur:7.2f}s  tasks={ntasks:4d}  {desc[:110]}")
    spark.stop()
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
