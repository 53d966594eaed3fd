"""Two-cluster-size scaling evidence (BASELINE.json north rule).

A real N vs 4N executor comparison is impossible in this sandbox, so —
as BASELINE.md specifies — the same replay job runs at two local
parallelism levels (local[N] and local[4N]) over the IDENTICAL
pre-generated event log, and we report throughput at both plus
scaling efficiency = (t_N / t_4N) / 4.

Each measurement is a fresh JVM (subprocess) with a fresh warehouse:
no page-cache-warm JVM reuse between levels; the log directory is
shared so data is byte-identical.

I/O placement: warehouse, event log, and spark.local.dir live on
tmpfs (/dev/shm). The sandbox's single virtio disk tops out at
~745 MB/s regardless of thread count (measured with dd oflag=direct),
which caps ANY multi-core run at the disk, not the engine — while a
real N->4N cluster multiplies aggregate disk bandwidth by 4 along
with the cores. tmpfs models that per-node-scaled I/O so the
measurement reflects the engine's scalability. The disk ceiling and
this placement are disclosed in BENCH.md.

Usage: python scripts/scaling_bench.py [n_events] [N] [--weak]
``--weak`` gives the 4N level 4x the events (constant per-core memory
traffic — the honest analog of a cluster scale-up where each node
keeps its own data share). Writes JSON to stdout; results belong in
BENCH.md.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_replay(cpus: int, n_events: int, log_path: str, trials: int = 2) -> dict:
    """Best of ``trials`` fresh-JVM runs: single-JVM local mode has
    occasional multi-second GC stalls at high thread counts that a
    real per-executor-JVM cluster doesn't see; min-of-trials controls
    for them (disclosed in BENCH.md)."""
    best = None
    for t in range(trials):
        env = dict(os.environ)
        env.update(
            {
                "SPARK_GRAFT_CPUS": str(cpus),
                "SPARK_GRAFT_BENCH_EVENTS": str(n_events),
                "SPARK_GRAFT_BENCH_MODE": "replay_only",
                # this harness already takes min over fresh JVMs; one
                # in-JVM trial each keeps the levels comparable to r2/r3
                "SPARK_GRAFT_BENCH_TRIALS": "1",
                "SPARK_GRAFT_EVENT_LOG": log_path,
                "SPARK_GRAFT_TMP": "/dev/shm",
                "SPARK_GRAFT_LOCAL_DIR": f"/dev/shm/spark-local-{cpus}",
                "PYTHONPATH": REPO,
            }
        )
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env,
            capture_output=True,
            text=True,
            timeout=3600,
        )
        lines = out.stdout.strip().splitlines()
        if not lines:
            raise RuntimeError(
                f"bench.py (cpus={cpus}) produced no output; stderr tail:\n"
                + "\n".join(out.stderr.strip().splitlines()[-15:])
            )
        res = json.loads(lines[-1])
        if best is None or res["queries"]["replay"] < best["queries"]["replay"]:
            best = res
    return best


def generate_log(n_events: int, log_path: str) -> None:
    """Generate ONCE at full width (generation speed is not under test)."""
    gen_env = dict(os.environ)
    gen_env.update({"PYTHONPATH": REPO})
    subprocess.run(
        [
            sys.executable,
            "-c",
            f"""
import sys; sys.path.insert(0, {REPO!r})
from getl_spark.session import get_spark
from getl_spark.events import generate_change_events, write_event_log
spark = get_spark("gen", cpus=32)
spark.sparkContext.setLogLevel("ERROR")
ev = generate_change_events(spark, {n_events}, n_keys=max({n_events}//20,1000),
                            n_repos=max({n_events}//1000,8), seed=42, partitions=64)
write_event_log(ev, {log_path!r})
spark.stop()
""",
        ],
        env=gen_env,
        check=True,
        capture_output=True,
        timeout=3600,
    )


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    weak = "--weak" in sys.argv
    n_events = int(args[0]) if args else 2_000_000
    n = int(args[1]) if len(args) > 1 else 8
    tmp = tempfile.mkdtemp(prefix="getl_scaling_", dir="/dev/shm")
    log_path = os.path.join(tmp, "event_log")
    try:
        generate_log(n_events, log_path)
        lo = run_replay(n, n_events, log_path)
        if weak:
            # WEAK scaling: 4N cores get 4x the events — constant
            # memory traffic per core per unit time, the honest analog
            # of an N->4N *cluster* scale-up where every node keeps its
            # own data share (BASELINE.md's alternative evidence form).
            # Ideal: equal wall time, 4x throughput; efficiency formula
            # below is unchanged because eps_hi reflects 4x events.
            log_hi = os.path.join(tmp, "event_log_4x")
            generate_log(4 * n_events, log_hi)
            hi = run_replay(4 * n, 4 * n_events, log_hi)
        else:
            hi = run_replay(4 * n, n_events, log_path)
        t_lo, t_hi = lo["queries"]["replay"], hi["queries"]["replay"]
        s_lo = lo.get("events_per_sec_steady", lo["events_per_sec"])
        s_hi = hi.get("events_per_sec_steady", hi["events_per_sec"])
        m_lo = lo.get("events_per_sec_mor_steady", 0)
        m_hi = hi.get("events_per_sec_mor_steady", 0)
        print(
            json.dumps(
                {
                    "mode": "weak (4N runs 4x events)" if weak else "strong (same input)",
                    "n_events": n_events,
                    "N": n,
                    "4N": 4 * n,
                    f"replay_sec_local[{n}]": t_lo,
                    f"replay_sec_local[{4*n}]": t_hi,
                    f"events_per_sec_local[{n}]": lo["events_per_sec"],
                    f"events_per_sec_local[{4*n}]": hi["events_per_sec"],
                    f"steady_eps_local[{n}]": s_lo,
                    f"steady_eps_local[{4*n}]": s_hi,
                    f"mor_steady_eps_local[{n}]": m_lo,
                    f"mor_steady_eps_local[{4*n}]": m_hi,
                    "speedup_wall": round(t_lo / t_hi, 3),
                    # strong: ideal wall = t_lo/4. weak: 4N chews 4x the
                    # events, ideal wall = t_lo (no /4).
                    "scaling_efficiency_wall": round(
                        (t_lo / t_hi) if weak else (t_lo / t_hi) / 4.0, 3
                    ),
                    "scaling_efficiency_steady": round((s_hi / s_lo) / 4.0, 3),
                    "scaling_efficiency_mor_steady": round((m_hi / m_lo) / 4.0, 3) if m_lo else None,
                }
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        for c in (n, 4 * n):
            shutil.rmtree(f"/dev/shm/spark-local-{c}", ignore_errors=True)


if __name__ == "__main__":
    main()
