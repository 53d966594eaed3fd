"""CDC pipeline x DedupStore composition (VERDICT r5 item 3): the
pre-merge near-dedup stage drops duplicate-content events before the
MERGE, records them durably in _dedup_rejects, and the composition
stays exactly-once under re-runs and crashes on either side of the
store commit. Mirrors getl Flow.copy + story-table skip
(proc/Flow.groovy:294-672 + files/Manager.groovy:525-567) with
content identity instead of file names."""

import datetime

import pytest

from getl_spark.dedupstore import DedupStore
from getl_spark.pipeline import CDCPipeline

WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
    "kilo lima mike november oscar papa quebec romeo sierra tango "
    "uniform victor whiskey xray yankee zulu one two three four five "
    "six seven eight nine ten eleven twelve thirteen fourteen"
)
T1 = WORDS
T1_NEAR = WORDS.rsplit(" ", 1)[0] + " fifteen"  # ~0.85 jaccard vs T1
T2 = " ".join(reversed(WORDS.split()))
T2_NEAR = "prefix " + T2
T3 = " ".join(WORDS.split()[i] for i in (0, 5, 10, 15, 20, 25, 30) for _ in range(6))
T4 = (
    "red orange yellow green blue indigo violet crimson amber teal "
    "maroon olive navy coral salmon ivory beige plum mint jade "
    "ruby topaz pearl onyx quartz slate copper bronze silver gold "
    "iron zinc nickel cobalt chrome titanium mercury lead tin argon"
)


def _ts(seq):
    return datetime.datetime(2023, 11, 14) + datetime.timedelta(seconds=seq)


def _events(spark, rows):
    """rows: (seq, op, repo, path, content|None)"""
    data = [
        (seq, op, repo, path, f"c{seq:040d}"[:40], "py", content, _ts(seq))
        for seq, op, repo, path, content in rows
    ]
    return spark.createDataFrame(
        data,
        "seq bigint, op string, repo string, path string, commit string, "
        "lang string, content string, event_ts timestamp",
    )


EPOCH0 = [
    (10, "I", "r1", "a.py", T1),
    (20, "I", "r1", "b.py", T2),
    (30, "I", "r2", "c.py", T1_NEAR),  # near-dup of seq 10 -> rejected
]
EPOCH1 = [
    (110, "I", "r2", "d.py", T2_NEAR),  # cross-epoch near-dup of 20 -> rejected
    (120, "I", "r3", "e.py", T3),       # novel -> kept
    (130, "U", "r1", "a.py", T4),  # kept update, novel vocabulary
    (140, "D", "r1", "b.py", None),     # tombstone passes through
]
EXPECTED = {  # (repo, path) -> content after dedup-aware LWW reduction
    ("r1", "a.py"): T4,
    ("r3", "e.py"): T3,
    # r1/b.py deleted; r2/c.py and r2/d.py rejected pre-merge
}


def _mk(spark, wh, **kw):
    store = DedupStore(
        str(wh), num_hashes=32, bands=8, threshold=0.6, num_buckets=16
    )
    pipe = CDCPipeline(
        spark, str(wh), num_buckets=8, dedup_store=store, **kw
    )
    return pipe, store


def _state(pipe):
    return {
        (r.repo, r.path): r.content
        for r in pipe.state().select("repo", "path", "content").collect()
    }


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_dedup_premerge_end_to_end(spark, tmp_path, mode):
    ev = _events(spark, EPOCH0 + EPOCH1)
    pipe, store = _mk(spark, tmp_path / f"wh_{mode}", merge_mode=mode)
    results = pipe.replay(ev, 100)
    assert [r.applied for r in results] == [True, True]
    assert _state(pipe) == EXPECTED

    # rejects are durable and name the doc they duplicated
    rej = {
        r.doc_id: r.dup_of for r in store.rejects.read(spark).collect()
    }
    assert rej == {30: 10, 110: 20}

    # re-run is a no-op on BOTH layers (store story filter + merge
    # epoch watermark) and the state is unchanged
    results2 = pipe.replay(ev, 100)
    assert results2 == []  # checkpoint already past both epochs
    pipe_again, store_again = _mk(spark, tmp_path / f"wh_{mode}", merge_mode=mode)
    forced = pipe_again.apply_epoch(ev.filter("seq <= 100"), 0)
    assert forced.applied is False
    assert store_again.last_batch_stats["story_path"] == "watermark-replay-noop"
    assert _state(pipe_again) == EXPECTED
    assert store_again.corpus_size() == 6  # no duplicate docs rows


def test_crash_between_store_and_merge_recovers_kept_set(spark, tmp_path):
    """The hard window: the store commits the epoch's verdicts/index,
    then the process dies before the MERGE. The replay's add_batch is
    a story no-op (returns nothing new), so the kept set MUST come
    from the persisted verdicts — and must equal the clean run's."""
    wh = tmp_path / "wh"
    ev = _events(spark, EPOCH0 + EPOCH1)
    pipe, _ = _mk(spark, wh)
    pipe.replay(ev, 100, stop_after_epoch=0)

    pipe2, store2 = _mk(spark, wh)
    real_merge = pipe2.target.merge

    def boom(*a, **k):
        raise RuntimeError("simulated crash after the store commit")

    pipe2.target.merge = boom
    with pytest.raises(RuntimeError, match="simulated crash"):
        pipe2.apply_epoch(ev.filter("seq > 100"), 1)
    # the store DID commit epoch 1's docs before the merge crashed
    assert store2.corpus_size() == 6
    pipe2.target.merge = real_merge

    pipe3, store3 = _mk(spark, wh)
    res = pipe3.replay(ev, 100)  # resumes at epoch 1
    assert [r.epoch for r in res] == [1] and res[0].applied
    assert store3.last_batch_stats["story_path"] == "watermark-replay-noop"
    assert _state(pipe3) == EXPECTED
    rej = {r.doc_id: r.dup_of for r in store3.rejects.read(spark).collect()}
    assert rej == {30: 10, 110: 20}


def test_streaming_tailer_with_dedup_store(spark, tmp_path):
    """The composed stage flows through the structured-streaming
    tailer unchanged (foreachBatch -> apply_epoch)."""
    from getl_spark.streaming import StreamingTailer

    log_dir = tmp_path / "log"
    _events(spark, EPOCH0).coalesce(1).write.mode("append").parquet(str(log_dir))
    _events(spark, EPOCH1).coalesce(1).write.mode("append").parquet(str(log_dir))
    store = DedupStore(
        str(tmp_path / "wh"), num_hashes=32, bands=8, threshold=0.6, num_buckets=16
    )
    tailer = StreamingTailer(
        spark, str(tmp_path / "wh"), str(tmp_path / "ckpt"), dedup_store=store,
        max_files_per_trigger=1,  # one micro-batch per epoch file: the
        # near-dup seeds pair with PRIOR-batch docs; in a single batch
        # their originals lose LWW and never reach the store
    )
    n = tailer.run_available_now(str(log_dir))
    assert n >= 1
    got = {
        (r.repo, r.path): r.content
        for r in tailer.state().select("repo", "path", "content").collect()
    }
    assert got == EXPECTED
    # restart over the same log: stream checkpoint + story filter +
    # merge watermark each make it a no-op
    tailer2 = StreamingTailer(
        spark, str(tmp_path / "wh"), str(tmp_path / "ckpt"), dedup_store=store,
    )
    assert tailer2.run_available_now(str(log_dir)) == 0
    assert store.corpus_size() == 6


def test_store_maintenance_between_epochs_is_transparent(spark, tmp_path):
    """Ops reality: compact/expire/orphan-sweep the store BETWEEN
    epochs of a composed pipeline. The next epoch must still dedup
    against the (maintained) standing index, replay must stay a
    no-op on both layers, and the final state must equal the
    uninterrupted run's."""
    ev = _events(spark, EPOCH0 + EPOCH1)

    # reference: uninterrupted composed run
    ref_pipe, _ = _mk(spark, tmp_path / "ref")
    ref_pipe.replay(ev, 100)
    expected = _state(ref_pipe)

    pipe, store = _mk(spark, tmp_path / "wh")
    assert pipe.replay(ev.filter("seq <= 100"), 100)[0].applied
    res = store.compact(spark)
    assert res["index"]["files_after"] <= res["index"]["files_before"]
    store.expire(keep_last=8)
    assert store.remove_orphans(older_than_seconds=0) == {
        "index": 0, "docs": 0, "rejects": 0,
    }

    # epoch 1 still dedups 110 (near-dup of 20) against the compacted
    # standing index, through the pipeline path
    assert pipe.replay(ev, 100)[0].applied
    assert _state(pipe) == expected
    rej = {r.doc_id: r.dup_of for r in store.rejects.read(spark).collect()}
    assert rej == {30: 10, 110: 20}

    # both layers still replay as no-ops after maintenance
    assert pipe.replay(ev, 100) == []


def test_cli_tail_with_dedup_store(spark, tmp_path, capsys):
    """CLI surface for the composition: tail --dedup-store runs the
    pre-merge stage; a second tail against the same store reopens it
    under the stored config and keeps deduping cross-run."""
    from getl_spark.__main__ import main

    log1, log2 = str(tmp_path / "log1"), str(tmp_path / "log2")
    _events(spark, EPOCH0).write.parquet(log1)
    _events(spark, EPOCH1).write.parquet(log2)
    wh, swh = str(tmp_path / "wh"), str(tmp_path / "store")

    import json as _json

    rc = main(["tail", "--events", log1, "--warehouse", wh,
               "--epoch-size", "100", "--num-buckets", "8",
               "--dedup-store", swh])
    assert rc == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["dedup_rejects"] == 1  # seq 30 near-dups seq 10
    assert out["rows"] == 2

    rc = main(["tail", "--events", log2, "--warehouse", wh,
               "--epoch-size", "100", "--num-buckets", "8",
               "--dedup-store", swh])
    assert rc == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["dedup_rejects"] == 2  # + seq 110 near-dups seq 20

    pipe = CDCPipeline(spark, wh, num_buckets=8)
    assert _state(pipe) == EXPECTED


@pytest.mark.parametrize("epoch_size", [1, 3, 100])
def test_composition_invariant_to_epoch_boundaries(spark, tmp_path, epoch_size):
    """Epoch-boundary invariance: the composed pipeline must land on
    the SAME final state and the SAME reject verdicts whether the log
    arrives as one epoch or one event at a time — the store's
    watermark story + the merge's seq-monotonic guards make epoch
    size purely physical."""
    ev = _events(spark, EPOCH0 + EPOCH1)
    pipe, store = _mk(spark, tmp_path / f"wh_{epoch_size}")
    pipe.replay(ev, epoch_size)
    assert _state(pipe) == EXPECTED
    rej = {r.doc_id: r.dup_of for r in store.rejects.read(spark).collect()}
    assert rej == {30: 10, 110: 20}


def test_cli_stream_with_dedup_store(spark, tmp_path, capsys):
    """stream --dedup-store: the composed stage runs inside
    foreachBatch; micro-batch replays after restart stay exactly-once
    on both layers (the second run applies nothing new)."""
    import json as _json

    from getl_spark.__main__ import main

    log = str(tmp_path / "log")
    # one file per epoch + one file per trigger: the near-dup seeds
    # pair with PRIOR-batch docs (in a single batch their originals
    # lose LWW and never reach the store)
    _events(spark, EPOCH0).coalesce(1).write.mode("append").parquet(log)
    _events(spark, EPOCH1).coalesce(1).write.mode("append").parquet(log)
    args = ["stream", "--events", log,
            "--warehouse", str(tmp_path / "wh"),
            "--checkpoint", str(tmp_path / "ckpt"),
            "--num-buckets", "8", "--max-files-per-trigger", "1",
            "--dedup-store", str(tmp_path / "store")]
    rc = main(args)
    assert rc == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["dedup_rejects"] == 2 and out["rows"] > 0

    rc = main(args)  # restart: checkpoint + story make it a no-op
    assert rc == 0
    out2 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["dedup_rejects"] == 2 and out2["rows"] == out["rows"]

    pipe = CDCPipeline(spark, str(tmp_path / "wh"), num_buckets=8)
    assert _state(pipe) == EXPECTED


# -- EmbDedupStore composition (VERDICT r6 #2): embedding events -----

V1 = [1.0 + 0.01 * i for i in range(64)]
V2 = [(-1.0) ** i * (1.0 + 0.005 * i) for i in range(64)]
V3 = [1.0 if i < 8 else -0.25 for i in range(64)]
V4 = [0.1 * ((i * 7) % 13 - 6) for i in range(64)]


def _scale(v, k):
    return [x * k for x in v]


def _emb_events(spark, rows):
    """rows: (seq, op, repo, path, embedding|None) — events carrying a
    vector column instead of text content."""
    data = [
        (seq, op, repo, path, f"c{seq:040d}"[:40], "py", None, _ts(seq), emb)
        for seq, op, repo, path, emb in rows
    ]
    return spark.createDataFrame(
        data,
        "seq bigint, op string, repo string, path string, commit string, "
        "lang string, content string, event_ts timestamp, "
        "embedding array<double>",
    )


# a scaled copy has cosine exactly 1.0 AND identical hyperplane signs,
# so the LSH candidate + exact-cosine verify are both deterministic
EMB_EPOCH0 = [
    (10, "I", "r1", "a.py", V1),
    (20, "I", "r1", "b.py", V2),
    (30, "I", "r2", "c.py", _scale(V1, 1.001)),  # near-dup of 10 -> rejected
]
EMB_EPOCH1 = [
    (110, "I", "r2", "d.py", _scale(V2, 0.999)),  # cross-epoch near-dup of 20
    (120, "I", "r3", "e.py", V3),                  # novel -> kept
    (130, "U", "r1", "a.py", V4),                  # kept update
    (140, "D", "r1", "b.py", None),                # tombstone passes through
]
EMB_EXPECTED = {("r1", "a.py"), ("r3", "e.py")}


def _mk_emb(spark, wh, **kw):
    from getl_spark.dedupstore import EmbDedupStore

    store = EmbDedupStore(
        str(wh), dim=64, threshold=0.95, n_bits=6, n_tables=4, seed=99,
        max_bucket=None, num_buckets=16,
    )
    pipe = CDCPipeline(spark, str(wh), num_buckets=8, dedup_store=store, **kw)
    return pipe, store


def _keys(pipe):
    return {(r.repo, r.path) for r in pipe.state().select("repo", "path").collect()}


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_emb_dedup_premerge_end_to_end(spark, tmp_path, mode):
    """VERDICT r6 #2: the pre-merge stage accepts an EmbDedupStore —
    embedding events near-dedup'd against the standing vector corpus,
    dropped seqs never reach the MERGE, verdicts durable, replays
    no-ops on both layers."""
    ev = _emb_events(spark, EMB_EPOCH0 + EMB_EPOCH1)
    pipe, store = _mk_emb(spark, tmp_path / f"wh_{mode}", merge_mode=mode)
    results = pipe.replay(ev, 100)
    assert [r.applied for r in results] == [True, True]
    assert _keys(pipe) == EMB_EXPECTED

    rej = {r.vec_id: r.dup_of for r in store.rejects.read(spark).collect()}
    assert rej == {30: 10, 110: 20}

    # re-run is a no-op on BOTH layers and the state is unchanged
    assert pipe.replay(ev, 100) == []
    pipe_again, store_again = _mk_emb(spark, tmp_path / f"wh_{mode}", merge_mode=mode)
    forced = pipe_again.apply_epoch(ev.filter("seq <= 100"), 0)
    assert forced.applied is False
    assert store_again.last_batch_stats["story_path"] == "watermark-replay-noop"
    assert _keys(pipe_again) == EMB_EXPECTED
    assert store_again.corpus_size() == 6  # no duplicate vector rows


def test_emb_crash_between_store_and_merge_recovers_kept_set(spark, tmp_path):
    """The hard window for the EMBEDDING store: verdicts/vectors commit,
    the process dies before the MERGE. The replay's add_batch is a
    story no-op, so the kept set MUST come from the persisted
    _embdedup_rejects via rejected_of — and equal the clean run's."""
    wh = tmp_path / "wh"
    ev = _emb_events(spark, EMB_EPOCH0 + EMB_EPOCH1)
    pipe, _ = _mk_emb(spark, wh)
    pipe.replay(ev, 100, stop_after_epoch=0)

    pipe2, store2 = _mk_emb(spark, wh)

    def boom(*a, **k):
        raise RuntimeError("simulated crash after the store commit")

    pipe2.target.merge = boom
    with pytest.raises(RuntimeError, match="simulated crash"):
        pipe2.apply_epoch(ev.filter("seq > 100"), 1)
    assert store2.corpus_size() == 6  # the store DID commit epoch 1

    pipe3, store3 = _mk_emb(spark, wh)
    res = pipe3.replay(ev, 100)  # resumes at epoch 1
    assert [r.epoch for r in res] == [1] and res[0].applied
    assert store3.last_batch_stats["story_path"] == "watermark-replay-noop"
    assert _keys(pipe3) == EMB_EXPECTED
    rej = {r.vec_id: r.dup_of for r in store3.rejects.read(spark).collect()}
    assert rej == {30: 10, 110: 20}


def test_cli_tail_with_embdedup_store(spark, tmp_path, capsys):
    """CLI surface: tail --embdedup-store creates the store on first
    use (--embdedup-dim required) and reopens it under its own stored
    config on the second run — verdict counts accumulate cross-run."""
    import json as _json

    from getl_spark.__main__ import main

    log1, log2 = str(tmp_path / "log1"), str(tmp_path / "log2")
    _emb_events(spark, EMB_EPOCH0).write.parquet(log1)
    _emb_events(spark, EMB_EPOCH1).write.parquet(log2)
    wh, swh = str(tmp_path / "wh"), str(tmp_path / "store")

    rc = main(["tail", "--events", log1, "--warehouse", wh,
               "--epoch-size", "100", "--num-buckets", "8",
               "--embdedup-store", swh, "--embdedup-dim", "64"])
    assert rc == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["dedup_rejects"] == 1  # seq 30 near-dups seq 10
    assert out["rows"] == 2

    # reopen: no --embdedup-dim needed, stored config wins
    rc = main(["tail", "--events", log2, "--warehouse", wh,
               "--epoch-size", "100", "--num-buckets", "8",
               "--embdedup-store", swh])
    assert rc == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["dedup_rejects"] == 2  # + seq 110 near-dups seq 20

    pipe = CDCPipeline(spark, wh, num_buckets=8)
    assert _keys(pipe) == EMB_EXPECTED
