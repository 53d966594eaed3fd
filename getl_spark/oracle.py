"""Pandas reference reducer — the trivially-correct oracle.

Replays an event log in plain pandas (sort by seq, last state per key,
delete removes the key) to produce the expected final table state.
Used only at test scale (<= 1e5 events); the engine is compared to it
via per-row ``sha2(content, 256)`` equality (BASELINE.md invariant).

Reference parity: mirrors how getl tests compute expectations in-test
(/root/reference/src/test/groovy/getl/jdbc/JDBCDriverProto.groovy:632-636).
"""

from __future__ import annotations

import hashlib

import pandas as pd


def reduce_events(events: pd.DataFrame, tiebreak: str = "commit") -> pd.DataFrame:
    """Final state: for each (repo, path) the last event by (seq, tiebreak);
    keys whose last op is D are absent. Returns columns
    (repo, path, commit, lang, content, _seq) sorted by key."""
    ev = events.sort_values(["seq", tiebreak], kind="mergesort")
    last = ev.groupby(["repo", "path"], as_index=False).last()
    alive = last[last["op"] != "D"].copy()
    alive = alive.rename(columns={"seq": "_seq"})
    cols = ["repo", "path", "commit", "lang", "content", "_seq"]
    return alive[cols].sort_values(["repo", "path"]).reset_index(drop=True)


def sha256_state(final: pd.DataFrame) -> pd.DataFrame:
    """(repo, path, content_sha256) for the per-row invariant check."""
    out = final[["repo", "path"]].copy()
    out["content_sha256"] = final["content"].map(
        lambda c: hashlib.sha256(c.encode("utf-8")).hexdigest() if c is not None else None
    )
    return out.sort_values(["repo", "path"]).reset_index(drop=True)


def assert_final_state_matches(engine_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> None:
    """Assert engine table state == oracle state: same keys, same
    content sha256, same commit/lang/_seq."""
    e = engine_pdf.sort_values(["repo", "path"]).reset_index(drop=True)
    o = oracle_pdf.sort_values(["repo", "path"]).reset_index(drop=True)
    e_keys = list(zip(e["repo"], e["path"]))
    o_keys = list(zip(o["repo"], o["path"]))
    assert e_keys == o_keys, (
        f"key sets differ: engine-only={set(e_keys) - set(o_keys)} "
        f"oracle-only={set(o_keys) - set(e_keys)}"
    )
    eh = sha256_state(e)["content_sha256"].tolist()
    oh = sha256_state(o)["content_sha256"].tolist()
    mismatch = [k for k, a, b in zip(e_keys, eh, oh) if a != b]
    assert not mismatch, f"content sha256 mismatch for keys: {mismatch[:5]}"
    for col in ("commit", "lang", "_seq"):
        if col in e.columns and col in o.columns:
            bad = [
                k
                for k, a, b in zip(e_keys, e[col], o[col])
                if a != b
            ]
            assert not bad, f"{col} mismatch for keys: {bad[:5]}"
