"""Persisted IVF index: build/probe/append lifecycle, probe-all ==
exact, parity with the one-shot ivf_topk, REAL manifest pruning
(probes must not scan unprobed cells' files), reopen from disk."""

import pytest
from pyspark.sql import functions as F

from getl_spark.annindex import AnnIndex
from getl_spark.functions import simsearch


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )


def _pairs(df):
    return {(r.query_id, r.neighbor_id, r.score) for r in df.collect()}


def test_build_search_probe_all_equals_exact(spark, emb, tmp_path):
    idx = AnnIndex(str(tmp_path / "wh"), dim=64, n_centroids=16)
    n = idx.build(spark, emb, train=True)
    assert n == emb.count()
    queries = emb.filter("vec_id < 5")
    got = _pairs(idx.search(spark, queries, k=5, n_probe=16))
    exact = _pairs(simsearch.cosine_topk(emb, queries, k=5))
    assert got == exact


def test_search_matches_one_shot_ivf_topk(spark, emb, tmp_path):
    """The persisted index and the one-shot operator share centroids
    and assignment math, so equal n_probe must yield equal results."""
    idx = AnnIndex(str(tmp_path / "wh"), dim=64, n_centroids=16)
    idx.build(spark, emb, train=True)
    queries = emb.filter("vec_id < 5")
    got = _pairs(idx.search(spark, queries, k=5, n_probe=4))
    one_shot = _pairs(
        simsearch.ivf_topk(
            emb, queries, k=5, dim=64, n_centroids=16, n_probe=4,
            centroids=idx.centroids,
        )
    )
    assert got == one_shot


def test_probe_actually_prunes_files(spark, emb, tmp_path):
    idx = AnnIndex(str(tmp_path / "wh"), dim=64, n_centroids=16)
    idx.build(spark, emb, train=True)
    queries = emb.filter("vec_id < 2")
    probe = simsearch._ivf_cells_udf(idx.centroids, 2)
    cells = sorted(
        {
            int(c)
            for r in queries.select(probe(F.col("embedding")).alias("cs")).collect()
            for c in r["cs"]
        }
    )
    buckets = idx._buckets_for_cells(spark, cells)
    total_buckets = {
        f["bucket"] for f in idx.table.current_snapshot["files"]
    }
    assert len(buckets) < len(total_buckets), (
        "a 2-query/2-probe batch must scan a strict subset of buckets"
    )
    # and the pruned search is still correct vs an unpruned re-rank
    got = _pairs(idx.search(spark, queries, k=3, n_probe=2))
    assert len(got) == queries.count() * 3


def test_reopen_from_disk_and_append(spark, emb, tmp_path):
    wh = str(tmp_path / "wh")
    AnnIndex(wh, dim=64, n_centroids=16).build(spark, emb, train=True)

    # fresh object (simulating a new process) loads centroids from disk
    idx2 = AnnIndex(wh, dim=64, n_centroids=16)
    assert idx2.centroids is not None
    dup = emb.filter("vec_id = 3").select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    assert idx2.append(spark, dup) == 1
    got = idx2.search(spark, emb.filter("vec_id = 3"), k=1, n_probe=1)
    top = got.collect()[0]
    assert top.neighbor_id == 100003 and top.score == 1.0

    with pytest.raises(ValueError, match="config mismatch"):
        AnnIndex(wh, dim=64, n_centroids=32)


def test_unbuilt_index_raises(spark, emb, tmp_path):
    idx = AnnIndex(str(tmp_path / "wh"), dim=64)
    with pytest.raises(ValueError, match="not built"):
        idx.search(spark, emb.limit(1))


def test_append_then_compact_preserves_results(spark, emb, tmp_path):
    """Appends fragment buckets (one file per touched bucket per
    batch); compact() folds them and probes return identical results."""
    idx = AnnIndex(str(tmp_path / "wh"), dim=64, n_centroids=16)
    idx.build(spark, emb.filter("vec_id < 400"), train=True)
    for lo, hi in [(400, 450), (450, 500)]:
        idx.append(spark, emb.filter(f"vec_id >= {lo} AND vec_id < {hi}"))
    before = idx.stats(spark)
    assert before["rows"] == 500
    queries = emb.filter("vec_id < 5")
    res_before = _pairs(idx.search(spark, queries, k=5, n_probe=16))
    idx.compact(spark)
    after = idx.stats(spark)
    assert after["rows"] == 500
    assert after["data_files"] < before["data_files"]
    assert after["max_files_per_bucket"] == 1
    assert _pairs(idx.search(spark, queries, k=5, n_probe=16)) == res_before
