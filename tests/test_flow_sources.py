"""Flow copy/validate, CSV/JSON sources, mask vars, sequence keys,
multimodal plumbing."""

import json
import os

import pytest
from pyspark.sql import functions as F

from getl_spark.flow import copy_rows, parse_map, validate_rows, write_all_to
from getl_spark.functions.multimodal import extract_features, resize_plan, synth_media
from getl_spark.lake import LakeCatalog, PartitionSpec
from getl_spark.schema import parse_ddl
from getl_spark.sequence import SequenceGenerator, assign_surrogate_keys
from getl_spark.sources import (
    already_ingested_filter,
    mask_to_regex,
    read_csv,
    read_json,
    read_with_mask_vars,
    write_csv,
)


def test_parse_map_syntax():
    rules = parse_map({"D1": "src1;format=yyyy-MM-dd", "d2": "s2;convert=false", "d3": ""})
    assert rules["d1"].source == "src1" and rules["d1"].format == "yyyy-MM-dd"
    assert rules["d2"].convert is False
    assert rules["d3"].source is None


def test_copy_rows_automap_convert_nulls(spark):
    src = spark.createDataFrame(
        [("1", "2020-01-02", "x")], "ID string, DT string, extra string"
    )
    dest = parse_ddl("id bigint, dt date, missing string")
    out = copy_rows(src, dest, mapping={"dt": "dt;format=yyyy-MM-dd"})
    row = out.collect()[0]
    assert row.id == 1
    assert str(row.dt) == "2020-01-02"
    assert row.missing is None
    assert out.schema == dest


def test_copy_rows_exclude(spark):
    src = spark.createDataFrame([(1, 2)], "a int, b int")
    dest = parse_ddl("a bigint, b bigint")
    out = copy_rows(src, dest, exclude_fields=["b"]).collect()[0]
    assert out.a == 1 and out.b is None


def test_validate_rows_split(spark):
    df = spark.createDataFrame([(1, 10), (2, -5), (None, 3)], "id int, v int")
    valid, errors = validate_rows(
        df, [("v > 0", "v must be positive"), ("id IS NOT NULL", "id required")]
    )
    assert valid.count() == 1
    errs = {r.error for r in errors.collect()}
    assert "v must be positive" in errs and "id required" in errs


def test_write_all_to_multicast(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b"), (3, "a")], "id int, k string")
    outs = {}

    def sink(name):
        def w(d):
            outs[name] = d.count()

        return w

    write_all_to(df, [("k = 'a'", sink("a")), ("k = 'b'", sink("b")), (None, sink("all"))])
    assert outs == {"a": 2, "b": 1, "all": 3}


def test_csv_roundtrip_with_corrupt_rows(spark, tmp_path):
    p = str(tmp_path / "in.csv")
    with open(p, "w") as f:
        f.write("id;name;val\n1;alice;2.5\nbad_row_only_one_field\n2;bob;3.5\n")
    schema = parse_ddl("id int, name string, val double")
    ok = read_csv(spark, p, schema=schema, field_delimiter=";")
    assert ok.count() == 2
    kept = read_csv(spark, p, schema=schema, field_delimiter=";", keep_corrupt_rows=True)
    bad = kept.filter(F.col("_corrupt_record").isNotNull())
    assert bad.count() == 1

    outdir = str(tmp_path / "out")
    write_csv(ok, outdir, field_delimiter="|", split_size=1)
    back = read_csv(spark, outdir, schema=schema, field_delimiter="|")
    assert back.count() == 2
    import glob

    assert len(glob.glob(outdir + "/*.csv")) >= 2  # splitSize=1 -> file per row


def test_json_rootnode_alias(spark, tmp_path):
    p = str(tmp_path / "in.json")
    doc = {"meta": {"v": 1}, "data": {"rows": [{"a": 1, "b": {"c": "x"}}, {"a": 2, "b": {"c": "y"}}]}}
    with open(p, "w") as f:
        json.dump(doc, f)
    df = read_json(spark, p, root_node="data.rows", aliases={"a": "a", "c_val": "b.c"})
    got = sorted([(r.a, r.c_val) for r in df.collect()])
    assert got == [(1, "x"), (2, "y")]


def test_mask_vars_and_story(spark, tmp_path):
    for region, date in [("emea", "2024-01-01"), ("apac", "2024-01-02")]:
        d = tmp_path / region / date
        d.mkdir(parents=True)
        (d / "data.csv").write_text("id\n1\n2\n")
    df = read_with_mask_vars(
        spark, str(tmp_path), "{region}/{date}/data.csv", format="csv", header=True
    )
    got = {(r.region, r.date) for r in df.select("region", "date").distinct().collect()}
    assert got == {("emea", "2024-01-01"), ("apac", "2024-01-02")}
    # story: drop already-ingested region
    story = spark.createDataFrame([("emea",)], "region string")
    rest = already_ingested_filter(df, story, ["region"])
    assert {r.region for r in rest.select("region").distinct().collect()} == {"apac"}


def test_sequence_generator_blocks(spark, tmp_warehouse):
    cat = LakeCatalog(tmp_warehouse)
    t = cat.create_table("seqtab", parse_ddl("id bigint"), PartitionSpec.none())
    gen = SequenceGenerator(t, "sk")
    assert gen.next_block(10) == 1
    assert gen.next_block(5) == 11
    assert gen.current() == 15
    # survives reload (persisted in table metadata)
    gen2 = SequenceGenerator(cat.load_table("seqtab"), "sk")
    assert gen2.next_block(1) == 16


@pytest.mark.parametrize("distributed", [False, True])
def test_assign_surrogate_keys_dense_unique(spark, distributed):
    df = spark.range(100).select((F.col("id") * 7 % 100).alias("k"))
    out = assign_surrogate_keys(df, base=501, order_cols=["k"], distributed=distributed)
    sks = sorted(r.sk for r in out.collect())
    assert sks == list(range(501, 601))
    # deterministic: same input -> same mapping
    again = assign_surrogate_keys(df, base=501, order_cols=["k"], distributed=distributed)
    m1 = {r.k: r.sk for r in out.collect()}
    m2 = {r.k: r.sk for r in again.collect()}
    assert m1 == m2


def test_multimodal_feature_plumbing(spark):
    media = synth_media(spark, 50)
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == 50
    assert all(len(r.feat) == 8 for r in rows)
    assert all(r.n_bytes == 64 for r in rows)  # sha512 payload = 64 bytes
    # deterministic across runs
    again = {r.media_id: r.sha256 for r in extract_features(media).collect()}
    assert {r.media_id: r.sha256 for r in rows} == again
    plan = resize_plan(media, max_side=128).collect()
    assert all(max(r.target_w, r.target_h) <= 128 for r in plan)


def test_multimodal_unknown_type_raises(spark):
    media = synth_media(spark, 5).withColumn("media_type", F.lit("hologram"))
    with pytest.raises(Exception, match="hologram"):
        extract_features(media).collect()
