"""Operational FileCopier/FileCleaner: distributed listing, multicast
copy, rename/destination masks, segmented sharding, move semantics,
story-based exactly-once rerun (CopyTest 81->0 analog), cleaner."""

import os

import pytest
from pyspark.sql import functions as F

from getl_spark.filecopy import clean_files, copy_files, list_files


@pytest.fixture()
def src_tree(tmp_path):
    base = tmp_path / "src"
    for region, date, i in [
        ("emea", "2024-01-01", 1),
        ("emea", "2024-01-01", 2),
        ("emea", "2024-01-02", 3),
        ("apac", "2024-01-01", 4),
        ("apac", "2024-01-02", 5),
    ]:
        d = base / region / date
        d.mkdir(parents=True, exist_ok=True)
        (d / f"data_{i}.csv").write_text(f"id\n{i}\n")
    (base / "root.csv").write_text("id\n0\n")
    return str(base)


def test_list_files_mask_vars_and_builtins(spark, src_tree):
    lst = list_files(spark, src_tree, "{region}/{date}/data_{num}.csv").toPandas()
    assert len(lst) == 5
    assert set(lst["region"]) == {"emea", "apac"}
    assert set(lst["fileextonly"]) == {"csv"}
    assert (lst["filesize"] > 0).all()
    assert lst["filenameonly"].str.startswith("data_").all()
    # bare-root files match a root-level mask
    root = list_files(spark, src_tree, "*.csv").toPandas()
    assert list(root["filename"]) == ["root.csv"]


def test_copy_multicast_preserves_relpath(spark, src_tree, tmp_path):
    d1, d2 = str(tmp_path / "d1"), str(tmp_path / "d2")
    res = copy_files(
        spark, src_tree, "{region}/{date}/data_{num}.csv", [d1, d2]
    ).toPandas()
    assert len(res) == 10 and res["ok"].all()
    for d in (d1, d2):
        assert os.path.exists(os.path.join(d, "emea/2024-01-01/data_1.csv"))
        assert os.path.exists(os.path.join(d, "apac/2024-01-02/data_5.csv"))
    # sources untouched (copy, not move)
    assert os.path.exists(os.path.join(src_tree, "emea/2024-01-01/data_1.csv"))


def test_copy_rename_and_dest_path_masks(spark, src_tree, tmp_path):
    d1 = str(tmp_path / "out")
    res = copy_files(
        spark,
        src_tree,
        "{region}/{date}/data_{num}.csv",
        [d1],
        dest_path_mask="{date}/{region}",
        rename_mask="{region}_{num}.{fileextonly}",
    ).toPandas()
    assert res["ok"].all()
    assert os.path.exists(os.path.join(d1, "2024-01-01/emea/emea_1.csv"))
    assert os.path.exists(os.path.join(d1, "2024-01-02/apac/apac_5.csv"))
    with pytest.raises(ValueError, match="unknown variable"):
        copy_files(spark, src_tree, "{region}/{date}/data_{num}.csv", [d1],
                   rename_mask="{nope}.csv").toPandas()


def test_copy_custom_mask_equal_to_relpath_keeps_directory(spark, tmp_path):
    """A custom dest_path_mask whose rendered value coincides with a
    file's relpath must still be used as the directory (the blanking
    guard applies only to the default preserve-relpath branch)."""
    base = tmp_path / "flat"
    base.mkdir()
    (base / "a.txt").write_text("x")
    out = str(tmp_path / "out")
    res = copy_files(
        spark, str(base), "*.txt", [out], dest_path_mask="{filename}"
    ).toPandas()
    assert res["ok"].all()
    assert os.path.exists(os.path.join(out, "a.txt", "a.txt"))


def test_copy_segmented_shards_across_destinations(spark, src_tree, tmp_path):
    dests = [str(tmp_path / f"shard{i}") for i in range(2)]
    res = copy_files(
        spark, src_tree, "{region}/{date}/data_{num}.csv", dests,
        segmented_by=["region"],
    ).toPandas()
    assert len(res) == 5 and res["ok"].all()  # ONE destination per file
    by_dest = res.groupby(res["dest"].str.contains("shard0"))["filepath"].count()
    assert by_dest.sum() == 5
    # same segment key -> same shard: all emea files landed together
    emea_shards = {d.split("/")[-4] for d in res[res["dest"].str.contains("emea")]["dest"]}
    assert len(emea_shards) == 1


def test_move_deletes_source_and_story_rerun_is_exactly_once(spark, src_tree, tmp_path):
    d1 = str(tmp_path / "moved")
    mask = "{region}/{date}/data_{num}.csv"
    res1 = copy_files(spark, src_tree, mask, [d1], delete_source=True).toPandas()
    assert len(res1) == 5 and res1["ok"].all()
    # sources gone, dests present
    assert not os.path.exists(os.path.join(src_tree, "emea/2024-01-01/data_1.csv"))
    assert os.path.exists(os.path.join(d1, "emea/2024-01-01/data_1.csv"))
    # rerun: nothing left to copy (the 81->0 pattern, via listing alone)
    res2 = copy_files(spark, src_tree, mask, [d1]).toPandas()
    assert len(res2) == 0

    # story-based exactly-once WITHOUT move: re-create a tree, copy,
    # then rerun with the story of successful copies -> zero work even
    # though the sources still exist
    src2 = str(tmp_path / "src2")
    for i in range(3):
        os.makedirs(os.path.join(src2, f"r{i}"), exist_ok=True)
        with open(os.path.join(src2, f"r{i}", "f.csv"), "w") as fh:
            fh.write("x\n")
    d2 = str(tmp_path / "d2")
    first = copy_files(spark, src2, "{r}/f.csv", [d2])
    story = first.filter(F.col("ok")).select("filepath").distinct()
    assert first.count() == 3
    again = copy_files(spark, src2, "{r}/f.csv", [d2], story=story)
    assert again.count() == 0


def test_copy_retries_and_reports_failure(spark, src_tree, tmp_path):
    """An uncreatable destination fails after number_attempts retries
    with the error recorded — and does not fail the whole job."""
    blocked = tmp_path / "blocked"
    blocked.write_text("a file, not a dir")
    res = copy_files(
        spark, src_tree, "{region}/{date}/data_{num}.csv",
        [str(blocked / "sub")], number_attempts=2, time_between_attempts=0.01,
    ).toPandas()
    assert len(res) == 5 and (~res["ok"]).all()
    assert (res["attempts"] == 2).all()
    assert res["error"].str.len().gt(0).all()


def test_clean_files_with_story_scope(spark, src_tree):
    lst = list_files(spark, src_tree, "{region}/{date}/data_{num}.csv")
    story = lst.filter(F.col("region") == "emea").select("filepath")
    res = clean_files(spark, src_tree, "{region}/{date}/data_{num}.csv", story=story).toPandas()
    assert len(res) == 3 and res["ok"].all()  # only the emea files
    left = list_files(spark, src_tree, "{region}/{date}/data_{num}.csv").toPandas()
    assert set(left["region"]) == {"apac"} and len(left) == 2


def test_copy_and_clean_execute_eagerly_and_once(spark, src_tree, tmp_path):
    """Mutating file operators run their I/O at call time (no action
    needed) and exactly once — a second action on the result must NOT
    redo the copies (mapInPandas would otherwise re-execute per job)."""
    d1 = str(tmp_path / "eager")
    res = copy_files(spark, src_tree, "{region}/{date}/data_{num}.csv", [d1])
    # no action taken on res yet — the files must already be there
    assert os.path.exists(os.path.join(d1, "emea/2024-01-01/data_1.csv"))
    # delete a source, then run MORE actions on the result: cached
    # status is served, the copy plan is not re-executed (which would
    # now fail on the missing source)
    os.remove(os.path.join(src_tree, "emea/2024-01-01/data_1.csv"))
    assert res.count() == 5 and res.filter(F.col("ok")).count() == 5
    # clean is likewise eager
    clean_files(spark, src_tree, "{region}/{date}/data_{num}.csv")
    assert list_files(spark, src_tree, "{region}/{date}/data_{num}.csv").count() == 0


def test_process_files_user_closure(spark, src_tree):
    from getl_spark.filecopy import process_files

    def count_lines(row):
        with open(row["filepath"]) as fh:
            n = sum(1 for _ in fh)
        if row["region"] == "apac":
            return None  # skippable
        return {"filepath": row["filepath"], "region": row["region"], "lines": n}

    out = process_files(
        spark, src_tree, "{region}/{date}/data_{num}.csv", count_lines,
        "filepath string, region string, lines int",
    ).toPandas()
    assert len(out) == 3  # apac skipped
    assert set(out["region"]) == {"emea"} and (out["lines"] == 2).all()


def test_typed_mask_vars_filter_and_type(spark, tmp_path):
    """Path.variable typing: typed mask vars come back as their Spark
    type, and paths whose values don't carry the declared type/format
    are excluded from the listing (buildList filtering)."""
    base = tmp_path / "typed"
    for d in ("2024-01-05", "2024-13-40", "notadate"):
        (base / d).mkdir(parents=True)
        (base / d / "f_7.csv").write_text("x\n")
    (base / "2024-02-06").mkdir()
    (base / "2024-02-06" / "f_xx.csv").write_text("x\n")

    lst = list_files(
        spark, str(base), "{d}/f_{n}.csv",
        var_types={"d": "date", "n": "int"},
    ).toPandas()
    # 'notadate' fails the shape regex; '2024-13-40' parses to NULL and
    # is dropped; 'f_xx' fails the int shape
    assert len(lst) == 1
    assert str(lst["d"].iloc[0]) == "2024-01-05"
    assert int(lst["n"].iloc[0]) == 7
    # untyped listing keeps everything as strings
    raw = list_files(spark, str(base), "{d}/f_{n}.csv").toPandas()
    assert len(raw) == 4 and raw["d"].dtype == object


def test_typed_mask_vars_in_read(spark, tmp_path):
    from getl_spark.sources import read_with_mask_vars

    base = tmp_path / "r"
    for d, n in (("20240105", 1), ("20241340", 2)):
        (base / d).mkdir(parents=True)
        (base / d / f"part{n}.csv").write_text("id\n1\n")
    df = read_with_mask_vars(
        spark, str(base), "{d}/part{n}.csv", format="csv", header=True,
        var_types={"d": ("date", "yyyyMMdd"), "n": "int"},
    )
    rows = df.select("d", "n").distinct().collect()
    assert len(rows) == 1  # month-13 path excluded
    assert str(rows[0].d) == "2024-01-05" and rows[0].n == 1
    assert dict(df.dtypes)["d"] == "date" and dict(df.dtypes)["n"] == "int"


def test_per_destination_story_retries_only_failed_dest(spark, tmp_path):
    """A story with a dest column skips per (file, destination): after
    a partial multi-destination failure, the rerun copies exactly the
    missing destination and never re-copies the succeeded one."""
    src = tmp_path / "s"
    (src / "r").mkdir(parents=True)
    (src / "r" / "f.csv").write_text("x\n")
    good, blocked = str(tmp_path / "good"), tmp_path / "blocked"
    blocked.write_text("not a dir")  # second destination cannot be created
    res1 = copy_files(
        spark, str(src), "{r}/f.csv", [good, str(blocked / "sub")],
        number_attempts=1,
    )
    pdf1 = res1.toPandas()
    assert pdf1["ok"].sum() == 1 and (~pdf1["ok"]).sum() == 1
    story = res1.filter(F.col("ok")).select("filepath", "dest")

    # unblock the second destination, rerun with the per-dest story
    os.remove(str(blocked))
    # watch for re-copy of the good dest: remove it — a filepath-only
    # story would skip the whole file; per-dest must retry ONLY blocked
    res2 = copy_files(
        spark, str(src), "{r}/f.csv", [good, str(blocked / "sub")], story=story
    )
    pdf2 = res2.toPandas()
    assert len(pdf2) == 1 and pdf2["ok"].all()
    assert "blocked" in pdf2["dest"].iloc[0]
    assert os.path.exists(os.path.join(str(blocked / "sub"), "r", "f.csv"))


def test_typed_mask_quoted_literal_format(spark, tmp_path):
    """A Java-pattern quoted literal ('T') in a typed mask variable's
    format matches the literal character in the path."""
    base = tmp_path / "q"
    for d in ("2024-01-05T10:30", "2024-01-05 10:30"):
        (base / d).mkdir(parents=True)
        (base / d / "f.csv").write_text("x\n")
    lst = list_files(
        spark, str(base), "{ts}/f.csv",
        var_types={"ts": ("datetime", "yyyy-MM-dd'T'HH:mm")},
    ).toPandas()
    assert len(lst) == 1
    assert str(lst["ts"].iloc[0]) == "2024-01-05 10:30:00"


def test_typed_mask_time_validates(spark, tmp_path):
    base = tmp_path / "t"
    for d in ("10:30:56", "99:99:99"):
        (base / d.replace(":", "_")).mkdir(parents=True)
    # ':' is awkward in paths on some FS; use '.' separated time format
    base2 = tmp_path / "t2"
    for d in ("10.30.56", "99.99.99"):
        (base2 / d).mkdir(parents=True)
        (base2 / d / "f.csv").write_text("x\n")
    lst = list_files(
        spark, str(base2), "{t}/f.csv", var_types={"t": ("time", "HH.mm.ss")}
    ).toPandas()
    assert list(lst["t"]) == ["10.30.56"]  # stays string, invalid excluded


def test_list_files_deep_fanout_partitions_one_hot_subtree(spark, tmp_path):
    """A tree whose files all live under ONE first-level directory must
    still produce multiple independent walk roots (the straggler-task
    guard), and deeper/shallower fan-outs list identical files."""
    base = tmp_path / "hot"
    for i in range(6):
        d = base / "bigrepo" / f"part{i}"
        d.mkdir(parents=True)
        (d / "f.csv").write_text("x\n")
    (base / "bigrepo" / "direct.csv").write_text("x\n")
    (base / "top.csv").write_text("x\n")

    deep = list_files(spark, str(base), "*", fanout_depth=2).toPandas()
    shallow = list_files(spark, str(base), "*", fanout_depth=1).toPandas()
    assert sorted(deep["relpath"]) == sorted(shallow["relpath"])
    # '*' doesn't cross '/': only the two direct-level matches... at
    # their respective roots; use a crossing mask for the full set
    deep_all = list_files(spark, str(base), "{a}/{b}/f.csv", fanout_depth=2).toPandas()
    assert len(deep_all) == 6
    assert set(deep_all["a"]) == {"bigrepo"} and len(set(deep_all["b"])) == 6
