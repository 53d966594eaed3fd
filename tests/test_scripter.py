"""SQLScripter mini-language (reference: jdbc/SQLScripter.groovy
:45-466): {var} substitution, SET/ECHO/FOR SELECT/IF/ERROR/EXIT,
/*:label*/ capture, LOAD_POINT/SAVE_POINT over the checkpoint table."""

import pytest

from getl_spark.lake import LakeCatalog, PartitionSpec
from getl_spark.schema import parse_ddl
from getl_spark.scripter import SQLScripter, SQLScriptError, split_statements


def test_split_statements_respects_strings_and_comments():
    s = "SELECT 'a;b' AS x; -- c;d\nECHO done; /* e;f */ SELECT 2"
    got = split_statements(s)
    assert len(got) == 3
    assert got[0] == "SELECT 'a;b' AS x"
    assert got[1].startswith("-- c;d\nECHO done")
    assert got[2].endswith("SELECT 2")


def test_set_echo_vars_and_label(spark):
    sc = SQLScripter(spark, vars={"lo": 2})
    sc.run(
        """
        SET SELECT {lo} + 1 AS hi, 'x' AS tag;
        ECHO hi is {hi} tag is {tag};
        /*:nums*/ SELECT id FROM range({lo}, {hi});
        """
    )
    assert sc.vars["hi"] == 3 and sc.vars["tag"] == "x"
    assert sc.echoed == ["hi is 3 tag is x"]
    assert [r["id"] for r in sc.vars["nums"]] == [2]


def test_for_loop_nested_scripter_and_exit(spark):
    sc = SQLScripter(spark)
    sc.run(
        """
        FOR SELECT id AS n FROM range(0, 5);
          IF {n} = 3;
            EXIT;
          END IF;
          ECHO row {n};
        END FOR;
        ECHO after
        """
    )
    # rows 0..2 echo, row 3 exits the loop AND the outer script
    assert sc.echoed == ["row 0", "row 1", "row 2"]


def test_if_false_skips_and_error_raises(spark):
    sc = SQLScripter(spark)
    sc.run("IF 1 = 2; ECHO never; END IF; ECHO yes")
    assert sc.echoed == ["yes"]
    with pytest.raises(SQLScriptError, match="boom"):
        SQLScripter(spark).run("ERROR boom {x}")


def test_load_save_point_roundtrip(spark, tmp_warehouse):
    cat = LakeCatalog(tmp_warehouse)
    sc = SQLScripter(spark, catalog=cat)
    sc.run(
        """
        LOAD_POINT _points.daily TO last_seq WITH merge;
        IF {last_seq} IS NULL;
          SET SELECT 0 AS last_seq;
        END IF;
        SET SELECT {last_seq} + 100 AS new_seq;
        SAVE_POINT _points.daily FROM new_seq WITH merge
        """
    )
    assert sc.vars["new_seq"] == 100
    # second run resumes from the saved point
    sc2 = SQLScripter(spark, catalog=cat)
    sc2.run("LOAD_POINT _points.daily TO last_seq WITH merge")
    assert sc2.vars["last_seq"] == 100


def test_list_var_renders_as_block(spark):
    sc = SQLScripter(spark, vars={"cols": ["1 AS a,", "2 AS b"]})
    sc.run("/*:r*/ SELECT {cols}")
    assert sc.vars["r"] == [{"a": 1, "b": 2}]


def test_nested_for_depth_counting(spark):
    sc = SQLScripter(spark)
    sc.run(
        """
        FOR SELECT id AS i FROM range(0, 2);
          FOR SELECT id AS j FROM range(0, 2);
            ECHO {i}-{j};
          END FOR;
        END FOR
        """
    )
    assert sc.echoed == ["0-0", "0-1", "1-0", "1-1"]


def test_comments_inside_string_literals_survive(spark):
    sc = SQLScripter(spark)
    sc.run("/*:r*/ SELECT 'a--b' AS v, 'x/*y*/z' AS w -- trailing\n")
    assert sc.vars["r"] == [{"v": "a--b", "w": "x/*y*/z"}]


def test_for_body_trailing_line_comment(spark):
    sc = SQLScripter(spark)
    sc.run(
        "FOR SELECT id AS n FROM range(0, 2);\n"
        "  SET SELECT {n} * 10 AS m -- times ten\n;\n"
        "  ECHO got {m};\n"
        "END FOR"
    )
    assert sc.echoed == ["got 0", "got 10"]


def test_save_point_never_regresses(spark, tmp_warehouse):
    cat = LakeCatalog(tmp_warehouse)
    SQLScripter(spark, catalog=cat, vars={"v": 100}).run(
        "SAVE_POINT _p.x FROM v WITH merge"
    )
    SQLScripter(spark, catalog=cat, vars={"v": 50}).run(
        "SAVE_POINT _p.x FROM v WITH merge"  # stale smaller value
    )
    sc = SQLScripter(spark, catalog=cat)
    sc.run("LOAD_POINT _p.x TO last WITH merge")
    assert sc.vars["last"] == 100


def test_begin_block_runs_statements_raw(spark):
    sc = SQLScripter(spark, vars={"n": 3})
    sc.run(
        """
        BEGIN BLOCK;
        CREATE OR REPLACE TEMP VIEW blk AS SELECT {n} AS v;
        END BLOCK;
        /*:r*/ SELECT v FROM blk
        """
    )
    assert sc.vars["r"] == [{"v": 3}]
