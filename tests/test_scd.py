"""Title-history SCD build + as-of join semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_build_title_history(spark):
    from tempel_spark.operators.scd import build_title_history

    revs = spark.createDataFrame(
        [
            (1, "Foo", "2013-01-01"),
            (1, "Foo", "2013-06-01"),   # same title → no event
            (1, "Foo (band)", "2014-01-01"),
            (1, "Foo", "2015-01-01"),   # renamed back → event
            (2, "Bar", "2013-03-01"),
        ],
        "page_id long, title string, rev_ts string",
    ).withColumn("rev_ts", F.to_date("rev_ts"))
    got = {
        (r.title, str(r.valid_from)): r.page_id
        for r in build_title_history(revs).collect()
    }
    assert got == {
        ("Foo", "2013-01-01"): 1,
        ("Foo (band)", "2014-01-01"): 1,
        ("Foo", "2015-01-01"): 1,
        ("Bar", "2013-03-01"): 2,
    }


def test_asof_join_semantics(spark):
    from tempel_spark.operators.scd import asof_join

    changes = spark.createDataFrame(
        [("T", 10, 100), ("T", 20, 200), ("U", 15, 900)],
        "title string, valid_from long, page_id long",
    )
    probes = spark.createDataFrame(
        [("p1", "T", 5), ("p2", "T", 10), ("p3", "T", 19), ("p4", "T", 25), ("p5", "U", 30),
         ("p6", "V", 7)],
        "pid string, title string, ts long",
    )
    out = {r.pid: (r.page_id, r.asof_valid_from) for r in
           asof_join(probes, changes, "title", "ts").collect()}
    assert out["p1"] == (None, None)       # before first change
    assert out["p2"] == (100, 10)          # equal ts matches (>= semantics)
    assert out["p3"] == (100, 10)
    assert out["p4"] == (200, 20)          # latest change wins
    assert out["p5"] == (900, 15)
    assert out["p6"] == (None, None)       # key never changed
    # row universe preserved
    assert len(out) == 6


def test_asof_join_rejects_ambiguous_changes(spark):
    from tempel_spark.operators.scd import asof_join

    changes = spark.createDataFrame(
        [("T", 10, 1), ("T", 10, 2)], "title string, valid_from long, page_id long"
    )
    probes = spark.createDataFrame([("p", "T", 11)], "pid string, title string, ts long")
    with pytest.raises(ValueError):
        asof_join(probes, changes, "title", "ts")
