"""Transitive redirect resolution: chains, cycles, exclusion join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _red(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_resolve_chains_and_cycles(spark):
    from tempel_spark.operators.redirects import resolve_redirects

    red = _red(
        spark,
        [
            ("a", "b"), ("b", "c"), ("c", "d"),          # chain a→b→c→d (terminal)
            ("x", "y"), ("y", "x"),                       # 2-cycle
            ("p", "q"), ("q", "r"), ("r", "p"),           # 3-cycle
            ("lone", "end"),                              # single hop
        ],
    )
    out = {r.src: (r.resolved, r.n_hops, r.is_cycle) for r in resolve_redirects(red).collect()}
    assert out["a"] == ("d", 3, False)
    assert out["b"] == ("d", 2, False)
    assert out["c"] == ("d", 1, False)
    assert out["lone"] == ("end", 1, False)
    for cyc in ("x", "y", "p", "q", "r"):
        assert out[cyc][0] is None and out[cyc][2] is True, cyc


def test_resolve_long_chain_log_rounds(spark):
    from tempel_spark.operators.redirects import resolve_redirects

    n = 40
    red = _red(spark, [(f"n{i:02d}", f"n{i + 1:02d}") for i in range(n)])
    out = {r.src: (r.resolved, r.n_hops) for r in resolve_redirects(red, max_hops=64).collect()}
    assert out["n00"] == (f"n{n:02d}", n)
    assert out[f"n{n - 1:02d}"] == (f"n{n:02d}", 1)


def test_duplicate_sources_rejected(spark):
    from tempel_spark.operators.redirects import resolve_redirects

    with pytest.raises(ValueError):
        resolve_redirects(_red(spark, [("a", "b"), ("a", "c")]))


def test_strip_redirected(spark):
    from tempel_spark.operators.redirects import strip_redirected

    red = _red(spark, [("a", "b"), ("x", "y")])
    df = spark.createDataFrame([("a",), ("b",), ("z",)], "target_id string")
    kept = {r.target_id for r in strip_redirected(df, red, "target_id").collect()}
    assert kept == {"b", "z"}


def test_resolution_is_deterministic(spark):
    from tempel_spark.operators.redirects import resolve_redirects

    red = _red(spark, [(f"s{i}", f"s{i + 1}") for i in range(0, 30, 2)] + [("c1", "c2"), ("c2", "c1")])
    a = sorted(map(tuple, resolve_redirects(red).collect()))
    b = sorted(map(tuple, resolve_redirects(red).collect()))
    assert a == b
