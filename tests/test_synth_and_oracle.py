"""Synth schema/determinism tests + the DuckDB oracle suite at sf0.001
(fast smoke; the driver runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from tests.oracle_harness import duck_con, compare


def test_synth_schema_matches_input_hint(spark):
    from tempel_spark.synth import synth_transcripts

    df = synth_transcripts(spark, n_convs=10)
    assert [(f.name, f.dataType.simpleString()) for f in df.schema.fields] == [
        ("conv_id", "string"), ("turn_idx", "int"), ("role", "string"),
        ("text", "string"), ("tool", "string"), ("ts", "timestamp"),
    ]
    rows = df.collect()
    assert len(rows) >= 40
    # (conv_id, turn_idx) unique + ts monotone within conv
    seen = {}
    for r in rows:
        assert (r.conv_id, r.turn_idx) not in seen
        seen[(r.conv_id, r.turn_idx)] = r.ts
    by_conv = {}
    for (c, i), ts in sorted(seen.items()):
        if c in by_conv:
            assert ts >= by_conv[c]
        by_conv[c] = ts


def test_synth_deterministic(spark):
    from tempel_spark.synth import synth_transcripts

    a = sorted(map(tuple, synth_transcripts(spark, n_convs=15).collect()))
    b = sorted(map(tuple, synth_transcripts(spark, n_convs=15).collect()))
    assert a == b


def _all_query_names():
    from tempel_spark.plans.testdata_queries import QUERIES

    return sorted(QUERIES)


@pytest.mark.parametrize("name", _all_query_names())
def test_oracle_query(spark, sf_smoke, name):
    from tempel_spark.plans.testdata_queries import ORACLES, QUERIES

    con = duck_con(sf_smoke)
    res = compare(QUERIES[name](spark, sf_smoke), con, ORACLES[name], name)
    assert res["ok"], {k: v for k, v in res.items() if k != "ok"}


def test_entry_contract(spark):
    import __spark_entry__ as E

    df = E.entry(spark)
    assert df.count() > 0
    qs, osql = E.queries(), E.oracle_sql()
    assert len(qs) >= 40
    assert set(osql).issubset(set(qs))
