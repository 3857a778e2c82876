"""Physical-plan audits (build contract: '.explain the plan and
iterate until it's the plan you'd want').

These assert the optimizations actually land — filter pushdown into
the parquet scan, broadcast joins for dims, no corpus shuffle in
snapshot assignment — so a regression that silently de-optimizes a
plan fails CI, not a 100 TB run."""

from __future__ import annotations

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_q01_filter_pushdown(spark, sf_smoke):
    from tempel_spark.plans.testdata_queries import QUERIES

    df = QUERIES["q01_pricing_summary"](spark, sf_smoke)
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: only the 5 needed columns reach the scan
    assert "l_comment" not in plan


def test_q05_broadcast_dims(spark, sf_smoke):
    from tempel_spark.plans.testdata_queries import QUERIES

    plan = _plan(QUERIES["q05_nation_revenue"](spark, sf_smoke))
    assert plan.count("BroadcastHashJoin") >= 2  # nation + region at least
    assert "EqualTo(r_name,ASIA)" in plan  # region predicate pushed to the scan


def test_assign_snapshot_no_shuffle(spark):
    from tempel_spark.operators.asof import assign_snapshot
    from tempel_spark.synth import synth_transcripts

    t = synth_transcripts(spark, n_convs=10)
    plan = _plan(assign_snapshot(t, "ts", ["2014-01-01 00:00:00", "2015-01-01 00:00:00"]))
    # pure projection — zero SHUFFLE exchanges (the synth generator's
    # broadcast of the entity dim is fine; hash/range repartitioning is not)
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan


def test_component_assignment_broadcasts(spark):
    """The mention→cluster join must broadcast the vocabulary side —
    the 10^12-row mention table never shuffles."""
    from tempel_spark.plans.pipeline import run_pipeline
    from tempel_spark.synth import synth_transcripts

    t = synth_transcripts(spark, n_convs=30)
    res = run_pipeline(spark, t, snapshots=["2014-01-01 00:00:00", "2015-01-01 00:00:00", "2016-01-01 00:00:00"])
    assert "BroadcastHashJoin" in _plan(res["components"])


def test_scoring_normalize_not_reexecuted(spark):
    """The scored plan must reference the carried `norm_a/norm_b`
    columns, not inline regexp_replace normalization per feature."""
    from tempel_spark.plans.pipeline import run_pipeline
    from tempel_spark.synth import synth_transcripts

    t = synth_transcripts(spark, n_convs=30)
    res = run_pipeline(spark, t, snapshots=["2014-01-01 00:00:00", "2015-01-01 00:00:00"])
    opt = _optimized(res["scored"])
    # normalization must NEVER sit inside a higher-order-function
    # lambda (it would re-run the regex chain once per array element —
    # per shingle position, per pair). Plan text outside lambdas may
    # repeat expressions across union branches; that's only printing.
    for line in opt.splitlines():
        if "lambdafunction" in line:
            assert "regexp_replace" not in line, line[:200]


def test_extraction_anchor_prefilter(spark):
    """The JVM-side Contains(text, '[[') filter must sit below the
    Arrow extraction — anchor-free turns never cross into Python."""
    from tempel_spark.plans.pipeline import extract_mention_table
    from tempel_spark.synth import synth_transcripts

    t = synth_transcripts(spark, n_convs=5, n_entities=4, n_snapshots=2)
    m = extract_mention_table(t, ["2013-01-01 00:00:00", "2016-01-01 00:00:00"])
    plan = m._jdf.queryExecution().executedPlan().toString()
    # the predicate must appear BELOW (after, in toString order) the
    # MapInPandas node — i.e. evaluated before rows reach Python.
    # Catalyst may fold it into a join condition or inline the text
    # expression, so match the Contains predicate itself.
    below_arrow = plan.split("MapInPandas", 1)[-1]
    assert "Contains(" in below_arrow, plan[:1500]


def test_bucketed_join_no_shuffle(spark, tmp_path):
    """write_bucketed: two tables bucketed identically on the join key
    join with ZERO Exchange on either side — the co-located layout for
    the big-by-big joins (mention x entity) that dominate at 100 TB."""
    from pyspark.sql import functions as F

    from tempel_spark.sources.sinks import write_bucketed

    mentions = spark.range(0, 2000).select(
        (F.col("id") % 100).alias("entity_id"), F.col("id").alias("mention_id")
    )
    entities = spark.range(0, 100).select(
        F.col("id").alias("entity_id"), F.concat(F.lit("e"), F.col("id")).alias("name")
    )
    write_bucketed(mentions, "b_mentions", ("entity_id",), n_buckets=8,
                   path=str(tmp_path / "b_mentions"))
    write_bucketed(entities, "b_entities", ("entity_id",), n_buckets=8,
                   path=str(tmp_path / "b_entities"))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # disable broadcast so the join strategy is the bucket-aware
        # sort-merge, which must read both sides pre-partitioned
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table("b_mentions").join(spark.table("b_entities"), "entity_id")
        phys = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in phys, phys
        assert j.count() == 2000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS b_mentions")
        spark.sql("DROP TABLE IF EXISTS b_entities")


def test_fs_score_adds_no_exchange(spark):
    """fs_score must fold the weight table into pure expressions: the
    scored plan may not contain a single shuffle or join beyond what
    the pairs frame itself had (here: none)."""
    from tempel_spark.operators.linkage import fs_score, fs_weights

    pairs = spark.createDataFrame(
        [(1, 2, True, True), (1, 3, True, False), (2, 3, False, False)],
        "id_a long, id_b long, is_match boolean, f boolean",
    )
    wts = fs_weights(pairs, ["f"])
    plan = _plan(fs_score(pairs, wts))
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_edge_triangle_support_no_cartesian(spark):
    from tempel_spark.operators.graph import edge_triangle_support

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "id_a long, id_b long"
    )
    plan = _plan(edge_triangle_support(edges))
    assert "CartesianProduct" not in plan


def test_meta_block_prune_single_bounded_crossjoin(spark):
    """The only nested-loop join allowed is the broadcast of the
    one-row mean-weight stats frame; the pair stage itself must be
    equi-joins + hash aggregates."""
    from tempel_spark.operators.blocking import meta_block_prune

    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (1, "b")], "node long, block string"
    )
    plan = _plan(meta_block_prune(df, max_block_size=10))
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") == 1  # the 1-row stats
