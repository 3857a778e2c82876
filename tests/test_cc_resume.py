"""Mid-clustering resumability: the per-iteration durable edge-state
checkpoint warm-starts to the identical fixed point."""

from __future__ import annotations

import tempfile


def test_cc_warm_start_reaches_same_fixed_point(spark):
    from tempel_spark.operators.clustering import _large_star, _small_star, connected_components

    edges = spark.createDataFrame(
        [(f"n{i:03d}", f"n{i + 1:03d}") for i in range(40) if i % 7]  # chains with breaks
        + [("a", "b"), ("b", "c"), ("z", "a")],
        "id_a string, id_b string",
    )
    full = connected_components(edges, shuffle_partitions=4)
    assert full.converged

    # simulate a crash after ONE iteration: take the intermediate edge
    # state and resume from it
    import pyspark.sql.functions as F

    e0 = edges.select(F.col("id_a").alias("a"), F.col("id_b").alias("b")).distinct()
    partial = _small_star(_large_star(e0))
    resumed = connected_components(edges, shuffle_partitions=4, resume_state=partial)
    assert resumed.converged

    a = sorted(map(tuple, full.components.collect()))
    b = sorted(map(tuple, resumed.components.collect()))
    assert a == b


def test_pipeline_cc_durable_checkpoint(spark):
    from tempel_spark.plans.pipeline import run_pipeline
    from tempel_spark.sources.catalog import Catalog
    from tempel_spark.synth import synth_transcripts

    snaps = [f"{y}-01-01 00:00:00" for y in (2013, 2014, 2015, 2016)]
    t = synth_transcripts(spark, n_convs=30)
    with tempfile.TemporaryDirectory(prefix="ccres_") as tmp:
        cat = Catalog(spark, tmp)
        r1 = run_pipeline(spark, t, catalog=cat, snapshots=snaps)
        comp1 = sorted(map(tuple, r1["components"].collect()))
        assert cat.exists("cc_edges")  # per-iteration durable state published
        # a rerun (components checkpoint present) returns identical output
        r2 = run_pipeline(spark, t, catalog=cat, snapshots=snaps)
        assert sorted(map(tuple, r2["components"].collect())) == comp1
