"""Labeled-pairs evaluation (the BASELINE metric shape) + cluster
canonicalization, end-to-end over the pipeline."""

from __future__ import annotations

from pyspark.sql import functions as F

SNAPSHOTS = [f"{y}-01-01 00:00:00" for y in (2013, 2014, 2015, 2016)]


def test_eval_labeled_pairs_end_to_end(spark):
    from tempel_spark.functions.hashing import hash_uniform
    from tempel_spark.operators.metrics import eval_labeled_pairs
    from tempel_spark.plans.pipeline import run_pipeline
    from tempel_spark.synth import synth_transcripts

    t = synth_transcripts(spark, n_convs=50, n_entities=12, n_snapshots=3, with_gold=True)
    res = run_pipeline(spark, t.drop("gold_entity_id", "surface"), snapshots=SNAPSHOTS)

    gold = res["mentions"].join(
        t.select("conv_id", "turn_idx", "gold_entity_id"), ["conv_id", "turn_idx"]
    ).select("snapshot_ts", "mention_id", "gold_entity_id")

    # labeled pairs at the same blocking key (FIXTURES labeled_pairs):
    # sample same-first-token pairs, labeled by gold equality
    m = res["mentions"].select("snapshot_ts", "mention_id", F.lower(F.split("surface", " ").getItem(0)).alias("bk"))
    g = gold.join(m, ["snapshot_ts", "mention_id"])
    a = g.select("snapshot_ts", F.col("bk"), F.col("mention_id").alias("mention_id_a"), F.col("gold_entity_id").alias("ga"))
    b = g.select("snapshot_ts", F.col("bk"), F.col("mention_id").alias("mention_id_b"), F.col("gold_entity_id").alias("gb"))
    pairs = (
        a.join(b, ["snapshot_ts", "bk"])
        .filter(F.col("mention_id_a") < F.col("mention_id_b"))
        .filter(hash_uniform("mention_id_a", "mention_id_b", seed=5) < 0.3)
        .select("snapshot_ts", F.col("bk").alias("block_key"), "mention_id_a", "mention_id_b",
                (F.col("ga") == F.col("gb")).alias("same_entity"))
    )

    ev = eval_labeled_pairs(res["components"], pairs).collect()
    assert len(ev) == 3
    for r in ev:
        assert r.tp + r.fp + r.fn + r.tn > 0
        # same-block pairs are the HARD cases; still expect strong F1
        assert r.f1 >= 0.75, f"{r.snapshot_ts}: f1={r.f1:.3f}"


def test_cluster_canonical_names(spark):
    from tempel_spark.operators.metrics import cluster_canonical_names
    from tempel_spark.plans.pipeline import run_pipeline
    from tempel_spark.synth import synth_transcripts

    t = synth_transcripts(spark, n_convs=40, n_entities=10, n_snapshots=2)
    res = run_pipeline(spark, t, snapshots=SNAPSHOTS)
    canon = cluster_canonical_names(res["surface_components"], res["surfaces"]).collect()
    assert len(canon) > 0
    by_key = {(r.snapshot_ts, r.component): r for r in canon}
    assert len(by_key) == len(canon)  # one canonical name per cluster
    # canonical names must be member surfaces, with sane counts
    assert all(r.n_surfaces >= 1 and r.n_mentions >= r.n_surfaces for r in canon)
    # exact-form clusters: the most frequent surface wins the name
    big = max(canon, key=lambda r: r.n_mentions)
    assert big.canonical_name
