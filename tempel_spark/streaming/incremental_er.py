"""Incremental ER: continuous blocking + scoring over arriving
transcripts (Structured Streaming, `availableNow`).

The batch pipeline re-derives every stage from the full corpus; this
module keeps the ER *pair state* continuously up to date instead. Per
micro-batch:

  new files ──▶ mention extraction (same Arrow stage as batch)
      ▼
  batch norm counts ──anti-join──▶ GENUINELY NEW norms (never seen
      │                            in this (snapshot, norm) vocab)
      ▼
  vocab upsert (union + re-aggregate, atomically republished —
      │   with an Iceberg catalog this is a MERGE INTO)
      ▼
  candidate pairs: new × all, equi-joined on the SAME stationary
      │   block keys as batch (pipeline.build_block_keys — keys are
      │   derived from norm text alone, so a norm is keyed once and
      │   joins against any future vocabulary) + the bipartite
      │   first-token key in both (new, all) / (all, new) roles
      ▼
  score_pairs (texts only ⇒ identical scores to batch) ──append──▶
      durable scored-pair log

Every emitted pair has ≥ 1 side that is new to the vocabulary, so no
pair is ever scored twice across batches, and the accumulated log
equals the batch pipeline's scored-pair set whenever the block caps
don't bind (pinned by tests/test_streaming_incremental_er.py). At
10^12-turn scale this is the difference between re-scoring the full
vocabulary² candidate space per ingest and scoring only the
new-norm frontier (new norms grow ~log-like while turns grow
linearly).

Clustering stays a periodic batch job (`recluster`): component merges
are non-monotone under new evidence (a new bridging norm can merge two
old clusters), so the honest incremental contract is "pairs are
incremental, components are recomputed from the pair log on demand" —
connected_components re-solves the vocabulary-scale edge list, never
the corpus.

Pair frequencies (`n_mentions_*`) in the log are arrival-time values;
consumers that need current priors (abbreviation resolution) join the
live `stream_norms` vocab instead, as `recluster` does.

Reference: the TempEL pipeline has no incremental path at all — a new
dump re-runs the multi-day batch (BASELINE.md); this module is part of
the engine's Spark-native surplus, like streaming/{incremental,
stateful,windowed,sessionize}.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tempel_spark.operators.blocking import cap_block_size, norm_key
from tempel_spark.operators.scoring import abbreviation_edges, score_pairs
from tempel_spark.plans.pipeline import (
    bipartite_first_token_pairs,
    build_block_keys,
    extract_mention_table,
)
from tempel_spark.sources.catalog import Catalog
from tempel_spark.streaming.incremental import TRANSCRIPT_SCHEMA

__all__ = ["stream_incremental_er", "read_scored_pairs", "recluster"]

_VOCAB = "stream_norms"
_PAIRS = "stream_scored_pairs"


def _batch_norms(transcripts: DataFrame, snapshots: list[str] | None) -> DataFrame:
    """Micro-batch → (snapshot_ts, norm, n_mentions), the same two
    pivots (surface, then norm) as the batch pipeline."""
    mentions = extract_mention_table(transcripts, snapshots)
    return (
        mentions.groupBy("snapshot_ts", "surface")
        .agg(F.count(F.lit(1)).alias("n_mentions"))
        .withColumn("norm", norm_key("surface"))
        .groupBy("snapshot_ts", "norm")
        .agg(F.sum("n_mentions").alias("n_mentions"))
    )


def _new_pairs(
    fresh: DataFrame,
    vocab: DataFrame,
    pair_cap: int,
    lsh_hashes: int,
    lsh_bands: int,
) -> DataFrame:
    """Candidate pairs with ≥ 1 fresh side: fresh block keys equi-join
    the full vocabulary's keys (fresh ⊆ vocab, so fresh×vocab covers
    fresh×fresh too), plus the bipartite first-token key in both role
    assignments. Hot blocks stay capped on the vocabulary side — the
    same guardrail as batch, applied per ingest."""
    kf = build_block_keys(fresh, lsh_hashes, lsh_bands)
    ka = build_block_keys(vocab, lsh_hashes, lsh_bands)
    ka = cap_block_size(ka, ["snapshot_ts", "block_key"], "norm", cap=pair_cap)
    kf = cap_block_size(kf, ["snapshot_ts", "block_key"], "norm", cap=pair_cap)
    j = kf.select(
        "snapshot_ts", "block_key",
        F.col("norm").alias("fn"), F.col("n_mentions").alias("fc"),
    ).join(
        ka.select(
            "snapshot_ts", "block_key",
            F.col("norm").alias("on"), F.col("n_mentions").alias("oc"),
        ),
        ["snapshot_ts", "block_key"],
    ).filter(F.col("fn") != F.col("on"))
    lt = F.col("fn") < F.col("on")
    blocked = j.select(
        "snapshot_ts",
        F.when(lt, F.col("fn")).otherwise(F.col("on")).alias("id_a"),
        F.when(lt, F.col("on")).otherwise(F.col("fn")).alias("id_b"),
        F.when(lt, F.col("fn")).otherwise(F.col("on")).alias("norm_a"),
        F.when(lt, F.col("on")).otherwise(F.col("fn")).alias("norm_b"),
        F.when(lt, F.col("fc")).otherwise(F.col("oc")).alias("n_mentions_a"),
        F.when(lt, F.col("oc")).otherwise(F.col("fc")).alias("n_mentions_b"),
    )
    bip = bipartite_first_token_pairs(fresh, vocab, pair_cap=pair_cap).unionByName(
        bipartite_first_token_pairs(vocab, fresh, pair_cap=pair_cap)
    )
    return blocked.unionByName(bip).dropDuplicates(["snapshot_ts", "id_a", "id_b"])


def stream_incremental_er(
    spark: SparkSession,
    input_dir: str,
    catalog: Catalog,
    snapshots: list[str] | None = None,
    threshold: float = 0.75,
    pair_cap: int = 200,
    lsh_hashes: int = 12,
    lsh_bands: int = 6,
    checkpoint_dir: str | None = None,
):
    """Start (or resume) the incremental ER ingest over `input_dir`.

    `availableNow` + the stream checkpoint give exactly-once file
    consumption: a cron-style rerun processes only files that landed
    since the last run and stops. Returns the StreamingQuery — call
    `.awaitTermination()`.
    """
    ckpt = checkpoint_dir or f"{catalog.base}/_stream_er_ckpt"

    def process(batch_df: DataFrame, batch_id: int) -> None:
        bn = _batch_norms(batch_df, snapshots)
        if catalog.exists(_VOCAB):
            prev = catalog.read(_VOCAB)
            # materialize BEFORE the vocab overwrite: both anti-join
            # and merge read the parquet being republished
            fresh = bn.join(prev, ["snapshot_ts", "norm"], "left_anti").localCheckpoint(
                eager=True
            )
            merged = (
                prev.unionByName(bn)
                .groupBy("snapshot_ts", "norm")
                .agg(F.sum("n_mentions").alias("n_mentions"))
                .localCheckpoint(eager=True)
            )
        else:
            fresh = bn.localCheckpoint(eager=True)
            merged = fresh
        vocab = catalog.write(merged, _VOCAB)
        n_new = fresh.count()
        if n_new:
            pairs = _new_pairs(fresh, vocab, pair_cap, lsh_hashes, lsh_bands)
            scored = score_pairs(
                pairs, "norm_a", "norm_b", threshold=threshold, prenormalized=True
            )
            # append-only pair log: the one ER table that must never
            # be rewritten per ingest
            scored.write.mode("append").parquet(catalog.path(_PAIRS))
            n_pairs = -1  # avoid a second action; counts live in lineage readers
        else:
            n_pairs = 0
        catalog.log_metrics(
            f"stream_er_batch_{batch_id}", {"n_new_norms": n_new, "paired": n_pairs != 0}
        )

    return (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .parquet(input_dir)
        .writeStream.foreachBatch(process)
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .start()
    )


def read_scored_pairs(spark: SparkSession, catalog: Catalog) -> DataFrame:
    return spark.read.parquet(catalog.path(_PAIRS))


def recluster(spark: SparkSession, catalog: Catalog, shuffle_partitions: int = 16):
    """Periodic batch job over the accumulated pair log: match edges
    (+ abbreviation-prior edges against the CURRENT vocab frequencies)
    → connected components per snapshot. Vocabulary-scale, corpus-free."""
    from tempel_spark.operators.clustering import connected_components

    scored = read_scored_pairs(spark, catalog)
    vocab = catalog.read(_VOCAB)
    # refresh priors: arrival-time frequencies in the log are stale
    cur = vocab.select("snapshot_ts", F.col("norm"), F.col("n_mentions"))
    refreshed = (
        scored.drop("n_mentions_a", "n_mentions_b")
        .join(
            cur.select(
                "snapshot_ts", F.col("norm").alias("id_a"),
                F.col("n_mentions").alias("n_mentions_a"),
            ),
            ["snapshot_ts", "id_a"],
        )
        .join(
            cur.select(
                "snapshot_ts", F.col("norm").alias("id_b"),
                F.col("n_mentions").alias("n_mentions_b"),
            ),
            ["snapshot_ts", "id_b"],
        )
    )
    edges = refreshed.filter(F.col("is_match")).select(
        "snapshot_ts", "id_a", "id_b"
    ).unionByName(
        abbreviation_edges(
            refreshed, text_a="norm_a", text_b="norm_b", prenormalized=True,
            freq_a="n_mentions_a", freq_b="n_mentions_b",
        )
    )
    sep = "\x1f"
    e = edges.select(
        F.concat_ws(sep, F.col("snapshot_ts").cast("string"), "id_a").alias("id_a"),
        F.concat_ws(sep, F.col("snapshot_ts").cast("string"), "id_b").alias("id_b"),
    )
    nodes = vocab.select(
        F.concat_ws(sep, F.col("snapshot_ts").cast("string"), "norm").alias("id_a")
    )
    res = connected_components(e, nodes=nodes, shuffle_partitions=shuffle_partitions)
    return res.components.select(
        F.split_part("node", F.lit(sep), F.lit(1)).cast("timestamp").alias("snapshot_ts"),
        F.split_part("node", F.lit(sep), F.lit(2)).alias("norm"),
        F.split_part("component", F.lit(sep), F.lit(2)).alias("component"),
    )
