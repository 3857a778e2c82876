"""Dedup-on-ingest: streaming near-duplicate detection over winnowed
document fingerprints.

A 100 TB training-data pipeline dedupes the crawl AS IT LANDS — batch
re-deduping the whole corpus per drop re-pays the full corpus cost for
every delta. This operator is the streaming twin of
`dedup.winnow_similar_pairs` (MOSS report, Schleimer et al. 2003),
built on the same crash-safety discipline as
`streaming/incremental_er.stream_incremental_er`:

* per-batch work tracks the DELTA: fingerprinting is a zero-shuffle
  Arrow pass over the new docs only (a document's fingerprint set is
  immutable, so each doc is fingerprinted exactly once, ever);
* the fingerprint→doc-frequency state folds through
  `Catalog.upsert_fold` — a batch rewrites only the fp hash buckets it
  touches, and the replay marker (batch id + content fingerprint)
  commits atomically with the fold;
* pair + fingerprint appends go FIRST, the df fold with its marker
  LAST: a crashed batch's retry re-appends (at-least-once) and the
  read-side dedupe restores exactly-once; committing the marker first
  would let a retry silently drop the batch's pairs;
* the doc-frequency cap (`max_df`) is decided AT EMIT TIME from the
  merged (previous ∪ delta) counts of exactly the fps the batch
  touches — bucket-pruned state reads, never a full-state scan. Both
  docs' fingerprint sets are complete when the later doc arrives, so
  when the cap does not bind the emitted pairs (and their n_shared)
  equal a batch `winnow_similar_pairs` run over the full corpus —
  pinned by the parity test. When the cap binds, insert-time df ≤
  final df, so the stream may emit pairs on fps that later go hot
  (batch drops them): dedup-on-ingest intentionally errs toward
  recall — a pair seen early is still a real near-dup.

The fp log itself is append-only (parquet mode reads it whole per
ingest for the cross join, like the ER key log; Iceberg mode would
declare `bucket(n, fp)` on it so the engine prunes the same way the
df fold does).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tempel_spark.operators.dedup import winnow_fingerprints
from tempel_spark.sources.catalog import Catalog, upsert_bucket_col

__all__ = ["stream_incremental_winnow", "read_winnow_pairs", "DOC_SCHEMA"]

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)

_FPS = "stream_winnow_fps"
_DF = "stream_winnow_df"
_PAIRS = "stream_winnow_pairs"


def stream_incremental_winnow(
    spark: SparkSession,
    input_dir: str,
    catalog: Catalog,
    k: int = 20,
    w: int = 10,
    max_df: int = 5,
    min_shared: int = 2,
    checkpoint_dir: str | None = None,
    state_parts: int = 64,
):
    """Start (or resume) the dedup-on-ingest stream over `input_dir`
    ((doc_id, text) parquet drops). `availableNow` + the stream
    checkpoint give exactly-once file consumption. Returns the
    StreamingQuery — call `.awaitTermination()`.

    Emits (id_a, id_b, n_shared, batch_id) rows to the append-only
    pair log for every pair sharing >= min_shared fingerprints that
    are rare (df <= max_df at emit time), where at least one side is
    new in the batch.
    """
    ckpt = checkpoint_dir or f"{catalog.base}/_stream_winnow_ckpt"

    def process(batch_df: DataFrame, batch_id: int) -> None:
        fps_new = (
            winnow_fingerprints(batch_df.select("doc_id", "text"), "doc_id", "text", k=k, w=w)
            .select("doc_id", "fp")
            .distinct()
            .localCheckpoint(eager=True)
        )
        fp_row = fps_new.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.expr("bit_xor(xxhash64(doc_id, fp))"), F.lit(0)).alias("h"),
        ).collect()[0]
        batch_fp = f"{fp_row['n']}:{fp_row['h']}"
        # REPLAY GUARD — same contract as incremental ER's: the df-fold
        # marker carries (checkpoint, batch id, content fp) atomically
        # with the folded state. A replay of the applied batch with
        # matching contents is skipped; a re-pointed checkpoint or a
        # same-id batch with different contents (wiped checkpoint over
        # kept state) fails loudly instead of corrupting df counts.
        applied = catalog.get_inline_meta(_DF) or {}
        if applied.get("wn_batch_id") is not None:
            if applied.get("wn_ckpt") != ckpt:
                raise RuntimeError(
                    "stream checkpoint / winnow state mismatch: state was "
                    f"committed under checkpoint {applied.get('wn_ckpt')!r} but "
                    f"the stream runs with {ckpt!r} — delete the stream_winnow_* "
                    "state and the checkpoint together, or restore the original "
                    "checkpoint dir."
                )
            if batch_id <= applied["wn_batch_id"]:
                if (
                    batch_id == applied["wn_batch_id"]
                    and applied.get("wn_batch_fp") in (None, batch_fp)
                ):
                    return  # true replay of the applied batch
                raise RuntimeError(
                    f"winnow state has applied batch {applied['wn_batch_id']} but "
                    f"the stream presented batch {batch_id} with unrecognized "
                    "contents — checkpoint and state must live and die together."
                )
        # delta df + bucket-priced merge with previous df state: only
        # fps touched by this batch can form new pairs, so the cap
        # check reads exactly the delta's hash buckets.
        delta_df = fps_new.groupBy("fp").agg(F.count(F.lit(1)).alias("n_docs"))
        merged = delta_df
        if catalog.exists(_DF):
            if catalog.use_iceberg:
                prev = catalog.read(_DF)
            else:
                touched = [
                    r["_b"]
                    for r in delta_df.select(
                        upsert_bucket_col(("fp",), state_parts).alias("_b")
                    ).distinct().collect()
                ]
                prev = catalog.read_upsert_buckets(_DF, touched)
            if prev is not None:
                merged = (
                    delta_df.unionByName(prev.join(delta_df.select("fp"), "fp", "leftsemi"))
                    .groupBy("fp")
                    .agg(F.sum("n_docs").alias("n_docs"))
                )
        rare = merged.filter(F.col("n_docs") <= max_df).select("fp")
        new_rare = fps_new.join(rare, "fp").localCheckpoint(eager=True)
        sides = new_rare.select(
            "fp", F.col("doc_id").alias("doc_b"), F.lit(True).alias("_new")
        )
        if catalog.append_has_data(_FPS):
            old = (
                catalog.read_append(_FPS)
                .distinct()  # restores exactly-once over at-least-once appends
                .join(rare, "fp")
                .select("fp", F.col("doc_id").alias("doc_b"), F.lit(False).alias("_new"))
            )
            sides = sides.unionByName(old)
        joined = new_rare.select("fp", F.col("doc_id").alias("doc_a")).join(sides, "fp")
        pairs = (
            joined.filter((~F.col("_new")) | (F.col("doc_a") < F.col("doc_b")))
            .filter(F.col("doc_a") != F.col("doc_b"))
            .select(
                F.least("doc_a", "doc_b").alias("id_a"),
                F.greatest("doc_a", "doc_b").alias("id_b"),
                "fp",
            )
            .distinct()
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("n_shared"))
            .filter(F.col("n_shared") >= min_shared)
            .withColumn("batch_id", F.lit(batch_id).cast("long"))
        )
        # WRITE ORDER = crash safety (see module docstring): appends
        # first, df fold + marker last.
        catalog.append(pairs, _PAIRS)
        catalog.append(fps_new, _FPS)
        catalog.upsert_fold(
            delta_df,
            _DF,
            key_cols=("fp",),
            sum_cols=("n_docs",),
            marker={"wn_ckpt": ckpt, "wn_batch_id": batch_id, "wn_batch_fp": batch_fp},
            n_parts=state_parts,
        )

    return (
        spark.readStream.schema(DOC_SCHEMA)
        .parquet(input_dir)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )


def read_winnow_pairs(spark: SparkSession, catalog: Catalog) -> DataFrame:
    """Near-dup pairs emitted so far, exactly-once view: a crashed
    batch's retry may have re-appended identical rows — identical
    content, so dropDuplicates restores the exactly-once set."""
    if not catalog.append_has_data(_PAIRS):
        return spark.createDataFrame(
            [], "id_a long, id_b long, n_shared long, batch_id long"
        )
    return catalog.read_append(_PAIRS).dropDuplicates(["id_a", "id_b", "batch_id"])
