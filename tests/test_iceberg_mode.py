"""Iceberg-mode catalog/durability suite.

The Catalog speaks the same API over partitioned parquet and Iceberg
tables; the parquet side is exercised by the whole test suite, this
file drives the SAME contracts through the Iceberg branch:

* write() with inline_meta → table property set in the SAME
  createOrReplace transaction (catalog.py `_META_PROP`);
* upsert_fold() → keyed MERGE INTO with the per-row `_last_upsert`
  marker guard (replay-idempotent across the MERGE/property commit
  gap);
* append()/read_append()/append_has_data() → Iceberg append commits;
* stream_incremental_er end-to-end (pair log + vocab parity).

This sandbox has NO network and no vendored iceberg-spark-runtime
jar, so the whole module skips with that reason; point
TEMPEL_ICEBERG_JAR at an `iceberg-spark-runtime-4.x_2.13` jar and run
this file in its OWN pytest process (the Iceberg session needs a
fresh JVM — extensions cannot be added to the already-running shared
session):

    TEMPEL_ICEBERG_JAR=/path/to/jar python -m pytest tests/test_iceberg_mode.py
"""

from __future__ import annotations

import glob
import json
import os

import pytest


def _iceberg_jar() -> str | None:
    jar = os.environ.get("TEMPEL_ICEBERG_JAR")
    if jar and os.path.exists(jar):
        return jar
    import pyspark

    cands = glob.glob(
        os.path.join(os.path.dirname(pyspark.__file__), "jars", "*iceberg-spark-runtime*.jar")
    )
    return cands[0] if cands else None


_JAR = _iceberg_jar()

pytestmark = pytest.mark.skipif(
    _JAR is None,
    reason=(
        "iceberg-spark-runtime jar unavailable: this sandbox has no network "
        "access to fetch it and none is vendored — searched pyspark/jars, "
        "pip cache, ~/.m2, ~/.ivy2 (r5). The MERGE fold logic is value-"
        "checked by proxy against DuckDB + the parquet path in "
        "tests/test_upsert_catalog.py::test_merge_fold_sql_duckdb_proxy; "
        "set TEMPEL_ICEBERG_JAR to run this suite for real"
    ),
)


@pytest.fixture(scope="module")
def ispark(tmp_path_factory):
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None and "iceberg" not in (
        active.conf.get("spark.sql.catalog.ice", "") or ""
    ):
        pytest.skip(
            "an existing non-Iceberg SparkSession owns this JVM — run "
            "tests/test_iceberg_mode.py in its own pytest process"
        )
    wh = str(tmp_path_factory.mktemp("iceberg_wh"))
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("tempel_iceberg")
        .config("spark.jars", _JAR)
        .config(
            "spark.sql.extensions",
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
        )
        .config("spark.sql.catalog.ice", "org.apache.iceberg.spark.SparkCatalog")
        .config("spark.sql.catalog.ice.type", "hadoop")
        .config("spark.sql.catalog.ice.warehouse", wh)
        .config("spark.sql.defaultCatalog", "ice")
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ice.er")
    spark.sql("USE ice.er")
    yield spark
    spark.stop()


def _cat(ispark, tmp_path):
    from tempel_spark.sources.catalog import Catalog

    cat = Catalog(ispark, str(tmp_path / "unused_base"))
    assert cat.use_iceberg, "fixture must produce an Iceberg-backed session"
    return cat


def _kv(ispark, rows):
    return ispark.createDataFrame(rows, "k string, v long")


def test_write_read_inline_meta_same_transaction(ispark, tmp_path):
    cat = _cat(ispark, tmp_path)
    df = _kv(ispark, [("a", 1), ("b", 2)])
    cat.write(df, "w1", inline_meta={"er_batch_id": 7})
    assert cat.exists("w1")
    assert {tuple(r) for r in cat.read("w1").collect()} == {("a", 1), ("b", 2)}
    assert cat.get_inline_meta("w1") == {"er_batch_id": 7}
    cat.delete("w1")
    assert not cat.exists("w1")
    assert cat.get_inline_meta("w1") is None


def test_upsert_fold_merge_and_replay(ispark, tmp_path):
    cat = _cat(ispark, tmp_path)
    cat.upsert_fold(_kv(ispark, [("a", 1), ("b", 1)]), "u1", ("k",), ("v",),
                    marker={"batch": 0}, n_parts=4)
    delta = _kv(ispark, [("a", 2), ("z", 5)])
    cat.upsert_fold(delta, "u1", ("k",), ("v",), marker={"batch": 1}, n_parts=4)
    want = {("a", 3), ("b", 1), ("z", 5)}
    got = {tuple(r) for r in cat.read("u1").select("k", "v").collect()}
    assert got == want
    # replay (retried foreachBatch): per-row _last_upsert guard → no-op
    cat.upsert_fold(delta, "u1", ("k",), ("v",), marker={"batch": 1}, n_parts=4)
    got = {tuple(r) for r in cat.read("u1").select("k", "v").collect()}
    assert got == want
    assert cat.get_inline_meta("u1") == {"batch": 1}
    # read() hides the internal row-marker column
    assert "_last_upsert" not in cat.read("u1").columns
    cat.delete("u1")


def test_append_log(ispark, tmp_path):
    cat = _cat(ispark, tmp_path)
    assert not cat.append_has_data("log1")
    cat.append(_kv(ispark, [("a", 1)]), "log1")
    cat.append(_kv(ispark, [("b", 2)]), "log1")
    assert cat.append_has_data("log1")
    assert {tuple(r) for r in cat.read_append("log1").collect()} == {("a", 1), ("b", 2)}
    cat.delete("log1")


def test_incremental_er_end_to_end(ispark, tmp_path):
    from pyspark.sql import functions as F

    from tempel_spark.plans.pipeline import run_pipeline
    from tempel_spark.streaming.incremental_er import (
        read_scored_pairs,
        stream_incremental_er,
    )
    from tempel_spark.synth import synth_transcripts

    snaps = [f"{y}-01-01 00:00:00" for y in (2013, 2014, 2015)]
    t = synth_transcripts(ispark, n_convs=30, n_entities=10, n_snapshots=2)
    landing = str(tmp_path / "landing")
    cat = _cat(ispark, tmp_path)
    cap = 100_000
    t.filter(F.crc32("conv_id") % 2 == 0).write.mode("append").parquet(landing)
    stream_incremental_er(
        ispark, landing, cat, snapshots=snaps, pair_cap=cap,
        checkpoint_dir=str(tmp_path / "ck"),
    ).awaitTermination()
    t.filter(F.crc32("conv_id") % 2 == 1).write.mode("append").parquet(landing)
    stream_incremental_er(
        ispark, landing, cat, snapshots=snaps, pair_cap=cap,
        checkpoint_dir=str(tmp_path / "ck"),
    ).awaitTermination()

    batch = run_pipeline(ispark, t, snapshots=snaps, pair_cap=cap)

    def canon(df):
        return sorted(map(tuple, df.select(
            F.col("snapshot_ts").cast("string"), "id_a", "id_b",
            F.round("score", 6), "is_match").collect()))

    assert canon(read_scored_pairs(ispark, cat)) == canon(batch["scored"])
    vocab = sorted(map(tuple, cat.read("stream_norms").select(
        F.col("snapshot_ts").cast("string"), "norm", "n_mentions").collect()))
    bnorms = sorted(map(tuple, batch["norms"].select(
        F.col("snapshot_ts").cast("string"), "norm", "n_mentions").collect()))
    assert vocab == bnorms
