"""Stage checkpoint catalog (SURVEY.md §2.1 S5/S6, §4 resumability).

The reference memoizes stage outputs as pickle files and per-cut CSVs
(load_wiki_sql_tables.py:18-21, s02_alias_table_generator.py:139-142);
the north_rule upgrades this to Iceberg checkpoint tables with
per-partition lineage. In this sandbox no Iceberg runtime jar is
available (no network), so the catalog speaks the same API over
partitioned parquet and transparently switches to real Iceberg
(`df.writeTo(...).createOrReplace()`) when an Iceberg catalog is
configured on the session. The write layout (snapshot_ts partition
column, overwrite-by-name semantics, atomic-rename publish) matches
what the Iceberg path produces, so pipeline code is identical in both
modes.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["Catalog"]


def _split_ddl_fields(ddl: str) -> list[str]:
    """Split `a:int,b:array<struct<x:int,y:int>>` on TOP-LEVEL commas
    only (nested array/struct/map types contain commas of their own,
    as does decimal(p,s))."""
    out, depth, cur = [], 0, []
    for ch in ddl:
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return out


def _iceberg_available(spark: SparkSession) -> bool:
    try:
        impl = spark.conf.get("spark.sql.catalog.spark_catalog", "")
        return "iceberg" in (impl or "").lower()
    except Exception:
        return False


class Catalog:
    """Named, partitioned, atomically-published stage tables +
    a lineage/metrics journal (north_rule: "resumable from checkpoint
    with per-partition lineage + metrics")."""

    def __init__(self, spark: SparkSession, base_path: str):
        self.spark = spark
        self.base = base_path.rstrip("/")
        os.makedirs(self.base, exist_ok=True)
        self.use_iceberg = _iceberg_available(spark)

    # -- paths ---------------------------------------------------------
    def path(self, name: str) -> str:
        return f"{self.base}/{name}"

    def exists(self, name: str) -> bool:
        if self.use_iceberg:
            return self.spark.catalog.tableExists(f"ckpt_{name}")
        self._recover(name)
        return os.path.exists(f"{self.path(name)}/_SUCCESS_TEMPEL")

    # -- atomic publish ----------------------------------------------------
    # The sentinel (and any inline meta) is written INSIDE the tmp dir
    # BEFORE the swap, so the final os.rename is the single commit
    # point: a crash at any earlier moment leaves the previous publish
    # (or a recoverable .__old_) untouched, never a half-written final.

    @staticmethod
    def _orphans(final: str) -> list[str]:
        import glob as _glob

        esc = _glob.escape(final)  # base paths may contain [ ] ? *
        return _glob.glob(f"{esc}.__tmp_*") + _glob.glob(f"{esc}.__old_*")

    def _swap_in(self, tmp: str, final: str) -> None:
        trash = f"{final}.__old_{uuid.uuid4().hex[:8]}"
        if os.path.exists(final):
            os.rename(final, trash)
        os.rename(tmp, final)
        # GC the trash AND any orphans earlier crashes left behind —
        # a surviving orphan could later be resurrected by _recover
        # and shadow this publish
        for d in self._orphans(final):
            shutil.rmtree(d, ignore_errors=True)

    def _recover(self, name: str) -> None:
        """Heal an interrupted swap: if the final dir is missing, adopt
        the NEWEST complete (sentinel-bearing) .__tmp_ publish, else
        restore the newest .__old_ previous version; non-adopted
        orphans are removed either way. No-op in the common case."""
        final = self.path(name)
        if os.path.exists(final):
            return
        import glob as _glob

        esc = _glob.escape(final)
        tmps = [
            d for d in _glob.glob(f"{esc}.__tmp_*")
            if os.path.exists(f"{d}/_SUCCESS_TEMPEL")
        ]
        pick = None
        if tmps:
            pick = max(tmps, key=os.path.getmtime)
        else:
            olds = _glob.glob(f"{esc}.__old_*")
            if olds:
                pick = max(olds, key=os.path.getmtime)
        if pick is not None:
            os.rename(pick, final)
            for d in self._orphans(final):
                shutil.rmtree(d, ignore_errors=True)

    # -- write / read ----------------------------------------------------
    def write(
        self,
        df: DataFrame,
        name: str,
        partition_by: tuple[str, ...] = (),
        inline_meta: dict | None = None,
    ) -> DataFrame:
        """Overwrite-publish a stage table; returns the re-read
        DataFrame (reading back the checkpoint truncates lineage the
        same way the reference's pickle reload does, but distributed).

        inline_meta: a small dict published ATOMICALLY with the data
        (written inside the tmp dir before the commit rename) — use it
        for markers that must never disagree with the table contents,
        e.g. the incremental-ER applied-batch id."""
        t0 = time.time()
        if self.use_iceberg:
            if inline_meta is not None:
                # silently dropping the marker would re-enable the
                # replay double-count the marker exists to prevent;
                # the Iceberg analogue is a table property set in the
                # same transaction, not yet wired up
                raise NotImplementedError(
                    "inline_meta is not supported on the Iceberg catalog path yet"
                )
            w = df.writeTo(f"ckpt_{name}").using("iceberg")
            if partition_by:
                w = w.partitionedBy(*[F.col(c) for c in partition_by])
            w.createOrReplace()
            out = self.spark.table(f"ckpt_{name}")
        else:
            final = self.path(name)
            tmp = f"{final}.__tmp_{uuid.uuid4().hex[:8]}"
            writer = df.write.mode("overwrite")
            if partition_by:
                writer = writer.partitionBy(*partition_by)
            writer.parquet(tmp)
            if inline_meta is not None:
                with open(f"{tmp}/_inline_meta.json", "w") as fh:
                    json.dump(inline_meta, fh)
            with open(f"{tmp}/_SUCCESS_TEMPEL", "w") as fh:
                fh.write("ok")
            self._swap_in(tmp, final)
            # a plain write over a previously bucketed stage must drop
            # the stale registration, or spark.table would keep serving
            # the replaced files' bucket layout
            self._clear_bucket_layout(name)
            out = self.spark.read.parquet(final)
        self._journal(name, df_schema=[f.simpleString() for f in df.schema.fields],
                      seconds=round(time.time() - t0, 3), partition_by=list(partition_by))
        return out

    def get_inline_meta(self, name: str) -> dict | None:
        """The dict published atomically with the last write(), if any.
        Runs crash recovery first — a replay guard that read None from
        an unhealed swap would re-apply a batch the adopted publish
        already contains."""
        self._recover(name)
        p = f"{self.path(name)}/_inline_meta.json"
        if not os.path.exists(p):
            return None
        with open(p) as fh:
            return json.load(fh)

    def read(self, name: str) -> DataFrame:
        if self.use_iceberg:
            return self.spark.table(f"ckpt_{name}")
        self._recover(name)
        spec = self._get_bucket_spec(name)
        if spec:
            return self._read_bucketed(name, spec)
        return self.spark.read.parquet(self.path(name))

    # -- bucketed stage tables ---------------------------------------------
    # The bucket spec lives INSIDE the published directory (not the
    # put_meta sidecar — pipeline code owns that dict for stage
    # fingerprints and compares it by full equality), so spec and data
    # commit in the same rename and a plain re-write atomically sheds
    # the old layout with the old files.

    def _tbl(self, name: str) -> str:
        """Session-global registration name scoped by the catalog base
        path — two Catalogs over different directories in one session
        must never resolve to each other's tables."""
        import hashlib

        return f"ckpt_{name}__{hashlib.md5(self.base.encode()).hexdigest()[:8]}"

    def _get_bucket_spec(self, name: str) -> dict | None:
        p = f"{self.path(name)}/_bucket_spec.json"
        if not os.path.exists(p):
            return None
        with open(p) as fh:
            return json.load(fh)

    def _clear_bucket_layout(self, name: str) -> None:
        """Drop a stage's in-session bucket registration. The spec file
        lives inside the published dir, so a plain write() replacing
        the dir sheds it automatically — only the session-catalog
        registration can go stale and needs the explicit drop."""
        self.spark.sql(f"DROP TABLE IF EXISTS {self._tbl(name)}")

    def write_bucketed_stage(
        self,
        df: DataFrame,
        name: str,
        bucket_by: tuple[str, ...],
        n_buckets: int = 32,
        sort_by: tuple[str, ...] | None = None,
    ) -> DataFrame:
        """Checkpoint a stage in bucket layout: downstream joins/aggs
        keyed on `bucket_by` read it pre-hash-partitioned, so a resumed
        run's big⋈big join (e.g. mention⋈entity on the component key)
        runs with ZERO Exchange on this side — plan-asserted in
        tests/test_cc_resume.py. With an Iceberg catalog the same
        intent is a `bucket(n, col)` partition transform. Bucket
        metadata lives in the session catalog, not the parquet files,
        so the bucket spec is written inside the published dir (same
        commit rename as the data) and the table is re-registered on
        read in a fresh session. Publish is atomic (spec + sentinel
        land in the tmp dir before the swap), so a failed
        re-checkpoint keeps the previous good state and `df` may
        derive from the stage being replaced."""
        t0 = time.time()
        from tempel_spark.sources.sinks import write_bucketed

        final = self.path(name)
        tmp = f"{final}.__tmp_{uuid.uuid4().hex[:8]}"
        tmp_tbl = f"{self._tbl(name)}__tmp"
        write_bucketed(df, tmp_tbl, bucket_by, n_buckets=n_buckets,
                       sort_cols=sort_by, path=tmp)
        # external table: dropping the registration keeps the files
        self.spark.sql(f"DROP TABLE IF EXISTS {tmp_tbl}")
        spec = {
            "bucket_by": list(bucket_by), "n_buckets": n_buckets,
            "sort_by": list(sort_by or ()),
            # full typed schema (StructType.jsonValue round-trips column
            # names needing quoting, char/varchar widths, nullability —
            # the simpleString DDL form loses all three)
            "schema_json": df.schema.json(),
        }
        with open(f"{tmp}/_bucket_spec.json", "w") as fh:
            json.dump(spec, fh)
        with open(f"{tmp}/_SUCCESS_TEMPEL", "w") as fh:
            fh.write("ok")
        self._clear_bucket_layout(name)
        self._swap_in(tmp, final)
        self._journal(name, df_schema=[f.simpleString() for f in df.schema.fields],
                      seconds=round(time.time() - t0, 3),
                      bucket_by=list(bucket_by), n_buckets=n_buckets)
        return self._read_bucketed(name, spec)

    def _read_bucketed(self, name: str, spec: dict) -> DataFrame:
        """spark.table() so the bucket layout reaches the planner; if
        this session has not seen the table yet (resume after restart),
        re-register it from the sidecar bucket spec. The registration
        name is base-path-scoped (_tbl), so an existing registration
        always points at this catalog's files."""
        tbl = self._tbl(name)
        if not self.spark.catalog.tableExists(tbl):
            def q(c: str) -> str:
                return "`" + c.replace("`", "``") + "`"

            cols = ", ".join(q(c) for c in spec["bucket_by"])
            sort = (f" SORTED BY ({', '.join(q(c) for c in spec['sort_by'])})"
                    if spec.get("sort_by") else "")
            if "schema_json" in spec:
                from pyspark.sql.types import StructType

                st = StructType.fromJson(json.loads(spec["schema_json"]))
                ddl = ", ".join(
                    f"{q(f.name)} {f.dataType.simpleString()}"
                    f"{'' if f.nullable else ' NOT NULL'}"
                    for f in st.fields
                )
            else:  # legacy spec (pre-round-4): lossy simpleString DDL
                ddl = ", ".join(
                    f"`{p.split(':', 1)[0]}` {p.split(':', 1)[1]}"
                    for p in _split_ddl_fields(spec["schema_ddl"])
                )
            self.spark.sql(
                f"CREATE TABLE {tbl} ({ddl}) USING parquet "
                f"CLUSTERED BY ({cols}){sort} INTO {spec['n_buckets']} BUCKETS "
                f"LOCATION '{self.path(name)}'"
            )
        return self.spark.table(tbl)

    def delete(self, name: str) -> None:
        """Drop a published stage table (used to invalidate stale
        incremental state, e.g. cc_edges whose edge input changed)."""
        if self.use_iceberg:
            self.spark.sql(f"DROP TABLE IF EXISTS ckpt_{name}")
        else:
            # unconditional: a ghost registration may outlive its
            # sidecar (crash between publish steps)
            self._clear_bucket_layout(name)
            final = self.path(name)
            if os.path.exists(final):
                shutil.rmtree(final)
            # also purge swap orphans, or _recover would resurrect a
            # deliberately invalidated stage on the next exists()
            for d in self._orphans(final):
                shutil.rmtree(d, ignore_errors=True)
        meta = f"{self.base}/_meta_{name}.json"
        if os.path.exists(meta):
            os.remove(meta)
        self._journal(name, deleted=True)

    # -- sidecar metadata (stage fingerprints) -----------------------------
    def put_meta(self, name: str, meta: dict) -> None:
        with open(f"{self.base}/_meta_{name}.json", "w") as fh:
            json.dump(meta, fh)

    def get_meta(self, name: str) -> dict | None:
        p = f"{self.base}/_meta_{name}.json"
        if not os.path.exists(p):
            return None
        with open(p) as fh:
            return json.load(fh)

    def read_or_compute(self, name: str, compute, partition_by: tuple[str, ...] = (), force: bool = False) -> DataFrame:
        """Resume-from-checkpoint: the idempotent-stage pattern. A
        rerun after failure skips every published stage."""
        if not force and self.exists(name):
            return self.read(name)
        return self.write(compute(), name, partition_by)

    # -- lineage / metrics journal ----------------------------------------
    def _journal(self, name: str, **kv) -> None:
        rec = {"table": name, "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()), **kv}
        with open(f"{self.base}/_lineage.jsonl", "a") as fh:
            fh.write(json.dumps(rec) + "\n")

    def log_metrics(self, stage: str, metrics: dict) -> None:
        self._journal(f"metrics::{stage}", **metrics)

    def partition_lineage(self, name: str, partition_col: str = "snapshot_ts") -> DataFrame:
        """Per-partition row counts of a published stage — the
        lineage/metrics table the north_rule requires."""
        df = self.read(name)
        return df.groupBy(partition_col).agg(F.count(F.lit(1)).alias("rows")).withColumn(
            "table", F.lit(name)
        )
