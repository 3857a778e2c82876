"""Title-change slowly-changing dimension + as-of join.

Reference: the history reader emits (title, filtered_date, page_id)
rows whenever a page's title at a cut differs
(misc/wikipedia_history_reader.py:301-368, sink s01:346-362), and the
alias-table stage joins mention stats to title_changes on
(title, filtered_date) (s02_alias_table_generator.py:275-295) — i.e.
"which page held this title AS OF this cut". Generalized here to a
proper SCD-2 dimension + a scalable as-of join.

The as-of join is the union-merge trick, not a range join: tag
change rows and probe rows, union them on the join key, and let one
ordered window carry the latest change attributes forward onto each
probe row. One shuffle per side, no interval explosion, no
O(probe × changes) blowup — the shape that survives 10^12 probe rows
(windows partition by the join key, which is the natural mention-
table distribution).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["build_title_history", "asof_join"]


def build_title_history(
    revisions: DataFrame,
    page_col: str = "page_id",
    title_col: str = "title",
    ts_col: str = "rev_ts",
) -> DataFrame:
    """Revision stream → title-change events (title, valid_from,
    page_id): one row whenever a page's title differs from its own
    previous revision (the reference's detect-changed-title fold,
    wikipedia_history_reader.py:301-368). Deterministic: ties on
    (page, ts) ordered by title."""
    w = Window.partitionBy(page_col).orderBy(F.col(ts_col).asc(), F.col(title_col).asc())
    prev = F.lag(title_col).over(w)
    return (
        revisions.select(page_col, title_col, ts_col)
        .withColumn("_prev", prev)
        .filter(F.col("_prev").isNull() | (F.col("_prev") != F.col(title_col)))
        .select(
            F.col(title_col).alias("title"),
            F.col(ts_col).alias("valid_from"),
            F.col(page_col).alias("page_id"),
        )
    )


def asof_join(
    probes: DataFrame,
    changes: DataFrame,
    key: str,
    probe_ts: str,
    change_ts: str = "valid_from",
    payload: list[str] | None = None,
) -> DataFrame:
    """For each probe row: attributes of the LATEST change with
    change_ts ≤ probe_ts for the same key (equal timestamps match —
    the reference joins stats to the title row OF the cut itself,
    s02:275-277).

    changes must be unique per (key, change_ts) — enforced here,
    because a tie would make the carried payload nondeterministic.
    Payload columns come back NULL for probes before the first
    change.
    """
    payload = payload or [c for c in changes.columns if c not in (key, change_ts)]
    # pin: the eager uniqueness probe below materializes the change
    # frame once and the union-merge then reads the pinned RDD instead
    # of re-deriving the whole changes chain a second time
    changes = changes.localCheckpoint(eager=False)
    dup = (
        changes.groupBy(key, change_ts).count().filter(F.col("count") > 1).limit(1).count()
    )
    if dup:
        raise ValueError(f"changes not unique per ({key}, {change_ts})")

    probe_cols = probes.columns
    clash = set(probe_cols) & ({*payload, "asof_valid_from"})
    if clash:
        raise ValueError(f"probe/payload column clash: {sorted(clash)}")
    change_types = dict(changes.dtypes)
    probe_types = dict(probes.dtypes)

    # probe rows carry their own columns; change rows carry the
    # payload — no synthetic row id (monotonically_increasing_id is
    # retry-nondeterministic), the union itself preserves identity.
    c = changes.select(
        F.col(key).alias("_k"),
        F.col(change_ts).alias("_ts"),
        F.lit(1).alias("_is_change"),
        *[F.lit(None).cast(probe_types[pc]).alias(pc) for pc in probe_cols],
        *[F.col(p) for p in payload],
        F.col(change_ts).alias("asof_valid_from"),
    )
    pu = probes.select(
        F.col(key).alias("_k"),
        F.col(probe_ts).alias("_ts"),
        F.lit(0).alias("_is_change"),
        *probe_cols,
        *[F.lit(None).cast(change_types[p]).alias(p) for p in payload],
        F.lit(None).cast(change_types[change_ts]).alias("asof_valid_from"),
    )
    # change rows sort BEFORE probe rows at equal ts (desc on the tag)
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), F.col("_is_change").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = c.unionByName(pu).select(
        "_is_change",
        *probe_cols,
        *[F.last(p, ignorenulls=True).over(w).alias(p) for p in payload],
        F.last("asof_valid_from", ignorenulls=True).over(w).alias("asof_valid_from"),
    )
    return carried.filter(F.col("_is_change") == 0).drop("_is_change")
