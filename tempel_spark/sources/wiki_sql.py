"""Typed wiki SQL-dump loaders — the reference's field-specific
`page` / `redirect` / `page_props` parsers
(misc/load_wiki_sql_tables.py:25-59, 85-131, 155-211) on top of the
generic INSERT-tuple scan.

Reference semantics preserved per table:
  * page_props: keep rows whose property field is 'wikibase_item';
    page_id coerced to int, value is the QID (lines 36-50).
  * page: namespace-0 filter, title unquoting (``\\'`` → ``'``),
    page_id coerced to int (lines 169-196).
  * redirect: namespace-0 filter, target-title unquoting, then the
    title→page_id resolution the reference does through its page
    dict — here an equi-join against the typed page table; targets
    whose title is absent from namespace-0 pages drop out, exactly
    like the reference's dict KeyError path (lines 100-127).

Where the reference asserts key uniqueness while building its dicts,
these loaders stay declarative: rows pass through unchanged and a
caller that needs the invariant checks it as a count (the
test-strategy mapping of SURVEY.md §5 inline assertions).

Scale: the dump text scan is line-splittable (one INSERT line holds
~1k tuples, gzip is the only seam), the parse is all native regexp
expressions, and the title-resolution join is a plain equi-join —
broadcastable when the page dimension is small, shuffle-joined
otherwise; no driver-side dict of 10^7 pages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tempel_spark.sources.readers import parse_insert_lines, read_sql_dump_inserts

__all__ = [
    "page_props_from_inserts",
    "page_from_inserts",
    "redirects_from_inserts",
    "load_page_props",
    "load_page",
    "load_redirects",
]

# leading fields each parser consumes (the reference reads tuples
# positionally and ignores everything after the fields it needs, so
# trailing dump columns — whatever the layout year added — are inert)
_N_FIELDS = {"page_props": 3, "page": 3, "redirect": 3}


def page_props_from_inserts(raw: DataFrame) -> DataFrame:
    """(page_id long, qid string) from parsed `page_props` tuples
    (f0=pp_page, f1=pp_propname, f2=pp_value)."""
    return (
        raw.filter(F.col("f1") == "wikibase_item")
        .select(
            F.col("f0").cast("long").alias("page_id"),
            F.col("f2").alias("qid"),
        )
        .filter(F.col("page_id").isNotNull())
    )


def page_from_inserts(raw: DataFrame) -> DataFrame:
    """(page_id long, title string) from parsed `page` tuples
    (f0=page_id, f1=page_namespace, f2=page_title), namespace 0 only.
    Quote unescaping happened in the tuple scan."""
    return (
        raw.filter(F.col("f1").cast("int") == 0)
        .select(
            F.col("f0").cast("long").alias("page_id"),
            F.col("f2").alias("title"),
        )
        .filter(F.col("page_id").isNotNull())
    )


def redirects_from_inserts(raw: DataFrame, page: DataFrame) -> DataFrame:
    """(page_id_from long, page_id_to long, title_to string) from
    parsed `redirect` tuples (f0=rd_from, f1=rd_namespace,
    f2=rd_title) resolved against the typed page table — the
    reference's dict lookup as an equi-join."""
    red = (
        raw.filter(F.col("f1").cast("int") == 0)
        .select(
            F.col("f0").cast("long").alias("page_id_from"),
            F.col("f2").alias("title_to"),
        )
        .filter(F.col("page_id_from").isNotNull())
    )
    tgt = page.select(F.col("title").alias("title_to"), F.col("page_id").alias("page_id_to"))
    return red.join(tgt, "title_to").select("page_id_from", "page_id_to", "title_to")


def load_page_props(spark: SparkSession, path: str) -> DataFrame:
    return page_props_from_inserts(
        read_sql_dump_inserts(spark, path, "page_props", _N_FIELDS["page_props"])
    )


def load_page(spark: SparkSession, path: str) -> DataFrame:
    return page_from_inserts(read_sql_dump_inserts(spark, path, "page", _N_FIELDS["page"]))


def load_redirects(spark: SparkSession, path: str, page: DataFrame) -> DataFrame:
    return redirects_from_inserts(
        read_sql_dump_inserts(spark, path, "redirect", _N_FIELDS["redirect"]), page
    )


def parse_page_props_lines(lines: DataFrame) -> DataFrame:
    """In-plan variant over a `value: string` column of dump lines."""
    return page_props_from_inserts(
        parse_insert_lines(lines, "page_props", _N_FIELDS["page_props"])
    )


def parse_page_lines(lines: DataFrame) -> DataFrame:
    return page_from_inserts(parse_insert_lines(lines, "page", _N_FIELDS["page"]))


def parse_redirect_lines(lines: DataFrame, page: DataFrame) -> DataFrame:
    return redirects_from_inserts(
        parse_insert_lines(lines, "redirect", _N_FIELDS["redirect"]), page
    )
