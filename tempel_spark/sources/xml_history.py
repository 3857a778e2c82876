"""Wikipedia-style revision-history XML reader (SURVEY.md §2.1 S1).

The reference streams 7z-compressed dumps through a SAX parser in
reader processes (s01_wikipedia_clean_and_tokenize.py:75-97,
misc/seven_zip_reader.py, misc/wikipedia_history_reader.py:14-438).
Two Spark shapes, matching the two dump encodings:

* plain/bz2 XML (`read_revision_history_xml`): splittable — read
  <page>…</page> blocks as custom-delimited text records
  (textinputformat.record.delimiter) so a multi-GB file fans out
  across tasks, each SAX-parsing its own pages via mapInPandas.
* .7z parts (`read_revision_history_7z`): the container is NOT
  splittable, so parallelism is one task per part file — exactly the
  reference's process-per-file model (60 reader processes ≈ 60 dump
  parts). The container decodes through the dependency-free stdlib
  reader (sources/sevenzip.py); pages stream out of the raw
  decompressor in bounded chunks, never materializing a member.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

__all__ = ["read_revision_history_xml", "read_revision_history_7z", "REVISION_SCHEMA"]

REVISION_SCHEMA = (
    "page_id long, title string, ns int, redirect string, "
    "rev_id long, rev_ts string, rev_text string"
)

_TAG = re.compile(r"<(/?)(\w+)")


def _parse_page(xml_fragment: str) -> list[tuple]:
    """Parse one <page>…</page> fragment into revision rows."""
    try:
        root = ET.fromstring(xml_fragment)
    except ET.ParseError:
        return []
    title = root.findtext("title") or ""
    ns = int(root.findtext("ns") or 0)
    page_id = int(root.findtext("id") or -1)
    redirect_el = root.find("redirect")
    redirect = redirect_el.get("title") if redirect_el is not None else ""
    rows = []
    for rev in root.findall("revision"):
        rows.append(
            (
                page_id, title, ns, redirect,
                int(rev.findtext("id") or -1),
                rev.findtext("timestamp") or "",
                rev.findtext("text") or "",
            )
        )
    return rows


def read_revision_history_xml(spark: SparkSession, path: str) -> DataFrame:
    """One row per (page, revision). Record split on `</page>` keeps
    each page's XML within a single task regardless of file size."""
    conf = {"textinputformat.record.delimiter": "</page>"}
    rdd = spark.sparkContext.newAPIHadoopFile(
        path,
        "org.apache.hadoop.mapreduce.lib.input.TextInputFormat",
        "org.apache.hadoop.io.LongWritable",
        "org.apache.hadoop.io.Text",
        conf=conf,
    ).map(lambda kv: kv[1])
    frags = spark.createDataFrame(rdd.map(lambda s: (s,)), "fragment string")

    def gen(batches):
        for pdf in batches:
            rows: list[tuple] = []
            for frag in pdf["fragment"]:
                start = frag.find("<page")
                if start < 0:
                    continue
                rows.extend(_parse_page(frag[start:] + "</page>"))
            yield pd.DataFrame(
                rows,
                columns=["page_id", "title", "ns", "redirect", "rev_id", "rev_ts", "rev_text"],
            )

    return frags.mapInPandas(gen, schema=REVISION_SCHEMA)


def read_revision_history_7z(spark: SparkSession, path: str) -> DataFrame:
    """One row per (page, revision), straight from .7z dump parts.

    Pages are split on ``</page>`` inside the chunk stream of each
    member, so peak task memory is one chunk + one page, independent
    of member size."""
    from tempel_spark.sources.sevenzip import SevenZArchive

    files = spark.read.format("binaryFile").load(path).select("content")

    cols = ["page_id", "title", "ns", "redirect", "rev_id", "rev_ts", "rev_text"]

    def gen(batches):
        for pdf in batches:
            for content in pdf["content"]:
                ar = SevenZArchive(bytes(content))
                # page split happens on BYTES (a multi-byte UTF-8 char
                # can straddle a chunk boundary — decoding per chunk
                # would corrupt it); each folder decompresses once
                tails: dict[str, bytes] = {}
                rows: list[tuple] = []
                for member, block in ar.iter_all():
                    buf = tails.get(member, b"") + block
                    parts = buf.split(b"</page>")
                    tails[member] = parts.pop()
                    for frag_b in parts:
                        start = frag_b.find(b"<page")
                        if start >= 0:
                            frag = frag_b[start:].decode("utf-8", errors="replace")
                            rows.extend(_parse_page(frag + "</page>"))
                    if len(rows) >= 1000:
                        yield pd.DataFrame(rows, columns=cols)
                        rows = []
                yield pd.DataFrame(rows, columns=cols)

    return files.mapInPandas(gen, schema=REVISION_SCHEMA)
