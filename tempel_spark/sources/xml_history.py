"""Wikipedia-style revision-history XML reader (SURVEY.md §2.1 S1).

The reference streams 7z-compressed dumps through a SAX parser in
reader processes (s01_wikipedia_clean_and_tokenize.py:75-97,
misc/seven_zip_reader.py, misc/wikipedia_history_reader.py:14-438).
Spark shape: wholeTextFiles-per-split is wrong for multi-GB dumps, so
we read <page>…</page> blocks as custom-delimited text records
(textinputformat.record.delimiter) — each task SAX-parses its own
pages via mapInPandas. 7z is not splittable and py7zr isn't in this
container; on a real cluster dumps are transcoded to bz2-multistream
or plain text first (standard practice), which this reader consumes.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

__all__ = ["read_revision_history_xml", "REVISION_SCHEMA"]

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
