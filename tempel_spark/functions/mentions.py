"""Mention extraction from turn text (SURVEY.md §2.8 F1).

The reference scans page wikitext for `[[target|mention]]` anchors
with pipe-trick / namespace / capitalization rules
(s01_wikipedia_clean_and_tokenize.py:117-274, get_mention 136-206,
parse_mentions_from_source 209-253; regexes misc/compiled_regexes.py:3-9).

Two implementations:

* ``extract_mentions_native`` — pure Column expressions
  (regexp_extract_all → explode → split). Used in oracle-checked
  queries: bit-identical semantics are expressible in ANSI SQL.
* ``extract_mentions_pandas`` — Arrow-batched pandas UDF carrying the
  full reference rule set (pipe trick, namespace skip, first-letter
  capitalization, underscore canonicalization) plus span offsets.
  This is the "mention extraction per turn with vectorized Arrow
  UDFs" stage named by the north_rule.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["extract_mentions_native", "extract_mentions_pandas", "MENTION_SCHEMA"]

ANCHOR_RE = r"\[\[(.*?)\]\]"

# namespaces the reference skips (s01:136-206 ignore rules)
_SKIP_PREFIX = re.compile(r"(?i)^(file|image|category|wikipedia|help|template|special|media|portal|book|draft|user|talk|[a-z\-]{2,3}):")
_ANCHOR = re.compile(ANCHOR_RE)


def extract_mentions_native(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Explode every `[[target|mention]]` (or `[[target]]`) anchor into
    one row with (target_raw, mention_raw). Keeps all other columns.

    Whole plan is JVM-side: regexp_extract_all + explode + split —
    no Python in the hot path at all.
    """
    anchors = F.regexp_extract_all(F.col(text_col), F.lit(ANCHOR_RE), 1)
    out = df.withColumn("anchor", F.explode(anchors))
    # F.get (not getItem): null for missing pipe part instead of an
    # out-of-bounds error under ANSI mode
    return (
        out.withColumn("target_raw", F.get(F.split(F.col("anchor"), r"\|"), 0))
        .withColumn(
            "mention_raw",
            F.coalesce(F.get(F.split(F.col("anchor"), r"\|"), 1), F.col("target_raw")),
        )
        .drop("anchor")
    )


def _canon_target(t: str) -> str:
    # capitalize first letter + space→underscore, the reference's page
    # title canonicalization (s01:197-206)
    t = t.strip()
    if not t:
        return t
    return (t[0].upper() + t[1:]).replace(" ", "_")


def _extract_one(text: str) -> list[tuple[str, str, int, int]]:
    res = []
    for m in _ANCHOR.finditer(text or ""):
        inner = m.group(1)
        if "|" in inner:
            target, mention = inner.split("|", 1)
            if mention == "":  # pipe trick: [[Title (dab)|]] → "Title"
                mention = re.sub(r"\s*\(.*?\)\s*$", "", target).split(":")[-1]
        else:
            target = mention = inner
        target = target.strip()
        mention = mention.strip()
        if not target or not mention or _SKIP_PREFIX.match(target):
            continue
        res.append((_canon_target(target), mention, m.start() + 1, m.end()))
    return res


MENTION_SCHEMA = (
    "conv_id string, turn_idx int, snapshot_ts timestamp, "
    "mention_text string, target_id string, span_start int, span_end int"
)


def extract_mentions_pandas(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Full reference-rule extraction with span offsets, via
    mapInPandas (batch iterator — one Arrow batch in, n mention rows
    out; the UDTF shape of SURVEY.md §2.11).

    Input needs columns conv_id, turn_idx, snapshot_ts, ``text_col``.
    """

    def gen(batches):
        for pdf in batches:
            rows = []
            for conv_id, turn_idx, snap, text in zip(
                pdf["conv_id"], pdf["turn_idx"], pdf["snapshot_ts"], pdf[text_col]
            ):
                for target, mention, s, e in _extract_one(text):
                    rows.append((conv_id, turn_idx, snap, mention, target, s, e))
            yield pd.DataFrame(
                rows,
                columns=[
                    "conv_id", "turn_idx", "snapshot_ts",
                    "mention_text", "target_id", "span_start", "span_end",
                ],
            )

    cols = ["conv_id", "turn_idx", "snapshot_ts", text_col]
    # JVM-side pre-filter: a turn without "[[" can't yield a mention,
    # so it never crosses the Arrow boundary. Semantics-preserving
    # (such rows produce zero output rows anyway) and it cuts the
    # Python-worker traffic by the anchor-free fraction of the corpus
    # — at web scale most turns carry no anchor at all.
    pre = df.select(*cols).filter(F.col(text_col).contains("[["))
    return pre.mapInPandas(gen, schema=MENTION_SCHEMA)
