"""Text normalization & cleaning scalars (SURVEY.md §2.8 F2-F4, F8, F11, F19).

Native Column expressions wherever the reference's regex is simple;
the recursive-template wikitext cleaner is the one genuinely
imperative piece and lives in a pandas UDF (Arrow-batched).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tempel_spark.functions.wikitemplates import expand_inline_templates

__all__ = [
    "normalize_mention",
    "strip_quotes",
    "word_count",
    "whole_word_contains",
    "detect_redirect",
    "clean_wikitext_udf",
    "context_window",
]


def normalize_mention(col: Column | str) -> Column:
    """lower + trim + underscores→spaces + collapse whitespace.

    Reference: s02_alias_table_generator.py:198-203,253-254,446-448
    (mention normalization before the alias-table groupbys).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(F.translate(c, "_", " ")), " +", " "))


def strip_quotes(col: Column | str) -> Column:
    """Drop wiki bold/italic quote runs: `'''x'''` → `x`.

    Reference: s01_wikipedia_clean_and_tokenize.py:203,
    s02_alias_table_generator.py:54-61.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, "'+", "")


def word_count(col: Column | str) -> Column:
    """content_length = number of space-separated words
    (reference: s01:456 `len(text.split(' '))`)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.split(c, " "))


def whole_word_contains(needle: Column | str, hay: Column | str) -> Column:
    """Word-boundary containment (`one_string_in_another`,
    reference s02_alias_table_generator.py:29-47): needle appears in
    hay delimited by start/end/space/comma."""
    n = F.col(needle) if isinstance(needle, str) else needle
    h = F.col(hay) if isinstance(hay, str) else hay
    # regex-quote the needle, then anchor on word-ish boundaries
    quoted = F.regexp_replace(n, r"([\\.\[\]\{\}\(\)\*\+\?\^\$\|])", r"\\$1")
    return F.regexp_like(h, F.concat(F.lit("(^| )"), quoted, F.lit("( |,|$)")))


def detect_redirect(col: Column | str) -> Column:
    """Extract redirect target from `#REDIRECT [[Target]]` page text;
    empty string when the page is not a redirect.

    Reference: s02_redirect_detector.py:46-88.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract(c, r"(?i)^\s*#\s*REDIRECT\s*\[\[(.*?)\]\]", 1)


def context_window(text: Column | str, pos: Column, max_chars: int = 128) -> tuple[Column, Column]:
    """(left, right) context around a 1-based position, clipped to
    ``max_chars`` each side (reference context split:
    s03_final_dataset_creator_utils.py:70-91, max_len_context=128)."""
    t = F.col(text) if isinstance(text, str) else text
    left = t.substr(F.greatest(pos - max_chars, F.lit(1)), F.least(pos - 1, F.lit(max_chars)))
    right = t.substr(pos, F.lit(max_chars))
    return left, right


# --- wikitext gross/fine clean (reference misc/cleaning.py:38-195 +
# misc/recursive_cleaning.py) -----------------------------------------
# The nested {{...}} template remover needs a bracket-depth scan, which
# regexes can't express; this is the canonical "(b) pandas-UDF" case of
# the build contract. Batch in, batch out — no per-row Python dispatch.

_RE_COMMENT = re.compile(r"<!--.*?-->", re.S)
_RE_REF = re.compile(r"<ref[^>/]*/>|<ref[^>]*>.*?</ref>", re.S | re.I)
_RE_FILE = re.compile(r"\[\[(?:File|Image):[^\[\]]*(?:\[\[[^\[\]]*\]\][^\[\]]*)*\]\]", re.I)
_RE_TABLE = re.compile(r"\{\|.*?\|\}", re.S)
_RE_HEADING_CUT = re.compile(r"==\s*(References|External links|See also)\s*==.*$", re.S | re.I)
_RE_HTML = re.compile(r"<[^>]+>")
_RE_WS = re.compile(r"[ \t]+")


def _strip_templates(s: str) -> str:
    """Remove nested {{...}} blocks with a depth counter (the job of
    the reference's recursive_cleaning.py, reimplemented as a linear
    scan rather than recursive regex substitution)."""
    out: list[str] = []
    depth = 0
    i, n = 0, len(s)
    while i < n:
        if s.startswith("{{", i):
            depth += 1
            i += 2
        elif s.startswith("}}", i) and depth > 0:
            depth -= 1
            i += 2
        else:
            if depth == 0:
                out.append(s[i])
            i += 1
    return "".join(out)


def _clean_one(s: str) -> str:
    s = s.replace("&nbsp;", " ")
    s = _RE_COMMENT.sub(" ", s)
    s = _RE_REF.sub(" ", s)
    s = _RE_HEADING_CUT.sub(" ", s)
    s = _RE_FILE.sub(" ", s)
    # convert-family expansion BEFORE the generic strip (which would
    # delete these templates): offline dictionary replaces the
    # reference's memoized expandtemplates API (cleaning.py:72-170)
    s = expand_inline_templates(s)
    s = _strip_templates(s)
    s = _RE_TABLE.sub(" ", s)
    s = _RE_HTML.sub(" ", s)
    s = s.replace("'''", "").replace("''", "")
    return _RE_WS.sub(" ", s).strip()


# DataType object (not DDL string): parsing a DDL string requires an
# active SparkContext, which would make module import order matter.
@F.pandas_udf(T.StringType())
def clean_wikitext_udf(texts: pd.Series) -> pd.Series:
    """Gross+fine wikitext clean, Arrow-vectorized per batch."""
    return texts.fillna("").map(_clean_one)
