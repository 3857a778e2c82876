"""Tokenization (SURVEY.md §2.8 F12/F13/F18).

The reference BERT-tokenizes every snapshot/mention/title with
HuggingFace (s01:404-408,496-501). `transformers` isn't in this
container, so the REAL tokenizer is gated behind an import-try and a
deterministic wordpiece-ish fallback keeps the plumbing (schemas,
Arrow batching, array columns) fully exercised — swap-in is one
import.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["tokenize_udf", "detokenize_udf", "sentence_chunks", "word_tokens"]

try:  # pragma: no cover - not installed in this sandbox
    from transformers import BertTokenizer

    _TOKENIZER = BertTokenizer.from_pretrained("bert-base-uncased")

    def _tokenize(text: str) -> list[str]:
        return _TOKENIZER.tokenize(text)

except Exception:  # noqa: BLE001
    _WORD = re.compile(r"[a-z0-9]+|[^a-z0-9\s]")

    def _tokenize(text: str) -> list[str]:
        """Deterministic wordpiece-ish fallback: lowercase words, words
        longer than 6 chars split into 4-char pieces with the ##
        continuation convention (so detokenize round-trips)."""
        out: list[str] = []
        for w in _WORD.findall((text or "").lower()):
            if len(w) <= 6:
                out.append(w)
            else:
                out.append(w[:4])
                out.extend(f"##{w[i:i + 4]}" for i in range(4, len(w), 4))
        return out


@F.pandas_udf(T.ArrayType(T.StringType()))
def tokenize_udf(texts: pd.Series) -> pd.Series:
    """F12: batch tokenizer (Arrow). Model/tokenizer is a per-worker
    module singleton — loaded once per executor process, not per batch
    (the iterator-of-series pattern from SURVEY §2.11)."""
    return texts.map(_tokenize)


@F.pandas_udf(T.StringType())
def detokenize_udf(tokens: pd.Series) -> pd.Series:
    """F13: `##`-piece join back to text (reference misc/utils.py:5-13)."""

    def join(toks) -> str:
        out: list[str] = []
        for t in toks or []:
            if t.startswith("##") and out:
                out[-1] += t[2:]
            else:
                out.append(t)
        return " ".join(out)

    return tokens.map(join)


def word_tokens(col: Column | str) -> Column:
    """Native whitespace tokens (the zero-Python fast path)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def sentence_chunks(df: DataFrame, text_col: str, max_words: int = 32) -> DataFrame:
    """F18: split text into ≤max_words passages at sentence boundaries
    (reference src/models/utils/utils.py:70-127, used at s06:113-116).
    Native: split on sentence enders → greedy re-group in a pandas UDF
    only for the budget packing (the data-dependent fold), explode."""

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def pack(sentences: pd.Series) -> pd.Series:
        def fold(sents) -> list[str]:
            chunks: list[str] = []
            cur: list[str] = []
            n = 0
            # Arrow hands arrays in as numpy arrays — `sents or []`
            # raises on multi-element arrays
            for s in (sents if sents is not None else []):
                w = len(s.split())
                if cur and n + w > max_words:
                    chunks.append(" ".join(cur))
                    cur, n = [], 0
                cur.append(s)
                n += w
            if cur:
                chunks.append(" ".join(cur))
            return chunks

        return sentences.map(fold)

    sents = F.filter(
        F.transform(F.split(F.col(text_col), r"(?<=[.!?])\s+"), lambda s: F.trim(s)),
        lambda s: s != "",
    )
    return (
        df.withColumn("_chunks", pack(sents))
        .select("*", F.posexplode("_chunks").alias("chunk_idx", "chunk"))
        .drop("_chunks")
    )
