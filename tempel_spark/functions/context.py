"""Per-occurrence context featurization (feature-hashed token vectors).

The reference disambiguates mentions by encoding the mention *in its
context* with a bi-encoder and retrieving nearest entity encodings
(src/models/biencoder/biencoder.py:105-123,
nn_prediction.py:76 — candidates are per mention-in-context, not per
surface). No model is available (or needed) here: a feature-hashed
bag-of-tokens vector captures topical co-occurrence, which is the
signal that separates two entities sharing an ambiguous surface.

Fully native Column expressions — the hashing trick is `dim` filtered
counts over the token array, all inside whole-stage codegen; no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["anchor_visible_text", "hashed_token_vector"]


def anchor_visible_text(text: Column | str) -> Column:
    """Collapse `[[target|mention]]` anchors to their VISIBLE part.

    The anchor target is the gold label in wiki-style corpora
    (s01:209-253) — leaving it in the context vector would let the
    featurizer read the answer instead of the context. `[[t|m]]` → m,
    `[[t]]` → t (the pipeless target is the visible text)."""
    t = F.col(text) if isinstance(text, str) else text
    t = F.regexp_replace(t, r"\[\[[^\]\|]*\|([^\]]*)\]\]", r"$1")
    return F.regexp_replace(t, r"\[\[([^\]]*)\]\]", r"$1")


def hashed_token_vector(
    text: Column | str,
    dim: int = 64,
    seed: int = 42,
    stopwords: list[str] | None = None,
    exclude: Column | str | None = None,
) -> Column:
    """Feature-hashed token-count vector (array<double>, length `dim`):
    bucket(token) = xxhash64(token, seed) mod dim, value = token count.

    stopwords: tokens to drop before hashing — pass the corpus's
    high-document-frequency tokens (see context_disambig) so boiler-
    plate phrasing doesn't drown the discriminative topical tokens.

    exclude: per-row string column whose tokens are removed — pass
    the row's own mention surface so the vector is the mention's
    CONTEXT, not the mention itself (a shared surface token carries
    no signal between candidates but skews cosine toward the
    shorter-named candidate via its smaller centroid norm).

    Deterministic (hash-keyed — retry/resume-stable like every other
    "random" choice in this engine) and cheap: tokens never leave the
    executor, and cosine over these vectors is the native zip_with
    dot product (similarity.cosine_sim)."""
    t = F.col(text) if isinstance(text, str) else text
    norm = F.lower(F.regexp_replace(t, r"[^\p{L}\p{N}]+", " "))
    toks = F.filter(F.split(norm, " "), lambda w: w != F.lit(""))
    if exclude is not None:
        ex = F.col(exclude) if isinstance(exclude, str) else exclude
        ex_toks = F.split(F.lower(F.regexp_replace(ex, r"[^\p{L}\p{N}]+", " ")), " ")
        toks = F.filter(toks, _not_in_arr_factory(ex_toks))
    if stopwords:
        toks = F.filter(toks, _not_in_factory(stopwords))
    buckets = F.transform(toks, lambda w: F.pmod(F.xxhash64(w, F.lit(seed)), F.lit(dim)))
    return F.array(
        *[
            F.size(F.filter(buckets, _eq_factory(d))).cast("double")
            for d in range(dim)
        ]
    )


def _eq_factory(d: int):
    # closure factory, NOT `lambda b, d=d`: a defaulted second param
    # turns the HOF lambda into the (element, index) form (see
    # blocking.minhash_signature / dedup.simhash64 notes)
    return lambda b: b == F.lit(d)


def _not_in_factory(stopwords: list[str]):
    return lambda w: ~w.isin(*stopwords)


def _not_in_arr_factory(arr: Column):
    return lambda w: ~F.array_contains(arr, w)
