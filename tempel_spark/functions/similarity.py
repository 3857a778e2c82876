"""String / set / vector similarity (SURVEY.md §2.8 F5-F7, F16-F17).

Native expressions for Levenshtein (JVM built-in), token Jaccard,
overlap-type classification; an Arrow-batched pandas UDF for
Jaro-Winkler (no JVM built-in exists).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "levenshtein_ratio",
    "token_jaccard",
    "overlap_type",
    "jaro_winkler_udf",
    "cosine_sim",
    "dot_product",
]


def levenshtein_ratio(a: Column | str, b: Column | str) -> Column:
    """dist / max(len) — `ratio_edit_distance_v2`
    (reference misc/utils.py:22-26). 0 = identical, 1 = disjoint."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return (F.levenshtein(a, b) / F.greatest(F.length(a), F.length(b), F.lit(1))).cast("double")


def token_jaccard(a: Column | str, b: Column | str, sep: str = " ") -> Column:
    """Distinct-token Jaccard similarity
    (reference src/stats/s07_analyze_similarity_of_predicted_candidates.py:165-228)."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    ta = F.array_distinct(F.split(a, sep))
    tb = F.array_distinct(F.split(b, sep))
    inter = F.size(F.array_intersect(ta, tb))
    union = F.size(F.array_union(ta, tb))
    return (inter / F.greatest(union, F.lit(1))).cast("double")


def overlap_type(mention: Column | str, title: Column | str) -> Column:
    """HIGH_OVERLAP / MULTIPLE_CATEGORIES / AMBIGUOUS_SUBSTRING /
    LOW_OVERLAP classifier (reference
    s02_alias_table_generator.py:50-90 `get_overlap_mention_entity_title`):

    - exact (case/underscore-normalized) match → HIGH_OVERLAP
    - mention == title minus a trailing parenthetical `_(...)`
      → MULTIPLE_CATEGORIES (disambiguation-page shape)
    - mention contained in title as whole words → AMBIGUOUS_SUBSTRING
    - else → LOW_OVERLAP
    """
    m = F.col(mention) if isinstance(mention, str) else mention
    t = F.col(title) if isinstance(title, str) else title
    norm = lambda c: F.trim(F.regexp_replace(F.lower(F.translate(c, "_", " ")), " +", " "))  # noqa: E731
    mn, tn = norm(m), norm(t)
    t_nodab = F.trim(F.regexp_replace(tn, r"\s*\(.*?\)\s*$", ""))
    contained = F.regexp_like(
        tn,
        F.concat(F.lit("(^| )"), F.regexp_replace(mn, r"([\\.\[\]\{\}\(\)\*\+\?\^\$\|])", r"\\$1"), F.lit("( |,|$)")),
    )
    return (
        F.when(mn == tn, F.lit("HIGH_OVERLAP"))
        .when(mn == t_nodab, F.lit("MULTIPLE_CATEGORIES"))
        .when(contained, F.lit("AMBIGUOUS_SUBSTRING"))
        .otherwise(F.lit("LOW_OVERLAP"))
    )


def _jaro(s1: str, s2: str) -> float:
    l1, l2 = len(s1), len(s2)
    if not l1 or not l2:
        return 0.0  # empty → 0 even for ("",""), matching the common SQL convention
    if s1 == s2:
        return 1.0
    match_dist = max(l1, l2) // 2 - 1
    f1 = [False] * l1
    f2 = [False] * l2
    matches = 0
    for i, c in enumerate(s1):
        lo = max(0, i - match_dist)
        hi = min(l2, i + match_dist + 1)
        for j in range(lo, hi):
            if not f2[j] and s2[j] == c:
                f1[i] = f2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(l1):
        if f1[i]:
            while not f2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    return (matches / l1 + matches / l2 + (matches - t) / matches) / 3.0


def _jaro_winkler(s1: str, s2: str, p: float = 0.1, max_prefix: int = 4) -> float:
    j = _jaro(s1, s2)
    if j <= 0.7:
        return j
    prefix = 0
    for a, b in zip(s1[:max_prefix], s2[:max_prefix]):
        if a == b:
            prefix += 1
        else:
            break
    return j + prefix * p * (1.0 - j)


def _make_jw():
    """Per-process Jaro-Winkler implementation picker: rapidfuzz's
    C-backed scorer when it is installed AND bit-agrees with the pure
    implementation on a probe set (guards against convention drift —
    boost threshold, empty-string handling); else the pure fallback.
    Evaluated once per Python worker at module import. The probe gate
    means a cluster with rapidfuzz gets the ~20× scorer with zero
    score drift (q_er_scored_pairs stays DuckDB-value-exact)."""
    try:
        from rapidfuzz.distance import JaroWinkler  # noqa: PLC0415
    except ImportError:
        return _jaro_winkler

    def rf(x: str, y: str) -> float:
        if not x or not y:
            return 0.0
        return JaroWinkler.normalized_similarity(x, y)

    probes = [
        ("martha", "marhta"), ("dwayne", "duane"), ("", ""), ("a", ""),
        ("granite ember", "granite embers"), ("abcdef", "abcdef"),
        ("ab", "ba"), ("jones", "johnson"), ("abcdefgh", "abzzzzzz"),
        ("prefix match low", "prxyzqw"), ("x", "y"),
    ]
    for x, y in probes:
        if abs(rf(x, y) - _jaro_winkler(x, y)) > 1e-9:
            return _jaro_winkler
    return rf


_JW = _make_jw()


@F.pandas_udf(T.DoubleType())
def jaro_winkler_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Jaro-Winkler similarity, Arrow-batched. Fills the scoring role
    of the reference's learned bi-encoder dot product
    (biencoder.py:105-123) for surface-form pairs — the scoring
    feature the north_rule names explicitly. Backed by rapidfuzz when
    available and probe-verified equivalent (_make_jw)."""
    return pd.Series(
        [_JW(x or "", y or "") for x, y in zip(a, b)], dtype="float64"
    )


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Native array<float> dot product via zip_with + aggregate —
    stays in codegen; no Python (reference F16, biencoder.py:105)."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_sim(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity over array<float> columns, fully native."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    num = dot_product(a, b)
    na = F.sqrt(dot_product(a, a))
    nb = F.sqrt(dot_product(b, b))
    return (num / F.when(na * nb > 0, na * nb).otherwise(F.lit(1.0))).cast("double")
