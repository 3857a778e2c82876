"""Phonetic blocking keys (American Soundex).

Phonetic codes are a standard blocking family in record linkage:
"Smith" / "Smyth" / "Smithe" share a key, so typo'd surface forms land
in the same block without any pairwise comparison. The reference
blocks on normalized token prefixes only (its mentions are wiki
anchors, rarely phonetic variants); for transcript ER the spoken-form
variants make a phonetic key the cheapest recall add-on.

The algorithm is expressed ONCE as a SQL string (`soundex_sql`) built
from engine-portable primitives — upper / regexp_replace / translate /
replace / substr / rpad — and rendered per dialect (Spark replaces all
regex matches by default; DuckDB needs the 'g' flag). The Spark
operator wraps it in `F.expr`, the DuckDB oracle embeds the same
string: both engines run the SAME logic, whole-stage-codegen on the
Spark side, zero Python anywhere.

Spec (classic American Soundex, the SQL-Server/DB2 variant where a
first-letter run collapses into the letter itself — 'Pfister' →
P236):

1. strip non-letters, uppercase; empty input → ''.
2. code every letter: BFPV→1 CGJKQSXZ→2 DT→3 L→4 MN→5 R→6,
   vowels+Y→0 (separator), H/W deleted (transparent: same-code
   letters around them still collapse).
3. collapse runs of the same digit, THEN drop the 0 separators.
4. key = first letter + next 3 codes (the first letter's own run
   contributes no code), right-padded with 0.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["soundex_sql", "soundex_code"]

_SX_FROM = "BFPVCGJKQSXZDTLMNRAEIOUYHW"
_SX_TO = "111122222222334556000000"  # H, W have no target -> deleted


def soundex_sql(col_sql: str, dialect: str = "spark") -> str:
    """The Soundex expression over ``col_sql`` (a column name or SQL
    sub-expression) for ``dialect`` ∈ {'spark', 'duckdb'}. Identical
    logic in both renderings — only the regexp_replace global-flag
    spelling differs."""
    if dialect not in ("spark", "duckdb"):
        raise ValueError(f"unknown dialect {dialect!r}")
    g = ", 'g'" if dialect == "duckdb" else ""
    u = f"upper(regexp_replace({col_sql}, '[^A-Za-z]', ''{g}))"
    coded = f"translate({u}, '{_SX_FROM}', '{_SX_TO}')"
    for d in "123456":
        coded = f"regexp_replace({coded}, '{d}{d}+', '{d}'{g})"
    nz = f"replace({coded}, '0', '')"
    # the first letter's own code: '' for H/W, '0' for a vowel — in
    # both cases it left no leading char in nz, so nothing to drop
    fc = f"translate(substr({u}, 1, 1), '{_SX_FROM}', '{_SX_TO}')"
    rest = f"CASE WHEN {fc} IN ('', '0') THEN {nz} ELSE substr({nz}, 2) END"
    return (
        f"CASE WHEN length({u}) = 0 THEN '' "
        f"ELSE substr({u}, 1, 1) || rpad({rest}, 3, '0') END"
    )


def soundex_code(col_sql: str) -> Column:
    """Spark Column of the Soundex key of ``col_sql`` (column name or
    SQL sub-expression)."""
    return F.expr(soundex_sql(col_sql, dialect="spark"))
