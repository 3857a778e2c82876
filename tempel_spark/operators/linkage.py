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

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["fs_weights", "fs_score", "fs_em", "fs_weights_leveled", "fs_score_leveled", "fs_posterior"]


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

    NULL feature values (comparison not possible) are excluded from
    that feature's numerator AND denominator — missing at random, the
    same convention `fs_score` (NULL → 0) and `fs_em` apply — never
    counted as disagreement.

    Returns one row per feature: feature, n_match, n_nonmatch (global
    label counts), m, u, agree_weight, disagree_weight — all
    probabilities/weights rounded to ``decimals`` (the repo's
    round-before-compare determinism rule: a double sum's addition
    order is partition-dependent).
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
        # NULL = comparison not possible: excluded from BOTH the
        # numerator and this feature's denominator (missing at random —
        # the same convention fs_score and fs_em apply), not counted as
        # disagreement.
        aggs.append(F.sum(F.when(lbl & (fc == True), 1).otherwise(0)).alias(f"_am_{f}"))  # noqa: E712
        aggs.append(F.sum(F.when(lbl & fc.isNotNull(), 1).otherwise(0)).alias(f"_anm_{f}"))
        aggs.append(F.sum(F.when((~lbl) & (fc == True), 1).otherwise(0)).alias(f"_au_{f}"))  # noqa: E712
        aggs.append(F.sum(F.when((~lbl) & fc.isNotNull(), 1).otherwise(0)).alias(f"_anu_{f}"))
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
                        F.col(f"_anm_{f}").alias("_anm"),
                        F.col(f"_au_{f}").alias("_au"),
                        F.col(f"_anu_{f}").alias("_anu"),
                    )
                    for f in feature_cols
                ]
            )
        ).alias("_f"),
    ).select("_nm", "_nu", "_f.feature", "_f._am", "_f._anm", "_f._au", "_f._anu")
    s = float(smoothing)
    m = (F.col("_am") + s) / (F.col("_anm") + 2 * s)
    u = (F.col("_au") + s) / (F.col("_anu") + 2 * s)
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


def fs_em(
    pairs: DataFrame,
    feature_cols: list[str],
    n_iter: int = 3,
    init_m: float = 0.9,
    init_u: float = 0.1,
    init_lambda: float = 0.1,
    smoothing: float = 0.5,
    decimals: int = 6,
) -> DataFrame:
    """UNSUPERVISED Fellegi–Sunter estimation by expectation-
    maximization (Winkler 1988; the calibration loop behind Splink):
    no labels — the two-class mixture over the boolean feature vectors
    is fit directly from the candidate pairs.

    Per iteration: the E-step scores every pair's match posterior from
    the current (λ, m, u) under conditional independence,
        P(M|x) = λ·Π p_i / (λ·Π p_i + (1−λ)·Π q_i),
        p_i = m_i if x_i else 1−m_i (NULL → 1: no information),
    and the M-step re-estimates λ = mean posterior and the smoothed
    posterior-weighted agreement rates
        m_i = (Σ P·[x_i] + s) / (Σ P·[x_i non-null] + 2s)   (u_i dual).
    Every parameter is rounded to ``decimals`` BEFORE the next E-step —
    the repo's round-before-compare rule — so each iteration's
    expression uses fixed constants and the trajectory is reproducible
    on any engine or partitioning.

    Scale posture: one global aggregation per iteration (2 + 2·k
    conditional sums, map-side combinable, one collected row per
    iteration — bounded by n_iter·k, never by pairs). Returns the
    same weight-table shape as `fs_weights` plus the final match
    prior: feature, m, u, agree_weight, disagree_weight, lam, n_pairs.
    """
    if not feature_cols:
        raise ValueError("feature_cols must be non-empty")
    if not (0.0 < init_lambda < 1.0):
        raise ValueError("init_lambda must be in (0, 1)")
    s = float(smoothing)
    lam = round(float(init_lambda), decimals)
    params = {f: (round(float(init_m), decimals), round(float(init_u), decimals))
              for f in feature_cols}
    n_pairs = None
    for _ in range(n_iter):
        pm = F.lit(lam)
        pu = F.lit(1.0 - lam)
        for f in feature_cols:
            fc = F.col(f).cast("boolean")
            m_f, u_f = params[f]
            pm = pm * (
                F.when(fc == True, F.lit(m_f))  # noqa: E712
                .when(fc == False, F.lit(1.0 - m_f))  # noqa: E712
                .otherwise(F.lit(1.0))
            )
            pu = pu * (
                F.when(fc == True, F.lit(u_f))  # noqa: E712
                .when(fc == False, F.lit(1.0 - u_f))  # noqa: E712
                .otherwise(F.lit(1.0))
            )
        post = (pm / (pm + pu)).alias("_p")
        base = pairs.select(post, *feature_cols)
        aggs = [F.count(F.lit(1)).alias("_n"), F.sum("_p").alias("_sp")]
        for f in feature_cols:
            fc = F.col(f).cast("boolean")
            nn = fc.isNotNull().cast("double")
            aggs.append(F.sum(F.col("_p") * (fc == True).cast("double")).alias(f"_a_{f}"))  # noqa: E712
            aggs.append(F.sum(F.col("_p") * nn).alias(f"_an_{f}"))
            aggs.append(F.sum((1 - F.col("_p")) * (fc == True).cast("double")).alias(f"_b_{f}"))  # noqa: E712
            aggs.append(F.sum((1 - F.col("_p")) * nn).alias(f"_bn_{f}"))
        row = base.agg(*aggs).collect()[0]
        n_pairs = int(row["_n"])
        lam = round(row["_sp"] / row["_n"], decimals)
        params = {
            f: (
                round((row[f"_a_{f}"] + s) / (row[f"_an_{f}"] + 2 * s), decimals),
                round((row[f"_b_{f}"] + s) / (row[f"_bn_{f}"] + 2 * s), decimals),
            )
            for f in feature_cols
        }
    spark = pairs.sparkSession
    out = spark.createDataFrame(
        [
            (f, params[f][0], params[f][1], lam, n_pairs)
            for f in feature_cols
        ],
        "feature string, m double, u double, lam double, n_pairs long",
    )
    return out.select(
        "feature", "m", "u",
        F.round(F.log2(F.col("m") / F.col("u")), decimals).alias("agree_weight"),
        F.round(F.log2((1 - F.col("m")) / (1 - F.col("u"))), decimals).alias(
            "disagree_weight"
        ),
        "lam", "n_pairs",
    )


def fs_weights_leveled(
    labeled: DataFrame,
    features: dict[str, list],
    label_col: str = "is_match",
    smoothing: float = 0.5,
    decimals: int = 6,
) -> DataFrame:
    """Fellegi–Sunter estimation over MULTI-LEVEL comparison features
    (the Splink comparison-level model): each feature column holds one
    of its declared ordered levels (e.g. 'exact' / 'close' / 'far')
    or NULL (comparison not possible — excluded from that feature's
    numerators and denominators, like the boolean estimator).

    For feature i, level l:
        m_il = P(level l | match),  u_il = P(level l | non-match),
        weight_il = log2(m_il / u_il),
    smoothed additively with ``smoothing`` per level (denominator adds
    |levels|·s, so the per-feature distribution still sums to ~1).

    A value outside the declared level list raises — a silent
    catch-all level would hide typos in the comparison definition.

    Scale posture: same as `fs_weights` — ONE global aggregation
    (2·Σ|levels| + 2 conditional sums), one-row result reshaped to the
    (feature, level) table. Returns: feature, level, m, u, weight.
    """
    if not features:
        raise ValueError("features must be non-empty")
    for f, levels in features.items():
        if not levels:
            raise ValueError(f"feature {f!r} has no levels")
        if len(set(levels)) != len(levels):
            raise ValueError(f"feature {f!r} has duplicate levels")
    lbl = F.col(label_col).cast("boolean")
    aggs = []
    checks = []
    for f, levels in features.items():
        fc = F.col(f)
        aggs.append(F.sum(F.when(lbl & fc.isNotNull(), 1).otherwise(0)).alias(f"_nm_{f}"))
        aggs.append(
            F.sum(F.when((~lbl) & fc.isNotNull(), 1).otherwise(0)).alias(f"_nu_{f}")
        )
        for i, lv in enumerate(levels):
            aggs.append(
                F.sum(F.when(lbl & (fc == F.lit(lv)), 1).otherwise(0)).alias(f"_m_{f}_{i}")
            )
            aggs.append(
                F.sum(F.when((~lbl) & (fc == F.lit(lv)), 1).otherwise(0)).alias(f"_u_{f}_{i}")
            )
        checks.append(
            F.sum(
                F.when(fc.isNotNull() & ~fc.isin(list(levels)), 1).otherwise(0)
            ).alias(f"_bad_{f}")
        )
    row = labeled.agg(*aggs, *checks).collect()[0]
    bad = {f: row[f"_bad_{f}"] for f in features if row[f"_bad_{f}"]}
    if bad:
        raise ValueError(
            f"values outside the declared levels (rows per feature): {bad}"
        )
    s = float(smoothing)
    out = []
    for f, levels in features.items():
        nm, nu = row[f"_nm_{f}"], row[f"_nu_{f}"]
        for i, lv in enumerate(levels):
            m = (row[f"_m_{f}_{i}"] + s) / (nm + len(levels) * s)
            u = (row[f"_u_{f}_{i}"] + s) / (nu + len(levels) * s)
            out.append(
                (f, str(lv), round(m, decimals), round(u, decimals),
                 round(math.log2(m / u), decimals))
            )
    return labeled.sparkSession.createDataFrame(
        out, "feature string, level string, m double, u double, weight double"
    )


def fs_score_leveled(
    pairs: DataFrame,
    weights: DataFrame,
    out_col: str = "fs_score",
    decimals: int = 6,
) -> DataFrame:
    """Score pairs with a leveled weight table (`fs_weights_leveled`
    output): per feature one CASE chain over its levels (collected —
    bounded by Σ|levels|), NULL → 0. Same determinism contract as
    `fs_score`: a sum of fixed rounded constants."""
    rows = weights.select("feature", "level", "weight").collect()
    if not rows:
        raise ValueError("weights frame is empty")
    by_feature: dict[str, list] = {}
    for r in rows:
        by_feature.setdefault(r["feature"], []).append((r["level"], r["weight"]))
    missing = [f for f in by_feature if f not in pairs.columns]
    if missing:
        raise ValueError(f"pairs frame lacks feature columns {missing}")
    score = F.lit(0.0)
    for f, lvls in by_feature.items():
        expr = F.when(F.col(f).isNull(), F.lit(0.0))
        for lv, w in lvls:
            expr = expr.when(F.col(f) == F.lit(lv), F.lit(float(w)))
        # an undeclared value scores NULL -> surface it loudly instead
        # of silently scoring 0 (estimation would have raised on it)
        score = score + expr
    return pairs.withColumn(out_col, F.round(score, decimals))


def fs_posterior(
    pairs: DataFrame,
    match_prior: float,
    score_col: str = "fs_score",
    out_col: str = "match_probability",
    decimals: int = 6,
) -> DataFrame:
    """Turn a Fellegi–Sunter log2-weight score into a calibrated match
    probability (Splink's match_probability):

        P(M | x) = 1 / (1 + 2^-(score + log2(λ / (1 − λ))))

    — the posterior of the two-class model whose evidence is the
    summed weights and whose prior odds are λ/(1−λ). ``match_prior``
    is λ: pass a known rate, or `fs_em`'s estimated ``lam``.
    Pure expression — codegen, no shuffle, no Python."""
    if not (0.0 < match_prior < 1.0):
        raise ValueError("match_prior must be in (0, 1)")
    prior_weight = math.log2(match_prior / (1.0 - match_prior))
    odds_exp = F.col(score_col) + F.lit(prior_weight)
    return pairs.withColumn(
        out_col,
        F.round(F.lit(1.0) / (F.lit(1.0) + F.pow(F.lit(2.0), -odds_exp)), decimals),
    )
