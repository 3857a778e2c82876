"""Pairwise scoring (SURVEY.md §7 Phase 3).

Scores candidate pairs with the feature family the north_rule names:
Jaro-Winkler (pandas UDF) + token-set Levenshtein ratio (native
`F.levenshtein`, reference formula misc/utils.py:22-26) + token
Jaccard + optional cached-embedding cosine (native zip_with dot,
reference biencoder.py:105-123).

The must-link rule is the reference's edit-ratio threshold
(ratio_edit_distance < 0.2, s03_dataset_creator.json:44-46). The
reference's OTHER must-link — whole-word containment
(s03_final_dataset_creator_utils.py:611-665) — is deliberately NOT an
unconditional link here: a contained shortening with several
completions welds entities together transitively (see score_pairs);
containment-shaped pairs resolve by alias-table prior rank instead
(s02:434-440), the same way the reference's own linking stage ranks
candidates. The literal containment rule is used where its semantics
are right: subset-clustering leakage control
(plans/dataset_creator.assign_subsets_leakage_safe).

Everything except Jaro-Winkler is whole-stage-codegen; the UDF is
Arrow-batched (no per-row Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tempel_spark.functions.similarity import (
    cosine_sim,
    jaro_winkler_udf,
    levenshtein_ratio,
    token_jaccard,
)
from tempel_spark.functions.text import normalize_mention

__all__ = ["score_pairs", "abbreviation_edges", "anchored_partial_sources", "MUST_LINK_RATIO"]

MUST_LINK_RATIO = 0.2  # reference s03_dataset_creator.json:44


def score_pairs(
    pairs: DataFrame,
    text_a: str = "surface_a",
    text_b: str = "surface_b",
    emb_a: str | None = None,
    emb_b: str | None = None,
    threshold: float = 0.75,
    prenormalized: bool = False,
) -> DataFrame:
    """Add feature + score columns to a candidate-pair DataFrame and an
    `is_match` decision.

    score = 0.45·JW + 0.30·(1−lev_ratio) + 0.25·jaccard
            (re-weighted to 0.35/0.25/0.20/0.20·cosine when
             embeddings are present)
    is_match = must_link OR (score ≥ threshold AND NOT is_partial)

    prenormalized: pass True when text_a/text_b are ALREADY normalized
    (the pipeline normalizes once per distinct surface upstream).
    Catalyst's CollapseProject inlines per-column expressions into
    every consumer, so an inline normalize here would be re-executed
    ~20× per pair row (regex each time) — normalizing on the distinct
    vocabulary and carrying the result is the scale-correct shape.
    """
    # Features computed on normalized surfaces (lower/underscore/space
    # collapse — the reference normalizes mentions the same way before
    # its alias-table stats, s02:253-254) so case/underscore drift
    # never splits a cluster.
    if prenormalized:
        na, nb = F.col(text_a), F.col(text_b)
    else:
        na, nb = normalize_mention(text_a), normalize_mention(text_b)
    lev = levenshtein_ratio(na, nb)
    jw = jaro_winkler_udf(na, nb)

    # The token-array features (jaccard, the subset test, the token
    # counts) all derive from the same two splits, and the decision
    # columns below re-reference the feature columns — CollapseProject
    # would inline a fresh copy of each split/levenshtein tree into
    # every consumer. Route the shared scalar features through ONE
    # Generate (inline of a 1-element struct array): a Generate's
    # outputs are attributes, not aliases, so consumers reference them
    # without duplicating the trees — the same shape that fixed
    # q_minhash_signature's 16-fold signature re-evaluation. The
    # splits themselves are bound once via bind_once. All feature
    # expressions are term-for-term those of token_jaccard /
    # levenshtein_ratio — identical values, bit for bit.
    from tempel_spark.operators.blocking import bind_once

    def _feats(t):
        ta, tb = t["ta"], t["tb"]

        def _jac(d):
            inter = F.size(F.array_intersect(d["da"], d["db"]))
            union = F.size(F.array_union(d["da"], d["db"]))
            return (inter / F.greatest(union, F.lit(1))).cast("double")

        jac = bind_once(
            F.struct(
                F.array_distinct(ta).alias("da"), F.array_distinct(tb).alias("db")
            ),
            _jac,
        )
        subset = (F.size(F.array_except(ta, tb)) == 0) | (
            F.size(F.array_except(tb, ta)) == 0
        )
        return F.struct(
            lev.alias("ratio_edit_distance"),
            jac.alias("jaccard"),
            subset.alias("_subset"),
            (F.size(ta) != F.size(tb)).alias("_diffcount"),
        )

    feats = bind_once(
        F.struct(F.split(na, " ").alias("ta"), F.split(nb, " ").alias("tb")), _feats
    )
    out = pairs.select("*", F.inline(F.array(feats))).withColumn(
        "jaro_winkler", jw
    )
    string_score = (
        0.45 * F.col("jaro_winkler")
        + 0.30 * (1.0 - F.col("ratio_edit_distance"))
        + 0.25 * F.col("jaccard")
    )
    if emb_a and emb_b:
        out = out.withColumn(
            "cosine",
            F.when(
                F.col(emb_a).isNotNull() & F.col(emb_b).isNotNull(), cosine_sim(emb_a, emb_b)
            ),
        )
        emb_score = (
            0.35 * F.col("jaro_winkler")
            + 0.25 * (1.0 - F.col("ratio_edit_distance"))
            + 0.20 * F.col("jaccard")
            + 0.20 * F.col("cosine")
        )
        # pairs with a missing cached embedding fall back to the
        # string-only score instead of poisoning the decision with null
        score = F.when(F.col("cosine").isNotNull(), emb_score).otherwise(string_score)
    else:
        score = string_score

    subset = F.col("_subset")

    # must-link is the reference's ratio rule ALONE
    # (ratio_edit_distance < 0.2, s03_dataset_creator.json:44). Two
    # earlier broader rules both over-merged and were retired after
    # cluster audits: token-SET subset (round 1 — {juniper, raven} ⊂
    # {juniper, raven, willow} bridges entities) and unconditional
    # token-boundary PREFIX (round 2 at scale — a shortening with
    # SEVERAL completions, e.g. "alpha bravo" from two "alpha bravo
    # …" entities, transitively welds every completion into one
    # mega-cluster: observed 188 components where ~24k were gold).
    must_link = F.col("ratio_edit_distance") < MUST_LINK_RATIO

    # PARTIAL pairs — a token-set subset with DIFFERENT token counts
    # that is not a must-link ("falcon" ⊆ "falcon krypton",
    # "alpha bravo" ⊆ "alpha bravo xenon") — are inherently
    # AMBIGUOUS: the short side could complete to several entities,
    # and its distinct-token jaccard is inflated by construction
    # (often 1.0), so letting the generic score threshold hard-match
    # it bridges entities. Partials NEVER hard-match; each short side
    # links to its TOP-1 completion like the reference's alias-table
    # prior rank (prior_rank = 1 wins, s02:434-440) via
    # abbreviation_edges — which resolves a UNIQUE completion
    # identically to a would-be prefix must-link — optionally
    # re-ranked per occurrence by context (context_disambig).
    # EQUAL-count subsets (word swaps "granite ember"↔"ember
    # granite", or duplicate-token degenerates) are NOT shortenings —
    # they stay on the plain score path.
    is_partial = subset & ~must_link & F.col("_diffcount")
    return (
        out.withColumn("score", score.cast("double"))
        .withColumn("must_link", must_link)
        .withColumn("is_partial", is_partial)
        .withColumn("is_match", F.col("must_link") | ((F.col("score") >= threshold) & ~is_partial))
        .drop("_subset", "_diffcount")
    )


def anchored_partial_sources(
    scored: DataFrame,
    group_cols: list[str] | None = None,
    text_a: str = "surface_a",
    text_b: str = "surface_b",
    prenormalized: bool = False,
) -> DataFrame:
    """Surfaces already must-linked to a strictly LONGER surface.

    Such a surface has a confirmed full form ("Juniper Raven" prefix-
    must-links "Juniper Raven Willow"); also giving it a prior-ranked
    partial edge to some OTHER full form would bridge two entities
    through it (the round-2 "Juniper Raven"→"Juniper Juniper Raven"
    over-merge). Returns (group…, surface) to anti-join."""
    groups = group_cols or ["snapshot_ts"]
    if prenormalized:
        na, nb = F.col(text_a), F.col(text_b)
    else:
        na, nb = normalize_mention(text_a), normalize_mention(text_b)
    sa, sb = F.size(F.split(na, " ")), F.size(F.split(nb, " "))
    ml = scored.filter(F.col("must_link"))
    shorter_a = ml.filter(sa < sb).select(*groups, F.col("id_a").alias("surface"))
    shorter_b = ml.filter(sb < sa).select(*groups, F.col("id_b").alias("surface"))
    return shorter_a.unionByName(shorter_b).distinct()


def abbreviation_edges(
    scored: DataFrame,
    group_cols: list[str] | None = None,
    text_a: str = "surface_a",
    text_b: str = "surface_b",
    prenormalized: bool = False,
    freq_a: str | None = None,
    freq_b: str | None = None,
    exclude_anchored: bool = True,
) -> DataFrame:
    """Resolve PARTIAL pairs (token-subset ambiguity, incl. single-
    token abbreviations): each unanchored short side links to exactly
    one full-form candidate — ranked by the candidate's mention
    FREQUENCY first (the alias-table prior: prior_rank = 1 wins,
    s02_alias_table_generator.py:434-440), then string score, then
    deterministic id tie-break. Pass freq_a/freq_b (per-surface
    mention counts) to enable the prior; without them the rank falls
    back to score-only. Sources that already must-link to a longer
    surface are excluded (see anchored_partial_sources). Returns
    (group…, id_a, id_b) edges to union into the clustering edge
    list."""
    groups = group_cols or ["snapshot_ts"]
    if prenormalized:
        na, nb = F.col(text_a), F.col(text_b)
    else:
        na, nb = normalize_mention(text_a), normalize_mention(text_b)
    a_is_src = F.size(F.split(na, " ")) <= F.size(F.split(nb, " "))
    cand = scored.filter(F.col("is_partial") & ~F.col("is_match")).withColumn(
        "_src", F.when(a_is_src, F.col("id_a")).otherwise(F.col("id_b"))
    )
    if exclude_anchored:
        anchored = anchored_partial_sources(
            scored, groups, text_a, text_b, prenormalized
        ).withColumnRenamed("surface", "_src")
        cand = cand.join(anchored, [*groups, "_src"], "left_anti")
    order = []
    if freq_a and freq_b:
        # frequency of the FULL-FORM side (the candidate entity)
        cand = cand.withColumn(
            "_cand_freq", F.when(a_is_src, F.col(freq_b)).otherwise(F.col(freq_a))
        )
        order.append(F.col("_cand_freq").desc())
    order += [F.col("score").desc(), F.col("id_a"), F.col("id_b")]
    w = Window.partitionBy(*groups, "_src").orderBy(*order)
    return (
        cand.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(*groups, "id_a", "id_b")
    )
