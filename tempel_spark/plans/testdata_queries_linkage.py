"""Record-linkage calibration / graph-QA / blocking-diagnostics
queries with DuckDB oracles: Fellegi–Sunter weight estimation and
scoring, per-edge triangle support (false-match bridge triage),
Soundex phonetic blocking keys, and the hot-key skew census."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tempel_spark.functions.phonetic import soundex_code, soundex_sql
from tempel_spark.plans.testdata_queries import register, t

# --- Fellegi–Sunter fixture: part records blocked on -----------------
# (first name word, brand); gold = exact name equality. f_w2 is a
# near-perfect predictor (m≈1, u≈0 → large weights of both signs),
# f_type / f_size are deliberate noise features (m≈u → weights ≈ 0):
# the estimator must recover both regimes.

_FS_PAIRS_CTE = """
    b AS (SELECT p_partkey, p_name, p_brand, p_type, p_size,
                 split_part(p_name, ' ', 1) AS w1,
                 split_part(p_name, ' ', 2) AS w2
          FROM part),
    p AS (SELECT a.p_partkey AS id_a, c.p_partkey AS id_b,
                 (a.p_name = c.p_name) AS is_match,
                 (a.w2 = c.w2) AS f_w2,
                 (a.p_type = c.p_type) AS f_type,
                 (abs(a.p_size - c.p_size) <= 2) AS f_size
          FROM b a JOIN b c ON a.w1 = c.w1 AND a.p_brand = c.p_brand
                           AND a.p_partkey < c.p_partkey),
    agg AS (SELECT sum(is_match::int) AS nm,
                   sum((NOT is_match)::int) AS nu,
                   sum((is_match AND f_w2)::int) AS am1,
                   sum((is_match AND f_w2 IS NOT NULL)::int) AS anm1,
                   sum((NOT is_match AND f_w2)::int) AS au1,
                   sum((NOT is_match AND f_w2 IS NOT NULL)::int) AS anu1,
                   sum((is_match AND f_type)::int) AS am2,
                   sum((is_match AND f_type IS NOT NULL)::int) AS anm2,
                   sum((NOT is_match AND f_type)::int) AS au2,
                   sum((NOT is_match AND f_type IS NOT NULL)::int) AS anu2,
                   sum((is_match AND f_size)::int) AS am3,
                   sum((is_match AND f_size IS NOT NULL)::int) AS anm3,
                   sum((NOT is_match AND f_size)::int) AS au3,
                   sum((NOT is_match AND f_size IS NOT NULL)::int) AS anu3
            FROM p),
    w AS (SELECT 'f_w2' AS feature, am1 AS am, anm1 AS anm, au1 AS au, anu1 AS anu, nm, nu FROM agg
          UNION ALL SELECT 'f_type', am2, anm2, au2, anu2, nm, nu FROM agg
          UNION ALL SELECT 'f_size', am3, anm3, au3, anu3, nm, nu FROM agg),
    wt AS (SELECT feature, nm::bigint AS n_match, nu::bigint AS n_nonmatch,
                  round((am + 0.5) / (anm + 1), 6) AS m,
                  round((au + 0.5) / (anu + 1), 6) AS u,
                  round(log2(((am + 0.5) / (anm + 1)) / ((au + 0.5) / (anu + 1))), 6)
                    AS agree_weight,
                  round(log2((1 - (am + 0.5) / (anm + 1)) / (1 - (au + 0.5) / (anu + 1))), 6)
                    AS disagree_weight
           FROM w)
"""


def _fs_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = t(spark, sf_dir, "part").select(
        "p_partkey", "p_name", "p_brand", "p_type", "p_size",
        F.expr("split_part(p_name, ' ', 1)").alias("w1"),
        F.expr("split_part(p_name, ' ', 2)").alias("w2"),
    )
    left = p.select(
        F.col("p_partkey").alias("id_a"), F.col("p_name").alias("name_a"),
        F.col("w2").alias("w2_a"), F.col("p_type").alias("type_a"),
        F.col("p_size").alias("size_a"), "w1", "p_brand",
    )
    right = p.select(
        F.col("p_partkey").alias("id_b"), F.col("p_name").alias("name_b"),
        F.col("w2").alias("w2_b"), F.col("p_type").alias("type_b"),
        F.col("p_size").alias("size_b"), "w1", "p_brand",
    )
    return (
        left.join(right, ["w1", "p_brand"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            (F.col("name_a") == F.col("name_b")).alias("is_match"),
            (F.col("w2_a") == F.col("w2_b")).alias("f_w2"),
            (F.col("type_a") == F.col("type_b")).alias("f_type"),
            (F.abs(F.col("size_a") - F.col("size_b")) <= 2).alias("f_size"),
        )
    )


_FS_FEATURES = ["f_w2", "f_type", "f_size"]


@register(
    "q_fs_weights",
    f"""
    WITH {_FS_PAIRS_CTE}
    SELECT * FROM wt
    """,
)
def q_fs_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi–Sunter m/u estimation over labeled blocked part pairs:
    one global conditional aggregation (4 sums per feature, one-row
    result) reshaped to a per-feature weight table — the calibration
    layer of a probabilistic linker, with smoothing keeping the
    perfect-predictor feature's weights finite."""
    from tempel_spark.operators.linkage import fs_weights

    return fs_weights(_fs_pairs(spark, sf_dir), _FS_FEATURES)


@register(
    "q_fs_score",
    f"""
    WITH {_FS_PAIRS_CTE},
    ws AS (SELECT
      max(CASE WHEN feature = 'f_w2' THEN agree_weight END) AS aw1,
      max(CASE WHEN feature = 'f_w2' THEN disagree_weight END) AS dw1,
      max(CASE WHEN feature = 'f_type' THEN agree_weight END) AS aw2,
      max(CASE WHEN feature = 'f_type' THEN disagree_weight END) AS dw2,
      max(CASE WHEN feature = 'f_size' THEN agree_weight END) AS aw3,
      max(CASE WHEN feature = 'f_size' THEN disagree_weight END) AS dw3
      FROM wt)
    SELECT p.id_a, p.id_b, p.f_w2, p.f_type, p.f_size,
           round((CASE WHEN f_w2 THEN aw1 ELSE dw1 END)
               + (CASE WHEN f_type THEN aw2 ELSE dw2 END)
               + (CASE WHEN f_size THEN aw3 ELSE dw3 END), 6) AS fs_score
    FROM p CROSS JOIN ws
    """,
)
def q_fs_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score every blocked pair with the estimated FS weights: the
    weight table (3 rows) folds into one codegen CASE chain — zero
    shuffle, zero Python at pair scale. Feature order in the sum is
    the feature_cols order on both engines (identical double
    arithmetic)."""
    from tempel_spark.operators.linkage import fs_score, fs_weights

    pairs = _fs_pairs(spark, sf_dir)
    wts = fs_weights(pairs, _FS_FEATURES)
    return fs_score(pairs, wts).select(
        "id_a", "id_b", "f_w2", "f_type", "f_size", "fs_score"
    )


_SUPPLIER_GRAPH_CTE = """
    e AS (
      SELECT a.s_suppkey AS ea, b.s_suppkey AS eb,
             round(1 - abs(a.s_acctbal - b.s_acctbal) / 2000, 6) AS esc
      FROM supplier a JOIN supplier b
        ON a.s_nationkey = b.s_nationkey AND a.s_suppkey < b.s_suppkey
       AND abs(a.s_acctbal - b.s_acctbal) < 2000),
    tri AS (SELECT e1.ea AS x, e1.eb AS y, e2.eb AS z FROM e e1
            JOIN e e2 ON e2.ea = e1.ea AND e2.eb > e1.eb
            JOIN e e3 ON e3.ea = e1.eb AND e3.eb = e2.eb),
    te AS (SELECT x AS ea, y AS eb FROM tri
           UNION ALL SELECT x, z FROM tri
           UNION ALL SELECT y, z FROM tri),
    s AS (SELECT ea, eb, count(*) AS n FROM te GROUP BY ea, eb)
"""


def _supplier_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared fixture graph: same-nation suppliers within a 2000
    balance delta (61 edges / 25 triangles at sf0.01) — one edge
    builder, one oracle CTE, used by BOTH graph queries."""
    sup = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey", "s_acctbal")
    a = sup.select(F.col("s_suppkey").alias("ka"), F.col("s_nationkey").alias("nk"),
                   F.col("s_acctbal").alias("ba"))
    b = sup.select(F.col("s_suppkey").alias("kb"), F.col("s_nationkey").alias("nk"),
                   F.col("s_acctbal").alias("bb"))
    return (
        a.join(b, "nk")
        .filter(
            (F.col("ka") < F.col("kb"))
            & (F.abs(F.col("ba") - F.col("bb")) < 2000)
        )
        .select(
            F.col("ka").alias("id_a"), F.col("kb").alias("id_b"),
            F.round(1 - F.abs(F.col("ba") - F.col("bb")) / 2000, 6).alias("score"),
        )
    )


@register(
    "q_edge_support",
    f"""
    WITH {_SUPPLIER_GRAPH_CTE}
    SELECT e.ea AS id_a, e.eb AS id_b,
           coalesce(s.n, 0)::bigint AS n_triangles,
           coalesce(s.n, 0) = 0 AS is_bridge_like
    FROM e LEFT JOIN s USING (ea, eb)
    """,
)
def q_edge_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle support per match-graph edge (degree-ordered wedge
    enumeration — hubs never fan out). Zero-support edges are the
    bridge-like candidate false matches that would weld two entity
    clusters; the fixture graph is the same-nation balance-threshold
    supplier graph (61 edges / 25 triangles at sf0.01)."""
    from tempel_spark.operators.graph import edge_triangle_support

    return edge_triangle_support(_supplier_edges(spark, sf_dir))


@register(
    "q_soundex_blocks",
    f"""
    WITH w AS (SELECT unnest(string_split(p_name, ' ')) AS word FROM part),
    c AS (SELECT word, {soundex_sql("word", "duckdb")} AS code FROM w)
    SELECT code, count(*) AS n_words, count(DISTINCT word) AS n_distinct
    FROM c GROUP BY code
    """,
)
def q_soundex_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phonetic blocking-key census over part-name words: both engines
    run the SAME Soundex expression (functions/phonetic.py renders one
    SQL string per dialect), so the codes — not just counts — are
    value-checked. n_distinct > 1 rows are the phonetic collisions the
    blocking key exists to catch."""
    p = t(spark, sf_dir, "part").select(
        F.explode(F.split("p_name", " ")).alias("word")
    )
    return (
        p.withColumn("code", soundex_code("word"))
        .groupBy("code")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.countDistinct("word").alias("n_distinct"),
        )
    )


@register(
    "q_key_skew",
    """
    WITH c AS (SELECT l_suppkey, count(*) AS n_rows FROM lineitem GROUP BY l_suppkey),
    st AS (SELECT count(*)::bigint AS n_keys, sum(n_rows)::bigint AS n_total,
                  avg(n_rows) AS mean FROM c),
    top AS (SELECT * FROM c ORDER BY n_rows DESC, l_suppkey LIMIT 10)
    SELECT row_number() OVER (ORDER BY n_rows DESC, l_suppkey) AS rank,
           l_suppkey, n_rows::bigint AS n_rows,
           round(n_rows / n_total::double, 6) AS share,
           round(n_rows / mean, 6) AS skew_factor,
           n_keys, n_total
    FROM top CROSS JOIN st
    """,
)
def q_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key census of lineitem by supplier: top-10 keys by row count
    (distributed TakeOrdered, never a global sort) with share and
    skew-factor against the one-row global stats — the decide-before-
    you-join diagnostic feeding salt_hot_blocks / AQE skew handling."""
    from tempel_spark.operators.metrics import key_skew_profile

    return key_skew_profile(
        t(spark, sf_dir, "lineitem"), ["l_suppkey"], top_n=10
    )


def _em_iter_sql(lam: str, mu: dict, tag: str) -> str:
    """One unrolled EM iteration: posterior from the given (λ, m, u)
    SQL expressions, then the M-step aggregate + rounded re-estimates.
    Emits CTEs p{tag} / agg{tag} / r{tag}."""
    pm = " * ".join(
        [lam] + [f"(CASE WHEN {f} THEN {m} ELSE 1 - ({m}) END)" for f, (m, _) in mu.items()]
    )
    pu = " * ".join(
        [f"(1 - ({lam}))"]
        + [f"(CASE WHEN {f} THEN {u} ELSE 1 - ({u}) END)" for f, (_, u) in mu.items()]
    )
    a_sums = ",\n           ".join(
        f"sum(post * ({f})::int) AS a_{f}, sum((1 - post) * ({f})::int) AS b_{f}"
        for f in mu
    )
    ests = ",\n           ".join(
        f"round((a_{f} + 0.5) / (sp + 1), 6) AS m_{f}, "
        f"round((b_{f} + 0.5) / ((n_ct - sp) + 1), 6) AS u_{f}"
        for f in mu
    )
    src = "p" if tag == "1" else f"p CROSS JOIN r{int(tag) - 1}"
    return f"""
    pp{tag} AS (SELECT *, pm / (pm + pu) AS post FROM (
        SELECT *, {pm} AS pm, {pu} AS pu
        FROM {src})),
    agg{tag} AS (SELECT count(*)::bigint AS n_ct, sum(post) AS sp,
           {a_sums}
           FROM pp{tag}),
    r{tag} AS (SELECT n_ct, round(sp / n_ct, 6) AS lam,
           {ests}
           FROM agg{tag})"""


_EM_FEATURES = {"f_w2": ("0.9", "0.1"), "f_type": ("0.9", "0.1"), "f_size": ("0.9", "0.1")}
_EM_IT1 = _em_iter_sql("0.1", _EM_FEATURES, "1")
_EM_IT2 = _em_iter_sql(
    "lam", {f: (f"m_{f}", f"u_{f}") for f in _EM_FEATURES}, "2"
)


@register(
    "q_fs_em",
    f"""
    WITH {_FS_PAIRS_CTE},
    {_EM_IT1},
    {_EM_IT2}
    SELECT feature, m, u,
           round(log2(m / u), 6) AS agree_weight,
           round(log2((1 - m) / (1 - u)), 6) AS disagree_weight,
           lam, n_ct AS n_pairs
    FROM (
      SELECT 'f_w2' AS feature, m_f_w2 AS m, u_f_w2 AS u, lam, n_ct FROM r2
      UNION ALL SELECT 'f_type', m_f_type, u_f_type, lam, n_ct FROM r2
      UNION ALL SELECT 'f_size', m_f_size, u_f_size, lam, n_ct FROM r2)
    """,
)
def q_fs_em(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNSUPERVISED Fellegi–Sunter calibration: two EM iterations over
    the blocked part pairs with NO labels — the estimator must
    discover on its own that f_w2 separates the match mixture while
    f_type / f_size carry no evidence. Every parameter rounds to 6 dp
    before the next E-step, so the whole trajectory (both engines
    unroll the same two iterations) is value-checked, not just the
    fixed point."""
    from tempel_spark.operators.linkage import fs_em

    return fs_em(_fs_pairs(spark, sf_dir), _EM_FEATURES_LIST, n_iter=2)


_EM_FEATURES_LIST = list(_EM_FEATURES)


@register(
    "q_robust_components",
    f"""
    WITH RECURSIVE
    {_SUPPLIER_GRAPH_CTE},
    kept AS (SELECT e.ea AS a, e.eb AS b FROM e LEFT JOIN s USING (ea, eb)
             WHERE coalesce(s.n, 0) >= 1),
    ed AS (SELECT a, b FROM kept UNION SELECT b, a FROM kept),
    reach(n, m) AS (
      SELECT a, b FROM ed
      UNION
      SELECT r.n, e2.b FROM reach r JOIN ed e2 ON r.m = e2.a),
    comp AS (SELECT n AS node, least(n, min(m)) AS component FROM reach GROUP BY n),
    -- DuckDB quirk: inside a WITH RECURSIVE list, a non-self-referencing
    -- UNION CTE is NOT deduplicated (it parses as base/step) — dedup
    -- explicitly with DISTINCT over UNION ALL.
    nodes AS (SELECT DISTINCT node FROM
              (SELECT ea AS node FROM e UNION ALL SELECT eb FROM e))
    SELECT nodes.node, coalesce(comp.component, nodes.node) AS component
    FROM nodes LEFT JOIN comp USING (node)
    """,
)
def q_robust_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bridge-pruned reclustering of the supplier match graph: edges
    with zero triangle support (the bridge-like candidate false
    matches) are dropped, components recomputed with the full original
    node universe (orphaned nodes become singletons). Oracle =
    triangle prune + recursive-CTE transitive closure."""
    from tempel_spark.operators.graph import robust_components

    return robust_components(
        _supplier_edges(spark, sf_dir), min_support=1
    ).components.select(F.col("node"), F.col("component"))


_META_SX = soundex_sql("split_part(text, ' ', 1)", "duckdb")


@register(
    "q_meta_blocking",
    f"""
    WITH fam AS (
      SELECT doc_id AS node,
             'p:' || array_to_string(list_slice(string_split(text, ' '), 1, 2), ' ') AS blk
      FROM documents
      UNION ALL
      SELECT doc_id, 's:' || {_META_SX} FROM documents
      UNION ALL
      SELECT doc_id, 'l:' || (n_chars // 50)::varchar FROM documents),
    a0 AS (SELECT DISTINCT node, blk FROM fam),
    sz AS (SELECT blk, count(*) AS bs FROM a0 GROUP BY blk HAVING count(*) <= 40),
    a1 AS (SELECT a0.node, a0.blk, sz.bs FROM a0 JOIN sz USING (blk)),
    af AS (
      SELECT node, blk FROM (
        SELECT node, blk,
               row_number() OVER (PARTITION BY node ORDER BY bs ASC, blk ASC) AS r,
               count(*) OVER (PARTITION BY node) AS nb
        FROM a1)
      WHERE r <= ceil(nb * 0.6)),
    p AS (
      SELECT x.node AS id_a, y.node AS id_b, count(DISTINCT x.blk) AS weight
      FROM af x JOIN af y ON x.blk = y.blk AND x.node < y.node
      GROUP BY x.node, y.node),
    st AS (SELECT round(avg(weight), 6) AS mean_weight FROM p)
    SELECT p.id_a, p.id_b, p.weight, st.mean_weight,
           p.weight > st.mean_weight AS kept
    FROM p CROSS JOIN st
    """,
)
def q_meta_blocking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Meta-blocking over three overlapping block families on the
    documents corpus — 2-token prefix, Soundex of the first token, and
    a 50-char length bucket — purged at 40 rows/block, each node
    keeping its ceil(0.6·|blocks|) smallest blocks, pairs CBS-weighted
    and WEP-pruned at the global mean (~96% of candidates cut at
    sf0.01). The whole prune decision is value-checked, not just the
    survivor count."""
    from tempel_spark.operators.blocking import meta_block_prune

    d = t(spark, sf_dir, "documents").select("doc_id", "text", "n_chars")
    fam = (
        d.select(
            F.col("doc_id").alias("node"),
            F.concat(
                F.lit("p:"),
                F.concat_ws(" ", F.slice(F.split("text", " "), 1, 2)),
            ).alias("block"),
        )
        .unionAll(
            d.select(
                F.col("doc_id").alias("node"),
                F.concat(
                    F.lit("s:"), soundex_code("split_part(text, ' ', 1)")
                ).alias("block"),
            )
        )
        .unionAll(
            d.select(
                F.col("doc_id").alias("node"),
                F.concat(
                    F.lit("l:"),
                    F.floor(F.col("n_chars") / 50).cast("long").cast("string"),
                ).alias("block"),
            )
        )
    )
    return meta_block_prune(
        fam, max_block_size=40, block_filter_ratio=0.6
    )


@register(
    "q_fs_leveled",
    """
    WITH b AS (SELECT p_partkey, p_name, p_brand, p_size,
                      split_part(p_name, ' ', 1) AS w1
               FROM part),
    raw AS (SELECT a.p_partkey AS id_a, c.p_partkey AS id_b,
                   (a.p_name = c.p_name) AS is_match,
                   levenshtein(a.p_name, c.p_name) AS lev,
                   abs(a.p_size - c.p_size) AS sd
            FROM b a JOIN b c ON a.w1 = c.w1 AND a.p_brand = c.p_brand
                             AND a.p_partkey < c.p_partkey),
    lp AS (SELECT *,
                  CASE WHEN lev = 0 THEN 'exact' WHEN lev <= 5 THEN 'close'
                       ELSE 'far' END AS name_sim,
                  CASE WHEN sd = 0 THEN 'same' WHEN sd <= 2 THEN 'near'
                       ELSE 'far' END AS size_diff
           FROM raw),
    agg AS (SELECT sum(is_match::int) AS nm, sum((NOT is_match)::int) AS nu,
        sum((is_match AND name_sim = 'exact')::int) AS m_n0,
        sum((is_match AND name_sim = 'close')::int) AS m_n1,
        sum((is_match AND name_sim = 'far')::int) AS m_n2,
        sum((NOT is_match AND name_sim = 'exact')::int) AS u_n0,
        sum((NOT is_match AND name_sim = 'close')::int) AS u_n1,
        sum((NOT is_match AND name_sim = 'far')::int) AS u_n2,
        sum((is_match AND size_diff = 'same')::int) AS m_s0,
        sum((is_match AND size_diff = 'near')::int) AS m_s1,
        sum((is_match AND size_diff = 'far')::int) AS m_s2,
        sum((NOT is_match AND size_diff = 'same')::int) AS u_s0,
        sum((NOT is_match AND size_diff = 'near')::int) AS u_s1,
        sum((NOT is_match AND size_diff = 'far')::int) AS u_s2
        FROM lp),
    wt AS (SELECT
        round(log2(((m_n0 + 0.5) / (nm + 1.5)) / ((u_n0 + 0.5) / (nu + 1.5))), 6) AS w_n0,
        round(log2(((m_n1 + 0.5) / (nm + 1.5)) / ((u_n1 + 0.5) / (nu + 1.5))), 6) AS w_n1,
        round(log2(((m_n2 + 0.5) / (nm + 1.5)) / ((u_n2 + 0.5) / (nu + 1.5))), 6) AS w_n2,
        round(log2(((m_s0 + 0.5) / (nm + 1.5)) / ((u_s0 + 0.5) / (nu + 1.5))), 6) AS w_s0,
        round(log2(((m_s1 + 0.5) / (nm + 1.5)) / ((u_s1 + 0.5) / (nu + 1.5))), 6) AS w_s1,
        round(log2(((m_s2 + 0.5) / (nm + 1.5)) / ((u_s2 + 0.5) / (nu + 1.5))), 6) AS w_s2
        FROM agg)
    SELECT fs_score, count(*) AS n_pairs FROM (
      SELECT round(
        (CASE name_sim WHEN 'exact' THEN w_n0 WHEN 'close' THEN w_n1 ELSE w_n2 END)
        + (CASE size_diff WHEN 'same' THEN w_s0 WHEN 'near' THEN w_s1 ELSE w_s2 END),
        6) AS fs_score
      FROM lp CROSS JOIN wt)
    GROUP BY fs_score
    """,
)
def q_fs_leveled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Splink-style MULTI-LEVEL comparison model end to end: leveled
    features (name levenshtein exact/close/far, size diff
    same/near/far) estimated with fs_weights_leveled (one global
    aggregation) and scored with fs_score_leveled (per-feature CASE
    chain over collected rounded weights), reported as the score
    histogram — estimation AND scoring value-checked through one
    9-level weight table."""
    from tempel_spark.operators.linkage import fs_score_leveled, fs_weights_leveled

    p = t(spark, sf_dir, "part").select(
        "p_partkey", "p_name", "p_brand", "p_size",
        F.expr("split_part(p_name, ' ', 1)").alias("w1"),
    )
    left = p.select(F.col("p_partkey").alias("id_a"), F.col("p_name").alias("name_a"),
                    F.col("p_size").alias("size_a"), "w1", "p_brand")
    right = p.select(F.col("p_partkey").alias("id_b"), F.col("p_name").alias("name_b"),
                     F.col("p_size").alias("size_b"), "w1", "p_brand")
    lev = F.levenshtein("name_a", "name_b")
    sd = F.abs(F.col("size_a") - F.col("size_b"))
    pairs = (
        left.join(right, ["w1", "p_brand"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            (F.col("name_a") == F.col("name_b")).alias("is_match"),
            F.when(lev == 0, "exact").when(lev <= 5, "close").otherwise("far")
            .alias("name_sim"),
            F.when(sd == 0, "same").when(sd <= 2, "near").otherwise("far")
            .alias("size_diff"),
        )
    )
    wts = fs_weights_leveled(
        pairs,
        {"name_sim": ["exact", "close", "far"], "size_diff": ["same", "near", "far"]},
    )
    return (
        fs_score_leveled(pairs, wts)
        .groupBy("fs_score")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@register(
    "q_cluster_cohesion",
    f"""
    WITH RECURSIVE
    {_SUPPLIER_GRAPH_CTE},
    ed AS (SELECT ea AS a, eb AS b FROM e UNION ALL SELECT eb, ea FROM e),
    reach(n, m) AS (
      SELECT a, b FROM ed
      UNION
      SELECT r.n, e2.b FROM reach r JOIN ed e2 ON r.m = e2.a),
    comp AS (SELECT n AS node, least(n, min(m)) AS component FROM reach GROUP BY n),
    nodes AS (SELECT DISTINCT node FROM
              (SELECT ea AS node FROM e UNION ALL SELECT eb FROM e)),
    asg AS (SELECT nodes.node, coalesce(comp.component, nodes.node) AS component
            FROM nodes LEFT JOIN comp USING (node)),
    sz AS (SELECT component, count(*) AS n_members FROM asg GROUP BY component),
    ie AS (SELECT ca.component, count(*) AS n_edges,
                  round(avg(esc), 6) AS avg_score, round(min(esc), 6) AS min_score
           FROM e JOIN asg ca ON e.ea = ca.node
                  JOIN asg cb ON e.eb = cb.node AND ca.component = cb.component
           GROUP BY ca.component)
    SELECT sz.component, sz.n_members,
           coalesce(ie.n_edges, 0)::bigint AS n_edges,
           ie.avg_score, ie.min_score,
           CASE WHEN n_members > 1
                THEN round(coalesce(ie.n_edges, 0)
                           / (n_members * (n_members - 1) / 2.0), 6)
                ELSE 1.0 END AS density
    FROM sz LEFT JOIN ie USING (component)
    """,
)
def q_cluster_cohesion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster cohesion report over the supplier match graph:
    components from the engine's large-star/small-star CC, then edge
    density and avg/min edge affinity per cluster — the over-merge
    triage view (low density + weak min_score = audit with
    edge_triangle_support). Oracle = recursive-CTE closure + the same
    aggregations."""
    from tempel_spark.operators.clustering import connected_components
    from tempel_spark.operators.graph import cluster_cohesion

    edges = _supplier_edges(spark, sf_dir)
    cc = connected_components(edges.select("id_a", "id_b"))
    return cluster_cohesion(cc.components, edges)


@register(
    "q_tfidf_cosine",
    """
    WITH tk AS (
      SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x != ''))
               AS tok
      FROM documents),
    tf AS (SELECT doc_id, tok, count(*) AS tf FROM tk GROUP BY doc_id, tok),
    nd AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
    dfr AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
    w AS (SELECT tf.doc_id, tf.tok,
                 tf.tf * (ln((n + 1.0) / (df + 1.0)) + 1) AS w
          FROM tf JOIN dfr USING (tok) CROSS JOIN nd),
    nm AS (SELECT doc_id, sqrt(sum(w * w)) AS nm FROM w GROUP BY doc_id),
    p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
          FROM (SELECT doc_id, substr(text, 1, 12) AS k FROM documents) a
          JOIN (SELECT doc_id, substr(text, 1, 12) AS k FROM documents) b
            ON a.k = b.k AND a.doc_id < b.doc_id),
    dots AS (SELECT p.id_a, p.id_b, sum(wa.w * wb.w) AS dot
             FROM p JOIN w wa ON wa.doc_id = p.id_a
                    JOIN w wb ON wb.doc_id = p.id_b AND wb.tok = wa.tok
             GROUP BY p.id_a, p.id_b)
    SELECT p.id_a, p.id_b,
           round(coalesce(dots.dot, 0.0) / (na.nm * nb.nm), 6) AS tfidf_cosine
    FROM p LEFT JOIN dots USING (id_a, id_b)
           JOIN nm na ON na.doc_id = p.id_a
           JOIN nm nb ON nb.doc_id = p.id_b
    """,
)
def q_tfidf_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF cosine for blocked document pairs (Cohen's record-
    linkage string metric): rare shared tokens dominate, boilerplate
    contributes ~nothing. Weights one explode + hash agg, pair dot a
    shared-token equi-join — the fixture blocks on a 12-char text
    prefix."""
    from tempel_spark.operators.retrieval import tfidf_cosine_pairs

    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    keyed = d.select("doc_id", F.substring("text", 1, 12).alias("k"))
    pairs = (
        keyed.select(F.col("doc_id").alias("id_a"), "k")
        .join(keyed.select(F.col("doc_id").alias("id_b"), "k"), "k")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
    return tfidf_cosine_pairs(d, pairs)


@register(
    "q_fs_posterior",
    f"""
    WITH {_FS_PAIRS_CTE},
    ws AS (SELECT
      max(CASE WHEN feature = 'f_w2' THEN agree_weight END) AS aw1,
      max(CASE WHEN feature = 'f_w2' THEN disagree_weight END) AS dw1,
      max(CASE WHEN feature = 'f_type' THEN agree_weight END) AS aw2,
      max(CASE WHEN feature = 'f_type' THEN disagree_weight END) AS dw2,
      max(CASE WHEN feature = 'f_size' THEN agree_weight END) AS aw3,
      max(CASE WHEN feature = 'f_size' THEN disagree_weight END) AS dw3
      FROM wt),
    sc AS (SELECT round((CASE WHEN f_w2 THEN aw1 ELSE dw1 END)
                      + (CASE WHEN f_type THEN aw2 ELSE dw2 END)
                      + (CASE WHEN f_size THEN aw3 ELSE dw3 END), 6) AS fs_score
           FROM p CROSS JOIN ws)
    SELECT round(1.0 / (1.0 + pow(2.0, -(fs_score + log2(0.125 / 0.875)))), 6)
             AS match_probability,
           count(*) AS n_pairs
    FROM sc GROUP BY 1
    """,
)
def q_fs_posterior(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The calibrated end of the FS family (Splink match_probability):
    log2-weight scores plus prior odds through the logistic transform
    — estimation, scoring AND calibration value-checked through one
    histogram (λ = 0.125, the fixture's approximate match rate)."""
    from tempel_spark.operators.linkage import fs_posterior, fs_score, fs_weights

    pairs = _fs_pairs(spark, sf_dir)
    wts = fs_weights(pairs, _FS_FEATURES)
    scored = fs_score(pairs, wts)
    return (
        fs_posterior(scored, match_prior=0.125)
        .groupBy("match_probability")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
