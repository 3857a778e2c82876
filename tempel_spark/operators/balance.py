"""Deterministic sampling & dataset balancing (SURVEY.md §2.9 R1-R4,
§2.6 O6) — the reference's random sampling/balancing made retry- and
resume-stable by replacing every `random.*` draw with hash-keyed
uniforms (functions/hashing.py). Spark re-executes partitions on task
retry, so nondeterministic sampling silently corrupts exactly-once
semantics; these never do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tempel_spark.functions.hashing import hash_bucket, hash_uniform

__all__ = [
    "deterministic_sample_fraction",
    "deterministic_sample_n",
    "round_robin_assign",
    "weighted_reduce_to_quota",
    "shuffle_groups",
]


def deterministic_sample_fraction(df: DataFrame, key_col: str, fraction: float, seed: int = 42) -> DataFrame:
    """R1: keep each row iff hash-uniform(key) < fraction. Same rows
    on every run/retry/resume (reference df.sample, s03:422-423)."""
    return df.filter(hash_uniform(key_col, seed=seed) < fraction)


def deterministic_sample_n(df: DataFrame, key_col: str, n: int, seed: int = 42) -> DataFrame:
    """R1 exact-n: global hash-rank then limit. One total-order sort of
    the KEYS ONLY at the window — use for ≤ ~10^7 sampled universes
    (the reference caps at 10k entities, s03_dataset_creator.json:67)."""
    w = Window.orderBy(hash_uniform(key_col, seed=seed), F.col(key_col))
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= n).drop("_rn")


def round_robin_assign(
    df: DataFrame,
    group_col: str,
    order_cols: list[str],
    n_buckets: int,
    bucket_col: str = "bucket",
) -> DataFrame:
    """O6: distribute each group's rows 0,1,2,…,0,1,2 across buckets
    (reference round-robin quota allocation, s03_utils:160-169) —
    window arithmetic, parallel across groups."""
    w = Window.partitionBy(group_col).orderBy(*order_cols)
    return df.withColumn(bucket_col, F.pmod(F.row_number().over(w) - 1, F.lit(n_buckets)))


def weighted_reduce_to_quota(
    df: DataFrame,
    group_col: str,
    weight_col: str,
    quota: int,
    id_col: str,
    seed: int = 42,
) -> DataFrame:
    """R3: per group, keep `quota` rows sampled ∝ weight — the
    reference's weighted reduction multiset sampler (s03:544-571)
    re-expressed with exponential-race weighted sampling
    (Efraimidis-Spirakis): key = u^(1/w) with u = hash-uniform;
    top-quota keys per group win. Deterministic, one window."""
    u = hash_uniform(id_col, seed=seed)
    # avoid log(0): clamp u into (0,1)
    race = F.pow(F.greatest(u, F.lit(1e-12)), 1.0 / F.greatest(F.col(weight_col), F.lit(1e-12)))
    w = Window.partitionBy(group_col).orderBy(F.desc(race), F.col(id_col))
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= quota).drop("_rn")


def shuffle_groups(df: DataFrame, group_col: str, seed: int = 42) -> DataFrame:
    """R2: randomize group processing order deterministically —
    a hash sort key per group (reference random.shuffle of per-entity
    frames, s03:301-304)."""
    return df.withColumn("_gorder", hash_bucket(1_000_000, group_col, seed=seed)).orderBy(
        "_gorder", group_col
    ).drop("_gorder")
