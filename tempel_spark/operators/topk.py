"""Vector similarity search (SURVEY.md §2.3 J11/J12; reference FAISS
IndexFlatIP brute-force + HNSW, faiss_indexer.py:40,61-126,
nn_prediction.py:76).

Three tiers, in preference order at scale:

1. ``brute_force_topk`` — exact: broadcast the (small) query side
   against the partitioned candidate side, native dot/cosine, window
   rank-filter. This IS the reference's IndexFlatIP semantics.
2. ``ivf_topk`` — approximate: both sides bucketed by a deterministic
   coarse quantizer (sign bits of random-ish hyperplane projections —
   the same family as FAISS IVF/LSH coarse quantization); candidates
   searched only within the query's bucket (+ optional multi-probe).
   Turns O(Q×N) into O(Q×N/2^bits) with a bucket-key equi-join Spark
   shuffles normally (AQE handles bucket skew).
3. ``matmul_topk_pandas`` — exact, Arrow-batched: per-partition numpy
   GEMM against the broadcast query matrix. Use when the candidate
   row count per partition is large enough that BLAS beats codegen
   (wide embeddings, many queries).
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tempel_spark.functions.similarity import cosine_sim, dot_product

__all__ = ["brute_force_topk", "ivf_topk", "matmul_topk_pandas", "hyperplane_bucket"]


def brute_force_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 64,
    query_id: str = "query_id",
    cand_id: str = "cand_id",
    q_emb: str = "q_emb",
    c_emb: str = "c_emb",
    metric: str = "cosine",
) -> DataFrame:
    """Exact top-k: candidates stay partitioned (the 10^12 side),
    queries broadcast. Output: (query_id, cand_id, score, rank)."""
    sim = cosine_sim(q_emb, c_emb) if metric == "cosine" else dot_product(q_emb, c_emb)
    w = Window.partitionBy(query_id).orderBy(F.col("_score").desc(), F.col(cand_id))
    return (
        candidates.crossJoin(F.broadcast(queries))
        .withColumn("_score", sim)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, cand_id, F.col("_score").alias("score"), "rank")
    )


def hyperplane_bucket(emb_col, n_bits: int = 4, dim: int | None = None, seed: int = 7):
    """Deterministic coarse quantizer: sign of Σ w_i·x_i per bit, with
    pseudo-random ±1 weights derived from md5(bit, index) — engine-
    portable (same construction is expressible in the SQL oracle) and
    retry-stable, unlike a trained k-means codebook."""
    emb = F.col(emb_col) if isinstance(emb_col, str) else emb_col

    def _weight(b: int):
        # single-arg lambda via factory — `lambda i, b=b:` would become
        # the (element, index) transform form and bind b to the index
        # Column (see blocking.minhash_signature)
        return lambda i: F.when(
            F.substring(F.md5(F.concat(F.lit(f"hp{b}:"), i.cast("string"))), 1, 1) >= "8",
            F.lit(1.0),
        ).otherwise(F.lit(-1.0))

    bits = []
    for b in range(n_bits):
        # w_i = +1 if md5("hp{b}:{i}") first hex nibble >= '8' else -1
        proj = F.aggregate(
            F.zip_with(
                emb,
                F.transform(F.sequence(F.lit(1), F.size(emb)), _weight(b)),
                lambda x, w: x.cast("double") * w,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj >= 0, F.lit(1)).otherwise(F.lit(0)) * (2**b))
    out = bits[0]
    for x in bits[1:]:
        out = out + x
    return out.cast("int")


def ivf_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 64,
    n_bits: int = 4,
    query_id: str = "query_id",
    cand_id: str = "cand_id",
    q_emb: str = "q_emb",
    c_emb: str = "c_emb",
    nprobe: int = 1,
) -> DataFrame:
    """Approximate top-k: search the query's hyperplane bucket, plus —
    with ``nprobe`` > 1 — its Hamming-1 neighbor buckets (flip one
    sign bit each; the FAISS multi-probe idea, reference ANN role
    faiss_indexer.py:61-126).  nprobe=1 is the cheapest/lowest-recall
    setting; nprobe=n_bits+1 probes every Hamming-1 neighbor; values
    in between flip the lowest-index bits first.  Recall < 1 by
    design; tests/test_new_operators.py pins a recall@k floor vs
    brute force.

    Scale shape: the bucket equi-join shuffles both sides on the
    bucket key instead of replicating anything; multi-probe only
    explodes the (small) query side nprobe-fold, the candidate side
    is untouched.  Each candidate lives in exactly one bucket and the
    probe list is distinct, so no (query, candidate) pair dedup is
    needed before ranking."""
    base = hyperplane_bucket(q_emb, n_bits)
    if nprobe > 1:
        probes = F.array(
            base, *[base.bitwiseXOR(F.lit(1 << j)) for j in range(min(nprobe - 1, n_bits))]
        )
        qb = queries.withColumn("_bucket", F.explode(probes))
    else:
        qb = queries.withColumn("_bucket", base)
    cb = candidates.withColumn("_bucket", hyperplane_bucket(c_emb, n_bits))
    sim = cosine_sim(q_emb, c_emb)
    w = Window.partitionBy(query_id).orderBy(F.col("_score").desc(), F.col(cand_id))
    return (
        qb.join(cb, "_bucket")
        .withColumn("_score", sim)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, cand_id, F.col("_score").alias("score"), "rank")
    )


def matmul_topk_pandas(
    queries_pdf: pd.DataFrame,
    candidates: DataFrame,
    k: int = 64,
    cand_id: str = "cand_id",
    c_emb: str = "c_emb",
) -> DataFrame:
    """Exact top-k via per-partition numpy GEMM (Arrow batches).

    queries_pdf: small pandas frame (query_id, embedding list) —
    broadcast via closure, one BLAS matmul per Arrow batch. The
    reference's `embedding_ctxt.mm(cand_encs.t())` (biencoder.py:105)
    with the partition as the candidate block.
    """
    import numpy as np

    qids = queries_pdf.iloc[:, 0].to_numpy()
    qmat = np.stack(queries_pdf.iloc[:, 1].to_list()).astype("float64")
    qnorm = np.linalg.norm(qmat, axis=1)
    qnorm[qnorm == 0] = 1.0

    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cmat = np.stack(pdf[c_emb].to_list()).astype("float64")
            cnorm = np.linalg.norm(cmat, axis=1)
            cnorm[cnorm == 0] = 1.0
            sims = (qmat @ cmat.T) / qnorm[:, None] / cnorm[None, :]
            n_take = min(k, sims.shape[1])
            idx = np.argpartition(-sims, n_take - 1, axis=1)[:, :n_take]
            rows = []
            for qi in range(sims.shape[0]):
                for ci in idx[qi]:
                    rows.append((qids[qi], pdf[cand_id].iloc[ci], float(sims[qi, ci])))
            yield pd.DataFrame(rows, columns=["query_id", "cand_id", "score"])

    partial = candidates.mapInPandas(gen, schema="query_id long, cand_id long, score double")
    # per-partition top-k → global top-k (tree reduction, no full sort)
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("cand_id"))
    return partial.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def recall_at_k(approx: DataFrame, exact: DataFrame, query_id: str = "query_id", cand_id: str = "cand_id") -> float:
    """Fraction of exact top-k pairs the approximate index returned."""
    hit = approx.join(exact, [query_id, cand_id], "inner").count()
    total = exact.count()
    return hit / total if total else 1.0
