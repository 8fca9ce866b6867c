"""Similarity search over embedding columns (array<float>).

* ``cosine_topk``  — exact brute-force top-k: broadcast the (small)
  query side, JVM-side dot/norm via zip_with/aggregate, window rank.
  The baseline; O(|Q| * |corpus|) but fully distributed and
  whole-stage-codegen'd (no Python).
* ``lsh_bucket_assign`` / ``ann_topk_lsh`` — the scale path: random-
  hyperplane LSH (deterministic seed) buckets the corpus once; queries
  probe only their own bucket (+ optional multi-probe neighbors), so
  per-query cost is |bucket| ~ n / 2^planes.
* ``cosine_near_dup_pairs`` — embedding near-duplicate detection via
  the same LSH buckets: pairs within a bucket above a cosine threshold.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

__all__ = [
    "dot", "l2norm", "cosine", "cosine_topk", "cosine_pairs_bruteforce",
    "lsh_bucket_assign", "ann_topk_lsh", "cosine_near_dup_pairs",
]


def dot(a: Column, b: Column) -> Column:
    """Sequential left-to-right float accumulation — same order as a
    scalar loop, so results are reproducible across partitionings."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2norm(a) * l2norm(b))


# Note on the join kernels below: norms are materialized as per-row
# columns BEFORE the pair join, so each vector's norm fold runs once
# per row instead of once per candidate pair (HOF folds are interpreted
# — they re-evaluate per use).  dot/(na*nb) is arithmetically identical
# to cosine(a, b), so oracle parity is unaffected.


def cosine_topk(queries: DataFrame, corpus: DataFrame, k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k by cosine for each query vector.

    Query side is broadcast (it is small by contract); ties broken by
    ascending corpus id so ranks are deterministic.  Returns
    (query_id, neighbor_id, cos_sim, rank)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"),
        l2norm(F.col(vec_col)).alias("q_norm"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"),
        l2norm(F.col(vec_col)).alias("c_norm"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos_sim",
            F.round(
                dot(F.col("q_vec"), F.col("c_vec"))
                / (F.col("q_norm") * F.col("c_norm")),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def cosine_pairs_bruteforce(df: DataFrame, threshold: float,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            round_to: int = 4,
                            max_collect_bytes: int = 2 << 30) -> DataFrame:
    """All-pairs cosine >= threshold via blocked matrix multiply.

    One side is collected + broadcast as a normalized numpy matrix
    (the same fits-in-memory contract as a broadcast hash join); the
    other side streams through ``mapInPandas`` in Arrow batches, each
    batch scored against the broadcast matrix with a single GEMM.
    This replaces the row-at-a-time expression form (a self-join
    producing |n|^2 pair rows, each paying an interpreted
    zip_with/aggregate dot product — measured 200+s at 2k vectors vs
    seconds for this kernel).  At corpus sizes where neither side fits
    an executor, use ``cosine_near_dup_pairs`` (LSH-bucketed) — brute
    force all-pairs is only ever the small-side baseline."""
    import numpy as np

    spark = df.sparkSession
    # fail fast instead of OOMing the driver: learn dim from a limit-1
    # probe, derive the row cap, then collect AT MOST cap+1 rows.  Two
    # cheap driver actions total — not the probe+count+collect triple
    # that recomputed the full upstream lineage three times (round-2
    # ADVICE)
    probe = df.select(vec_col).head(1)
    dim = len(probe[0][0]) if probe and probe[0][0] is not None else 1
    cap = max_collect_bytes // (max(dim, 1) * 8)
    rows = df.select(id_col, vec_col).limit(cap + 1).collect()
    if len(rows) > cap:
        raise ValueError(
            f"cosine_pairs_bruteforce would collect more than "
            f"{max_collect_bytes >> 20} MiB ({cap}+ rows x {dim}-dim "
            f"doubles) to the driver; use cosine_near_dup_pairs "
            f"(LSH-bucketed) at this scale or raise max_collect_bytes "
            f"explicitly"
        )
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([list(r[1]) for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0.0] = np.nan  # zero vectors never match (NaN < any threshold)
    mat = mat / norms
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(mat)

    def kernel(batches):
        import numpy as _np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            a_ids = pdf[id_col].to_numpy(dtype=_np.int64)
            a = _np.stack([_np.asarray(v, dtype=_np.float64)
                           for v in pdf[vec_col]])
            an = _np.linalg.norm(a, axis=1, keepdims=True)
            an[an == 0.0] = _np.nan
            a = a / an
            raw = a @ b_mat.value.T
            # round half-away-from-zero to match F.round / DuckDB round
            # (np.round is banker's: 0.00005 would round DOWN and
            # disagree with the oracle at the threshold boundary)
            scale = 10.0 ** round_to
            sims = _np.sign(raw) * _np.floor(_np.abs(raw) * scale + 0.5) / scale
            ia, ib = _np.nonzero(sims >= threshold)
            keep = a_ids[ia] < b_ids.value[ib]
            yield pd.DataFrame({
                "id_a": a_ids[ia][keep],
                "id_b": b_ids.value[ib][keep],
                "cos_sim": sims[ia, ib][keep],
            })

    out_schema = "id_a long, id_b long, cos_sim double"
    src = df.select(id_col, vec_col).repartition(
        spark.sparkContext.defaultParallelism
    )
    return src.mapInPandas(kernel, schema=out_schema)


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes (driver-side numpy, broadcast as
    literals — tiny: n_planes x dim doubles).  Values are rounded to 3
    decimals so they are exact rational literals reproducible in any
    SQL engine — the DuckDB correctness oracle re-derives the same
    bucket assignment from these literals."""
    import numpy as np

    rng = np.random.RandomState(seed)
    return [[round(float(x), 3) for x in row]
            for row in rng.standard_normal((n_planes, dim))]


def lsh_bucket_assign(df: DataFrame, dim: int, n_planes: int = 8,
                      seed: int = 42, vec_col: str = "embedding") -> DataFrame:
    """Random-hyperplane LSH: bucket = bit pattern of sign(v . h_i).
    One narrow pass, no shuffle; the bucket column then drives
    groupBy/join co-location."""
    planes = _hyperplanes(dim, n_planes, seed)
    bucket = F.lit(0)
    vec = F.col(vec_col)
    for i, plane in enumerate(planes):
        h = F.array(*[F.lit(float(x)) for x in plane])
        bucket = bucket + F.when(dot(vec, h) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return df.withColumn("lsh_bucket", bucket.cast("int"))


def ann_topk_lsh(queries: DataFrame, corpus: DataFrame, dim: int, k: int = 5,
                 n_planes: int = 8, seed: int = 42, id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: score only corpus vectors in the query's LSH
    bucket.  Recall trades against 2^n_planes; the bucket equi-join
    replaces the brute-force cross join."""
    cb = lsh_bucket_assign(corpus, dim, n_planes, seed, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"),
        l2norm(F.col(vec_col)).alias("c_norm"), "lsh_bucket",
    )
    qb = lsh_bucket_assign(queries, dim, n_planes, seed, vec_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"),
        l2norm(F.col(vec_col)).alias("q_norm"), "lsh_bucket",
    )
    scored = (
        cb.join(F.broadcast(qb), on="lsh_bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos_sim",
            F.round(
                dot(F.col("q_vec"), F.col("c_vec"))
                / (F.col("q_norm") * F.col("c_norm")),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def cosine_near_dup_pairs(df: DataFrame, dim: int, threshold: float = 0.95,
                          n_planes: int = 6, seed: int = 42,
                          id_col: str = "vec_id",
                          vec_col: str = "embedding") -> DataFrame:
    """Embedding near-duplicate pairs: cosine >= threshold, candidates
    restricted to same-LSH-bucket pairs (equi-join, not cross join).
    Fewer planes than search -> higher recall for the dedup use case."""
    b = lsh_bucket_assign(df, dim, n_planes, seed, vec_col).select(
        F.col(id_col), F.col(vec_col), l2norm(F.col(vec_col)).alias("_norm"),
        "lsh_bucket",
    )
    l, r = b.alias("l"), b.alias("r")
    return (
        l.join(
            r,
            (F.col("l.lsh_bucket") == F.col("r.lsh_bucket"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .withColumn(
            "cos_sim",
            F.round(
                dot(F.col(f"l.{vec_col}"), F.col(f"r.{vec_col}"))
                / (F.col("l._norm") * F.col("r._norm")),
                6,
            ),
        )
        .filter(F.col("cos_sim") >= threshold)
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            "cos_sim",
        )
    )
