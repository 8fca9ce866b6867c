"""Linear text-classifier inference at corpus scale (the fastText /
CCNet model-filter shape).

Production curation pipelines filter with *trained* linear models
(CCNet's fastText LM filter, quality classifiers in GPT-3/LLaMA data
work): hash tokens into feature buckets, dot with a weight vector,
squash.  Training happens offline; what the 100-TB engine must do is
the *inference* — per document, zero shuffle, no Python.

This module implements exactly that shape with a deterministic
placeholder weight vector so the driver's DuckDB oracle can re-derive
scores bit-for-bit (a real model would broadcast its weights the same
way; only the literals change):

- feature hashing (Weinberger et al. 2009): bucket(token) =
  md5-60('b|' || token) % n_buckets;
- weights: w_int(bucket) = md5-60('w|' || bucket) % 2001 - 1000,
  i.e. integers in [-1000, 1000] standing in for trained weights
  scaled by 1000;
- the per-document accumulation is an EXACT INTEGER sum (order-free —
  the same cross-engine-determinism discipline as functions/sketch.py),
  divided once: logit = sum / (1000 * n_tokens);
- score = sigmoid(logit), round 6.

Everything is JVM higher-order functions over the token array —
per-row, no shuffle, no UDF.

Reference parity: the reference scores each document with a remote
model call (services/gemini_service.py); this is the batch-engine
version where the model is local arithmetic over broadcast weights.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ocr_spark.functions.text import tokens

__all__ = ["N_FEATURES", "linear_text_score", "feature_hash_vector",
           "burrows_delta"]

N_FEATURES = 64


def _md5_mod(prefix: str, c: Column, mod: int) -> Column:
    """md5-60(prefix || value) % mod — DuckDB twin:
    ('0x' || substr(md5(prefix || v), 1, 15))::BIGINT % mod."""
    return (
        F.conv(F.substring(F.md5(F.concat(F.lit(prefix), c)), 1, 15),
               16, 10).cast("long") % mod
    )


def linear_text_score(col: str | Column,
                      n_buckets: int = N_FEATURES) -> dict[str, Column]:
    """Per-row linear-model score of a text column.

    Returns {n_toks, logit, score, keep}: logit is the hashed-feature
    dot product (empty docs get logit 0 -> score 0.5), keep is the
    score >= 0.5 filter verdict.  Zero shuffle; exact-integer fold.
    """
    toks = tokens(col)

    def w_int(t: Column) -> Column:
        bucket = _md5_mod("b|", t, n_buckets)
        return _md5_mod("w|", bucket.cast("string"), 2001) - F.lit(1000)

    s = F.aggregate(toks, F.lit(0).cast("long"),
                    lambda acc, t: acc + w_int(t))
    n = F.size(toks).cast("long")
    logit = F.when(n > 0, s.cast("double")
                   / (F.lit(1000.0) * n.cast("double"))) \
        .otherwise(F.lit(0.0))
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))
    # dot_int is the EXACT integer dot product (the oracle-comparable
    # form); a rounded logit is deliberately not exposed — s/(1000n)
    # terminates at a '...5' decimal whenever n is a power of two, and
    # round-6 of that boundary is engine-dependent (Spark HALF_UP on
    # the shortest repr vs scaled-multiply rounding).
    return {
        "n_toks": n,
        "dot_int": s,
        "logit": logit,
        "score": F.round(score, 6),
        "keep": score >= F.lit(0.5),
    }


def feature_hash_vector(col: str | Column, dim: int = 16) -> Column:
    """Signed feature-hashing vectorizer (the hashing trick,
    Weinberger et al. ICML'09): token t adds ``sign(t)`` to component
    ``bucket(t)``, with bucket = md5-60('fh|' || t) % dim and sign
    from an independent hash bit — the unbiased sketch that lets a
    linear model or a cosine retrieval run without a vocabulary
    (exactly what a 10^12-doc corpus can't build a global vocab for).

    Returns an ``array<long>`` of EXACT integer counts — ONE per-row
    HOF fold (2 hash evaluations per token, a vector update per
    step), zero shuffle, SQL-oracle-able bit-for-bit.  Callers
    composing several reductions over the vector (dot + norm + ...)
    should materialize it once (select + localCheckpoint/cache):
    Spark's CollapseProject re-inlines the fold into every consumer
    otherwise and the interpreted HOF re-runs per consumer (measured
    10x on the retrieval query)."""
    toks = tokens(col)

    def bucket(t: Column) -> Column:
        return _md5_mod("fh|", t, dim)

    def sign(t: Column) -> Column:
        return F.when(_md5_mod("fs|", t, 2) == 0, F.lit(1)) \
            .otherwise(F.lit(-1)).cast("long")

    # hash each token ONCE into (bucket, sign) structs, then fold the
    # struct list into the dense vector — 2 md5 evaluations per token
    # total (hashing inside the fold's inner lambda would re-evaluate
    # per vector component).  NOTE: inner lambdas must take their
    # exact arity — an extra defaulted parameter would be bound to the
    # element INDEX.
    hashed = F.transform(toks, lambda t: F.struct(
        bucket(t).alias("b"), sign(t).alias("s")))
    zero = F.array_repeat(F.lit(0).cast("long"), dim)
    return F.aggregate(
        hashed, zero,
        lambda acc, p: F.transform(
            acc, lambda x, i: x + F.when(p["b"] == i.cast("long"),
                                         p["s"]).otherwise(F.lit(0))),
    )


def burrows_delta(df: DataFrame, pairs: DataFrame | None = None,
                  text_col: str = "text", id_col: str = "doc_id",
                  n_terms: int = 30,
                  round_digits: int = 6) -> DataFrame:
    """Burrows' Delta stylometric distance (Burrows 2002; Evert et al.
    2017 showed it is cosine-family on z-scored function-word rates):
    for the corpus's ``n_terms`` most frequent terms (in authorship
    work these are the function words — exactly the words every OTHER
    similarity op throws away), z-score each document's relative term
    frequency against the corpus distribution, and score a pair of
    documents as the mean absolute z-difference:

        delta(a, b) = mean_t | z(a, t) - z(b, t) |

    Same-author / same-template documents sit close in function-word
    style even when their topics — and therefore their shingle/minhash
    profiles — share nothing, so this catches ghost-written template
    farms that content dedup cannot.

    ``pairs`` (doc_a, doc_b) names which pairs to score; production
    feeds LSH/cluster candidates here (all-pairs is quadratic — the
    same contract as ``edit_verify`` and ``lsh_jaccard``).  None
    scores ALL pairs (test/oracle scale only).

    Determinism: mean and std are computed with explicitly-ordered
    arithmetic (sigma = sqrt(avg(f^2) - avg(f)*avg(f)), population
    form) so the SQL oracle replays the identical expression tree;
    zero-frequency (doc, term) cells contribute z = (0 - mu)/sigma and
    are reconstructed by a frame join, not dropped.  Published delta
    is rounded.

    Scale shape: one explode->hash aggregate for (term, doc) counts; a
    broadcast top-term cut; the (top-term x doc) z-matrix is skinny
    (n_terms * n_docs rows); pair scoring is an equi-join of that
    matrix with the candidate pair list on each side's doc id."""
    tl = df.select(F.col(id_col).alias("did"), tokens(text_col).alias("_t"))
    # Zero-token docs are excluded BEFORE the frame build: f = c/n is
    # undefined at n = 0 (Spark yields NULL, DuckDB NULL-or-NaN
    # depending on ieee_floating_point_ops), so a blank doc would
    # otherwise emit pair rows with NULL delta / engine-divergent
    # sigma.  The oracle applies the identical n > 0 cut.
    sizes = (tl.select("did", F.size("_t").cast("long").alias("n"))
             .where(F.col("n") > 0))
    sizes = sizes.localCheckpoint(eager=True)
    tdc = (tl.select("did", F.explode("_t").alias("tok"))
           .groupBy("tok", "did").agg(F.count("*").alias("c")))
    tdc = tdc.localCheckpoint(eager=True)
    top = (tdc.groupBy("tok").agg(F.sum("c").alias("v"))
           .orderBy(F.desc("v"), F.asc("tok")).limit(n_terms)
           .select("tok"))
    # full (term x doc) frame, zero cells included
    frame = F.broadcast(top).crossJoin(sizes.select("did"))
    cells = (frame.join(tdc, ["tok", "did"], "left")
             .join(sizes, "did")
             .select("tok", "did",
                     (F.coalesce("c", F.lit(0)).cast("double") / F.col("n"))
                     .alias("f")))
    stats = cells.groupBy("tok").agg(
        F.avg("f").alias("mu"),
        F.sqrt(F.avg(F.col("f") * F.col("f"))
               - F.avg("f") * F.avg("f")).alias("sigma"))
    z = (cells.join(F.broadcast(stats), "tok")
         .where(F.col("sigma") > 0)
         .select("tok", "did",
                 ((F.col("f") - F.col("mu")) / F.col("sigma")).alias("z")))
    if pairs is None:
        a = z.select(F.col("did").alias("doc_a"), "tok",
                     F.col("z").alias("z_a"))
        b = z.select(F.col("did").alias("doc_b"), "tok",
                     F.col("z").alias("z_b"))
        joined = a.join(b, "tok").where(F.col("doc_a") < F.col("doc_b"))
    else:
        za = z.select(F.col("did").alias("doc_a"), "tok",
                      F.col("z").alias("z_a"))
        zb = z.select(F.col("did").alias("doc_b"), "tok",
                      F.col("z").alias("z_b"))
        joined = (pairs.join(za, "doc_a").join(zb, ["doc_b", "tok"]))
    return (joined.groupBy("doc_a", "doc_b")
            .agg(F.round(F.avg(F.abs(F.col("z_a") - F.col("z_b"))),
                         round_digits).alias("delta"),
                 F.count("*").alias("n_terms_used")))
