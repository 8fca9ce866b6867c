"""Corpus indexing and reporting.

* :func:`inverted_index` — positional posting lists (term -> document
  -> positions), the search-infrastructure shape a curated corpus
  feeds (retrieval baselines, BM25 stats, decontamination lookups).
* :func:`corpus_stats` — the per-(lang, source) "corpus card"
  aggregate every released dataset ships (doc counts, token counts,
  length distribution).

Scale shape: both are single explode->hash-aggregate plans over
skinny projections; the full text column never shuffles.  Posting
lists stay FLAT (one row per (term, doc)) — the nested
array-of-structs form is a presentation detail the sink can apply,
and flat rows keep the shuffle skinny, the hot term absorbed by
map-side partial aggregation, and every row independently placeable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ocr_spark.functions.text import tokens

__all__ = ["inverted_index", "corpus_stats", "bm25_topk"]


def inverted_index(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", min_df: int = 1) -> DataFrame:
    """Positional inverted index: one row per (term, document) with
    the term's 0-based token positions (sorted) and tf.

    ``min_df`` drops hapax/noise terms: document frequencies are a
    second skinny aggregate broadcast back as a semi-join filter (the
    classic vocabulary-pruning move — the posting shuffle only ever
    carries surviving terms).

    Plan: posexplode(tokens) -> filter -> ONE hash aggregate keyed
    (term, doc) with map-side combine; positions collect_list is
    bounded by per-doc term frequency, never corpus-wide.
    """
    pos = df.select(
        id_col, F.posexplode(tokens(text_col)).alias("pos", "term"))
    if min_df > 1:
        keep = (pos.groupBy("term")
                .agg(F.countDistinct(id_col).alias("df_t"))
                .where(F.col("df_t") >= min_df)
                .select("term"))
        pos = pos.join(F.broadcast(keep), "term", "left_semi")
    return (
        pos.groupBy("term", id_col)
        .agg(
            F.count("*").alias("tf"),
            F.sort_array(F.collect_list("pos")).alias("positions"),
        )
    )


def corpus_stats(df: DataFrame, text_col: str = "text",
                 group_cols: tuple[str, ...] = ("lang", "source")) -> DataFrame:
    """Per-group corpus card: document count, token totals, length
    distribution (exact interpolated median — identical semantics to
    the oracle's quantile_cont), and distinct-doc sanity count.

    One skinny aggregate over (group, n_tokens) rows; the median sort
    is per-group and bounded by group cardinality in rows of ONE int —
    at 100 TB this is the cheapest query in the pipeline."""
    per_doc = df.select(
        *group_cols, F.size(tokens(text_col)).alias("n_toks"))
    return (
        per_doc.groupBy(*group_cols)
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_toks").alias("n_tokens"),
            F.round(F.avg("n_toks"), 6).alias("avg_tokens"),
            F.expr("percentile(n_toks, 0.5)").alias("p50_tokens"),
            F.min("n_toks").alias("min_tokens"),
            F.max("n_toks").alias("max_tokens"),
        )
    )


def bm25_topk(df: DataFrame, query_terms: tuple[str, ...], k: int = 10,
              text_col: str = "text", id_col: str = "doc_id",
              k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """BM25 ranking of the corpus against a fixed term set — the
    retrieval baseline a curated corpus should be able to serve
    (Robertson-Sparck Jones idf: ``ln((N - df + 0.5)/(df + 0.5) + 1)``).

    Determinism note (shared with the SQL oracle): the per-document
    score sums ONE term at a time in the literal order of
    ``query_terms`` — conditional-aggregated tf columns combined in a
    fixed expression — never a groupBy-sum over per-term rows, whose
    float addition order is partition-dependent.  Rounded to 6 places.

    Scale shape: the token explode filters to the query terms FIRST
    (pushdown-friendly ``isin``), so the aggregate only ever sees
    matching tokens; df/N/avgdl are one tiny broadcast row; top-k is a
    global TakeOrdered, never a full sort.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    tl = df.select(id_col, tokens(text_col).alias("_t"))
    lens = tl.select(id_col, F.size("_t").alias("dl"))
    ex = tl.select(id_col, F.explode("_t").alias("term")).where(
        F.col("term").isin(*query_terms))
    tfs = ex.groupBy(id_col).agg(*[
        F.sum(F.when(F.col("term") == t, 1).otherwise(0)).alias(f"tf_{i}")
        for i, t in enumerate(query_terms)
    ])
    stats = lens.agg(
        F.count("*").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    ).crossJoin(
        ex.groupBy().agg(*[
            F.countDistinct(F.when(F.col("term") == t, F.col(id_col)))
            .alias(f"df_{i}")
            for i, t in enumerate(query_terms)
        ])
    )
    scored = (
        lens.join(tfs, id_col)  # docs with no query term drop out
        .crossJoin(F.broadcast(stats))
    )
    score = F.lit(0.0)
    for i in range(len(query_terms)):
        idf = F.log(
            (F.col("n_docs") - F.col(f"df_{i}") + 0.5)
            / (F.col(f"df_{i}") + 0.5) + 1)
        tf = F.col(f"tf_{i}").cast("double")
        score = score + idf * (
            tf * (k1 + 1)
            / (tf + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))))
    return (
        scored.select(id_col, F.round(score, 6).alias("score"))
        .orderBy(F.desc("score"), id_col)
        .limit(k)
    )
