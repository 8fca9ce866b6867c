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

__all__ = ["inverted_index", "corpus_stats"]


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
