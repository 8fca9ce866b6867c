"""Extractive summarization: TextRank over the per-document sentence
graph (Mihalcea & Tarau, EMNLP 2004).

Each document becomes a graph whose nodes are its sentences and whose
edge weights are normalized token overlaps; a fixed-iteration weighted
PageRank scores the sentences and the top-k are the extract.  A
curation pipeline uses the extract as the snippet/abstract column and
as a cheap salience prior for token-budget trimming (keep a long
document's top sentences when the mix budget forces a cut).

Scale shape: everything is keyed by (doc_id, sentence_idx) — the
sentence-pair join is PER DOCUMENT (bounded by a doc's own sentence
count squared, never cross-document), rank iterations are the same
skinny join + hash-aggregate rounds as the link-graph PageRank
(operators/web.py:pagerank) with ``localCheckpoint`` lineage
truncation, and the final top-k window partitions by doc_id (bounded
groups).  Determinism: overlap counts are exact integers, the weight
normalization is one double division, scores are published on a
round-9 grid, and the overlap variant ``|A ∩ B| / (|A| + |B|)`` is
chosen over the paper's ``log|A| + log|B|`` denominator because it is
division-safe for 1-token sentences and exactly re-derivable in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ocr_spark.functions.text import sentences, tokens

__all__ = ["textrank_sentences"]


def textrank_sentences(df: DataFrame, key_col: str = "doc_id",
                       text_col: str = "text", n_iter: int = 3,
                       damping: float = 0.85, top_k: int = 2,
                       round_digits: int = 9) -> DataFrame:
    """Top-k TextRank sentences per document:
    ``(key, sent_rank, sent_idx, score, sentence)``.

    rank_i = (1-d) + d * sum_j w(j,i)/W(j) * rank_j from an all-ones
    start, ``n_iter`` unrolled iterations (fixed unrolling keeps the
    computation expressible as chained SQL aggregates for the oracle,
    the same convention as pagerank); w(i,j) = |tokens_i ∩ tokens_j|
    / (|tokens_i| + |tokens_j|) over distinct lowercased tokens,
    zero-overlap pairs dropped.  Sentences in documents with no
    overlapping pair score the teleport constant and rank by index."""
    sent = (
        df.select(F.col(key_col).alias("k"),
                  F.posexplode(sentences(text_col)).alias("sidx", "s"))
        .select("k", "sidx", "s",
                F.array_distinct(tokens(F.lower(F.col("s")))).alias("tk"))
        .localCheckpoint()
    )
    a = sent.select("k", F.col("sidx").alias("src"),
                    F.col("tk").alias("ta"))
    b = sent.select("k", F.col("sidx").alias("dst"),
                    F.col("tk").alias("tb"))
    ov = F.size(F.array_intersect("ta", "tb"))
    edges = (
        a.join(b, "k")
        .where(F.col("src") != F.col("dst"))
        .select("k", "src", "dst",
                (ov.cast("double")
                 / (F.size("ta") + F.size("tb")).cast("double")).alias("w"),
                ov.alias("ovl"))
        .where(F.col("ovl") > 0)
        .drop("ovl")
        .localCheckpoint()
    )
    wsum = edges.groupBy("k", "src").agg(F.sum("w").alias("wsum"))
    nodes = sent.select("k", "sidx")
    ranks = nodes.select("k", "sidx", F.lit(1.0).alias("r"))
    for _ in range(n_iter):
        contrib = (
            edges.join(ranks.withColumnRenamed("sidx", "src"), ["k", "src"])
            .join(wsum, ["k", "src"])
            .groupBy("k", "dst")
            .agg(F.sum(F.col("w") / F.col("wsum") * F.col("r")).alias("x"))
            .withColumnRenamed("dst", "sidx")
        )
        ranks = (
            nodes.join(contrib, ["k", "sidx"], "left")
            .select("k", "sidx",
                    (F.lit(1.0 - damping)
                     + F.lit(damping) * F.coalesce("x", F.lit(0.0)))
                    .alias("r"))
            .localCheckpoint()
        )
    scored = (
        ranks.join(sent.select("k", "sidx", "s"), ["k", "sidx"])
        .select("k", "sidx", F.round("r", round_digits).alias("score"), "s")
    )
    w = Window.partitionBy("k").orderBy(F.col("score").desc(),
                                        F.col("sidx").asc())
    return (
        scored.withColumn("sent_rank", F.row_number().over(w))
        .where(F.col("sent_rank") <= top_k)
        .select(F.col("k").alias(key_col),
                "sent_rank",
                F.col("sidx").alias("sent_idx"),
                "score",
                F.col("s").alias("sentence"))
    )
