"""Site-level boilerplate removal: per-domain template-line stripping
and intra-document paragraph dedup.

Two curation passes that complement the DOM-heuristic extractor
(extractor/core.py) and the *global* CCNet line dedup
(operators/dedup.py:line_dedup):

- ``strip_templates``: lines that recur across most documents of the
  SAME site (nav labels, cookie banners, footer legalese) are
  template boilerplate even when they are globally rare — a small
  site's banner never crosses a global frequency threshold.  CCNet
  and RefinedWeb both run this pass per-shard/per-domain.  The line
  frequency here is *document* frequency (countDistinct doc) so a
  line repeated many times inside one page does not self-promote
  into a template.
- ``dedup_paragraphs``: scraped pages frequently repeat whole
  paragraphs inside one document (print/mobile variants concatenated,
  pagination overlap).  First occurrence wins, document order
  otherwise preserved.

Scale shape (strip_templates): the exploded (domain, line) projection
is skinny; the per-domain frequency groupBy partial-aggregates
map-side; the template table is tiny (lines above a 50% doc-frequency
threshold) and broadcast for the anti-join, so the full-width text
crosses the network only once, at the final per-doc reassembly — the
same discipline as line_dedup.  At 100 TB the reassembly groupBy is
the only full-width exchange, and it is keyed by doc id (uniform).

Paragraph dedup is zero-shuffle: split / array fold / rejoin are all
per-row JVM expressions.

Reference parity: the reference strips boilerplate per-page with DOM
heuristics only (services/gemini_service.py prompt rules); cross-page
template detection is the corpus-level generalization a batch engine
can do and a per-page service cannot.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["strip_templates", "dedup_paragraphs"]


def strip_templates(df: DataFrame, key_col: str = "doc_id",
                    text_col: str = "text", group_col: str = "source",
                    min_df_frac: float = 0.5,
                    min_group_docs: int = 3) -> DataFrame:
    """Remove lines whose within-group document frequency is
    >= ``min_df_frac`` of the group's documents (groups smaller than
    ``min_group_docs`` are left untouched — 2 docs agreeing on a line
    is not evidence of a template).

    Returns (key, group, text_clean, n_lines_in, n_lines_kept).
    Blank lines are never counted as templates (they are structure,
    not content) and survive as-is.
    """
    lines = df.select(
        key_col, group_col,
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    ).withColumn("lkey", F.trim(F.col("line")))

    group_sizes = df.groupBy(group_col).agg(
        F.countDistinct(key_col).alias("n_docs"))
    line_df = (lines.where(F.col("lkey") != "")
               .groupBy(group_col, "lkey")
               .agg(F.countDistinct(key_col).alias("df_docs")))
    templates = (line_df.join(F.broadcast(group_sizes), group_col)
                 .where((F.col("n_docs") >= min_group_docs)
                        & (F.col("df_docs")
                           >= F.col("n_docs") * F.lit(min_df_frac)))
                 .select(group_col, "lkey"))

    kept = lines.join(F.broadcast(templates), [group_col, "lkey"],
                      "left_anti")
    reassembled = kept.groupBy(key_col).agg(
        F.count("*").alias("n_lines_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"]),
            "\n").alias("text_clean"))
    # left join from the base table: a document whose every line was a
    # template still comes back (empty text), it is not silently lost
    base = df.select(
        key_col, group_col,
        F.size(F.split(F.col(text_col), "\n")).cast("long")
        .alias("n_lines_in"))
    return base.join(reassembled, key_col, "left").select(
        key_col, group_col, "n_lines_in",
        F.coalesce(F.col("n_lines_kept"), F.lit(0)).cast("long")
        .alias("n_lines_kept"),
        F.coalesce(F.col("text_clean"), F.lit("")).alias("text_clean"))


def dedup_paragraphs(text_col: str | Column,
                     sep: str = "\n\n") -> dict[str, Column]:
    """Per-row paragraph dedup: split on ``sep``, keep the first
    occurrence of each paragraph (trim-keyed), rejoin in original
    order.  Pure JVM higher-order functions — zero shuffle, no
    Python.

    Returns columns {text_dedup, n_paras_in, n_paras_out}.  The
    first-occurrence fold is an explicit ``aggregate`` (not
    array_distinct) so the keep-order contract is in the code, not in
    an engine's undocumented behavior.
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    paras = F.split(c, sep)
    # fold: accumulate paragraphs whose trimmed form was not seen yet
    kept = F.aggregate(
        paras,
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, p: F.when(
            F.exists(acc, lambda q: F.trim(q) == F.trim(p)), acc
        ).otherwise(F.concat(acc, F.array(p))),
    )
    return {
        "text_dedup": F.array_join(kept, sep),
        "n_paras_in": F.size(paras).cast("long"),
        "n_paras_out": F.size(kept).cast("long"),
    }
