"""Dictionary-driven text annotation.

:func:`gazetteer_link` — entity spotting: match a canonical
surface-form dictionary (gazetteer) against token n-grams and emit
(doc, position, entity) mention rows — the annotation layer entity
linking, knowledge-grounding, and PII-allowlist pipelines start from.
The reference has no annotation path (it returns flat field text,
services/response_parser.py); this is additive corpus capability.

Scale shape: the gazetteer is small by contract (thousands to low
millions of rows — it BROADCASTS); the corpus side explodes to at
most ``max_n`` rows per token and immediately broadcast-joins the
dictionary, so only actual mentions survive past the scan stage.
The containment-suppression self-join runs over mentions only
(orders of magnitude smaller than tokens) keyed by document.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ocr_spark.functions.text import tokens

__all__ = ["gazetteer_link"]


def gazetteer_link(df: DataFrame, gazetteer: dict[str, str],
                   id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Entity mentions: every token n-gram (n up to the longest
    gazetteer surface form) whose case-folded text equals a gazetteer
    surface, minus any mention STRICTLY contained in a longer mention
    (maximal munch: 'data table' at pos p suppresses 'table' at p+1,
    but two overlapping maximal mentions both survive — full
    leftmost-longest segmentation is inherently sequential and is
    deliberately not promised).  Output: (doc, pos, n_words, surface,
    entity_id), one row per surviving mention occurrence.

    Plan: per-n gram arrays built JVM-side (transform over a guarded
    sequence + array_join(slice)), exploded and immediately
    broadcast-joined against the literal gazetteer — corpus text
    never shuffles; the containment check is a left-anti self-join
    over the (rare) mention rows keyed by document."""
    if not gazetteer:
        raise ValueError("gazetteer must be non-empty")
    lengths = {len(s.split()) for s in gazetteer}
    if 0 in lengths:
        raise ValueError("gazetteer surface forms must be non-blank")
    spark = df.sparkSession
    gaz = F.broadcast(spark.createDataFrame(
        [(s, e, len(s.split())) for s, e in sorted(gazetteer.items())],
        "surface string, entity_id string, n_words int"))

    tl = df.select(id_col,
                   tokens(F.lower(F.col(text_col))).alias("_toks"))

    def gram_fn(n):
        # closure factory: the HOF lambda must take EXACTLY one param
        # (a second one would bind to the element index)
        return lambda i: F.struct(
            i.cast("int").alias("pos"),
            F.array_join(F.slice("_toks", i + 1, n), " ")
             .alias("surface"))

    parts = []
    for n in sorted(lengths):
        grams = F.when(
            F.size("_toks") >= n,
            F.transform(
                F.sequence(F.lit(0), F.size("_toks") - n), gram_fn(n))
        ).otherwise(F.array().cast(
            "array<struct<pos:int,surface:string>>"))
        parts.append(
            tl.select(id_col, F.explode(grams).alias("g"))
            .select(id_col, F.col("g.pos").alias("pos"),
                    F.col("g.surface").alias("surface")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    m = out.join(gaz, "surface").select(
        id_col, "pos", "n_words", "surface", "entity_id")
    a, b = m.alias("a"), m.alias("b")
    contained = (
        (F.col(f"a.{id_col}") == F.col(f"b.{id_col}"))
        & (F.col("b.pos") <= F.col("a.pos"))
        & (F.col("b.pos") + F.col("b.n_words")
           >= F.col("a.pos") + F.col("a.n_words"))
        & ((F.col("b.pos") != F.col("a.pos"))
           | (F.col("b.n_words") != F.col("a.n_words"))))
    return a.join(b, contained, "left_anti").select(
        id_col, "pos", "n_words", "surface", "entity_id")
