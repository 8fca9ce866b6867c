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

__all__ = ["gazetteer_link", "mention_contexts", "entity_cooc"]


def gazetteer_link(df: DataFrame, gazetteer: dict[str, str],
                   id_col: str = "doc_id",
                   text_col: str = "text",
                   materialize: bool = True) -> DataFrame:
    """Entity mentions: every token n-gram (n up to the longest
    gazetteer surface form) whose case-folded text equals a gazetteer
    surface, minus any mention STRICTLY contained in a longer mention
    (maximal munch: 'data table' at pos p suppresses 'table' at p+1,
    but two overlapping maximal mentions both survive — full
    leftmost-longest segmentation is inherently sequential and is
    deliberately not promised).  Output: (doc, pos, n_words, surface,
    entity_id), one row per surviving mention occurrence.

    Plan: all n-gram lengths build as tagged arrays in ONE projection
    and explode once (a per-n union would re-scan the corpus once per
    length), then immediately broadcast-join the literal gazetteer —
    corpus text never shuffles; the containment check is a left-anti
    self-join over the (rare) mention rows keyed by document."""
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

    arrays = []
    for n in sorted(lengths):
        arrays.append(F.when(
            F.size("_toks") >= n,
            F.transform(
                F.sequence(F.lit(0), F.size("_toks") - n), gram_fn(n))
        ).otherwise(F.array().cast(
            "array<struct<pos:int,surface:string>>")))
    combined = arrays[0] if len(arrays) == 1 else F.concat(*arrays)
    out = (tl.select(id_col, F.explode(combined).alias("g"))
           .select(id_col, F.col("g.pos").alias("pos"),
                   F.col("g.surface").alias("surface")))
    # materialize the (tiny) mention set before the containment
    # self-join: both join sides reference it, and without the
    # checkpoint each side re-runs the corpus scan + explode (the
    # CollapseProject/reuse lesson — one corpus pass, not two)
    m = out.join(gaz, "surface").select(
        id_col, "pos", "n_words", "surface", "entity_id")
    if materialize:
        # (materialize=False keeps the plan lazy/inspectable)
        m = m.localCheckpoint(eager=False)
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


def mention_contexts(df: DataFrame, mentions: DataFrame,
                     window: int = 3, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Context windows around mentions — the KWIC view entity-linking
    and citation-analysis pipelines read: for each (doc, pos, n_words)
    mention row, the surrounding ``window`` tokens on each side
    (clamped at document edges) joined back into a snippet.

    Plan: the token arrays join the mention rows on the document key
    (ONE shuffle of (doc, tokens) against the skinny mention side);
    the slice/join is per-row JVM.  At 100 TB restrict ``mentions``
    first — the operator only materializes windows for rows given."""
    tl = df.select(id_col,
                   tokens(F.lower(F.col(text_col))).alias("_toks"))
    start = F.greatest(F.lit(0), F.col("pos") - window)
    end = F.least(F.size("_toks"),
                  F.col("pos") + F.col("n_words") + window)
    return (mentions.join(tl, id_col)
            .select(
                id_col, "pos", "n_words",
                *[c for c in mentions.columns
                  if c not in (id_col, "pos", "n_words")],
                F.array_join(
                    F.slice("_toks", start + 1, end - start), " ")
                 .alias("context")))


def entity_cooc(mentions: DataFrame, window: int | None = None,
                min_count: int = 1, id_col: str = "doc_id",
                materialize: bool = True) -> DataFrame:
    """Entity co-occurrence graph from mention rows — the
    knowledge-graph edge builder: entity pairs appearing in the same
    document (optionally within ``window`` token positions), with the
    co-occurrence count and each side's corpus mention count so the
    caller can derive PMI/likelihood ratios (emitted as exact
    integers; no float scoring inside the operator).

    Plan: mention self-join keyed by document (mentions are orders of
    magnitude sparser than tokens), pair-count aggregate, then two
    broadcast joins of the tiny per-entity marginal aggregate."""
    m = mentions.select(id_col, "pos", "entity_id")
    if materialize:
        # mentions feed both self-join sides AND the marginals; lazy,
        # the upstream spotting pipeline re-runs three times
        m = m.localCheckpoint(eager=False)
    a, b = m.alias("a"), m.alias("b")
    cond = ((F.col(f"a.{id_col}") == F.col(f"b.{id_col}"))
            & (F.col("a.entity_id") < F.col("b.entity_id")))
    if window is not None:
        d = F.col("a.pos") - F.col("b.pos")
        cond = cond & (d <= window) & (-d <= window)
    pairs = (a.join(b, cond)
             .groupBy(F.col("a.entity_id").alias("entity_a"),
                      F.col("b.entity_id").alias("entity_b"))
             .agg(F.count("*").alias("n_cooc"))
             .filter(F.col("n_cooc") >= min_count))
    marg = m.groupBy("entity_id").agg(F.count("*").alias("n"))
    return (pairs
            .join(F.broadcast(marg.withColumnRenamed("n", "n_a")),
                  pairs.entity_a == marg.entity_id)
            .drop("entity_id")
            .join(F.broadcast(marg.withColumnRenamed("n", "n_b")),
                  pairs.entity_b == marg.entity_id)
            .drop("entity_id")
            .select("entity_a", "entity_b", "n_cooc", "n_a", "n_b"))
