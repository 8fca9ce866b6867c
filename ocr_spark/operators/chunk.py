"""Document chunking for retrieval / context-window pipelines.

Splits extracted text into fixed-size windows with overlap — the
retrieval-augmented-generation preprocessing step that follows
extraction (the reference emits whole-document text only,
services/file_processor.py; chunking is the downstream consumer's
first move at corpus scale).

Both variants are pure built-in column expressions (sequence →
explode → substring / slice): zero Python in the plan, zero shuffle —
a narrow map over the extracted table, so chunking 100 TB costs one
scan and whatever the sink writes.  Offsets are carried so every
chunk remains provenance-addressable back into the document
(char offsets for ``chunk_text``, token indices for ``chunk_tokens``).

Chunk-count closed form (shared by the DuckDB oracle): with
``stride = size - overlap`` and document length ``n``,

    n_chunks = 1                       if n <= size
               1 + ceil((n - size) / stride)   otherwise

so the final chunk always starts before ``n`` and every char/token
belongs to at least one chunk.  Empty documents emit exactly one
empty chunk — the doc keeps a row, which downstream join-backs rely
on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ocr_spark.functions.text import tokens

__all__ = ["chunk_text", "chunk_tokens", "split_sections", "texttiling"]


def _n_chunks(n_col, size: int, stride: int):
    return F.when(n_col <= size, F.lit(1)).otherwise(
        F.lit(1) + F.ceil((n_col - size) / F.lit(float(stride))).cast("int")
    )


def chunk_text(df: DataFrame, size: int, overlap: int = 0,
               text_col: str = "text", key_col: str = "doc_id") -> DataFrame:
    """Character-window chunking with overlap.

    Returns ``(key, chunk_id, start, end, chunk)`` where ``start`` is
    the 0-based char offset of the chunk in the source text and
    ``end`` is exclusive.  ``chunk_id`` is 0-based and dense per doc.
    """
    if not (0 <= overlap < size):
        raise ValueError(f"need 0 <= overlap < size, got {overlap}/{size}")
    stride = size - overlap
    n = F.length(F.col(text_col))
    out = df.select(
        key_col,
        text_col,
        F.posexplode(
            F.sequence(F.lit(0), _n_chunks(n, size, stride) - 1)
        ).alias("chunk_id", "_i"),
    )
    start = F.col("_i") * stride
    end = F.least(start + size, F.length(F.col(text_col)))
    return out.select(
        key_col,
        "chunk_id",
        start.cast("int").alias("start"),
        end.cast("int").alias("end"),
        # substring is 1-based and clamps length at the string end
        F.expr(
            f"substring({text_col}, chunk_id * {stride} + 1, {size})"
        ).alias("chunk"),
    )


def chunk_tokens(df: DataFrame, size: int, overlap: int = 0,
                 text_col: str = "text", key_col: str = "doc_id") -> DataFrame:
    """Token-window chunking with overlap (the LLM-context variant).

    Tokenization is :func:`ocr_spark.functions.text.tokens`
    (whitespace); the chunk text is the window re-joined with single
    spaces, so offsets are TOKEN indices (``tok_start`` inclusive,
    ``tok_end`` exclusive), not char offsets into the original text.
    """
    if not (0 <= overlap < size):
        raise ValueError(f"need 0 <= overlap < size, got {overlap}/{size}")
    stride = size - overlap
    toks = df.select(key_col, tokens(text_col).alias("_toks"))
    n = F.size("_toks")
    out = toks.select(
        key_col,
        "_toks",
        F.posexplode(
            F.sequence(F.lit(0), _n_chunks(n, size, stride) - 1)
        ).alias("chunk_id", "_i"),
    )
    start = F.col("_i") * stride
    end = F.least(start + size, F.size("_toks"))
    return out.select(
        key_col,
        "chunk_id",
        start.cast("int").alias("tok_start"),
        end.cast("int").alias("tok_end"),
        F.array_join(
            F.slice(F.col("_toks"), start + 1, F.lit(size)), " "
        ).alias("chunk"),
    )


def split_sections(df: DataFrame, key_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Heading-aware section splitting over markdown-shaped text (the
    output side of structure.html_to_markdown): a section is a
    ``#``-``######`` heading line plus everything until the next
    heading; content BEFORE the first heading becomes section 0 with a
    NULL heading.  This is the structure-preserving chunker RAG
    pipelines prefer over fixed windows when the document HAS
    structure — section boundaries are semantic, not positional.

    Returns ``(key, section_idx, heading, body, n_tokens)``; body
    preserves line order, blank-only sections keep body ''.

    Scale shape: posexplode lines -> heading flag -> running heading
    count over a PER-DOCUMENT window (bounded by doc length, same
    discipline as cdc_chunks) -> one (key, section) hash aggregate
    with order restored by position sort inside the collected list."""
    from pyspark.sql import Window

    from ocr_spark.functions.text import token_count

    lines = df.select(
        F.col(key_col),
        F.posexplode(F.split(F.coalesce(F.col(text_col), F.lit("")),
                             "\n")).alias("pos", "ln"),
    )
    is_h = F.col("ln").rlike(r"^#{1,6} ")
    w = Window.partitionBy(key_col).orderBy("pos") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sec = lines.withColumn(
        "section_idx",
        F.sum(F.when(is_h, 1).otherwise(0)).over(w).cast("int"),
    ).withColumn("_h", is_h)
    body_struct = F.when(~F.col("_h"), F.struct("pos", "ln"))
    out = (
        sec.groupBy(key_col, "section_idx")
        .agg(
            F.max(F.when(F.col("_h"), F.col("ln"))).alias("heading"),
            F.array_join(
                F.transform(F.array_sort(F.collect_list(body_struct)),
                            lambda s: s["ln"]),
                "\n",
            ).alias("body"),
        )
        .withColumn("n_tokens", token_count("body"))
    )
    # a document with no pre-heading content emits no empty section 0:
    # drop sections that have neither a heading nor non-blank body
    return out.filter(
        F.col("heading").isNotNull() | (F.length(F.trim("body")) > 0)
    )


def texttiling(df: DataFrame, id_col: str = "doc_id",
               text_col: str = "text", block: int = 10) -> DataFrame:
    """TextTiling-style topic segmentation (Hearst 1997, the
    token-sequence variant): split each document into fixed
    ``block``-token pseudo-sentences, score every gap between
    adjacent blocks by lexical cohesion, and mark boundaries at gaps
    whose DEPTH (drop from the neighbouring cohesion peaks) exceeds
    the document's mean depth.

    Determinism contract (same discipline as RAKE): cohesion is
    published as integer micro-units of cosine² —
    ``score_micro = (dot² * 1e6) div (|l|²·|r|²)`` over the adjacent
    blocks' term-frequency vectors — so scores, depths, and the
    threshold are integer arithmetic end-to-end (no sqrt, no float
    summation order).  Depth uses the bounded-window variant (peaks
    over the 2 gaps either side, edge windows clamp to 0) rather than
    the original's unbounded hill-climb, keeping the plan a pair of
    frame-bounded window functions instead of an iteration.

    Output: one row per gap — (id, gap_idx, score_micro, depth_micro,
    is_boundary).  Single-block documents emit no rows.

    Plan shape: posexplode -> two skinny hash aggregates (per-block
    tf, per-block norm) -> self-join of adjacent blocks on (id, term)
    -> per-doc windows over tens of gap rows.  The text column never
    shuffles; everything after the explode is (id, block, term, n)
    integers.  Window partitions are per-document and bounded by
    len/block, so no hot keys at corpus scale."""
    from pyspark.sql import Window

    toks = F.split(F.regexp_replace(F.lower(F.col(text_col)),
                                    r"\s+", " "), " ")
    pos = (df.select(id_col, F.posexplode(toks).alias("pos", "term"))
             .filter(F.col("term") != "")
             .select(id_col, (F.col("pos") / block).cast("long")
                     .alias("blk"), "term"))
    tf = (pos.groupBy(id_col, "blk", "term")
             .agg(F.count("*").alias("n")))
    norm = (tf.groupBy(id_col, "blk")
              .agg(F.sum(F.col("n") * F.col("n")).alias("nrm")))
    right = tf.select(id_col, (F.col("blk") - 1).alias("blk"),
                      "term", F.col("n").alias("n_r"))
    dot = (tf.join(right, [id_col, "blk", "term"])
             .groupBy(id_col, "blk")
             .agg(F.sum(F.col("n") * F.col("n_r")).alias("dot")))
    # every adjacent-block gap must exist even when dot == 0
    gaps = (norm.alias("l")
            .join(norm.alias("r"),
                  (F.col(f"l.{id_col}") == F.col(f"r.{id_col}"))
                  & (F.col("l.blk") + 1 == F.col("r.blk")))
            .select(F.col(f"l.{id_col}").alias(id_col),
                    F.col("l.blk").alias("gap_idx"),
                    F.col("l.nrm").alias("nrm_l"),
                    F.col("r.nrm").alias("nrm_r")))
    scored = (gaps.join(dot, (gaps[id_col] == dot[id_col])
                        & (gaps["gap_idx"] == dot["blk"]), "left")
              .select(gaps[id_col], "gap_idx",
                      F.coalesce("dot", F.lit(0)).alias("dot"),
                      "nrm_l", "nrm_r")
              .withColumn("score_micro",
                          F.expr("(dot * dot * 1000000)"
                                 " div (nrm_l * nrm_r)")))
    w = Window.partitionBy(id_col).orderBy("gap_idx")
    peak_l = F.max("score_micro").over(w.rowsBetween(-2, -1))
    peak_r = F.max("score_micro").over(w.rowsBetween(1, 2))
    depth = (F.greatest(F.coalesce(peak_l - F.col("score_micro"),
                                   F.lit(0)), F.lit(0))
             + F.greatest(F.coalesce(peak_r - F.col("score_micro"),
                                     F.lit(0)), F.lit(0)))
    d = scored.withColumn("depth_micro", depth)
    return (d.withColumn(
                "is_boundary",
                (F.col("depth_micro") > 0)
                & (F.col("depth_micro")
                   > F.expr("sum(depth_micro) over"
                            " (partition by {id}) div count(*) over"
                            " (partition by {id})".format(id=id_col))))
             .select(id_col, "gap_idx", "score_micro", "depth_micro",
                     "is_boundary"))
