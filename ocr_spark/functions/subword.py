"""Subword vocabulary learning + greedy WordPiece-style segmentation.

Two halves of the tokenizer-construction story a training-data engine
owes (complementing the merge-based BPE in functions/colloc.py):

* :func:`subword_vocab` — a frequency-truncated subword vocabulary
  (SentencePiece-style substring counting: every in-word substring up
  to ``max_piece_len`` chars, weighted by word frequency, WordPiece's
  start-vs-continuation distinction kept), truncated to the top
  ``vocab_size`` multi-char pieces; every observed single char is
  always retained so segmentation can always advance.  This is
  deliberately the deterministic counting variant, NOT the
  likelihood-EM trainer — documented simplification, bit-exact
  cross-engine.
* :func:`wordpiece_segment_stats` — greedy longest-match-first
  segmentation (the WordPiece INFERENCE rule of the BERT lineage)
  against any (piece, is_cont) vocabulary, emitting per-document
  piece/unknown counts — the fertility statistics tokenizer and
  corpus teams monitor.

Scale design: everything runs over the DISTINCT-word table (Zipf:
orders of magnitude smaller than the token stream), then joins back
to per-document occurrences as a skinny (word, n_pieces) side.  The
greedy walk is NOT an iterative job: per (word, position) longest
matches are ONE join + aggregate ("steps" table), and the sequential
walk folds per word over its own steps array with a higher-order
``aggregate`` — zero extra shuffles, no driver loop, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ocr_spark.functions.text import tokens

__all__ = ["subword_vocab", "wordpiece_segment_stats"]


def _word_counts(df: DataFrame, text_col: str) -> DataFrame:
    return (df.select(F.explode(tokens(F.lower(F.col(text_col))))
                      .alias("word"))
            .groupBy("word").agg(F.count("*").alias("wc")))


def _substring_candidates(words: DataFrame, max_piece_len: int,
                          ) -> DataFrame:
    """(word, pos, piece_len, piece, is_cont) for every in-word
    substring up to ``max_piece_len`` chars — built per DISTINCT
    word, ALL lengths in one projection (a per-length union would
    replan the word source once per length; one tagged array +
    explode keeps it a single pass)."""
    def piece_fn(ln):
        # closure factory (HOF single-param arity rule)
        return lambda i: F.struct(
            i.cast("int").alias("pos"),
            F.lit(ln).alias("piece_len"),
            F.substring(F.col("word"), i + 1, ln).alias("piece"),
            (i > 0).alias("is_cont"))

    arrays = []
    for ln in range(1, max_piece_len + 1):
        arrays.append(F.when(
            F.length("word") >= ln,
            F.transform(
                F.sequence(F.lit(0), F.length("word") - ln),
                piece_fn(ln))
        ).otherwise(F.array().cast(
            "array<struct<pos:int,piece_len:int,"
            "piece:string,is_cont:boolean>>")))
    combined = (arrays[0] if len(arrays) == 1
                else F.concat(*arrays))
    return (words.select("word", F.explode(combined).alias("g"))
            .select("word", F.col("g.pos").alias("pos"),
                    F.col("g.piece_len").alias("piece_len"),
                    F.col("g.piece").alias("piece"),
                    F.col("g.is_cont").alias("is_cont")))


def subword_vocab(df: DataFrame, vocab_size: int = 150,
                  max_piece_len: int = 4,
                  text_col: str = "text",
                  materialize: bool = True) -> DataFrame:
    """Learn the vocabulary: substring occurrences weighted by corpus
    word frequency; top ``vocab_size`` pieces of length >= 2 by
    (count desc, piece asc, is_cont asc — a total order), plus EVERY
    single-char piece.  Returns (rank, piece, is_cont, n_occ) with
    rank over the emitted set in the same order.

    Plan: one token-explode aggregate for word counts (skinny), one
    substring explode over distinct words joined to the counts, one
    (piece, is_cont) aggregate; the top-k is a window over the
    (tiny) aggregated piece table."""
    wc = _word_counts(df, text_col)
    sub = (_substring_candidates(wc.select("word"), max_piece_len)
           .join(wc, "word")
           .groupBy("piece", "is_cont")
           .agg(F.sum("wc").alias("n_occ")))
    if materialize:
        # the aggregated piece table feeds BOTH the top-k window and
        # the singles branch; lazy, each branch replans the corpus
        # substring pass (materialize=False keeps it inspectable)
        sub = sub.localCheckpoint(eager=False)
    order = [F.col("n_occ").desc(), F.col("piece").asc(),
             F.col("is_cont").asc()]
    multi = (sub.filter(F.length("piece") >= 2)
             .withColumn("rn", F.row_number().over(
                 Window.orderBy(*order)))
             .filter(F.col("rn") <= vocab_size).drop("rn"))
    v = sub.filter(F.length("piece") == 1).unionByName(multi)
    return (v.withColumn("rank", F.row_number().over(
                Window.orderBy(*order)).cast("int"))
            .select("rank", "piece", "is_cont", "n_occ"))


def wordpiece_segment_stats(df: DataFrame, vocab: DataFrame,
                            max_piece_len: int = 4,
                            id_col: str = "doc_id",
                            text_col: str = "text",
                            materialize: bool = True) -> DataFrame:
    """Greedy longest-match segmentation statistics per document:
    ``n_words``, ``n_pieces`` (greedy pieces over all word
    occurrences), ``n_unk`` (positions where no vocab piece matched —
    the walk advances one char and counts an unknown).

    The walk: a "steps" table gives each (word, pos) its longest
    matching piece length (one join + max aggregate); each word then
    folds over ``sequence(1, len)`` with a (pos, pieces, unknowns)
    accumulator struct — position jumps consume the steps array, so
    the sequential greedy rule costs one per-row JVM fold, never an
    iterative job."""
    wf = df.select(
        id_col,
        F.explode(tokens(F.lower(F.col(text_col)))).alias("word"))
    dw = wf.select("word").distinct()
    if materialize:
        # (eager=False: materialized once at the first action — no
        # extra per-checkpoint job at construction time)
        # the distinct-word hub feeds candidates, the position spine,
        # AND (transitively) every later stage; without materializing
        # it Catalyst replans the whole token-explode subtree per
        # consumer (measured: 46 corpus scans / 68 exchanges in one
        # plan; 4 scans / ~10 exchanges with the checkpoint).
        # materialize=False keeps the plan lazy for inspection.
        dw = dw.localCheckpoint(eager=False)
    vb = vocab.select("piece", "is_cont")
    if materialize:
        vb = vb.localCheckpoint(eager=False)  # tiny; one evaluation of the
        # caller's vocab plan instead of one per consumer stage
    cand = (_substring_candidates(dw, max_piece_len)
            .join(F.broadcast(vb), ["piece", "is_cont"], "left_semi"))
    best = (cand.groupBy("word", "pos")
            .agg(F.max("piece_len").alias("jump")))
    spine = dw.select(
        "word", F.explode(F.sequence(
            F.lit(0), F.length("word") - 1)).alias("pos"))
    steps = (spine.join(best, ["word", "pos"], "left")
             .select("word", "pos",
                     F.col("jump").isNotNull().alias("matched"),
                     F.coalesce("jump", F.lit(1)).alias("jump")))
    arrs = (steps.groupBy("word")
            .agg(F.array_sort(F.collect_list(
                F.struct("pos", "jump", "matched"))).alias("st"))
            .select(
                "word",
                F.transform("st", lambda s: s.getField("jump"))
                 .alias("jumps"),
                F.transform("st", lambda s: s.getField("matched"))
                 .alias("oks")))
    init = F.struct(F.lit(0).alias("p"), F.lit(0).alias("np"),
                    F.lit(0).alias("nu"))

    def step(acc, i):
        here = i - 1 == acc.getField("p")
        j = F.element_at("jumps", acc.getField("p") + 1)
        ok = F.element_at("oks", acc.getField("p") + 1)
        return F.when(
            here,
            F.struct(
                (acc.getField("p") + j).alias("p"),
                (acc.getField("np") + 1).alias("np"),
                (acc.getField("nu")
                 + F.when(ok, 0).otherwise(1)).alias("nu"))
        ).otherwise(acc)

    enc = arrs.select(
        "word",
        F.aggregate(F.sequence(F.lit(1), F.length("word")), init, step)
         .alias("acc")
    ).select("word", F.col("acc").getField("np").alias("w_pieces"),
             F.col("acc").getField("nu").alias("w_unk"))
    return (wf.join(enc, "word")
            .groupBy(id_col)
            .agg(F.count("*").alias("n_words"),
                 F.sum("w_pieces").alias("n_pieces"),
                 F.sum("w_unk").alias("n_unk")))
