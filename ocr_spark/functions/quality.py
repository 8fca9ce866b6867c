"""Repetition statistics and a composite document-quality filter for
webtext training-data curation (Gopher/C4-style rules, re-expressed as
Spark built-ins).

Public heuristics only: the rule family (token-count bounds, mean word
length, symbol ratio, duplicate-line / duplicate-token / top-n-gram
repetition caps) follows the published web-corpus filtering literature
(Rae et al. 2021 "Scaling Language Models" appendix A1.1; Raffel et
al. 2020 C4).  Thresholds here are constants tuned to be meaningful on
the synthetic corpus; a production run would sweep them per-corpus.

Everything is built-in ``pyspark.sql.functions`` — JVM-side, no Python
in the plan.  The only non-codegen pieces are higher-order-function
folds (``aggregate``/``filter``), which still evaluate inside the JVM
expression interpreter, per-row, with no shuffle and no Arrow hop.

Scale notes (100 TB):
- All stats are per-row map-side expressions: zero shuffles, fully
  pipelined with the scan, safe at any corpus size.
- ``top_bigram_ratio`` sorts each document's bigram array once
  (O(n log n) per doc in the JVM) and run-length-scans it with one
  ``aggregate`` fold — no per-document group-by, no explode.  This is
  the shape that survives a 100x scale-up: the alternative
  explode->groupBy(doc, gram) plan shuffles one row per bigram
  (~corpus token count) which is exactly the blow-up the per-row fold
  avoids.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ocr_spark.functions.text import tokens, with_text_stats

__all__ = [
    "word_bigrams_all", "max_sorted_run", "with_repetition_stats",
    "with_quality_filter", "QUALITY_THRESHOLDS", "unigram_logprob",
    "bigram_logprob", "kneser_ney_logprob", "good_turing_counts",
    "cross_bigram_logprob", "min_k_prob",
    "readability",
    "with_format_signals",
    "GOPHER_STOP_WORDS", "with_content_type",
    "CODE_KEYWORDS", "MATH_MARKERS", "CODE_SYMBOLS",
    "license_detect", "LICENSE_PATTERNS", "CC_LICENSE_RE",
    "compressibility",
]

# Rule thresholds for the composite filter.  Closed, documented set —
# the DuckDB oracle in __spark_entry__ re-derives from these exact
# values (imported, not copied), so engine and oracle cannot drift.
QUALITY_THRESHOLDS = {
    "min_tokens": 20,
    "max_tokens": 100_000,
    "min_avg_token_len": 2.0,
    "max_avg_token_len": 12.0,
    "max_non_alnum_ratio": 0.3,
    "max_dup_token_ratio": 0.65,
    "max_top_bigram_ratio": 0.12,
    "max_dup_line_ratio": 0.3,
}


def word_bigrams_all(col: str | Column) -> Column:
    """ALL word bigrams (space-joined, duplicates kept — unlike
    ``text.word_shingles`` which is distinct-only, this feeds frequency
    counting).  Documents with fewer than 2 tokens yield an empty
    array.  CASE WHEN short-circuits per row in codegen, so the
    negative-length slice in the n<2 branch never evaluates (same
    pattern as ``text.word_shingles``)."""
    toks = tokens(col)
    n = F.size(toks)
    cnt = n - 1
    grams = F.zip_with(
        F.slice(toks, 1, cnt), F.slice(toks, 2, cnt),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return F.when(n >= 2, grams).otherwise(F.array().cast("array<string>"))


def max_sorted_run(arr: Column) -> Column:
    """Length of the longest run of equal adjacent elements in a SORTED
    string array (= the max element frequency of the unsorted array) via
    one ``aggregate`` fold.  Empty array -> 0.  The "" sentinel for the
    initial prev is safe: callers pass space-joined bigrams, which are
    never empty strings."""
    step = lambda acc, x: F.struct(
        x.alias("prev"),
        F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
        F.greatest(
            acc["best"],
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
        ).alias("best"),
    )
    init = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
    )
    return F.aggregate(arr, init, step, lambda acc: acc["best"])


def with_repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Repetition signals, all per-row map-side expressions:

    - ``dup_token_ratio``: 1 - distinct_tokens/total_tokens (type-token
      ratio complement); 0.0 for empty text.
    - ``top_bigram_ratio``: occurrences of the most frequent word
      bigram / total bigrams; 0.0 below 2 tokens.
    - ``dup_line_ratio``: 1 - distinct/total over non-blank lines; 0.0
      for single-line or blank documents it is 0 only when no line
      repeats (a one-line doc has ratio 0).

    All ratios rounded to 4 places (hash-stable vs the DuckDB oracle).
    """
    toks = tokens(text_col)
    n_tok = F.size(toks)
    dup_tok = F.when(
        n_tok > 0,
        F.round(F.lit(1) - F.size(F.array_distinct(toks)) / n_tok, 4),
    ).otherwise(F.lit(0.0))

    grams = F.array_sort(word_bigrams_all(text_col))
    n_grams = F.size(grams)
    top_bigram = F.when(
        n_grams > 0, F.round(max_sorted_run(grams) / n_grams, 4)
    ).otherwise(F.lit(0.0))

    lines = F.filter(
        F.split(F.col(text_col), "\n"),
        lambda ln: F.length(F.trim(ln)) > 0,
    )
    n_lines = F.size(lines)
    dup_line = F.when(
        n_lines > 0,
        F.round(F.lit(1) - F.size(F.array_distinct(lines)) / n_lines, 4),
    ).otherwise(F.lit(0.0))

    return (
        df.withColumn("dup_token_ratio", dup_tok)
        .withColumn("top_bigram_ratio", top_bigram)
        .withColumn("dup_line_ratio", dup_line)
    )


def with_quality_filter(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite keep/drop decision over the text-stats + repetition
    signals.  Adds ``drop_reason`` (first failing rule in a fixed
    priority order; 'ok' when kept) and ``keep`` (int 0/1 — int, not
    boolean, so the cross-engine value hash is representation-stable).

    Rule order is part of the contract (a doc failing several rules
    reports the highest-priority one): too_short, too_long, token_len,
    symbol_noise, repetitive_tokens, repetitive_bigrams,
    repetitive_lines.
    """
    t = QUALITY_THRESHOLDS
    out = with_repetition_stats(with_text_stats(df, text_col), text_col)
    reason = (
        F.when(F.col("n_tokens") < t["min_tokens"], F.lit("too_short"))
        .when(F.col("n_tokens") > t["max_tokens"], F.lit("too_long"))
        .when(
            (F.col("avg_token_len") < t["min_avg_token_len"])
            | (F.col("avg_token_len") > t["max_avg_token_len"]),
            F.lit("token_len"),
        )
        .when(F.col("non_alnum_ratio") > t["max_non_alnum_ratio"],
              F.lit("symbol_noise"))
        .when(F.col("dup_token_ratio") > t["max_dup_token_ratio"],
              F.lit("repetitive_tokens"))
        .when(F.col("top_bigram_ratio") > t["max_top_bigram_ratio"],
              F.lit("repetitive_bigrams"))
        .when(F.col("dup_line_ratio") > t["max_dup_line_ratio"],
              F.lit("repetitive_lines"))
        .otherwise(F.lit("ok"))
    )
    return out.withColumn("drop_reason", reason).withColumn(
        "keep", (F.col("drop_reason") == "ok").cast("int")
    )


def unigram_logprob(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id",
                    broadcast_vocab: bool = True) -> DataFrame:
    """Corpus-trained unigram LM score per document — the perplexity
    quality signal of CCNet (Wenzek et al. 2020), with the KenLM 5-gram
    replaced by the unigram proxy whose training aggregate and scoring
    are exactly expressible as relational ops (and therefore
    SQL-oracle-able).  Documents scoring far from the corpus mean are
    the gibberish / boilerplate / wrong-language outliers.

    Model: add-1-smoothed unigram over the corpus's own token counts,
    ``p(tok) = (c_tok + 1) / (N + V)``; per-doc score is the mean token
    ``ln p`` and ``ppl = exp(-mean)``.  Token-less documents keep a
    NULL score (no evidence, not "perfect").

    Scale shape: ONE explode->hash-aggregate shuffle to train (the hot
    token — "the" — is absorbed by map-side partial aggregation); the
    scoring join broadcasts the vocab back over the exploded tokens, so
    the corpus-sized side never shuffles.  ``broadcast_vocab=False``
    falls back to a shuffle join for vocabularies past executor memory
    (then the hot token is a join-skew point — salt or AQE skew-join
    applies).  Per-doc reduction is a second skinny hash aggregate
    keyed by ``id_col``.
    """
    toks = df.select(id_col, F.explode(tokens(text_col)).alias("tok"))
    vocab = toks.groupBy("tok").agg(F.count("*").alias("c"))
    totals = vocab.agg(F.sum("c").alias("n_total"),
                       F.count("*").alias("v_size"))
    if broadcast_vocab:
        vocab = F.broadcast(vocab)
    scored = (
        toks.join(vocab, "tok")
        .crossJoin(F.broadcast(totals))
        .select(
            id_col,
            F.log((F.col("c") + 1).cast("double")
                  / (F.col("n_total") + F.col("v_size"))).alias("lp"),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.avg("lp").alias("avg_logprob"),
        F.count("*").alias("n_tokens"),
    )
    return (
        df.select(id_col).distinct()
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
            F.col("avg_logprob"),
            F.exp(-F.col("avg_logprob")).alias("ppl"),
        )
    )


def bigram_logprob(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id",
                   broadcast_model: bool = True) -> DataFrame:
    """Corpus-trained bigram LM score per document — one Markov order
    above :func:`unigram_logprob`, catching shuffled-word and
    wrong-collocation gibberish a unigram model scores as fluent.

    Model: add-1-smoothed conditional ``p(w2|w1) = (c(w1,w2) + 1) /
    (c(w1) + V)`` with V the unigram vocabulary size; per-doc score is
    the mean ``ln p`` over the doc's adjacent pairs and ``ppl =
    exp(-mean)``.  Docs with < 2 tokens keep NULL scores (no bigram
    evidence).

    Scale shape: TWO skinny training aggregates (bigram counts, unigram
    counts — both absorb hot keys map-side), broadcast back over the
    per-doc exploded pairs; corpus text shuffles never.
    ``broadcast_model=False`` falls back to shuffle joins when the
    bigram table outgrows executor memory (it is the |distinct pairs|
    table, not the corpus)."""
    from ocr_spark.functions.colloc import _bigrams

    tl = df.select(id_col, tokens(text_col).alias("_t"))
    prs = tl.select(id_col, F.explode(_bigrams(F.col("_t"))).alias("p")) \
        .select(id_col, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    bg = prs.groupBy("w1", "w2").agg(F.count("*").alias("c_xy"))
    uni = tl.select(F.explode("_t").alias("w1")).groupBy("w1").agg(
        F.count("*").alias("c_x"))
    # the unigram table feeds two consumers (scoring join + V) and
    # Spark does not reuse the exchange across branches — materialize
    # the SMALL aggregated table once rather than re-scanning the
    # corpus per consumer (same rationale as collocations)
    uni = uni.localCheckpoint(eager=True)
    vsize = uni.agg(F.count("*").alias("v"))
    if broadcast_model:
        bg, uni = F.broadcast(bg), F.broadcast(uni)
    scored = (
        prs.join(bg, ["w1", "w2"]).join(uni, "w1")
        .crossJoin(F.broadcast(vsize))
        .select(
            id_col,
            F.log((F.col("c_xy") + 1).cast("double")
                  / (F.col("c_x") + F.col("v"))).alias("lp"),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.avg("lp").alias("avg_logprob"),
        F.count("*").alias("n_bigrams"),
    )
    return (
        df.select(id_col).distinct()
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
            F.round("avg_logprob", 6).alias("avg_logprob"),
            F.round(F.exp(-F.col("avg_logprob")), 6).alias("ppl"),
        )
    )


def kneser_ney_logprob(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", discount: float = 0.75,
                       broadcast_model: bool = True) -> DataFrame:
    """Corpus-trained INTERPOLATED KNESER-NEY bigram LM score per
    document — the smoothing family actually used by production n-gram
    LMs (Kneser & Ney 1995; Chen & Goodman 1999 found interpolated KN
    the best-performing classical smoother; KenLM implements its
    modified variant), vs :func:`bigram_logprob`'s add-1 baseline.
    Add-1 drastically over-smooths (it gives every unseen pair the
    same mass regardless of how "promiscuous" the words are); KN backs
    off to the CONTINUATION probability — how many distinct contexts a
    word follows — which is the published fix for exactly the
    boilerplate-ish webtext this pipeline scores ("Francisco" is
    frequent but only ever follows "San": KN scores it low in novel
    contexts, add-1 scores it high).

    Model (all counts from the corpus itself, like the other LM ops):

        p(w2|w1) = max(c(w1,w2) - d, 0) / c(w1.)
                   + (d * N1+(w1,*) / c(w1.)) * (N1+(*,w2) / N_pairs)

    with d = ``discount``, c(w1.) = sum_y c(w1,y), N1+(w1,*) = distinct
    continuations of w1, N1+(*,w2) = distinct contexts preceding w2,
    N_pairs = total distinct bigram types.  The interpolation weight
    is the standard absolute-discounting leftover mass, so p sums to 1
    over seen w2 given w1 up to the continuation distribution.  Scored
    pairs always exist in training here (the corpus scores itself), so
    the max(.,0) term is never the whole story but the formula is the
    general one.  Per-doc score = mean ln p over adjacent pairs, ppl =
    exp(-mean); docs with < 2 tokens keep NULL scores.

    Scale shape: ONE explode->hash-aggregate over bigrams; every other
    model table (context totals, fan-out counts, fan-in counts, the
    N_pairs scalar) derives from that SKINNY aggregate, never from the
    corpus — the bigram-type table is materialized once
    (localCheckpoint) because four consumers would otherwise re-run
    the corpus explode per branch.  Scoring joins broadcast the model
    tables back over the per-doc pairs (``broadcast_model=False``
    falls back to shuffle joins past executor memory); corpus text
    never shuffles."""
    from ocr_spark.functions.colloc import _bigrams

    tl = df.select(id_col, tokens(text_col).alias("_t"))
    prs = tl.select(id_col, F.explode(_bigrams(F.col("_t"))).alias("p")) \
        .select(id_col, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    bg = prs.groupBy("w1", "w2").agg(F.count("*").alias("c_xy"))
    # one skinny table, four consumers -> materialize once
    bg = bg.localCheckpoint(eager=True)
    ctx = bg.groupBy("w1").agg(F.sum("c_xy").alias("c_x"),
                               F.count("*").alias("n_fw"))
    back = bg.groupBy("w2").agg(F.count("*").alias("n_bw"))
    npairs = bg.agg(F.count("*").alias("np"))
    if broadcast_model:
        bg, ctx, back = F.broadcast(bg), F.broadcast(ctx), F.broadcast(back)
    d = F.lit(float(discount))
    p = (
        F.greatest(F.col("c_xy") - d, F.lit(0.0)) / F.col("c_x")
        + d * F.col("n_fw") / F.col("c_x")
        * (F.col("n_bw") / F.col("np"))
    )
    scored = (
        prs.join(bg, ["w1", "w2"]).join(ctx, "w1").join(back, "w2")
        .crossJoin(F.broadcast(npairs))
        .select(id_col, F.log(p).alias("lp"))
    )
    per_doc = scored.groupBy(id_col).agg(
        F.avg("lp").alias("avg_logprob"),
        F.count("*").alias("n_bigrams"),
    )
    return (
        df.select(id_col).distinct()
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
            F.round("avg_logprob", 6).alias("avg_logprob"),
            F.round(F.exp(-F.col("avg_logprob")), 6).alias("ppl"),
        )
    )


def cross_bigram_logprob(train: DataFrame, score: DataFrame,
                         text_col: str = "text", id_col: str = "doc_id",
                         broadcast_model: bool = True) -> DataFrame:
    """CROSS-corpus bigram perplexity — the actual CCNet configuration
    (Wenzek et al. 2020 train their LM on Wikipedia and score Common
    Crawl with it), where :func:`bigram_logprob` is the self-scoring
    proxy: the add-1 bigram model is trained on ``train`` and scores
    ``score``, so pairs the training corpus never saw are possible and
    get the add-1 floor instead of being undefined:

        p(w2|w1) = (c(w1,w2) + 1) / (c(w1) + V)

    with all counts from TRAIN (c = 0 for unseen pairs/contexts, V =
    train unigram vocabulary).  A held-out split of one corpus (train
    on even docs, score odd) gives cross-validated perplexity — the
    quality signal without the self-scoring optimism of a model that
    has seen every document it scores.

    Scale shape: identical to bigram_logprob (two skinny train
    aggregates broadcast over the scored corpus's exploded pairs;
    text never shuffles) except the scoring joins are LEFT joins with
    coalesce(0) so unseen pairs survive to take the floor."""
    from ocr_spark.functions.colloc import _bigrams

    ttl = train.select(tokens(text_col).alias("_t"))
    bg = (ttl.select(F.explode(_bigrams(F.col("_t"))).alias("p"))
          .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
          .groupBy("w1", "w2").agg(F.count("*").alias("c_xy")))
    uni = (ttl.select(F.explode("_t").alias("w1"))
           .groupBy("w1").agg(F.count("*").alias("c_x")))
    uni = uni.localCheckpoint(eager=True)
    vsize = uni.agg(F.count("*").alias("v"))
    if broadcast_model:
        bg, uni = F.broadcast(bg), F.broadcast(uni)
    stl = score.select(id_col, tokens(text_col).alias("_t"))
    prs = stl.select(id_col, F.explode(_bigrams(F.col("_t"))).alias("p")) \
        .select(id_col, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    scored = (
        prs.join(bg, ["w1", "w2"], "left").join(uni, "w1", "left")
        .crossJoin(F.broadcast(vsize))
        .select(
            id_col,
            F.log((F.coalesce(F.col("c_xy"), F.lit(0)) + 1).cast("double")
                  / (F.coalesce(F.col("c_x"), F.lit(0)) + F.col("v")))
            .alias("lp"),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.avg("lp").alias("avg_logprob"),
        F.count("*").alias("n_bigrams"),
    )
    return (
        score.select(id_col).distinct()
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
            F.round("avg_logprob", 6).alias("avg_logprob"),
            F.round(F.exp(-F.col("avg_logprob")), 6).alias("ppl"),
        )
    )


def min_k_prob(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id", k_frac: float = 0.2,
               broadcast_vocab: bool = True) -> DataFrame:
    """Min-K% probability (Shi et al. 2024, "Detecting Pretraining
    Data from Large Language Models"): per document, the mean log
    probability of its K% LEAST-probable tokens.  The published use is
    membership inference — a document the model trained on has
    suspiciously few low-probability tokens, so a high min-k% score
    flags benchmark/corpus contamination that n-gram overlap
    (``decontaminate``) misses when the text was lightly paraphrased.
    The scoring model here is the corpus-trained add-1 unigram of
    :func:`unigram_logprob` (the paper uses the target LLM; the
    relational machinery is model-agnostic — any (token, logprob)
    table broadcast in its place gives the paper's statistic exactly).

    Scale shape: one explode + broadcast vocab join for per-token
    logprobs (corpus text never shuffles), ONE hash aggregate back to
    a per-doc logprob ARRAY, then the bottom-k selection is a per-row
    JVM fold: array_sort ascending, slice the first ceil(k * n),
    aggregate-mean.  Per-doc arrays are bounded by document token
    counts — the same per-row-array discipline as the repetition
    stats, never a per-(doc, token) window.

    FP note: the bottom-k mean is a SEQUENTIAL left fold over the
    sorted slice, so its accumulation order is fixed; the DuckDB
    oracle's list_sum does not specify one, and a last-ulp difference
    could in principle flip round(6) on a boundary.  Accepted as-is:
    the parity suite has never tripped it — if it ever does, compare
    with a small tolerance in the canon rather than re-ordering the
    engine fold."""
    toks = df.select(id_col, F.explode(tokens(text_col)).alias("tok"))
    vocab = toks.groupBy("tok").agg(F.count("*").alias("c"))
    vocab = vocab.localCheckpoint(eager=True)
    totals = vocab.agg(F.sum("c").alias("n_total"),
                       F.count("*").alias("v_size"))
    if broadcast_vocab:
        vocab = F.broadcast(vocab)
    scored = (toks.join(vocab, "tok")
              .crossJoin(F.broadcast(totals))
              .select(id_col,
                      F.log((F.col("c") + 1).cast("double")
                            / (F.col("n_total") + F.col("v_size")))
                      .alias("lp")))
    per_doc = scored.groupBy(id_col).agg(
        F.array_sort(F.collect_list("lp")).alias("lps"))
    n = F.size("lps")
    kn = F.ceil(n * F.lit(float(k_frac))).cast("int")
    bottom = F.slice("lps", 1, kn)
    mink = (F.aggregate(bottom, F.lit(0.0), lambda acc, x: acc + x)
            / kn.cast("double"))
    return (df.select(id_col).distinct()
            .join(per_doc, id_col, "left")
            .select(id_col,
                    F.coalesce(n, F.lit(0)).alias("n_tokens"),
                    F.coalesce(kn, F.lit(0)).alias("k_tokens"),
                    F.round(mink, 6).alias("min_k_logprob"))
            )


def good_turing_counts(df: DataFrame, text_col: str = "text",
                       n_rows: int = 20) -> DataFrame:
    """Good-Turing frequency-of-frequencies smoothing table over the
    corpus vocabulary (Good 1953; the Gale & Sampson 1995 "simple GT"
    presentation): for each observed frequency r, the adjusted count
    ``r* = (r+1) * N_{r+1} / N_r`` where N_r is the number of word
    TYPES seen exactly r times.  The r=1 row's ``mass_share``
    (N_1 / N) is the classic GT estimate of the probability that the
    next token is UNSEEN — the number a corpus curator reads as "how
    open is this vocabulary still" (rising N_1/N across crawl rounds =
    the crawl is still discovering genuinely new text; flat = mining
    the same pages).  Complements the LM scorers: they consume
    smoothed estimates, this op derives the smoothing itself.

    Output: the ``n_rows`` SMALLEST observed frequencies (the
    published GT guidance is to trust raw counts-of-counts only in
    the low-r region where N_r is large — "lowest observed", not
    "r <= constant", because a corpus with no rare tail, like a
    bounded synthetic vocabulary, starts its frequency spectrum well
    above any fixed cut): r, n_r, n_r1 (= N_{r+1}, 0 when absent),
    r_star (NULL when N_{r+1} is absent rather than a fake 0
    estimate), mass_share (= r * N_r / N).

    Scale shape: the corpus-sized work is ONE explode->hash-aggregate
    (unigram counts, hot types absorbed map-side); everything after
    operates on the counts-of-counts table, whose size is bounded by
    max observed frequency — a few thousand rows at ANY corpus size
    (it shrinks relative to the corpus as it grows).  The r+1 shift is
    a broadcast self-join on that tiny table."""
    uni = (df.select(F.explode(tokens(text_col)).alias("tok"))
           .groupBy("tok").agg(F.count("*").alias("r")))
    coc = uni.groupBy("r").agg(F.count("*").alias("n_r"))
    # tiny table (|distinct frequencies|), three consumers
    coc = coc.localCheckpoint(eager=True)
    nxt = coc.select((F.col("r") - 1).alias("r"), F.col("n_r").alias("n_r1"))
    tot = coc.agg(F.sum(F.col("r") * F.col("n_r")).alias("n_tokens"))
    return (coc.join(F.broadcast(nxt), "r", "left")
            .crossJoin(F.broadcast(tot))
            .orderBy("r").limit(n_rows)
            .select(
                "r", "n_r",
                F.coalesce("n_r1", F.lit(0)).cast("long").alias("n_r1"),
                F.round((F.col("r") + 1) * F.col("n_r1") / F.col("n_r"), 6)
                .alias("r_star"),
                F.round(F.col("r") * F.col("n_r") / F.col("n_tokens"), 6)
                .alias("mass_share"))
            .orderBy("r"))


def readability(col: str | Column) -> Column:
    """Flesch reading-ease score, per row, zero shuffle.

    ``206.835 - 1.015 * (words / sentences) - 84.6 * (syllables /
    words)`` with the standard cheap heuristics: sentences = runs of
    ``[.!?]`` (min 1), syllables per word = vowel-group count
    (``[aeiouy]+`` on the lowercased word) floored at 1.  NULL for
    token-less text.  Identical arithmetic in the DuckDB oracle."""
    c = F.col(col) if isinstance(col, str) else col
    tl = tokens(c)
    n_words = F.size(tl)
    n_sent = F.greatest(F.regexp_count(c, F.lit("[.!?]+")), F.lit(1))
    groups = F.regexp_count(F.lower(c), F.lit("[aeiouy]+"))
    vowelless = n_words - F.size(
        F.filter(tl, lambda w: F.lower(w).rlike("[aeiouy]")))
    n_syll = groups + vowelless
    return F.when(
        n_words > 0,
        F.round(
            F.lit(206.835)
            - 1.015 * (n_words.cast("double") / n_sent)
            - 84.6 * (n_syll.cast("double") / n_words), 6),
    )


# the Gopher stop-word set (Rae et al. 2021 §A1.1): a real document
# almost surely contains >= 2 of these; listing pages / nav dumps do not
GOPHER_STOP_WORDS = ("the", "be", "to", "of", "and",
                     "that", "have", "with")

_BULLET_RE = r"^([-*•·]|[0-9]+\.)"
_ELLIPSIS_RE = r"(\.\.\.|…)$"


def with_format_signals(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher line-FORMAT signals (the layout complement of
    with_repetition_stats' content signals), all per-row map-side
    expressions over the split-lines array — zero shuffle:

    - ``bullet_line_ratio``: fraction of non-blank lines starting
      with a list marker (-, *, bullet/middot, or "N.") — listing and
      nav pages score high;
    - ``ellipsis_line_ratio``: fraction ending in "..."/U+2026 —
      truncated-teaser farms score high;
    - ``stopword_hits`` / ``has_stop_words``: how many of the 8
      Gopher stop words appear (lowercased exact token match); real
      prose hits >= 2, keyword-stuffing and tag-soup pages do not.

    Ratios rounded to 4 (hash-stable vs the oracle); the int flag
    keeps the cross-engine value hash representation-stable."""
    lines = F.filter(
        F.split(F.col(text_col), "\n"),
        lambda ln: F.length(F.trim(ln)) > 0,
    )
    trimmed = F.transform(lines, lambda ln: F.trim(ln))
    n_lines = F.size(lines)
    n_bullet = F.size(F.filter(trimmed, lambda ln: ln.rlike(_BULLET_RE)))
    n_ellip = F.size(F.filter(trimmed, lambda ln: ln.rlike(_ELLIPSIS_RE)))
    stop_hits = F.size(F.array_intersect(
        F.array_distinct(F.transform(tokens(text_col),
                                     lambda t: F.lower(t))),
        F.array(*[F.lit(w) for w in GOPHER_STOP_WORDS]),
    ))
    ratio = (lambda n: F.when(n_lines > 0, F.round(n / n_lines, 4))
             .otherwise(F.lit(0.0)))
    return (
        df.withColumn("bullet_line_ratio", ratio(n_bullet))
        .withColumn("ellipsis_line_ratio", ratio(n_ellip))
        .withColumn("stopword_hits", stop_hits.cast("int"))
        .withColumn("has_stop_words", (stop_hits >= 2).cast("int"))
    )


# Content-type routing: closed marker sets (documented; identical
# literals in the DuckDB oracle).  Keyword hits use substring search,
# not tokenization, so 'import os' and 'import(os)' both count.
CODE_KEYWORDS = ["def ", "function ", "class ", "import ", "return ",
                 "const ", "var ", "#include"]
MATH_MARKERS = ["\\frac", "\\sum", "\\begin{", "$$", "\\alpha"]
CODE_SYMBOLS = "{}();=<>"


def with_content_type(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Content-type router: label each document prose / code / math /
    data from deterministic layout signals, the routing step a mixed
    web corpus needs before tokenization (code goes to a code
    pipeline with different dedup + quality rules, math to a
    math-preserving normalizer, tabular data is usually dropped —
    FineWeb/StarCoder-style corpus construction).

    Signals (all JVM built-ins, zero shuffle, pipelined with the
    scan):
      n_lines        non-empty lines
      indent_lines   lines starting with 4 spaces or a tab
      csv_lines      lines with >= 3 commas
      sym_count      chars in ``{}();=<>``
      kw_hits        distinct CODE_KEYWORDS present (substring)
      math_hits      distinct MATH_MARKERS present (substring)

    Label precedence (first match wins, integer cross-multiplied —
    no float thresholds):
      code:  kw_hits >= 2, or >= 3 lines with 30%+ indented AND
             symbol density >= 3%
      math:  math_hits >= 2
      data:  >= 3 lines and half of them CSV-ish
      prose: otherwise
    """
    c = F.col(text_col)
    lines = F.filter(F.split(c, "\n"), lambda ln: F.length(F.trim(ln)) > 0)
    n_lines = F.size(lines)
    indent_lines = F.size(F.filter(
        lines, lambda ln: ln.startswith("    ") | ln.startswith("\t")))
    csv_lines = F.size(F.filter(
        lines, lambda ln: F.size(F.split(ln, ",")) >= 4))
    sym_count = F.length(c) - F.length(F.translate(c, CODE_SYMBOLS, ""))
    kw_hits = sum(
        (F.instr(c, kw) > 0).cast("int") for kw in CODE_KEYWORDS)
    math_hits = sum(
        (F.instr(c, mk) > 0).cast("int") for mk in MATH_MARKERS)
    is_code = (kw_hits >= 2) | (
        (n_lines >= 3) & (indent_lines * 10 >= n_lines * 3)
        & (sym_count * 100 >= F.length(c) * 3))
    label = (
        F.when(is_code, "code")
        .when(math_hits >= 2, "math")
        .when((n_lines >= 3) & (csv_lines * 2 >= n_lines), "data")
        .otherwise("prose")
    )
    return (
        df.withColumn("n_lines", n_lines.cast("int"))
        .withColumn("indent_lines", indent_lines.cast("int"))
        .withColumn("csv_lines", csv_lines.cast("int"))
        .withColumn("sym_count", sym_count.cast("int"))
        .withColumn("kw_hits", kw_hits.cast("int"))
        .withColumn("math_hits", math_hits.cast("int"))
        .withColumn("content_label", label)
    )


# Licensing-signal patterns — Java-regex/RE2-common (no backrefs or
# lookaround) so the DuckDB oracle runs the IDENTICAL strings; matched
# against lowercased text.  Ordered by decision precedence: an
# explicit CC grant beats boilerplate "all rights reserved" footers.
CC_LICENSE_RE = r"creativecommons\.org/licenses/([a-z-]+)/"
LICENSE_PATTERNS: tuple[tuple[str, str], ...] = (
    ("public-domain",
     r"creativecommons\.org/publicdomain|\bpublic domain\b"),
    ("mit", r"\bmit license\b"),
    ("apache", r"\bapache license\b"),
    ("gpl", r"\bgnu general public license\b"),
    ("all-rights-reserved", r"\ball rights reserved\b"),
)


def license_detect(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Content-licensing detection — the corpus-governance pass that
    routes permissively-licensed pages into open releases and flags
    restricted ones: per document, the highest-precedence license
    signal (explicit CC grant with its type > public domain > MIT >
    Apache > GPL > all-rights-reserved > none) plus ``n_signals``,
    how many DISTINCT signal families matched — >1 is the ambiguity
    flag a human review queue keys on.

    Per-row JVM regexes only, zero shuffle; the reference has no
    licensing path — additive governance capability."""
    low = F.lower(F.col(text_col))
    cc_type = F.regexp_extract(low, CC_LICENSE_RE, 1)
    flags = {lbl: low.rlike(pat) for lbl, pat in LICENSE_PATTERNS}
    n = (cc_type != "").cast("int")
    for f in flags.values():
        n = n + f.cast("int")
    lic = F.lit("none")
    for lbl, _ in reversed(LICENSE_PATTERNS):
        lic = F.when(flags[lbl], F.lit(lbl)).otherwise(lic)
    lic = F.when(cc_type != "", F.concat(F.lit("cc-"), cc_type)) \
           .otherwise(lic)
    return df.select(id_col, lic.alias("license"),
                     n.alias("n_signals"))


def compressibility(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text",
                    ks: tuple[int, ...] = (4, 8, 16)) -> DataFrame:
    """Codec-free compressibility proxy: per document and char-gram
    size k, the total and DISTINCT character k-gram counts — highly
    repetitive text (template spam, keyword stuffing, generated
    filler) has few distinct k-grams relative to total.  Gopher-class
    pipelines run a real compressor for this signal; a codec is not
    reproducible as relational ops, so this publishes the exact
    integer pair (same discipline as posting_deltas' gap_sum: no
    float ratio inside the operator — callers divide).

    One row per (doc, k), long format.  Documents shorter than k
    chars emit (0, 0) for that k.

    Plan: all k values build as one struct array in a single
    projection (one scan) and explode; the k-gram arrays are per-row
    JVM transforms over the raw string — zero shuffle."""
    s = F.col(text_col)
    n = F.length(s)

    def stats(k):
        tot = F.greatest(n - (k - 1), F.lit(0))
        dist = F.when(
            tot > 0,
            F.size(F.array_distinct(F.transform(
                F.sequence(F.lit(1), tot),
                lambda i: F.substring(s, i, k))))
        ).otherwise(F.lit(0))
        return F.struct(F.lit(k).alias("k"),
                        tot.cast("long").alias("n_grams"),
                        dist.cast("long").alias("n_distinct"))

    arr = F.array(*[stats(k) for k in ks])
    return (df.select(id_col, n.alias("n_chars"),
                      F.explode(arr).alias("g"))
            .select(id_col, "n_chars",
                    F.col("g.k").alias("k"),
                    F.col("g.n_grams").alias("n_grams"),
                    F.col("g.n_distinct").alias("n_distinct")))
