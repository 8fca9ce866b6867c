"""Corpus statistics for tokenizer training and phrase mining.

Two corpus-scale primitives a training-data pipeline runs after
cleaning (neither exists in the reference — its corpus is one
document per request, app.py; these are what the same extraction
output feeds at 100 TB):

* :func:`collocations` — PMI-ranked adjacent word pairs (phrase
  mining / vocab curation signal, Church & Hanks 1990).
* :func:`bpe_pair_counts` / :func:`bpe_train` — the byte-pair-encoding
  pair-statistics step (Sennrich et al. 2016): BPE training is
  embarrassingly aggregatable — the ONLY corpus-wide state is the
  (word, freq) table and the tiny merge list, so each merge round is
  one skinny hash aggregate + a 1-row argmax, never a corpus pass.

Scale shape (both): explode to skinny (token, …) rows → hash
aggregate with map-side partial combine (hot tokens — "the" — are
absorbed map-side), broadcast the small count tables back.  Text
never shuffles; only counts do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ocr_spark.functions.text import tokens

__all__ = ["collocations", "bpe_pair_counts", "bpe_train",
           "bpe_train_local", "apply_merge", "bpe_encode",
           "term_dispersion", "heaps_fit"]


def _bigrams(toks) -> F.Column:
    """Adjacent (w1, w2) structs of a token array — zip_with of the
    array against its own 1-shift (equal lengths, no null padding)."""
    return F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )


def collocations(df: DataFrame, k: int = 20, min_count: int = 5,
                 text_col: str = "text",
                 materialize: bool = True) -> DataFrame:
    """Top-k adjacent-pair collocations by pointwise mutual information.

    ``pmi = ln( (c_xy / n_pairs) / ((c_x / n_tok) * (c_y / n_tok)) )``
    with raw counts (no smoothing — ``min_count`` is the noise gate,
    the standard Church-Hanks configuration).  Ties break on
    (w1, w2) text so the ranking is a total order the SQL oracle
    shares.  Returns ``(w1, w2, pair_count, pmi)``, pmi rounded to 6
    places for cross-engine float stability.

    Plan: two skinny aggregates (pairs, unigrams) + two broadcast
    joins of the unigram table + a global TakeOrdered(k) — no full
    sort, no wide shuffle of anything but counts.

    ``materialize=True`` localCheckpoints the two aggregated tables:
    the unigram table feeds THREE consumers (both joins + the token
    total) and the pair table two, and Spark does not reuse the
    exchange across those branches — unmaterialized, the corpus would
    be re-scanned and re-aggregated five times (measured: 5 FileScans
    in the physical plan).  The checkpointed tables are the SMALL
    aggregated sides (|vocab|, |distinct pairs|), never the corpus.
    """
    tok = df.select(tokens(text_col).alias("_t"))
    uni = tok.select(F.explode("_t").alias("w")).groupBy("w").agg(
        F.count("*").alias("c_w"))
    pairs = tok.select(F.explode(_bigrams(F.col("_t"))).alias("p")).select(
        F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    ).groupBy("w1", "w2").agg(F.count("*").alias("pair_count"))
    if materialize:
        uni = uni.localCheckpoint(eager=True)
        pairs = pairs.localCheckpoint(eager=True)
    totals = uni.agg(F.sum("c_w").alias("n_tok")).crossJoin(
        pairs.agg(F.sum("pair_count").alias("n_pairs")))
    scored = (
        pairs.where(F.col("pair_count") >= min_count)
        .join(F.broadcast(uni.withColumnRenamed("w", "w1")
                          .withColumnRenamed("c_w", "c_x")), "w1")
        .join(F.broadcast(uni.withColumnRenamed("w", "w2")
                          .withColumnRenamed("c_w", "c_y")), "w2")
        .crossJoin(F.broadcast(totals))
        .select(
            "w1", "w2", "pair_count",
            F.round(
                F.log(
                    (F.col("pair_count") / F.col("n_pairs"))
                    / ((F.col("c_x") / F.col("n_tok"))
                       * (F.col("c_y") / F.col("n_tok")))
                ), 6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(
        F.desc("pmi"), "w1", "w2"
    ).limit(k)


def _word_freq(df: DataFrame, text_col: str) -> DataFrame:
    return (
        df.select(F.explode(tokens(text_col)).alias("word"))
        .groupBy("word").agg(F.count("*").alias("freq"))
    )


def bpe_pair_counts(df: DataFrame, k: int = 20,
                    text_col: str = "text") -> DataFrame:
    """Corpus-wide adjacent CHARACTER pair counts weighted by word
    frequency — BPE merge round 0 as a standalone top-k query.

    Pairs are taken inside words only (the whitespace tokenizer is
    the pre-tokenizer, as in GPT-2-style BPE; no cross-word merges).
    Returns ``(lhs, rhs, pair_count)``, ordered by count desc then
    pair text, limited to k (``lhs``/``rhs`` naming keeps the shared
    oracle SQL clear of the LEFT/RIGHT keywords).  Both sides of a pair come from
    ``substr(word, i, 1)`` — char (not byte) indexed, identical
    semantics in DuckDB.
    """
    wf = _word_freq(df, text_col)
    # the >= 2 guard matters: Spark's sequence(1, 0) DESCENDS ([1, 0])
    # rather than returning empty, so 1-char words would fabricate a
    # (c, c) self-pair without it
    pairs = wf.where(F.expr("char_length(word) >= 2")).select(
        "freq",
        F.explode(
            F.expr(
                "transform(sequence(1, char_length(word) - 1), "
                "i -> struct(substring(word, i, 1) AS lhs, "
                "substring(word, i + 1, 1) AS rhs))"
            )
        ).alias("p"),
    )
    counts = pairs.groupBy(
        F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs")
    ).agg(F.sum("freq").alias("pair_count"))
    return counts.orderBy(F.desc("pair_count"), "lhs", "rhs").limit(k)


def apply_merge(syms_col, left: str, right: str) -> F.Column:
    """Replace non-overlapping left-to-right (left, right) adjacencies
    in a symbol array with the merged symbol — a left fold entirely in
    built-ins (no Python in the executor path).

    The fold is exactly BPE's scan: if the accumulated tail equals
    ``left`` and the next symbol is ``right``, the tail becomes
    ``left||right`` (and, being a new element, immediately re-pairs
    with what FOLLOWS, not what preceded — the non-overlap rule)."""
    l_lit, r_lit = F.lit(left), F.lit(right)
    return F.aggregate(
        syms_col,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == l_lit) & (x == r_lit),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(l_lit, r_lit)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(df: DataFrame, n_merges: int,
              text_col: str = "text") -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges over the corpus.

    Driver state is the merge list only.  Round structure:

    1. (once) aggregate the corpus to the skinny (word, freq) table —
       the only pass that ever touches the text column;
    2. per round: explode adjacent symbol pairs weighted by freq,
       hash-aggregate, take the argmax (count desc, pair text asc for
       a deterministic tie-break) with a 1-row collect;
    3. apply the merge to the symbol arrays with :func:`apply_merge`
       (narrow map, no shuffle) and localCheckpoint every few rounds
       to truncate the growing lineage — the iterative-Spark
       discipline used by dedup_clusters (operators/dedup.py).

    Words whose symbol array has shrunk to length 1 can never produce
    pairs again and are dropped from the working set (monotone
    shrinkage — the working table only gets smaller).
    """
    words = _word_freq(df, text_col).select(
        "freq",
        F.expr("filter(split(word, ''), x -> x <> '')").alias("syms"),
    ).where(F.size("syms") >= 2)
    words = words.localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for i in range(n_merges):
        pair_struct = F.zip_with(
            F.slice("syms", 1, F.greatest(F.size("syms") - 1, F.lit(0))),
            F.slice("syms", 2, F.greatest(F.size("syms") - 1, F.lit(0))),
            lambda a, b: F.struct(a.alias("l"), b.alias("r")),
        )
        top = (
            words.select("freq", F.explode(pair_struct).alias("p"))
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("freq").alias("c"))
            .orderBy(F.desc("c"), "l", "r")
            .limit(1)
            .collect()
        )
        if not top:
            break
        left, right = top[0]["l"], top[0]["r"]
        merges.append((left, right))
        words = words.select(
            "freq", apply_merge(F.col("syms"), left, right).alias("syms")
        ).where(F.size("syms") >= 2)
        if (i + 1) % 4 == 0:
            words = words.localCheckpoint(eager=True)
    return merges


def bpe_train_local(texts: list[str], n_merges: int) -> list[tuple[str, str]]:
    """Pure-Python reference implementation (test oracle for
    :func:`bpe_train` — same pre-tokenizer, same tie-break)."""
    from collections import Counter

    wf = Counter(w for t in texts for w in t.split())
    words = {w: list(w) for w in wf if len(w) >= 2}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: Counter = Counter()
        for w, syms in words.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += wf[w]
        if not counts:
            break
        pair = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(pair)
        for w, syms in list(words.items()):
            out: list[str] = []
            for s in syms:
                if out and out[-1] == pair[0] and s == pair[1]:
                    out[-1] = pair[0] + pair[1]
                else:
                    out.append(s)
            if len(out) >= 2:
                words[w] = out
            else:
                del words[w]
    return merges


def bpe_encode(df: DataFrame, merges: list[tuple[str, str]],
               text_col: str = "text",
               key_col: str = "doc_id") -> DataFrame:
    """Apply a FIXED BPE merge table to every document ->
    ``(key, n_words, n_bpe_tokens)`` — the production tokenizer shape:
    the merge table is trained ONCE (:func:`bpe_train`, or shipped with
    a released tokenizer) and then applied to the whole corpus, which
    is exactly the pass a training pipeline runs to size its data in
    REAL tokenizer tokens rather than whitespace words (token budgets,
    sequence packing, and per-source mixing all key off this count).

    Merges apply in table order, each a greedy left-to-right
    non-overlapping scan (:func:`apply_merge`), with merged symbols
    participating in later merges — standard BPE application.  The
    whole encode is per-row JVM expression work (split -> fold per
    word, summed with a higher-order aggregate): ZERO shuffle, zero
    Python, linear in corpus bytes at any scale."""
    words = tokens(text_col)

    def enc(w):
        syms = F.filter(F.split(w, ""), lambda x: x != F.lit(""))
        for left, right in merges:
            syms = apply_merge(syms, left, right)
        return syms

    counts = F.transform(words, lambda w: F.size(enc(w)))
    return df.select(
        F.col(key_col),
        F.size(words).cast("long").alias("n_words"),
        F.aggregate(counts, F.lit(0),
                    lambda a, x: a + x).cast("long").alias("n_bpe_tokens"),
    )


def term_dispersion(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", top: int = 20,
                    round_digits: int = 6) -> DataFrame:
    """Gries' DP (Deviation of Proportions) dispersion for the corpus's
    top terms (Gries 2008, "Dispersions and adjusted frequencies in
    corpora") — the corpus-linguistics answer to "is this word frequent
    because it is EVERYWHERE, or because three documents scream it":

        DP(t) = 1/2 * sum_i | v_i / V  -  s_i / S |

    over ALL documents i, with v_i the term's count in doc i, V its
    corpus count, s_i the doc's token count, S the corpus token count.
    DP ~ 0 = distributed exactly like the corpus (function words);
    DP -> 1 = concentrated in few docs (topical/boilerplate terms).
    For curation it separates genuinely common vocabulary from
    template residue at equal raw frequency — the signal raw counts
    and even zipf rank cannot give.

    Exactness: the absent-doc tail is folded in closed form (every doc
    where t is absent contributes s_i / S, so the tail sums to
    (S - sum_present s_i) / S) — no zero-row materialization — and the
    per-doc terms are summed as EXACT integers over the common
    denominator V*S (|v_i * S - s_i * V| in decimal(38,0) — long*long
    would wrap silently at web scale in non-ANSI Spark), divided into
    double exactly once.  The sum is therefore order-independent and
    the SQL oracle reproduces it bit-for-bit (DuckDB sums in HUGEINT).
    Bound: Spark caps sum/product precision at decimal(38,0), so the
    per-row product is exact only while |v_i*S - s_i*V| < 1e38 (comfortable
    at 100 TB: ~1e26 for a 1e13-token corpus) and the AGGREGATE sum
    must also stay < 1e38; in non-ANSI mode an overflow returns NULL
    silently rather than erroring — run with spark.sql.ansi.enabled
    (or check for NULL dp) if the corpus approaches that bound.

    Scale shape: one explode->hash aggregate for (term, doc) counts,
    one for doc sizes; the top-``top`` term cut broadcasts back (count
    desc, term asc — a total order, deterministic cut); the per-term
    reduction runs over the restricted (top-term x doc) table joined
    to the skinny doc-size table on the doc key.  Text never
    shuffles."""
    tl = df.select(id_col, tokens(text_col).alias("_t"))
    sizes = tl.select(id_col, F.size("_t").cast("long").alias("s"))
    toks = tl.select(id_col, F.explode("_t").alias("tok"))
    tdc = toks.groupBy("tok", id_col).agg(F.count("*").alias("v_i"))
    # tdc feeds the top-term cut AND the scoring join
    tdc = tdc.localCheckpoint(eager=True)
    vt = tdc.groupBy("tok").agg(F.sum("v_i").alias("v"))
    top_t = vt.orderBy(F.desc("v"), F.asc("tok")).limit(top)
    tot = sizes.agg(F.sum("s").alias("s_tot"))
    dec = "decimal(38,0)"
    t = (tdc.join(F.broadcast(top_t), "tok")
         .join(sizes, id_col)
         .crossJoin(F.broadcast(tot)))
    per = t.groupBy("tok", "v", "s_tot").agg(
        F.sum(F.abs(F.col("v_i").cast(dec) * F.col("s_tot").cast(dec)
                    - F.col("s").cast(dec) * F.col("v").cast(dec)))
        .alias("num_present"),
        F.sum("s").alias("s_present"),
        F.count("*").alias("n_docs_present"),
    )
    num = (F.col("num_present")
           + (F.col("s_tot") - F.col("s_present")).cast(dec)
           * F.col("v").cast(dec))
    den = (F.lit(2).cast(dec) * F.col("v").cast(dec)
           * F.col("s_tot").cast(dec))
    return per.select(
        "tok", F.col("v").cast("long").alias("v"),
        F.col("n_docs_present").cast("long").alias("n_docs"),
        F.round(num.cast("double") / den.cast("double"),
                round_digits).alias("dp"),
    ).orderBy(F.desc("v"), F.asc("tok"))


def heaps_fit(df: DataFrame, text_col: str = "text",
              id_col: str = "doc_id", bucket_width: int = 100,
              round_digits: int = 4) -> DataFrame:
    """Heaps'-law vocabulary-growth fit V(n) = K * n^beta (Heaps 1978;
    Herdan 1960) over the corpus read in document-id order: OLS of
    ln(cumulative vocabulary) on ln(cumulative tokens).  beta ~ 0.4-0.6
    is healthy natural text; beta collapsing toward 0 as the crawl
    grows means new pages stop contributing new vocabulary (template
    farms / crawler traps); beta near 1 flags token-noise (OCR
    garbage, random ids).  The longitudinal companion to the
    Good-Turing point estimate of unseen mass.

    The distributed trick is the CUMULATIVE DISTINCT count, which
    cannot be prefix-summed naively: a term must count once, at its
    FIRST document.  min(doc_id) per term is one skinny aggregate, and
    new-types-per-doc then prefix-sums exactly like token counts — so
    both cumulative series run through the same two-pass distributed
    prefix sum (range buckets on the id + driver-collected per-bucket
    offsets) with no global window task.  All cumulative points are
    exact longs; the OLS runs on their logs and rounds (the zipf_fit
    convention — regr_slope/regr_intercept share one published
    definition across engines).

    Output: one row — n_points, beta (slope), ln_k (intercept)."""
    from pyspark.sql import Window

    tl = df.select(F.col(id_col).alias("did"), tokens(text_col).alias("_t"))
    sizes = tl.select("did", F.size("_t").cast("long").alias("n_tok"))
    newt = (tl.select("did", F.explode("_t").alias("tok"))
            .groupBy("tok").agg(F.min("did").alias("fd"))
            .groupBy("fd").agg(F.count("*").alias("new_types")))
    per = (sizes.join(newt, sizes.did == newt.fd, "left")
           .select("did", "n_tok",
                   F.coalesce("new_types", F.lit(0)).alias("new_types"))
           .withColumn("bkt", F.floor(F.col("did") / bucket_width)))
    btot = sorted(per.groupBy("bkt").agg(
        F.sum("n_tok").alias("bn"), F.sum("new_types").alias("bv")).collect(),
        key=lambda r: r["bkt"])
    offs, rn, rv = [], 0, 0
    for r in btot:
        offs.append((r["bkt"], rn, rv))
        rn += r["bn"]
        rv += r["bv"]
    spark = df.sparkSession
    off = F.broadcast(spark.createDataFrame(
        offs or [(0, 0, 0)], "bkt long, off_n long, off_v long"))
    wb = Window.partitionBy("bkt").orderBy("did")
    cum = (per.join(off, "bkt")
           .select("did",
                   (F.sum("n_tok").over(wb) + F.col("off_n")).alias("cn"),
                   (F.sum("new_types").over(wb) + F.col("off_v")).alias("cv")))
    pts = cum.where((F.col("cn") > 0) & (F.col("cv") > 0))
    return pts.agg(
        F.count("*").alias("n_points"),
        F.round(F.regr_slope(F.log("cv"), F.log("cn")), round_digits)
        .alias("beta"),
        F.round(F.regr_intercept(F.log("cv"), F.log("cn")), round_digits)
        .alias("ln_k"))
