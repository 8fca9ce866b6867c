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

__all__ = ["inverted_index", "corpus_stats", "bm25_topk", "posting_deltas",
           "tfidf_cosine_pairs", "index_delta", "kwic_snippets", "rrf_fuse", "ndcg_eval",
           "rake_keyphrases", "mine_identifiers", "identifier_linkage",
           "mine_measurements", "hybrid_rerank"]


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


def _varint_bytes(c):
    """LEB128/varint byte count of a non-negative BIGINT column, as
    chained range CASEs (1 byte per 7 payload bits).  Deliberately NOT
    ``floor(log2(g)/7)+1``: float log2 at exact power-of-two
    boundaries is an engine-dependent rounding hazard, integer
    comparisons are bit-exact in both Spark and DuckDB."""
    return (
        F.when(c < (1 << 7), 1)
        .when(c < (1 << 14), 2)
        .when(c < (1 << 21), 3)
        .when(c < (1 << 28), 4)
        .when(c < (1 << 35), 5)
        .when(c < (1 << 42), 6)
        .when(c < (1 << 49), 7)
        .otherwise(8)
        .cast("long")
    )


def posting_deltas(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", min_df: int = 2,
                   shard_bits: int = 10) -> DataFrame:
    """Per-term posting-list delta-compression statistics: the numbers
    an index builder needs to size a Lucene/PISA-style delta+varint
    postings layout — gap distribution and encoded byte cost per term.

    For each term with document frequency >= ``min_df``: postings are
    the SORTED distinct doc ids; the stored form is ``first_doc``
    followed by the ``df_t - 1`` consecutive gaps.  Emits ``df_t``,
    ``first_doc``, ``min_gap`` / ``max_gap`` / ``gap_sum``, and
    ``varint_bytes`` — varint(first_doc) + Σ varint(gap), the classic
    d-gap encoding cost (Witten/Moffat/Bell, Managing Gigabytes ch.3).
    Every output is an exact INTEGER (gap_sum, not avg_gap: a float
    mean hits engine-dependent round-half ties — the model_score
    lesson — while Σgap = last_doc - first_doc crosses engines
    bit-exactly and the caller divides).

    THE scale hazard is the stopword term: df_t can equal the corpus
    size, and a naive window ``lag() OVER (PARTITION BY term ORDER BY
    doc_id)`` funnels the hottest term through ONE task (the same trap
    as domain_topk's hot domain).  This implementation is two-phase
    doc-range sharding, the same move Lucene's block postings make:

    1. shard postings by doc-id range (``doc_id >> shard_bits``);
       adjacency WITHIN a shard via a window over (term, shard) —
       bounded by 2^shard_bits rows regardless of df_t;
    2. cross-shard boundary gaps from the per-shard summary rows
       (term, shard, first_doc, last_doc) — a window over term ordered
       by shard, but its input is <= df_t / 2^shard_bits skinny rows.

    Results are IDENTICAL to the naive single-window form (every gap
    is either intra-shard or a boundary gap, counted exactly once), so
    the driver oracle runs the naive lag() in DuckDB while Spark runs
    the sharded plan — the equality is the test."""
    from pyspark.sql import Window

    from ocr_spark.functions.text import tokens

    p = (df.select(F.col(id_col).alias("doc"),
                   F.explode(tokens(text_col)).alias("term"))
         .distinct())
    if min_df > 1:
        keep = (p.groupBy("term").agg(F.count("*").alias("df_t"))
                .where(F.col("df_t") >= min_df).select("term"))
        p = p.join(F.broadcast(keep), "term", "left_semi")
    p = p.withColumn("shard", F.shiftright(F.col("doc"), shard_bits))

    in_shard = Window.partitionBy("term", "shard").orderBy("doc")
    local = p.withColumn("prev", F.lag("doc").over(in_shard))
    local_gaps = (local.where(F.col("prev").isNotNull())
                  .select("term", (F.col("doc") - F.col("prev")).alias("gap")))

    summary = p.groupBy("term", "shard").agg(
        F.min("doc").alias("first_doc"), F.max("doc").alias("last_doc"))
    across = Window.partitionBy("term").orderBy("shard")
    boundary = summary.withColumn(
        "prev_last", F.lag("last_doc").over(across))
    boundary_gaps = (boundary.where(F.col("prev_last").isNotNull())
                     .select("term", (F.col("first_doc")
                                      - F.col("prev_last")).alias("gap")))

    firsts = summary.groupBy("term").agg(F.min("first_doc").alias("first_doc"))
    gaps = local_gaps.unionByName(boundary_gaps)
    gap_stats = gaps.groupBy("term").agg(
        F.min("gap").alias("min_gap"),
        F.max("gap").alias("max_gap"),
        F.sum("gap").alias("gap_sum"),
        F.sum(_varint_bytes(F.col("gap"))).alias("gap_bytes"),
    )
    counts = p.groupBy("term").agg(F.count("*").alias("df_t"))
    return (
        counts.join(firsts, "term").join(gap_stats, "term", "left")
        .select(
            "term", "df_t", "first_doc",
            "min_gap", "max_gap", "gap_sum",
            (_varint_bytes(F.col("first_doc"))
             + F.coalesce(F.col("gap_bytes"), F.lit(0))).alias("varint_bytes"),
        )
    )


def tfidf_cosine_pairs(df: DataFrame, key_col: str = "doc_id",
                       text_col: str = "text", threshold: float = 0.5,
                       max_df: int | None = None,
                       broadcast_vocab: bool = True) -> DataFrame:
    """Sparse TF-IDF cosine similarity join — the lexical-vector
    near-dup detector between n-gram Jaccard (set semantics, no term
    weighting) and embedding cosine (dense, needs a model): docs are
    tf·idf vectors over the corpus vocabulary and pairs above the
    cosine threshold are emitted.  idf = ln((N+1)/(df_t+1)) + 1, the
    same smoothed form as tfidf_topk, so rare shared terms dominate
    and boilerplate contributes ~nothing even before the guard.

    ``max_df`` drops ultra-common terms from the VECTORS entirely
    (numerator and norms together — unlike ngram_jaccard's
    intersection-only cap, so the score stays a true cosine over the
    restricted vocabulary; semantics documented, not silent).  That
    guard is also what bounds the join: per-term pair fan-out is at
    most max_df² — without it one stopword would join every doc pair.

    Scale shape: two skinny hash aggregates (tf, df) + a broadcast idf
    join (``broadcast_vocab=False`` for executor-sized vocabularies),
    norms as a per-doc aggregate joined back skinny, and the pair dot
    product as ONE exploded term equi-join + hash aggregate — the
    ngram_jaccard shape with weights.  Cosines round at 1e-6 (cross-
    partition float summation order differs in the last ulps — the
    lm_score discipline)."""
    from pyspark.sql import Window  # noqa: F401  (parity w/ module deps)

    ex = df.select(F.col(key_col), F.explode(tokens(text_col)).alias("term"))
    tf = ex.groupBy(key_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = ex.groupBy("term").agg(F.countDistinct(key_col).alias("df_t"))
    if max_df is not None:
        dfreq = dfreq.filter(F.col("df_t") <= max_df)
    n_docs = df.select(key_col).agg(F.count(F.lit(1)).alias("n"))
    if broadcast_vocab:
        dfreq = F.broadcast(dfreq)
    w = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            key_col, "term",
            (F.col("tf")
             * (F.log((F.col("n") + 1).cast("double")
                      / (F.col("df_t") + 1)) + 1)).alias("w"),
        )
    )
    norms = w.groupBy(key_col).agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
    dots = (
        w.alias("l")
        .join(w.alias("r"),
              (F.col("l.term") == F.col("r.term"))
              & (F.col(f"l.{key_col}") < F.col(f"r.{key_col}")))
        .groupBy(
            F.col(f"l.{key_col}").alias("id_a"),
            F.col(f"r.{key_col}").alias("id_b"),
        )
        .agg(F.sum(F.col("l.w") * F.col("r.w")).alias("dot"))
    )
    return (
        dots
        .join(norms.withColumnsRenamed({key_col: "id_a", "nrm": "nrm_a"}),
              "id_a")
        .join(norms.withColumnsRenamed({key_col: "id_b", "nrm": "nrm_b"}),
              "id_b")
        .withColumn("cosine",
                    F.round(F.col("dot") / (F.col("nrm_a") * F.col("nrm_b")),
                            6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def index_delta(old: DataFrame, new: DataFrame, key_col: str = "url",
                text_col: str = "text") -> DataFrame:
    """Incremental inverted-index maintenance: the posting operations
    ``(key, term, op in {add, del})`` that move the index built on the
    OLD snapshot to the NEW one — rebuilding nothing for unchanged
    documents.  This is the crawl-cycle reality at web scale: each
    monthly snapshot touches a few percent of the corpus, and
    re-indexing the other ~97% is the cost this operator deletes.

    Ops per status (statuses from snapshot_delta's digest diff):
    removed -> del every old term; added -> add every new term;
    changed -> del (old terms \\ new terms) + add (new \\ old) — terms
    present on both sides of a changed doc produce NO op (tf changes
    are a posting-payload update the positional index recomputes from
    the add/del of surrounding terms; document-level membership is
    what this maintains).

    Scale shape: the snapshot diff is a skinny (key, digest)
    full-outer join; ONLY non-unchanged docs are semi-joined back for
    tokenization (text of unchanged docs never leaves its partition,
    never explodes); the op derivation is one full-outer join of the
    two skinny distinct (key, term) sets."""
    from ocr_spark.operators.snapshot import snapshot_delta

    delta = (snapshot_delta(old, new, key_col, text_col)
             .filter(F.col("status") != "unchanged")
             .select("key"))

    def term_sets(df: DataFrame) -> DataFrame:
        return (
            df.select(F.col(key_col).alias("key"), F.col(text_col))
            .join(delta, "key", "left_semi")
            .select("key", F.explode(tokens(text_col)).alias("term"))
            .distinct()
        )

    ot = term_sets(old).withColumn("_o", F.lit(True))
    nt = term_sets(new).withColumn("_n", F.lit(True))
    joined = ot.join(nt, ["key", "term"], "full_outer")
    return (
        joined.filter(F.col("_o").isNull() | F.col("_n").isNull())
        .select(
            "key", "term",
            F.when(F.col("_o").isNull(), F.lit("add"))
            .otherwise(F.lit("del")).alias("op"),
        )
    )


def kwic_snippets(df: DataFrame, term: str, window: int = 3,
                  key_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Keyword-in-context snippets: for every occurrence of ``term``,
    the ±``window``-token neighborhood — what a retrieval stack shows
    under each BM25 hit, and what an annotation pipeline extracts as
    candidate spans around a seed term.

    One row per occurrence: ``(key, pos, snippet)`` with ``pos`` the
    0-based token index.  Entirely per-row JVM array work (tokenize
    once, positions via a filtered index sequence, snippet via a
    bounded slice + join) — zero shuffle, no explode of non-matching
    docs (docs without the term emit nothing via the posexplode of an
    empty positions array)."""
    toks = tokens(text_col)
    n = F.size(toks)
    # try_element_at: NULL (never an ANSI index error) on the padded
    # index the greatest() guard leaves for empty docs; NULL == term
    # is NULL, which filter() drops — empty docs emit nothing
    hits = F.filter(
        F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
        lambda i: F.try_element_at(toks, i) == term,
    )
    start = F.greatest(F.col("_p") - window, F.lit(1))
    stop = F.least(F.col("_p") + window, F.col("_n"))
    return (
        df.select(F.col(key_col), toks.alias("_t"), n.alias("_n"),
                  F.explode(hits).alias("_p"))
        .select(
            key_col,
            (F.col("_p") - 1).cast("int").alias("pos"),
            F.array_join(
                F.slice(F.col("_t"), start, stop - start + 1), " ",
            ).alias("snippet"),
        )
    )


def rrf_fuse(rankings: list[DataFrame], k: int = 60,
             id_col: str = "doc_id", rank_col: str = "rank",
             round_digits: int = 9) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack et al., SIGIR 2009): fuse any
    number of top-k rankings into one list by
    ``rrf(d) = sum over rankings of 1 / (k + rank_r(d))`` — the
    standard zero-training hybrid-retrieval combiner (BM25 + dense
    cosine is THE production pairing) that needs no score calibration
    because it only consumes ranks.

    Input DataFrames carry ``(id_col, rank_col)``; a document missing
    from a ranking contributes nothing for it.  Output:
    ``(id_col, rrf_score, fused_rank)`` with the deterministic
    (score DESC, id ASC) tie-break.

    Scale shape: the inputs are already top-k (tiny); the fusion is a
    union + one hash aggregate + one rank window over the fused list —
    bounded by k * n_rankings rows, never the corpus."""
    from functools import reduce

    from pyspark.sql import Window

    parts = [
        r.select(F.col(id_col).alias("_id"),
                 (F.lit(1.0) / (F.lit(float(k)) + F.col(rank_col)
                                .cast("double"))).alias("_c"))
        for r in rankings
    ]
    u = reduce(lambda a, b: a.unionByName(b), parts)
    agg = u.groupBy("_id").agg(
        F.round(F.sum("_c"), round_digits).alias("rrf_score"))
    w = Window.orderBy(F.col("rrf_score").desc(), F.col("_id").asc())
    return agg.select(F.col("_id").alias(id_col), "rrf_score",
                      F.row_number().over(w).alias("fused_rank"))


def ndcg_eval(ranking: DataFrame, relevance: DataFrame,
              cutoffs: tuple[int, ...] = (5, 10, 20),
              id_col: str = "doc_id", rank_col: str = "rank",
              rel_col: str = "rel",
              round_digits: int = 6) -> DataFrame:
    """Ranked-retrieval self-evaluation: nDCG@k of a ranking against a
    graded relevance table — the metric that closes the retrieval
    loop (postings/BM25/ANN produce rankings; this says whether they
    are any good, per cutoff).  DCG uses the classic ``rel /
    log2(rank+1)`` discount; IDCG re-ranks the relevance table
    ideally with the deterministic (rel DESC, id ASC) tie-break.

    Scale shape: the ranking is already top-k (tiny); the ideal list
    comes from a distributed orderBy+limit(max cutoff) —
    TakeOrderedAndProject, never a global window over the corpus —
    and the per-cutoff sums run over <= max(cutoffs) rows."""
    from pyspark.sql import Window

    kmax = max(cutoffs)
    rel = relevance.select(F.col(id_col).alias("_id"),
                           F.col(rel_col).cast("double").alias("_rel"))
    ranked = (
        ranking.select(F.col(id_col).alias("_id"),
                       F.col(rank_col).cast("int").alias("_rank"))
        .where(F.col("_rank") <= kmax)
        .join(rel, "_id", "left")
        .select("_rank",
                (F.coalesce("_rel", F.lit(0.0))
                 / F.log2(F.col("_rank") + 1)).alias("_g"))
    )
    ideal = (
        rel.where(F.col("_rel") > 0)
        .orderBy(F.col("_rel").desc(), F.col("_id").asc())
        .limit(kmax)
    )
    wi = Window.orderBy(F.col("_rel").desc(), F.col("_id").asc())
    ideal = ideal.select(
        F.row_number().over(wi).alias("_rank"),
        (F.col("_rel") / F.log2(F.row_number().over(wi) + 1)).alias("_g"))
    cuts = ranking.sparkSession.createDataFrame(
        [(c,) for c in sorted(cutoffs)], "cutoff int")

    def at(df: DataFrame, name: str) -> DataFrame:
        return (cuts.crossJoin(df)
                .where(F.col("_rank") <= F.col("cutoff"))
                .groupBy("cutoff").agg(F.sum("_g").alias(name)))

    j = (cuts.join(at(ranked, "dcg"), "cutoff", "left")
         .join(at(ideal, "idcg"), "cutoff", "left")
         .select("cutoff",
                 F.round(F.coalesce("dcg", F.lit(0.0)),
                         round_digits).alias("dcg"),
                 F.round(F.coalesce("idcg", F.lit(0.0)),
                         round_digits).alias("idcg"),
                 F.round(F.when(F.coalesce("idcg", F.lit(0.0)) > 0,
                                F.coalesce("dcg", F.lit(0.0))
                                / F.col("idcg")).otherwise(F.lit(0.0)),
                         round_digits).alias("ndcg")))
    return j


RAKE_STOPWORDS = ("a", "an", "and", "the", "of", "to", "in", "is",
                  "on", "for")


def rake_keyphrases(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", k: int = 3,
                    stopwords: tuple[str, ...] = RAKE_STOPWORDS
                    ) -> DataFrame:
    """RAKE keyphrase extraction (Rose et al. 2010): candidate phrases
    are the maximal runs between stopwords/punctuation; each word
    scores deg(w)/freq(w) within its document (deg = summed length of
    the phrases containing it, freq = its occurrence count); a phrase
    scores the sum of its words' scores; top-k DISTINCT phrases per
    document win.

    Determinism contract: per-word scores are quantized to exact
    integer milli-units with floor division BEFORE summing
    (``score_milli = sum((deg*1000) div freq)``), so the published
    score and the ranking are integer arithmetic end-to-end — no
    float-summation-order sensitivity between executors (or between
    this engine and a SQL oracle).  Ties break on the phrase string.

    Plan shape: all splitting/trimming is JVM regexp on the normalized
    text; three hash-aggregate shuffles on skinny (id, word) /
    (id, phrase) projections (map-side combine absorbs hot words); the
    only window is the per-document top-k over tens of candidate rows.
    The full text column never shuffles."""
    from pyspark.sql.window import Window

    stop_alt = "|".join(stopwords)
    delim = rf"(?:[^a-z0-9 ]+|\b(?:{stop_alt})\b)"
    norm = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    ph = (df.select(id_col, F.explode(F.split(norm, delim)).alias("seg"))
            .select(id_col,
                    F.trim(F.regexp_replace("seg", r"\s+", " "))
                     .alias("phrase"))
            .filter(F.col("phrase") != ""))
    words = F.split(F.col("phrase"), " ")
    w = ph.select(id_col, F.size(words).alias("plen"),
                  F.explode(words).alias("word"))
    stats = (w.groupBy(id_col, "word")
              .agg(F.count("*").alias("freq"),
                   F.sum("plen").alias("deg")))
    dph = ph.groupBy(id_col, "phrase").agg(F.count("*").alias("n_occ"))
    dw = dph.select(id_col, "phrase", "n_occ",
                    F.size(words).cast("long").alias("n_words"),
                    F.explode(words).alias("word"))
    sc = (dw.join(stats, [id_col, "word"])
            .groupBy(id_col, "phrase")
            .agg(F.max("n_occ").alias("n_occ"),
                 F.max("n_words").alias("n_words"),
                 F.sum(F.expr("(deg * 1000) div freq"))
                  .alias("score_milli")))
    win = (Window.partitionBy(id_col)
           .orderBy(F.desc("score_milli"), F.asc("phrase")))
    return (sc.withColumn("rank", F.row_number().over(win))
              .filter(F.col("rank") <= k)
              .select(id_col, "rank", "phrase", "n_words", "n_occ",
                      "score_milli"))


# Java-regex/RE2-common patterns (no backrefs, no lookaround) so the
# DuckDB oracle runs the IDENTICAL strings — same discipline as the
# PII scrub table.  DOI per the Crossref display guidelines; arXiv
# new-style YYMM.NNNNN ids.
IDENTIFIER_PATTERNS = {
    "doi": r"\b10\.\d{4,9}/[-._;()/:a-z0-9]+",
    "arxiv": r"\barxiv:\d{4}\.\d{4,5}\b",
}


def mine_identifiers(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text",
                     patterns: dict[str, str] | None = None
                     ) -> DataFrame:
    """Scholarly/external identifier mining: every match of every
    pattern family, one row per occurrence with its per-(doc, kind)
    match index — the linkage keys citation-graph and
    dataset-provenance pipelines join on.  Case-folded before
    matching (DOIs are case-insensitive per spec).

    Plan: ONE pass — every family's ``regexp_extract_all`` runs as a
    tagged-struct array in the same projection (a union of per-family
    branches would re-scan the corpus once per family; concat +
    single explode keeps it one FileScan), pure JVM regex, zero
    shuffle."""
    pats = IDENTIFIER_PATTERNS if patterns is None else patterns
    low = F.lower(F.col(text_col))

    def tag(kind):
        # closure factory; the 2-arg HOF lambda receives (elem, idx)
        return lambda x, i: F.struct(
            F.lit(kind).alias("kind"), i.alias("match_idx"),
            x.alias("ident"))

    arrays = [
        F.transform(F.regexp_extract_all(low, F.lit(pat), 0), tag(kind))
        for kind, pat in sorted(pats.items())
    ]
    combined = arrays[0] if len(arrays) == 1 else F.concat(*arrays)
    return (df.select(id_col, F.explode(combined).alias("m"))
            .select(id_col, F.col("m.kind").alias("kind"),
                    F.col("m.match_idx").alias("match_idx"),
                    F.col("m.ident").alias("ident")))


def identifier_linkage(ids: DataFrame, id_col: str = "doc_id",
                       min_shared: int = 1,
                       max_df: int | None = None,
                       materialize: bool = True) -> DataFrame:
    """Bibliographic coupling over mined identifiers
    (``mine_identifiers`` output): two documents link with strength
    ``n_shared`` = how many distinct (kind, ident) keys they share —
    the citation-graph edge scholarly dedup and related-work mining
    join on.

    Plan: distinct (doc, kind, ident) postings; optional
    hot-identifier guard (an ident held by more than ``max_df`` docs
    is EXCLUDED via a broadcast anti-join — a mega-cited DOI would
    otherwise expand quadratically; same discipline as the
    ngram_jaccard hot-shingle guard, dedup.py).  Then a self
    equi-join on (kind, ident) — never all-pairs — and a pair-count
    aggregate.  Exchange ∝ postings; pair expansion bounded by
    max_df² per identifier; dropped hot idents are countable by the
    caller via the same groupBy."""
    post = ids.select(id_col, "kind", "ident").distinct()
    if materialize:
        # the posting set fans out to the df guard and BOTH self-join
        # sides — lazy, the upstream mining scan re-runs per consumer
        post = post.localCheckpoint(eager=False)
    if max_df is not None:
        hot = (post.groupBy("kind", "ident")
               .agg(F.count("*").alias("df"))
               .filter(F.col("df") > max_df)
               .select("kind", "ident"))
        post = post.join(F.broadcast(hot), ["kind", "ident"],
                         "left_anti")
    return (post.alias("l")
            .join(post.alias("r"),
                  (F.col("l.kind") == F.col("r.kind"))
                  & (F.col("l.ident") == F.col("r.ident"))
                  & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")))
            .groupBy(F.col(f"l.{id_col}").alias("doc_a"),
                     F.col(f"r.{id_col}").alias("doc_b"))
            .agg(F.count("*").alias("n_shared"))
            .filter(F.col("n_shared") >= min_shared))


# One shared Java-regex/RE2-common pattern (no backrefs/lookaround) so
# the DuckDB oracle can run the IDENTICAL string.  Alternation order
# is load-bearing under leftmost-FIRST semantics (both engines):
# compounds before their prefixes (km|cm|mm|ms|mg|mb before m/g/b,
# kg|kb|gb before g/b).  Value capped at 6 integer digits + 3 dp so
# the normalized milli-base product (worst case 1e9 milli-val x 1e9
# gb->bytes factor = 1e18) stays inside BIGINT under ANSI mode.
MEASUREMENT_PATTERN = (
    r"\b(\d{1,6}(?:\.\d{1,3})?)\s?"
    r"(km|cm|mm|ms|mg|mb|kg|kb|gb|m|g|s|h)\b")

# unit -> (dimension, base units per unit, expressed so that
# value_milli * factor = amount in MILLI-base-units, bit-exact ints)
MEASUREMENT_UNITS = {
    "km": ("length", 1_000_000), "m": ("length", 1_000),
    "cm": ("length", 10), "mm": ("length", 1),
    "kg": ("mass", 1_000_000), "g": ("mass", 1_000),
    "mg": ("mass", 1),
    "gb": ("data", 1_000_000_000), "mb": ("data", 1_000_000),
    "kb": ("data", 1_000),
    "h": ("time", 3_600_000), "s": ("time", 1_000),
    "ms": ("time", 1),
}


def mine_measurements(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Quantity mining: every ``<number> <unit>`` mention, one row per
    occurrence with the value decomposed EXACTLY into integer
    milli-units (string split on '.', never a float parse — round-half
    float casts are engine-dependent) and normalized to an integer
    amount of milli-base-units (mm/mg/bytes/ms) via the literal
    factor table — the structured-fact shape product/recipe/spec
    extraction pipelines aggregate.

    Plan: two ``regexp_extract_all`` group pulls over the same
    case-folded column (Catalyst subexpression-eliminates the shared
    lower()), ``arrays_zip`` keeps value/unit aligned by scan
    position, one posexplode — pure JVM, zero shuffle."""
    low = F.lower(F.col(text_col))
    pat = F.lit(MEASUREMENT_PATTERN)
    z = F.arrays_zip(F.regexp_extract_all(low, pat, 1),
                     F.regexp_extract_all(low, pat, 2))
    ex = df.select(
        id_col, F.posexplode(z).alias("match_idx", "m")).select(
        id_col, "match_idx",
        F.col("m").getField("0").alias("raw"),
        F.col("m").getField("1").alias("unit"))
    parts = F.split(F.col("raw"), r"\.")
    value_milli = (
        F.get(parts, 0).cast("long") * 1000
        + F.rpad(F.coalesce(F.get(parts, 1), F.lit("")), 3, "0")
           .cast("long"))
    dim, factor = F.lit(None).cast("string"), F.lit(None).cast("long")
    for u, (d, f) in sorted(MEASUREMENT_UNITS.items()):
        dim = F.when(F.col("unit") == u, d).otherwise(dim)
        factor = F.when(F.col("unit") == u, f).otherwise(factor)
    return ex.select(
        id_col, "match_idx", "unit",
        value_milli.alias("value_milli"),
        dim.alias("dimension"),
        (value_milli * factor).alias("norm_milli"))


def hybrid_rerank(docs: DataFrame, emb: DataFrame,
                  query_terms: tuple[str, ...],
                  query_vec: list[float], k_candidates: int = 50,
                  k: int = 10, id_col: str = "doc_id",
                  vec_id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """Two-stage retrieval — the production search shape: a cheap
    lexical recall stage (BM25 top ``k_candidates``) followed by an
    exact embedding rerank of ONLY those candidates against the query
    vector.  Returns (doc, bm25_score, cos_sim, rank) ranked by
    cosine, ties to the smaller id.

    Scale shape: stage 1 is the documented bm25_topk plan (filtered
    explode, broadcast stats, TakeOrdered); stage 2 BROADCASTS the
    k_candidates-row result into a semi-join against the embedding
    table — the corpus embeddings are scanned once, never shuffled,
    and the expensive scorer touches exactly k_candidates vectors.
    The query vector rides as a literal array (rational 3-dp floats),
    so the SQL oracle re-derives identical cosines."""
    from ocr_spark.operators.similarity import cosine

    cands = bm25_topk(docs, query_terms, k=k_candidates,
                      id_col=id_col).select(id_col, "score")
    qv = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = (emb.select(F.col(vec_id_col).alias(id_col),
                         F.col(vec_col))
              .join(F.broadcast(cands), id_col)
              .withColumn("cos_sim",
                          F.round(cosine(F.col(vec_col), qv), 6)))
    from pyspark.sql import Window
    w = Window.orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(id_col, F.col("score").alias("bm25_score"),
                    "cos_sim", "rank"))
