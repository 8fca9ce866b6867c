"""Corpus assembly operators — the last mile of a training-data run.

After dedup and quality filtering, a corpus is *assembled*: each source
stratum is down-sampled to a target rate or filled up to a token
budget ("30% web, 20% code, ..." mixes).  Two rules make this a
distributed-systems problem rather than a one-liner:

* **Determinism.**  ``df.sample()`` draws from a per-partition RNG, so
  the selected set changes with partitioning, retries, and engine
  version — unacceptable for a reproducible training corpus.  Both
  operators here select by a 60-bit md5 hash of the document key
  (the same ``conv(substring(md5(x),1,15),16,10)`` construction as
  ``dedup.simhash(hash_mode='md5_64')``), so the sample is a pure
  function of (key, salt) — identical across runs, engines, and
  cluster sizes, and re-derivable closed-form by the DuckDB oracle.

* **No single-task strata.**  A running token total per stratum is a
  prefix sum; the naive ``Window.partitionBy(source)`` form funnels an
  entire stratum (terabytes for "web") through ONE task.
  ``token_budget_mix`` instead does the classic two-pass distributed
  prefix sum: bucket by hash, aggregate per-(stratum, bucket) partial
  sums (tiny), turn those into per-bucket starting offsets with a
  window over the TINY partials frame, broadcast the offsets back, and
  cumsum only within each (stratum, bucket) partition.  Parallelism is
  ``n_buckets`` per stratum regardless of stratum size.

All hot-path logic is JVM built-ins; no Python in any plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ocr_spark.functions.text import token_count, tokens, word_shingles

__all__ = ["stratified_sample", "token_budget_mix", "sample_thresholds",
           "epoch_mix", "epoch_weights", "dsir_weights",
           "data_split", "split_thresholds", "cluster_split",
           "contamination_pairs", "pack_sequences", "packed_sequences",
           "length_buckets", "weighted_sample", "epoch_shuffle",
           "shard_plan", "shard_manifest", "fim_transform", "span_corrupt",
           "cloze_qa", "section_qa", "skipgram_pairs"]

# 60-bit hash space: 15 md5 hex chars, inside int64 on every engine
HASH_SPACE = 1 << 60


def _md5_60(col, salt: str):
    """Uniform 60-bit integer hash of (salt | key) — deterministic and
    identically computable in DuckDB as
    ('0x' || substr(md5(salt || '|' || key), 1, 15))::BIGINT.

    Built with the Column API (not an F.expr f-string) so a salt
    containing a quote, or a column name needing backticks, cannot
    break or inject into the expression — the salt rides as a bound
    literal and the column as a resolved reference."""
    return F.conv(
        F.substring(
            F.md5(
                F.concat(F.lit(salt), F.lit("|"),
                         F.col(col).cast("string"))
            ),
            1, 15,
        ),
        16, 10,
    ).cast("long")


def sample_thresholds(fractions: dict[str, float]) -> dict[str, int]:
    """fraction -> integer hash threshold, computed ONCE in Python so
    the engine and the SQL oracle compare against bit-identical
    literals (float rounding must not happen independently twice)."""
    return {s: int(f * HASH_SPACE) for s, f in fractions.items()}


def stratified_sample(df: DataFrame, fractions: dict[str, float],
                      strata_col: str = "source", key_col: str = "doc_id",
                      salt: str = "") -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff
    ``hash60(key) < fraction[stratum] * 2^60``.  Strata absent from
    ``fractions`` are dropped (a mix spec is a whitelist).

    Scale story: a pure filter — no shuffle, no state, pushes down
    around it; the kept set is a function of (key, salt) only, so a
    re-run, a retry, or a 1000-executor repartition selects the exact
    same documents."""
    thresholds = sample_thresholds(fractions)
    h = _md5_60(key_col, salt)
    thr = F.lit(0)
    for s, t in sorted(thresholds.items()):
        thr = F.when(F.col(strata_col) == s, F.lit(t)).otherwise(thr)
    return df.filter(h < thr)


def epoch_weights(weights: dict[str, float]) -> dict[str, tuple[int, int]]:
    """weight -> (whole epochs, fractional-epoch hash threshold),
    computed ONCE in Python so engine and SQL oracle compare against
    bit-identical integer literals."""
    return {s: (int(w), int((w - int(w)) * HASH_SPACE))
            for s, w in weights.items()}


def epoch_mix(df: DataFrame, weights: dict[str, float],
              strata_col: str = "source", key_col: str = "doc_id",
              salt: str = "") -> DataFrame:
    """Deterministic fractional upsampling for training mixes: stratum
    s with weight w emits every doc floor(w) times, plus one extra
    copy for the hash fraction frac(w) of its docs — so 2.5 epochs of
    wiki means every wiki doc twice and a deterministic half of them a
    third time (the standard epoch-weighting move when high-quality
    sources are smaller than their target share).  Strata absent from
    ``weights`` are dropped.  Output = input rows replicated with a
    1-based ``epoch`` copy index.

    Scale story: zero shuffle — a per-row explode of a bounded
    sequence; which docs get the fractional copy is a pure function of
    (key, salt), so retries and repartitionings reproduce the exact
    mix, and downstream shuffles see copies hash-scattered rather than
    a replicated hot partition."""
    spec = epoch_weights(weights)
    h = _md5_60(key_col, salt)
    base = F.lit(0)
    thr = F.lit(0)
    for s, (b, t) in sorted(spec.items()):
        cond = F.col(strata_col) == s
        base = F.when(cond, F.lit(b)).otherwise(base)
        thr = F.when(cond, F.lit(t)).otherwise(thr)
    n = base + F.when(h < thr, F.lit(1)).otherwise(F.lit(0))
    return (
        df.withColumn("_n_copies", n)
        # filter BEFORE sequence(): sequence(1, 0) would descend
        .filter(F.col("_n_copies") > 0)
        .withColumn("epoch",
                    F.explode(F.sequence(F.lit(1), F.col("_n_copies"))))
        .drop("_n_copies")
    )


def dsir_weights(df: DataFrame, target_col: str,
                 text_col: str = "text", id_col: str = "doc_id",
                 n_buckets: int = 256, salt: str = "dsir",
                 broadcast_buckets: bool = True) -> DataFrame:
    """DSIR hashed-n-gram importance weights (Xie et al., NeurIPS 2023:
    *Data Selection for Language Models via Importance Resampling*):
    score every raw document by how target-like its token distribution
    is, ``log w(x) = sum over tokens of ln p_target(bucket(tok)) -
    ln p_raw(bucket(tok))``, with tokens hashed into ``n_buckets``
    feature buckets and both bucket distributions add-1 smoothed.
    ``target_col`` is an int/bool column marking the in-domain subset
    (the Wikipedia/books side of the original paper); the raw
    distribution is the whole input.  High ``log_weight`` = looks like
    the target; selection downstream is a threshold or a top-k.

    Scale shape — identical to ``functions.quality.unigram_logprob``:
    ONE explode->hash-aggregate shuffle trains both distributions at
    once (the aggregate is keyed by bucket, so its output is exactly
    ``n_buckets`` rows no matter the corpus size, and the hot bucket is
    absorbed map-side); the log-ratio table broadcasts back over the
    exploded tokens; the per-doc reduction is a second skinny aggregate
    keyed by ``id_col``.  The bucket hash is the 60-bit md5 integer
    both engines compute bit-identically, so a SQL oracle re-derives
    every weight closed-form.  Token-less docs keep NULL ``log_weight``
    (no evidence)."""
    ex = df.select(
        id_col,
        F.col(target_col).cast("long").alias("_tgt"),
        F.explode(tokens(text_col)).alias("tok"),
    ).withColumn("b", _md5_60("tok", salt) % n_buckets).drop("tok")
    counts = ex.groupBy("b").agg(
        F.count("*").alias("c_raw"), F.sum("_tgt").alias("c_tgt")
    )
    totals = counts.agg(F.sum("c_raw").alias("n_raw"),
                        F.sum("c_tgt").alias("n_tgt"))
    lr = counts.crossJoin(F.broadcast(totals)).select(
        "b",
        (
            F.log((F.col("c_tgt") + 1).cast("double")
                  / (F.col("n_tgt") + n_buckets))
            - F.log((F.col("c_raw") + 1).cast("double")
                    / (F.col("n_raw") + n_buckets))
        ).alias("_lr"),
    )
    if broadcast_buckets:
        lr = F.broadcast(lr)
    per_doc = ex.join(lr, "b").groupBy(id_col).agg(
        F.sum("_lr").alias("log_weight"),
        F.count("*").alias("n_tokens"),
    )
    return (
        df.select(id_col).distinct()
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
            F.col("log_weight"),
        )
    )


# canonical 3-way split shares: a pure function of the key hash so the
# assignment is stable across runs, engines, and re-partitionings
def split_thresholds(shares: dict[str, float]) -> list[tuple[str, int]]:
    """Ordered (name, upper-bound) cut points over the 60-bit hash
    space: cumulative shares, computed once in Python so engine and
    oracle compare bit-identical integer literals.  Shares must sum to
    <= 1.0; any remainder falls into the LAST split (so 1.0-summing
    specs are exhaustive by construction)."""
    cuts, acc = [], 0.0
    items = list(shares.items())
    for name, frac in items[:-1]:
        acc += frac
        cuts.append((name, int(acc * HASH_SPACE)))
    cuts.append((items[-1][0], HASH_SPACE))
    return cuts


def data_split(df: DataFrame, shares: dict[str, float],
               key_col: str = "doc_id", salt: str = "split") -> DataFrame:
    """Deterministic train/val/test assignment: ``split`` column from
    the key's 60-bit hash against cumulative cut points — disjoint and
    exhaustive by construction, reproducible under retries and
    repartitionings, and leakage-safe (a document can never migrate
    between splits when the corpus grows, because its assignment
    depends only on its own key).  Zero shuffle: a per-row expression
    that pushes down around everything."""
    cuts = split_thresholds(shares)
    h = _md5_60(key_col, salt)
    expr = F.lit(cuts[-1][0])
    for name, ub in reversed(cuts[:-1]):
        expr = F.when(h < ub, F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


def cluster_split(clusters: DataFrame, shares: dict[str, float],
                  cluster_col: str = "cluster_id",
                  salt: str = "split") -> DataFrame:
    """Leakage-SAFE train/val/test assignment: split by the near-dup
    CLUSTER id, not the document id, so two near-duplicate documents
    can never land in different splits.

    Per-document hash splits (:func:`data_split`) leak under
    near-duplication: a val document whose 95%-identical twin sits in
    train inflates every eval number — the contamination failure mode
    decontamination pipelines exist to prevent, reintroduced by the
    split itself.  The fix is one line once clustering exists: hash
    the CLUSTER label (``near_dup_clusters``'s min-id representative),
    and every member inherits the same split.

    Zero additional shuffle: a per-row expression over the clusterer's
    output.  Deterministic in (cluster_id, salt) — reproducible under
    retries, repartitionings, and corpus growth (a cluster's split
    never migrates; new members join their cluster's side)."""
    cuts = split_thresholds(shares)
    h = _md5_60(cluster_col, salt)
    expr = F.lit(cuts[-1][0])
    for name, ub in reversed(cuts[:-1]):
        expr = F.when(h < ub, F.lit(name)).otherwise(expr)
    return clusters.withColumn("split", expr)


def token_budget_mix(df: DataFrame, budgets: dict[str, int],
                     strata_col: str = "source", key_col: str = "doc_id",
                     text_col: str = "text", n_buckets: int = 64,
                     salt: str = "") -> DataFrame:
    """Fill each stratum up to a token budget, in deterministic
    hash order (a reproducible uniform subsample, not "first files
    scanned" order).  Returns the selected rows as
    ``(key, stratum, n_tokens, cum_tokens)`` where ``cum_tokens`` is
    the running per-stratum total including the row itself; rows are
    kept while ``cum_tokens <= budget[stratum]``.  Strata absent from
    ``budgets`` are dropped.

    The running total is a two-pass distributed prefix sum (see module
    docstring): per-(stratum, hash-bucket) partials, offsets via a
    window over the tiny partials frame, broadcast back, cumsum within
    buckets.  Only full-data exchange: ONE hash partition by
    (stratum, bucket) — never a whole stratum in one task.  Bucket
    order is part of the global order (bucket, hash, key), so the
    result equals the single-window form exactly."""
    budget = F.lit(0).cast("long")
    for s, b in sorted(budgets.items()):
        budget = F.when(F.col(strata_col) == s, F.lit(int(b))).otherwise(budget)
    h = _md5_60(key_col, salt)
    base = (
        df.select(
            F.col(key_col),
            F.col(strata_col),
            token_count(text_col).cast("long").alias("n_tokens"),
        )
        .withColumn("h", h)
        .withColumn("bucket", F.pmod(F.col("h"), F.lit(n_buckets)))
        .filter(budget > 0)
    )
    partials = base.groupBy(strata_col, "bucket").agg(
        F.sum("n_tokens").alias("bucket_tokens")
    )
    w_off = (
        Window.partitionBy(strata_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = partials.select(
        strata_col,
        "bucket",
        F.coalesce(F.sum("bucket_tokens").over(w_off), F.lit(0)).alias("offset"),
    )
    w_run = (
        Window.partitionBy(strata_col, "bucket")
        .orderBy("h", key_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        base.join(F.broadcast(offsets), [strata_col, "bucket"])
        .withColumn(
            "cum_tokens", F.col("offset") + F.sum("n_tokens").over(w_run)
        )
        .filter(F.col("cum_tokens") <= budget)
        .select(key_col, strata_col, "n_tokens", "cum_tokens")
    )


def pack_sequences(df: DataFrame, seq_len: int, key_col: str = "doc_id",
                   text_col: str = "text", n_buckets: int = 64,
                   salt: str = "") -> DataFrame:
    """Sequence packing (GPT-style concat-and-cut): conceptually
    concatenate every document's tokens in deterministic hash order and
    cut the stream into fixed ``seq_len`` training sequences; report,
    per document, its global token offset and the half-open range of
    sequence ids it lands in::

        (key, n_tokens, start_off, seq_first, seq_last, n_seqs)

    where ``start_off = <tokens before this doc>``, ``seq_first =
    start_off div seq_len``, ``seq_last = (start_off + n_tokens - 1)
    div seq_len``.  A downstream writer groups by sequence id to emit
    the packed batches; this operator is the placement plan, which is
    the distributed-systems half of the problem.  Empty documents pack
    to nothing and are dropped.

    The global running offset is the same two-pass distributed prefix
    sum as ``token_budget_mix`` but with a single implicit stratum:
    per-bucket partial sums (``n_buckets`` rows — the offset window
    over them is single-partition but trivially small), broadcast the
    per-bucket starting offsets back, cumsum within buckets.  Global
    order is (bucket, h, key), a pure function of the key — the packing
    is identical across runs, retries, partitionings, and cluster
    sizes, which is what makes a training run reproducible."""
    h = _md5_60(key_col, salt)
    base = (
        df.select(
            F.col(key_col),
            token_count(text_col).cast("long").alias("n_tokens"),
        )
        .withColumn("h", h)
        .withColumn("bucket", F.pmod(F.col("h"), F.lit(n_buckets)))
        .filter(F.col("n_tokens") > 0)
    )
    partials = base.groupBy("bucket").agg(
        F.sum("n_tokens").alias("bucket_tokens")
    )
    w_off = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = partials.select(
        "bucket",
        F.coalesce(F.sum("bucket_tokens").over(w_off), F.lit(0)).alias("offset"),
    )
    w_run = (
        Window.partitionBy("bucket")
        .orderBy("h", key_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = F.col("offset") + F.sum("n_tokens").over(w_run)
    return (
        base.join(F.broadcast(offsets), "bucket")
        .withColumn("start_off", (cum - F.col("n_tokens")).cast("long"))
        .withColumn("seq_first", F.expr(f"start_off div {int(seq_len)}"))
        .withColumn(
            "seq_last",
            F.expr(f"(start_off + n_tokens - 1) div {int(seq_len)}"),
        )
        .withColumn(
            "n_seqs", (F.col("seq_last") - F.col("seq_first") + 1).cast("long")
        )
        .select(key_col, "n_tokens", "start_off", "seq_first", "seq_last",
                "n_seqs")
    )


def packed_sequences(df: DataFrame, seq_len: int, key_col: str = "doc_id",
                     text_col: str = "text", n_buckets: int = 64,
                     salt: str = "") -> DataFrame:
    """The writer half of :func:`pack_sequences`: materialize the
    actual fixed-length training sequences the placement plan
    describes.  Documents are split across sequence boundaries exactly
    as GPT-style concat-and-cut demands; the output is one row per
    training sequence::

        (seq_id, n_docs, n_tokens, full, text)

    where ``text`` is the sequence's tokens joined by single spaces,
    ``n_docs`` counts the documents contributing at least one token,
    and ``full`` marks complete ``seq_len`` sequences (the trailing
    partial sequence is emitted with full=false — dropping it is the
    caller's one-line policy decision, not silent truncation here).

    Scale shape: the placement plan stays the skinny two-pass prefix
    sum of ``pack_sequences``; token payload crosses the network
    exactly twice — the key-join that attaches each doc's token array
    to its plan row, and the groupBy(seq_id) that assembles segments.
    Each (doc, covered-sequence) pair becomes ONE segment row, so the
    explode is bounded by total_tokens/seq_len + n_docs, and every
    reduce group is ~seq_len tokens regardless of document sizes —
    a 10M-token document never lands in one task's memory; its
    segments spread over 10M/seq_len groups."""
    plan = pack_sequences(df, seq_len, key_col, text_col, n_buckets, salt)
    toks = df.select(F.col(key_col), tokens(text_col).alias("toks"))
    L = int(seq_len)
    seg = (
        plan.join(toks, key_col)
        .withColumn("seq_id", F.explode(F.sequence("seq_first", "seq_last")))
        .select(
            "seq_id",
            F.col("start_off"),
            F.greatest(F.lit(0), F.col("seq_id") * L - F.col("start_off"))
            .alias("lo"),
            F.least(F.col("n_tokens"),
                    (F.col("seq_id") + 1) * L - F.col("start_off"))
            .alias("hi"),
            "toks",
        )
        .withColumn(
            "seg", F.slice("toks", F.col("lo") + 1, F.col("hi") - F.col("lo"))
        )
    )
    return (
        seg.groupBy("seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("hi") - F.col("lo")).alias("n_tokens"),
            F.array_join(
                F.flatten(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("start_off", "seg"))
                        ),
                        lambda s: s["seg"],
                    )
                ),
                " ",
            ).alias("text"),
        )
        .withColumn("full", F.col("n_tokens") == L)
        .select("seq_id", "n_docs", "n_tokens", "full", "text")
    )


def contamination_pairs(corpus: DataFrame, benchmark: DataFrame,
                        corpus_key: str = "doc_id",
                        bench_key: str = "bench_id",
                        corpus_text: str = "text", bench_text: str = "text",
                        ngram_k: int = 8, min_shared: int = 3) -> DataFrame:
    """Benchmark decontamination: (corpus doc, benchmark doc) pairs
    sharing at least ``min_shared`` distinct k-word shingles — the
    standard n-gram-overlap contamination check run before training so
    eval documents leaked into the crawl are dropped from the corpus.

    Scale story: the benchmark side is small by nature (eval suites are
    10^3–10^5 docs), so its exploded shingle set is BROADCAST; the
    corpus side streams map-side through the broadcast hash join —
    the 100-TB corpus is never shuffled.  The only exchange is the
    partially-aggregated groupBy on (corpus_key, bench_key), which is
    proportional to the number of MATCHED grams, not to corpus size.
    ``word_shingles`` is distinct per document, so ``count(*)`` of
    joined rows is exactly the distinct-shared-gram count."""
    cg = corpus.select(
        F.col(corpus_key),
        F.explode(word_shingles(corpus_text, ngram_k)).alias("gram"),
    )
    bg = benchmark.select(
        F.col(bench_key),
        F.explode(word_shingles(bench_text, ngram_k)).alias("gram"),
    )
    return (
        cg.join(F.broadcast(bg), "gram")
        .groupBy(corpus_key, bench_key)
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def length_buckets(df: DataFrame, boundaries: tuple[int, ...],
                   batch_size: int, key_col: str = "doc_id",
                   text_col: str = "text", n_buckets: int = 64,
                   salt: str = "") -> DataFrame:
    """Length-bucketed inference batching — the serving-side
    counterpart of :func:`pack_sequences`: group documents into
    fixed-size batches of similar token length so per-batch padding
    (batch is padded to its bucket length) is bounded by the bucket
    granularity instead of the corpus maximum.

    ``boundaries`` (ascending) define the padded lengths: a document
    lands in the smallest boundary >= its token count; longer
    documents clamp into the last bucket (they would be truncated to
    it downstream — ``pad_tokens`` is 0 there, floor-clamped).

    Batch assignment is deterministic: within a bucket, documents
    order by (60-bit salted hash, key) and fill batches of
    ``batch_size`` in that order.  Returns ``(key, n_tokens,
    bucket_len, batch_idx, pos_in_batch, pad_tokens)``.

    Scale shape: same two-pass distributed prefix machinery as
    token_budget_mix — per-(bucket_len, hash-bucket) COUNT partials,
    offsets via a window over the tiny partials frame broadcast back,
    row_number within hash-buckets; the only full-data exchange is
    ONE hash partition by (bucket_len, hash-bucket), never a whole
    length-bucket through one window task.  The SQL-oracle twin is
    the naive single-window row_number, equal because hash-bucket
    order leads the global order."""
    if list(boundaries) != sorted(set(boundaries)) or not boundaries:
        raise ValueError("boundaries must be ascending and non-empty")
    blen = F.lit(int(boundaries[-1]))
    for b in sorted(boundaries, reverse=True):
        blen = F.when(token_count(text_col) <= b, F.lit(int(b))) \
            .otherwise(blen)
    base = (
        df.select(
            F.col(key_col),
            token_count(text_col).cast("long").alias("n_tokens"),
            blen.cast("long").alias("bucket_len"),
        )
        .withColumn("h", _md5_60(key_col, salt))
        .withColumn("hb", F.pmod(F.col("h"), F.lit(n_buckets)))
    )
    partials = base.groupBy("bucket_len", "hb").agg(
        F.count("*").alias("n"))
    w_off = (
        Window.partitionBy("bucket_len").orderBy("hb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = partials.select(
        "bucket_len", "hb",
        F.coalesce(F.sum("n").over(w_off), F.lit(0)).alias("offset"),
    )
    w_rn = Window.partitionBy("bucket_len", "hb").orderBy("h", key_col)
    idx = F.col("offset") + F.row_number().over(w_rn) - 1
    return (
        base.join(F.broadcast(offsets), ["bucket_len", "hb"])
        .withColumn("_idx", idx)
        .select(
            key_col, "n_tokens", "bucket_len",
            (F.col("_idx") / batch_size).cast("long").alias("batch_idx"),
            F.pmod(F.col("_idx"), F.lit(batch_size)).cast("int")
            .alias("pos_in_batch"),
            F.greatest(F.col("bucket_len") - F.col("n_tokens"),
                       F.lit(0)).alias("pad_tokens"),
        )
    )


def weighted_sample(df: DataFrame, k: int, weight_col: str,
                    key_col: str = "doc_id", salt: str = "") -> DataFrame:
    """Weighted sampling without replacement, Efraimidis-Spirakis A-ES
    (IPL 2006): each row draws u in (0,1] and gets key ln(u)/w; the k
    rows with the LARGEST keys are a weighted sample without
    replacement (equivalent to the paper's top-k by u^(1/w) — ln is
    monotone, and the log form keeps the key numerically meaningful
    for large weights where u^(1/w) collapses onto 1.0).

    The uniform draw is NOT an RNG: u = (hash60(key)+1) / 2^60, the
    same salted-md5 construction as :func:`stratified_sample`, so the
    selected set is a pure function of (keys, weights, salt) —
    identical across runs, retries, partitionings, and engines (the
    DuckDB oracle re-derives it closed-form).

    Rows with weight <= 0 or NULL are excluded (the A-ES key is
    undefined there); callers wanting them must pre-clamp.

    Scale shape: narrow per-row expressions then a global top-k, which
    Spark executes as TakeOrderedAndProject — per-partition heap of k
    rows, one driver-side merge of (n_partitions x k) skinny rows;
    the corpus itself is never sorted and never shuffled."""
    u = ((_md5_60(key_col, salt).cast("double") + F.lit(1.0))
         / F.lit(float(HASH_SPACE)))
    es = F.log(u) / F.col(weight_col).cast("double")
    return (
        df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("es_key", F.round(es, 9))
        .orderBy(es.desc(), F.col(key_col).asc())
        .limit(k)
    )


def epoch_shuffle(df: DataFrame, seed: str, key_col: str = "doc_id",
                  n_buckets: int = 256) -> DataFrame:
    """Deterministic global shuffle order for one training epoch:
    every row gets ``epoch_pos`` — its rank in the permutation induced
    by sorting on (hash60(seed|key), key).  Changing ``seed`` yields a
    fresh, reproducible permutation per epoch; a retry or a different
    partitioning yields the identical one (df.orderBy(rand()) does
    neither).

    Scale shape: the naive form (row_number over a global ORDER BY) is
    one task; this is the same two-pass distributed prefix sum as
    token_budget_mix/length_buckets, with one twist — the hash-bucket
    is the TOP bits of the sort key (a range partition), not a modulo,
    so (bucket, hash, key) order IS (hash, key) order and per-bucket
    ranks + broadcast bucket offsets compose to the exact global rank.
    md5 output is uniform, so top-bit buckets are as balanced as
    modulo buckets.  Parallelism is ``n_buckets`` regardless of corpus
    size; the offsets frame is ``n_buckets`` rows."""
    if n_buckets & (n_buckets - 1) or n_buckets <= 0:
        raise ValueError("n_buckets must be a power of two")
    shift = 60 - (n_buckets.bit_length() - 1)
    base = (
        df.withColumn("_h", _md5_60(key_col, seed))
        .withColumn("_hb", F.shiftright(F.col("_h"), shift))
    )
    partials = base.groupBy("_hb").agg(F.count("*").alias("n"))
    w_off = (
        Window.orderBy("_hb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = partials.select(
        "_hb", F.coalesce(F.sum("n").over(w_off), F.lit(0)).alias("_off"))
    w_rn = Window.partitionBy("_hb").orderBy("_h", key_col)
    return (
        base.join(F.broadcast(offsets), "_hb")
        .withColumn(
            "epoch_pos",
            (F.col("_off") + F.row_number().over(w_rn) - 1).cast("long"))
        .drop("_h", "_hb", "_off")
    )


def shard_plan(df: DataFrame, shard_bytes: int, key_col: str = "doc_id",
               text_col: str = "text", n_buckets: int = 64,
               salt: str = "") -> DataFrame:
    """WebDataset-style output shard planning: assign every document to
    a fixed-capacity output shard (the ~N-MB tar/parquet files a
    training loader streams) WITHOUT splitting documents, in
    deterministic hash order.  Returns, per document::

        (key, n_bytes, start_off, shard_id, shard_off)

    where ``start_off`` is the total bytes of documents before this one
    in the global order, ``shard_id = start_off div shard_bytes`` and
    ``shard_off = start_off mod shard_bytes``.  A document whose bytes
    straddle a budget boundary stays whole in the shard its FIRST byte
    lands in, so a shard can overrun its budget by at most one
    document — the standard no-split relaxation of first-fit that keeps
    the assignment a pure prefix-sum (greedy first-fit with reset-at-
    boundary is inherently sequential; this form is embarrassingly
    parallel and equals it whenever documents are small relative to the
    budget).

    Same two-pass distributed prefix sum as ``pack_sequences`` (which
    cuts a TOKEN stream at fixed length, splitting documents — this is
    its no-split BYTE-stream sibling): per-bucket partials, offsets via
    a window over the tiny partials frame, broadcast back, cumsum
    within buckets.  Global order is (bucket, h, key), a pure function
    of the key: the shard layout is identical across runs, retries,
    partitionings, and cluster sizes.  ONE full-data exchange (the
    bucket hash partition); no task ever sees more than its bucket."""
    h = _md5_60(key_col, salt)
    base = (
        df.select(
            F.col(key_col),
            F.octet_length(text_col).cast("long").alias("n_bytes"),
        )
        .withColumn("h", h)
        .withColumn("bucket", F.pmod(F.col("h"), F.lit(n_buckets)))
    )
    partials = base.groupBy("bucket").agg(
        F.sum("n_bytes").alias("bucket_bytes")
    )
    w_off = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = partials.select(
        "bucket",
        F.coalesce(F.sum("bucket_bytes").over(w_off), F.lit(0))
        .alias("offset"),
    )
    w_run = (
        Window.partitionBy("bucket")
        .orderBy("h", key_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = F.col("offset") + F.sum("n_bytes").over(w_run)
    sb = int(shard_bytes)
    if sb <= 0:
        raise ValueError(f"shard_bytes must be positive, got {shard_bytes}")
    return (
        base.join(F.broadcast(offsets), "bucket")
        .withColumn("start_off", (cum - F.col("n_bytes")).cast("long"))
        .withColumn("shard_id", F.expr(f"start_off div {sb}"))
        .withColumn(
            "shard_off",
            (F.col("start_off") - F.col("shard_id") * sb).cast("long"))
        .select(key_col, "n_bytes", "start_off", "shard_id", "shard_off")
    )


def shard_manifest(df: DataFrame, shard_bytes: int,
                   key_col: str = "doc_id", text_col: str = "text",
                   n_buckets: int = 64, salt: str = "",
                   sep: str = "") -> DataFrame:
    """The writer half of :func:`shard_plan` (as packed_sequences is
    to pack_sequences): materialize each planned shard's CONTENT
    DIGEST and totals -> ``(shard_id, n_docs, n_bytes,
    content_digest)``, where the digest is md5 over the shard's
    document texts concatenated in plan order (``start_off``).

    This is what a distributed shard writer publishes as its output
    manifest: a reader (or a re-run) can verify every emitted shard
    byte-for-byte against the plan without trusting the writer.  The
    concat group is ONE shard — bounded by ``shard_bytes`` plus one
    straddling document BY CONSTRUCTION — so the collect_list is
    capacity-bounded, never a skew hazard (same argument as
    stitch_series' pagination-depth bound)."""
    plan = shard_plan(df, shard_bytes, key_col=key_col,
                      text_col=text_col, n_buckets=n_buckets, salt=salt)
    joined = plan.join(df.select(key_col, text_col), key_col)
    ordered = F.transform(
        F.array_sort(F.collect_list(
            F.struct(F.col("start_off"), F.col(text_col).alias("t")))),
        lambda s: s["t"],
    )
    return (
        joined.groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_bytes").alias("n_bytes"),
            F.md5(F.encode(F.array_join(ordered, sep), "utf-8"))
            .alias("content_digest"),
        )
    )


def fim_transform(df: DataFrame, key_col: str = "doc_id",
                  text_col: str = "text",
                  sentinel_prefix: str = "<fim_prefix>",
                  sentinel_suffix: str = "<fim_suffix>",
                  sentinel_middle: str = "<fim_middle>") -> DataFrame:
    """Fill-in-the-middle transformation (Bavarian et al. 2022; the
    StarCoder/DeepSeek-Coder code-pretraining recipe): split each
    document into (prefix, middle, suffix) at the deterministic
    character thirds ``p1 = floor(len/3)``, ``p2 = floor(2*len/3)``
    and emit the sentinel-joined training text — PSM order
    (prefix, suffix, middle) for even hash parity, SPM
    (suffix, prefix, middle) for odd, the 50/50 mix the papers use.

    Parity comes from the md5-derived 60-bit key hash (deterministic
    across retries and partitionings, reproducible in SQL — same
    contract as stratified_sample), NOT ``rand()``.  Pure per-row JVM
    string expressions: zero shuffle, pipelined with the scan, safe at
    any corpus size.  Documents shorter than 3 chars pass through
    unsplit (mode 'raw') — a FIM split of a 2-char doc is all
    sentinels and no signal."""
    c = F.col(text_col)
    ln = F.length(c)
    p1 = F.floor(ln / 3).cast("int")
    p2 = F.floor(ln * 2 / 3).cast("int")
    prefix = F.substring(c, 1, p1)
    middle = c.substr(p1 + 1, p2 - p1)
    suffix = c.substr(p2 + 1, ln - p2)
    spm = _md5_60(key_col, "fim") % 2 == 1
    psm_text = F.concat(F.lit(sentinel_prefix), prefix,
                        F.lit(sentinel_suffix), suffix,
                        F.lit(sentinel_middle), middle)
    spm_text = F.concat(F.lit(sentinel_suffix), suffix,
                        F.lit(sentinel_prefix), prefix,
                        F.lit(sentinel_middle), middle)
    mode = (F.when(ln < 3, "raw")
            .when(spm, "spm").otherwise("psm"))
    return df.select(
        key_col,
        mode.alias("fim_mode"),
        p1.alias("prefix_len"),
        (p2 - p1).cast("int").alias("middle_len"),
        (ln - p2).cast("int").alias("suffix_len"),
        F.when(ln < 3, c).when(spm, spm_text).otherwise(psm_text)
        .alias("fim_text"),
    )


def span_corrupt(df: DataFrame, key_col: str = "doc_id",
                 text_col: str = "text", period: int = 20,
                 span_start: int = 7, span_len: int = 3) -> DataFrame:
    """T5-style span corruption (Raffel et al. 2020 §3.1.4): mask
    deterministic token spans and emit the (input, target) pair —
    input has each masked run replaced by one ``<extra_id_k>``
    sentinel, target lists sentinel+span in order and closes with a
    final sentinel.  Token i is masked iff
    ``span_start <= i % period < span_start + span_len`` (defaults:
    3 of every 20 tokens = the paper's 15% noise density with mean
    span 3) — deterministic positions instead of the paper's random
    draw, so the same doc always yields the same pair (reproducible
    across retries/partitionings, SQL-oracle-able; a production run
    wanting fresh noise per epoch salts ``span_start`` per epoch).

    Pure per-row JVM expressions (split + indexed transform + filter
    + join): zero shuffle, zero Python, pipelined with the scan."""
    from ocr_spark.functions.text import tokens

    toks = tokens(text_col)
    n = F.size(toks)
    idx = F.when(n == 0, F.array().cast("array<int>")).otherwise(
        F.sequence(F.lit(0), n - 1))
    lo, hi = span_start, span_start + span_len

    def run_id(i):
        return F.floor(i / period).cast("int")

    def sentinel(k):
        return F.concat(F.lit("<extra_id_"), k.cast("string"), F.lit(">"))

    def masked(i):
        return (i % period >= lo) & (i % period < hi)

    tok_at = lambda i: F.element_at(toks, i + 1)
    inp_pieces = F.transform(idx, lambda i: (
        F.when(~masked(i), tok_at(i))
        .when(i % period == lo, sentinel(run_id(i)))
        .otherwise(F.lit(""))))
    tgt_pieces = F.transform(idx, lambda i: (
        F.when(masked(i) & (i % period == lo),
               F.concat(sentinel(run_id(i)), F.lit(" "), tok_at(i)))
        .when(masked(i), tok_at(i))
        .otherwise(F.lit(""))))
    join = lambda arr: F.array_join(
        F.filter(arr, lambda p: F.length(p) > 0), " ")
    n_spans = F.when(n > lo, F.floor((n - lo - 1) / period) + 1) \
        .otherwise(F.lit(0)).cast("int")
    target = F.when(n_spans == 0, F.lit("")).otherwise(
        F.concat(join(tgt_pieces), F.lit(" "), sentinel(n_spans)))
    return df.select(
        key_col,
        n.cast("int").alias("n_tokens"),
        n_spans.alias("n_spans"),
        join(inp_pieces).alias("input_text"),
        target.alias("target_text"),
    )


def cloze_qa(df: DataFrame, id_col: str = "doc_id",
             text_col: str = "text", min_tokens: int = 5) -> DataFrame:
    """Cloze question synthesis — the deterministic reading-
    comprehension pairs (question with a blank, answer term) that
    instruction-tuning corpora bootstrap from raw text.  Per sentence
    (>= ``min_tokens`` whitespace tokens, case-folded): the answer is
    the token with the LOWEST corpus document frequency (rarest =
    most informative blank; ties to the lexicographically smallest
    token — a (df, term) struct-min, fully integer/string, no float
    scoring to drift cross-engine), and the question is the sentence
    with every whole-token occurrence of the answer replaced by
    '____' — rebuilt from the token array (concat_ws over a
    transform), never a regex substitution that would need
    metacharacter escaping.

    Tokens that sentence segmentation splits differently than the
    full-text tokenization (an unspaced 'a.b' straddling a boundary)
    are absent from the df table and silently ineligible as answers;
    a sentence whose every token is ineligible emits nothing.

    Plan: df table = one explode + hash aggregate over distinct
    per-doc tokens; sentence tokens join it on term (the stopword-df
    row is one row per term — standard AQE-handled skew), argmin is a
    struct-min aggregate keyed (doc, sent), one join back to the
    sentence row.  Text crosses the shuffle only as single sentences."""
    from ocr_spark.functions.text import sentences, tokens

    low = df.select(id_col, F.lower(F.col(text_col)).alias("_t"))
    sent = (low.select(
        id_col,
        F.posexplode(sentences(F.col("_t"))).alias("sent_idx", "s"))
        .withColumn("toks", tokens(F.col("s")))
        .filter(F.size("toks") >= min_tokens))
    tok = sent.select(
        id_col, "sent_idx",
        F.explode(F.array_distinct("toks")).alias("term"))
    dfreq = (low.select(
        F.col(id_col),
        F.explode(F.array_distinct(tokens(F.col("_t"))))
         .alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("df")))
    best = (tok.join(dfreq, "term")
            .groupBy(id_col, "sent_idx")
            .agg(F.min(F.struct("df", "term")).alias("b")))
    ans = F.col("b").getField("term")
    return (sent.join(best, [id_col, "sent_idx"])
            .select(
                id_col, "sent_idx",
                F.concat_ws(
                    " ",
                    F.transform(
                        F.col("toks"),
                        lambda t: F.when(t == ans, F.lit("____"))
                                   .otherwise(t))).alias("question"),
                ans.alias("answer"),
                F.col("b").getField("df").alias("answer_df")))


def section_qa(df: DataFrame, id_col: str = "doc_id",
               text_col: str = "text",
               min_body_tokens: int = 5) -> DataFrame:
    """Heading->body instruction-pair mining over markdown-shaped
    text — the practical QA-synthesis move for documents that HAVE
    structure (how-to pages, docs sites, wikis): each heading becomes
    the question (its ``#`` prefix stripped), its section body the
    answer.  Pre-heading preambles (NULL heading) and bodies under
    ``min_body_tokens`` are dropped — a heading with no substantive
    body is navigation, not an answer.

    Composition of :func:`ocr_spark.operators.chunk.split_sections`
    (same per-document window bound); the pair assembly adds only
    per-row JVM expressions."""
    from ocr_spark.operators.chunk import split_sections

    s = split_sections(df, key_col=id_col, text_col=text_col)
    return (s.filter(F.col("heading").isNotNull()
                     & (F.col("n_tokens") >= min_body_tokens))
            .select(
                id_col, "section_idx",
                F.trim(F.regexp_replace("heading", r"^#{1,6} ", ""))
                 .alias("question"),
                F.col("body").alias("answer"),
                F.col("n_tokens").alias("answer_tokens")))


def skipgram_pairs(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", window: int = 2,
                   n_neg: int = 2, salt: str = "sgns",
                   n_range_buckets: int = 64,
                   broadcast_vocab: bool = True) -> DataFrame:
    """Skip-gram-with-negative-sampling training pairs (word2vec SGNS,
    Mikolov et al. 2013) as a deterministic distributed batch: for
    every (center, context) pair inside a ``window``-token context,
    emit ``n_neg`` negative words drawn from the corpus unigram
    distribution.  This is the embedding-training data an LLM-corpus
    pipeline generates from its cleaned text — the step after curation
    and before any trainer runs.

    Determinism is the whole design (the same rule as
    :func:`stratified_sample`): negatives are NOT an RNG draw but the
    unigram inverse-CDF evaluated at a 60-bit hash of
    (doc, position, context-position, slot) — a pure function of the
    data, identical across retries, partitionings, engines, and
    re-derivable closed-form by a SQL oracle.  (The standard
    freq^0.75 tilt is deliberately NOT applied: a float pow on both
    engines lands on floor-boundary ties; raw counts keep every
    cumulative boundary an exact integer.  A production tilt would
    precompute integer milli-weights once, driver-side, like
    ``sample_thresholds``.)

    Plan, in 100-TB shapes:
    1. pairs: per-row JVM higher-order functions over the token array
       (no shuffle, no Python);
    2. vocab CDF: one explode->hash aggregate, then cumulative ranges
       [cum_start, cum_end) per term via the two-pass prefix sum —
       ordered range-buckets = first token character (a prefix of the
       sort key, so per-bucket windows + broadcast offsets compose to
       the exact global cumsum), per-bucket totals collected (tiny);
    3. negative assignment: target = hash % total_tokens, matched to
       its CDF interval by an equi-join on fixed-width range buckets
       of the cumulative space (each term explodes to the buckets its
       interval spans — bounded by V + n_range_buckets rows), then an
       interval-containment filter.  Never a theta-join, never a
       per-row lookup loop.  ``broadcast_vocab=False`` shuffles on the
       range bucket instead (then n_range_buckets IS the parallelism —
       size it >= shuffle partitions).

    Output: one row per (pair, negative slot): (id, pos, cpos, center,
    context, neg_slot, neg_tok)."""
    tl = (df.select(F.col(id_col).alias("_did"),
                    tokens(text_col).alias("_t"))
          .where(F.size("_t") >= 2))
    t = F.col("_t")
    win = window
    pr_arr = F.flatten(F.transform(
        F.sequence(F.lit(1), F.size(t)),
        lambda i: F.filter(
            F.transform(
                F.sequence(F.greatest(F.lit(1), i - win),
                           F.least(F.size(t), i + win)),
                lambda j: F.struct(i.cast("int").alias("pos"),
                                   j.cast("int").alias("cpos"))),
            lambda s: s.cpos != s.pos)))
    pairs = (tl.select("_did", "_t", F.explode(pr_arr).alias("p"))
             .select("_did",
                     F.col("p.pos").alias("pos"),
                     F.col("p.cpos").alias("cpos"),
                     F.expr("element_at(_t, p.pos)").alias("center"),
                     F.expr("element_at(_t, p.cpos)").alias("context")))
    # unigram CDF over the SAME input slice, ordered by token asc
    vocab = (tl.select(F.explode("_t").alias("tok"))
             .groupBy("tok").agg(F.count("*").alias("c"))
             .withColumn("vb", F.substring("tok", 1, 1)))
    vocab = vocab.localCheckpoint(eager=True)
    btot = sorted(vocab.groupBy("vb").agg(F.sum("c").alias("bc")).collect(),
                  key=lambda r: r["vb"])
    offs, run = [], 0
    for r in btot:
        offs.append((r["vb"], run))
        run += r["bc"]
    s_tot = run
    spark = df.sparkSession
    off = F.broadcast(spark.createDataFrame(
        offs or [("", 0)], "vb string, off long"))
    wv = Window.partitionBy("vb").orderBy("tok")
    cum = (vocab.join(off, "vb")
           .select("tok",
                   (F.sum("c").over(wv) + F.col("off") - F.col("c"))
                   .alias("cum_start"),
                   (F.sum("c").over(wv) + F.col("off")).alias("cum_end")))
    bwidth = max(1, (s_tot + n_range_buckets - 1) // n_range_buckets)
    cumx = cum.withColumn("rb", F.explode(F.sequence(
        F.floor(F.col("cum_start") / bwidth),
        F.floor((F.col("cum_end") - 1) / bwidth))))
    if broadcast_vocab:
        cumx = F.broadcast(cumx)
    slots = spark.range(1, n_neg + 1).select(
        F.col("id").cast("int").alias("neg_slot"))
    negk = (pairs.crossJoin(F.broadcast(slots))
            .withColumn("_sgkey", F.concat_ws(
                "|", F.col("_did").cast("string"),
                F.col("pos").cast("string"), F.col("cpos").cast("string"),
                F.col("neg_slot").cast("string")))
            .withColumn("target", _md5_60("_sgkey", salt) % s_tot)
            .withColumn("rb", F.floor(F.col("target") / bwidth)))
    return (negk.join(cumx, "rb")
            .where((F.col("target") >= F.col("cum_start"))
                   & (F.col("target") < F.col("cum_end")))
            .select(F.col("_did").alias(id_col), "pos", "cpos", "center",
                    "context", "neg_slot", F.col("tok").alias("neg_tok")))
