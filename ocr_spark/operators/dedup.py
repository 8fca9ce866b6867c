"""Deduplication operators for web-scale training-data pipelines.

Six families, each with a scale story:

* **exact**      — md5(text) hash-groupBy; one shuffle of (digest, id).
* **substring (ExactSubstr)** — duplicated token-k-gram span removal
  (Lee et al. 2022, arXiv:2107.06499 §4.1): grams shuffle as a skinny
  (hash, id, pos) projection, covered positions fold back per doc.
* **MinHash+LSH** — shingle -> minhash signature -> banded bucket-join;
  candidate pairs come from an equi-join on (band, signature), never a
  cross join, so cost is bounded by bucket collision counts.
* **SimHash**    — 64-bit sign-aggregated token hashes; near-dup pairs
  by pigeonhole blocking with the chunk count DERIVED from the
  threshold (max_hamming+1 chunks: <=h differing bits cannot touch all
  h+1 disjoint chunks, so a true pair always shares one), again an
  equi-join.
* **n-gram Jaccard** — exploded shingle equi-join with per-pair
  intersection counts; exact, for verification of LSH candidates.
* **embedding cosine** — see operators/similarity.py (shared kernels).

All pure DataFrame ops (xxhash64 / md5 / array lambdas) — no Python in
any hot path.  MinHash and SimHash each carry a hash_mode duality: an
md5-derived integer family the DuckDB oracle reproduces bit-for-bit
(``md5_affine`` / ``md5_64`` — the driver-oracled modes) and a
JVM-native xxhash64 family for pure production, property-tested for
recall parity against the oracled mode.  MinHash additionally keeps
the legacy per-index md5-string family (``md5``) — measured 2x slower
than md5_affine at sf0.1 (8.0s vs 4.0s; xxhash64 3.5s).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ocr_spark.functions.text import word_shingles

__all__ = [
    "exact_dedup", "line_dedup", "drop_duplicated_spans",
    "winnow_pairs",
    "minhash_signature",
    "minhash_affine_coeffs", "lsh_candidate_pairs", "lsh_cross_pairs",
    "lsh_bucket_overflow", "lsh_jaccard_pairs", "edit_verify",
    "ngram_jaccard_pairs",
    "ngram_containment_pairs",
    "simhash",
    "simhash_near_dup_pairs", "simhash_bucket_overflow",
    "connected_components", "near_dup_clusters", "cluster_representatives",
    "bloom_build", "bloom_member", "bloom_line_dedup", "cdc_chunks",
    "record_linkage",
]

# Mersenne prime 2^31-1: the affine minhash family works mod P, so
# a*b stays < 2^62 — inside int64 on every engine (Spark AND the
# DuckDB oracle), no overflow promotion anywhere.
MINHASH_P = (1 << 31) - 1


def minhash_affine_coeffs(n_hashes: int, seed: int = 11) -> list[tuple[int, int]]:
    """Deterministic (a_i, c_i) pairs for the affine minhash family
    h_i(b) = (a_i*b + c_i) mod P over the base shingle hash b — the
    classic one-strong-hash + pairwise-independent-transforms MinHash
    construction (Broder; Carter-Wegman universal hashing).  Plain
    integer literals, so any SQL oracle re-derives identical
    signatures by interpolating them."""
    import random

    rng = random.Random(seed)
    return [(rng.randrange(1, MINHASH_P), rng.randrange(0, MINHASH_P))
            for _ in range(n_hashes)]


def exact_dedup(df: DataFrame, text_col: str = "text",
                key_col: str = "doc_id", keys_only: bool = False) -> DataFrame:
    """Keep the lowest-key row per exact text digest.

    ``keys_only=True`` returns just ``(key, dup_count)`` — the 100-TB
    posture: the only data that ever shuffles is the skinny
    (digest, key) projection; callers semi-join the winner keys against
    the corpus when (and only when) they need the payload back.  The
    default attaches all of ``df``'s columns via a join-back, which at
    scale re-shuffles the full text column — opt into that cost
    knowingly."""
    digest = F.md5(F.encode(F.col(text_col), "utf-8")).alias("digest")
    groups = (
        df.select(digest, F.col(key_col))
        .groupBy("digest")
        .agg(F.min(key_col).alias(key_col), F.count("*").alias("dup_count"))
    )
    winners = groups.select(key_col, "dup_count")
    if keys_only:
        return winners
    return df.join(winners, on=key_col, how="inner")


def line_dedup(df: DataFrame, key_col: str = "doc_id",
               text_col: str = "text", min_dup_docs: int = 2,
               min_line_chars: int = 10,
               broadcast_banned: bool = True) -> DataFrame:
    """Line-level dedup (CCNet / RefinedWeb style): drop every line
    whose trimmed form appears in >= ``min_dup_docs`` DISTINCT
    documents — the standard pass that strips cookie banners, nav
    text, and share buttons that survive block-level extraction.
    Lines shorter than ``min_line_chars`` after trimming are never
    banned (short strings collide by chance, not by boilerplate).

    Returns one row per input document (docs whose every line is
    banned come back with text '' — a document is filtered by a later
    quality pass, never silently lost):
    ``(key, text, n_lines_kept, n_lines_dropped)``, line order
    preserved.

    Scale shape: the only full-width shuffle is the final groupBy(key)
    reassembly of KEPT line text; frequency counting shuffles just the
    skinny (trimmed-line, key) projection, and the banned-line table —
    boilerplate by definition, orders of magnitude smaller than the
    corpus — is broadcast into the probe join (set
    ``broadcast_banned=False`` to let the planner shuffle-join if a
    pathological corpus makes it large)."""
    lines = df.select(
        F.col(key_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "ln"),
    ).withColumn("nrm", F.trim(F.col("ln")))
    banned = (
        lines.filter(F.length("nrm") >= min_line_chars)
        .groupBy("nrm")
        .agg(F.countDistinct(key_col).alias("n_docs"))
        .filter(F.col("n_docs") >= min_dup_docs)
        .select("nrm", F.lit(True).alias("_banned"))
    )
    if broadcast_banned:
        banned = F.broadcast(banned)
    flagged = lines.join(banned, on="nrm", how="left")
    keep = F.col("_banned").isNull()
    kept_struct = F.when(keep, F.struct(F.col("pos"), F.col("ln")))
    return (
        flagged.groupBy(key_col)
        .agg(
            F.array_join(
                F.transform(
                    # collect_list skips the NULLs the when() leaves for
                    # banned lines; array_sort restores document order
                    F.array_sort(F.collect_list(kept_struct)),
                    lambda s: s["ln"],
                ),
                "\n",
            ).alias("text"),
            F.sum(F.when(keep, 1).otherwise(0)).alias("n_lines_kept"),
            F.sum(F.when(keep, 0).otherwise(1)).alias("n_lines_dropped"),
        )
    )


def drop_duplicated_spans(df: DataFrame, key_col: str = "doc_id",
                          text_col: str = "text", k: int = 8,
                          min_count: int = 2,
                          gram_key: str = "xxhash64",
                          broadcast_dups: bool = False) -> DataFrame:
    """Sub-document dedup (ExactSubstr style, Lee et al. 2022,
    arXiv:2107.06499 §4.1): remove every token that is covered by a
    whitespace-token k-gram occurring >= ``min_count`` times in the
    WHOLE corpus (all occurrences count, including repeats inside one
    document — the paper's semantics).  This is the pass that strips
    templated passages, license boilerplate, and quoted chain text
    that document- and line-level dedup both miss.

    The paper builds a corpus-wide suffix array, which does not
    distribute; the standard scalable form is positional k-gram cover:
    a token survives iff no duplicated k-gram window covers it.
    Granularity is tokens (k consecutive), not arbitrary byte spans —
    duplicated runs >= k tokens are removed in full, runs < k tokens
    are kept (conservative direction; documented, not silent).

    Returns one row per input document, token order preserved:
    ``(key, text, n_tokens_kept, n_tokens_dropped)``.  Documents whose
    every token is covered come back with text ``''`` (filtered by a
    later quality pass, never silently lost — same contract as
    line_dedup).

    Scale shape: the full text column is NEVER exploded or shuffled —
    grams travel as the skinny ``(gram_key, key, start_pos)``
    projection (~16 bytes/row under the default ``gram_key='xxhash64'``
    instead of a k-token string; collision odds 2^-64 per gram pair,
    ``'raw'`` mode keeps exact strings for tests/oracles), the
    frequency count is a map-side-combinable groupBy on that key, the
    duplicated-gram set probes back via equi-join (AQE skew-join
    handles hot grams; ``broadcast_dups=True`` for corpora where the
    dup set is provably small — unlike line_dedup's banned set it is
    NOT small in general, so the default is the shuffle join), and
    covered positions fold to one int array per doc before the single
    full-width left join back onto the untouched (key, tokens) row.
    """
    if gram_key not in ("xxhash64", "raw"):
        raise ValueError(f"unknown gram_key {gram_key!r}")
    toks = df.select(
        F.col(key_col),
        # NULL text behaves as empty (split of NULL would make size()
        # -1 and sequence(1, -1) DESCEND) — one token '' that can
        # never form a k-gram for k >= 2, comes back as text ''
        F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))),
                r"\s+").alias("_t"),
    )
    n = F.size("_t")
    # sequence(1, x) is DESCENDING for x < 1 — guard short docs to an
    # empty start list (explode then emits zero gram rows for them)
    starts = F.when(n >= k, F.sequence(F.lit(1), n - k + 1)) \
        .otherwise(F.array().cast("array<int>"))
    gram_str = F.concat_ws(
        " ", F.transform(F.sequence(F.col("_i"), F.col("_i") + (k - 1)),
                         lambda j: F.element_at("_t", j)))
    grams = (
        toks.select(F.col(key_col), F.col("_t"), F.explode(starts).alias("_i"))
        .select(
            F.col(key_col), F.col("_i"),
            (F.xxhash64(gram_str) if gram_key == "xxhash64"
             else gram_str).alias("_gk"),
        )
    )
    dups = (
        grams.groupBy("_gk").count()
        .filter(F.col("count") >= min_count)
        .select("_gk")
    )
    if broadcast_dups:
        dups = F.broadcast(dups)
    covered = (
        grams.join(dups, "_gk")
        .select(F.col(key_col),
                F.explode(F.sequence(F.col("_i"),
                                     F.col("_i") + (k - 1))).alias("_j"))
        .groupBy(key_col)
        .agg(F.collect_set("_j").alias("_cov"))
    )
    cov = F.coalesce(F.col("_cov"), F.array().cast("array<int>"))
    # array_except keeps first-arg order and hashes the second arg —
    # O(n_tokens + n_covered) per doc, not a nested scan
    kept_pos = F.array_except(F.sequence(F.lit(1), F.size("_t")), cov)
    return (
        toks.join(covered, key_col, "left")
        .select(
            F.col(key_col),
            F.array_join(
                F.transform(kept_pos, lambda j: F.element_at("_t", j)),
                " ").alias("text"),
            F.size(kept_pos).cast("long").alias("n_tokens_kept"),
            (F.size("_t") - F.size(kept_pos)).cast("long")
            .alias("n_tokens_dropped"),
        )
    )


def minhash_signature(col: str | Column, n_hashes: int = 16,
                      shingle_k: int = 3,
                      hash_mode: str = "md5") -> Column:
    """MinHash signature; empty docs get an empty signature.

    ``hash_mode`` picks the hash family (same duality as ``simhash``):

    * ``'md5'`` — legacy array<string>: element i is min over shingles
      of md5(i || '|' || shingle).  Valid uniform family, fully DuckDB-
      reproducible — but costs n_hashes md5 digests PER SHINGLE, the #1
      bench cost of round 3 (15.4s median on minhash_lsh_pairs).
    * ``'md5_affine'`` — array<bigint>: ONE md5-derived 60-bit base
      hash per shingle (the ``simhash md5_64`` construction), then
      element i = min over shingles of (a_i*b + c_i) mod P with the
      literal coefficients of :func:`minhash_affine_coeffs` — the
      classic one-strong-hash universal-hashing MinHash.  16x less
      hashing, still exactly re-derivable by a SQL oracle (the driver
      default).
    * ``'xxhash64'`` — array<bigint>: base hash is JVM-native
      xxhash64, same affine transforms.  The pure-production mode
      (fastest); not SQL-reproducible, so it is property-tested for
      candidate-recall parity against md5_affine instead.

    Shape: ONE aggregate pass over the shingle array, folding an
    elementwise ``least`` across each shingle's n_hashes values.  The
    naive ``transform(sequence(0,n), i -> array_min(transform(sh, ...)))``
    form re-evaluates the whole shingle expression (and its
    tokenization) once per hash index — quadratic re-compute that
    measured 200+ seconds at 10k docs vs seconds for this form.  For
    the affine modes the base hash is materialized into an array
    BEFORE the fold, so it too is computed once per shingle, not once
    per (shingle, hash index) — that hoist is the entire speedup."""
    sh = word_shingles(col, shingle_k)
    if hash_mode == "md5":
        # 'z' > any md5 hex char, so 'zz' is +infinity for the string-min fold
        init = F.array_repeat(F.lit("zz"), n_hashes)
        idx = F.sequence(F.lit(0), F.lit(n_hashes - 1))
        folded = F.aggregate(
            sh,
            init,
            lambda acc, s: F.zip_with(
                acc,
                F.transform(
                    idx,
                    lambda i: F.md5(
                        F.encode(F.concat_ws("|", i.cast("string"), s),
                                 "utf-8")
                    ),
                ),
                lambda a, b: F.least(a, b),
            ),
        )
        return F.when(F.size(sh) > 0, folded).otherwise(
            F.array().cast("array<string>")
        )
    if hash_mode == "md5_affine":
        def base_fn(s):
            return F.conv(
                F.substring(F.md5(F.encode(s, "utf-8")), 1, 15), 16, 10
            ).cast("long")
    elif hash_mode == "xxhash64":
        base_fn = F.xxhash64
    else:
        raise ValueError(f"unknown hash_mode: {hash_mode!r}")
    coeffs = minhash_affine_coeffs(n_hashes)
    p = F.lit(MINHASH_P)
    bases = F.transform(sh, lambda s: F.pmod(base_fn(s), p))
    init = F.array_repeat(p.cast("long"), n_hashes)  # values < P, so P = +inf
    folded = F.aggregate(
        bases,
        init,
        lambda acc, b: F.zip_with(
            acc,
            F.array(*[(F.lit(a) * b + F.lit(c)) % p for a, c in coeffs]),
            lambda x, y: F.least(x, y),
        ),
    )
    return F.when(F.size(sh) > 0, folded).otherwise(
        F.array().cast("array<bigint>")
    )


def _banded_rows(df: DataFrame, key_col: str, text_col: str,
                 n_hashes: int, bands: int, shingle_k: int,
                 hash_mode: str = "md5") -> DataFrame:
    """(key, band, band_sig) — one row per document per band.

    band_sig join key: md5 mode concatenates the hex digests bare (the
    legacy oracle contract); the integer modes join with '|' so
    [12, 3] and [1, 23] cannot collide as "123"."""
    rows_per = n_hashes // bands
    sig = minhash_signature(text_col, n_hashes, shingle_k, hash_mode)
    with_sig = df.select(F.col(key_col), sig.alias("sig")).filter(F.size("sig") > 0)

    def band_sig(b):
        sl = F.slice(F.col("sig"), b * rows_per + 1, rows_per)
        if hash_mode == "md5":
            return F.array_join(sl, "")
        return F.array_join(F.transform(sl, lambda x: x.cast("string")), "|")

    return with_sig.select(
        key_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"), band_sig(b).alias("band_sig")
                ),
            )
        ).alias("bs"),
    ).select(key_col, "bs.band", "bs.band_sig")


def _minhash_buckets(df: DataFrame, key_col: str, text_col: str,
                     n_hashes: int, bands: int, shingle_k: int,
                     hash_mode: str = "md5") -> DataFrame:
    """(band, band_sig) -> sorted id array, for buckets with >1 member."""
    banded = _banded_rows(df, key_col, text_col, n_hashes, bands,
                          shingle_k, hash_mode)
    return (
        banded.groupBy("band", "band_sig")
        .agg(F.array_sort(F.collect_list(key_col)).alias("ids"))
        .filter(F.size("ids") > 1)
    )


def lsh_candidate_pairs(df: DataFrame, key_col: str = "doc_id",
                        text_col: str = "text", n_hashes: int = 16,
                        bands: int = 4, shingle_k: int = 3,
                        max_bucket_size: int | None = None,
                        hash_mode: str = "md5") -> DataFrame:
    """Banded LSH: split the signature into ``bands`` bands of
    ``n_hashes/bands`` rows; docs sharing any full band signature are
    candidates.  Implemented as explode + equi-join on (band, band_sig):
    shuffle cost tracks collisions, never O(n^2).

    ``max_bucket_size`` guards the web-scale degenerate case: a bucket
    of near-identical boilerplate (thousands of docs sharing a band
    signature) would otherwise collect an unbounded id array into one
    row and expand quadratically.  Oversized buckets are EXCLUDED from
    pair expansion — never silently: report them via
    :func:`lsh_bucket_overflow` with the same arguments (such buckets
    are exact-dup territory anyway; route them through ``exact_dedup``
    or cluster-by-bucket instead of pairwise comparison)."""
    # bucket-local pair expansion instead of a banded self-join: one
    # hash-agg shuffle + in-bucket explode.  The self-join form computes
    # the signatures twice (no CSE across join branches) and costs three
    # extra exchanges; pair count is identical.  Cost is quadratic only
    # within a (band, band_sig) bucket, which is the LSH design point.
    buckets = _minhash_buckets(df, key_col, text_col, n_hashes, bands,
                               shingle_k, hash_mode)
    if max_bucket_size is not None:
        buckets = buckets.filter(F.size("ids") <= max_bucket_size)
    pairs = buckets.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("ids"),
                    lambda x, i: F.transform(
                        F.slice(F.col("ids"), i + 2,
                                F.greatest(F.size("ids") - i - 1, F.lit(0))),
                        lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
                    ),
                )
            )
        ).alias("p")
    )
    return pairs.select("p.id_a", "p.id_b").distinct()


def lsh_bucket_overflow(df: DataFrame, key_col: str = "doc_id",
                        text_col: str = "text", n_hashes: int = 16,
                        bands: int = 4, shingle_k: int = 3,
                        max_bucket_size: int = 1000,
                        hash_mode: str = "md5") -> DataFrame:
    """Buckets dropped by ``lsh_candidate_pairs(max_bucket_size=...)``:
    (band, band_sig, n_ids).  The no-silent-truncation companion —
    aggregate it for run reports, or feed its members to exact dedup."""
    return (
        _minhash_buckets(df, key_col, text_col, n_hashes, bands, shingle_k,
                         hash_mode)
        .filter(F.size("ids") > max_bucket_size)
        .select("band", "band_sig", F.size("ids").alias("n_ids"))
    )


def lsh_cross_pairs(new_df: DataFrame, base_df: DataFrame,
                    key_col: str = "doc_id", text_col: str = "text",
                    n_hashes: int = 16, bands: int = 4, shingle_k: int = 3,
                    hash_mode: str = "md5") -> DataFrame:
    """CROSS-corpus LSH candidates: (new_id, base_id) pairs where an
    incoming document shares any MinHash band signature with an
    EXISTING corpus document — the near-duplicate analogue of
    ``bloom_membership``'s exact incremental dedup.  This is the
    recurring-crawl shape: each monthly snapshot is deduped against
    the accumulated corpus, never against itself here (run
    ``lsh_candidate_pairs`` within the snapshot separately), so the
    join is new x base only — no within-side pair expansion, no
    self-join of the big side.

    Scale shape: both sides reduce to skinny (key, band, band_sig)
    rows (bands rows per doc); the candidate generator is ONE
    equi-join on (band, band_sig) with the SMALL side (the snapshot)
    on the left — at production scale the base side's banded rows are
    computed once per snapshot cycle and persist as a bucketed table,
    so each increment pays only the new side's signatures plus the
    join.  AQE's skew-join splits hot boilerplate signatures; pairs
    are distinct-ed on skinny ids only."""
    nb = _banded_rows(new_df, key_col, text_col, n_hashes, bands,
                      shingle_k, hash_mode) \
        .withColumnRenamed(key_col, "new_id")
    bb = _banded_rows(base_df, key_col, text_col, n_hashes, bands,
                      shingle_k, hash_mode) \
        .withColumnRenamed(key_col, "base_id")
    return (
        nb.join(bb, ["band", "band_sig"])
        .select("new_id", "base_id")
        .distinct()
    )


def ngram_jaccard_pairs(df: DataFrame, key_col: str = "doc_id",
                        text_col: str = "text", shingle_k: int = 3,
                        threshold: float = 0.5,
                        max_df: int | None = None) -> DataFrame:
    """Exact n-gram Jaccard similarity join.

    ``|A ∩ B|`` via exploded shingle equi-join (distributed, no cross
    join); ``|A ∪ B| = |A| + |B| - |A ∩ B|``.  Returns (id_a, id_b,
    jaccard) for pairs >= threshold.  Use on LSH candidates at scale
    (``lsh_jaccard_pairs``); standalone, per-shingle collision counts
    make the equi-join quadratic on hot shingles — one boilerplate
    phrase shared by 1M docs is 10^12 join rows.

    ``max_df`` is the standard hot-shingle guard for standalone use:
    shingles appearing in more than ``max_df`` documents are EXCLUDED
    from intersection counting (one linear agg + a broadcast anti-join
    — the hot set is tiny by definition).  Affected pairs undercount
    |A ∩ B| (recall biased down, never up); union denominators keep the
    full set sizes."""
    sh = (
        df.select(F.col(key_col), word_shingles(text_col, shingle_k).alias("sh"))
        .filter(F.size("sh") > 0)
    )
    sizes = sh.select(key_col, F.size("sh").alias("n_sh"))
    exploded = sh.select(key_col, F.explode("sh").alias("shingle"))
    if max_df is not None:
        hot = (
            exploded.groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_df)
            .select("shingle")
        )
        exploded = exploded.join(F.broadcast(hot), "shingle", "left_anti")
    inter = (
        exploded.alias("l")
        .join(
            exploded.alias("r"),
            (F.col("l.shingle") == F.col("r.shingle"))
            & (F.col(f"l.{key_col}") < F.col(f"r.{key_col}")),
        )
        .groupBy(
            F.col(f"l.{key_col}").alias("id_a"),
            F.col(f"r.{key_col}").alias("id_b"),
        )
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.join(sizes.withColumnsRenamed({key_col: "id_a", "n_sh": "n_a"}), "id_a")
        .join(sizes.withColumnsRenamed({key_col: "id_b", "n_sh": "n_b"}), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def ngram_containment_pairs(df: DataFrame, key_col: str = "doc_id",
                            text_col: str = "text", shingle_k: int = 3,
                            threshold: float = 0.5,
                            max_df: int | None = None) -> DataFrame:
    """ASYMMETRIC n-gram containment join: ``C(A→B) = |A ∩ B| / |A|``.

    Jaccard misses the quotation/subset case this exists for: a short
    document fully embedded in a long one (a quoted article inside an
    aggregator page, a licence block inside every README) has tiny
    Jaccard (the union is dominated by the long doc) but containment
    ≈ 1.0 in the short→long direction.  Containment-based dedup is how
    RefinedWeb/Dolma-style pipelines catch wholesale quotation that
    MinHash-Jaccard thresholds pass.

    Returns one row per unordered pair (id_a < id_b) with BOTH
    directions — ``contain_a`` (share of A's shingles found in B) and
    ``contain_b`` — kept when max(contain_a, contain_b) >= threshold,
    i.e. when either doc is mostly contained in the other.

    Scale shape: identical to :func:`ngram_jaccard_pairs` — one
    exploded shingle equi-join (never a cross join), intersection
    counts by hash aggregate, set sizes joined back as skinny (id, n)
    tables.  The same ``max_df`` hot-shingle guard applies (excluded
    shingles undercount |A ∩ B|, so recall biases down, never up);
    denominators keep the FULL set sizes.  At production scale run it
    on LSH candidates, not standalone, exactly like the Jaccard twin."""
    sh = (
        df.select(F.col(key_col), word_shingles(text_col, shingle_k).alias("sh"))
        .filter(F.size("sh") > 0)
    )
    sizes = sh.select(key_col, F.size("sh").alias("n_sh"))
    exploded = sh.select(key_col, F.explode("sh").alias("shingle"))
    if max_df is not None:
        hot = (
            exploded.groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_df)
            .select("shingle")
        )
        exploded = exploded.join(F.broadcast(hot), "shingle", "left_anti")
    inter = (
        exploded.alias("l")
        .join(
            exploded.alias("r"),
            (F.col("l.shingle") == F.col("r.shingle"))
            & (F.col(f"l.{key_col}") < F.col(f"r.{key_col}")),
        )
        .groupBy(
            F.col(f"l.{key_col}").alias("id_a"),
            F.col(f"r.{key_col}").alias("id_b"),
        )
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.join(sizes.withColumnsRenamed({key_col: "id_a", "n_sh": "n_a"}), "id_a")
        .join(sizes.withColumnsRenamed({key_col: "id_b", "n_sh": "n_b"}), "id_b")
        .withColumn("contain_a", F.round(F.col("n_inter") / F.col("n_a"), 6))
        .withColumn("contain_b", F.round(F.col("n_inter") / F.col("n_b"), 6))
        .filter(F.greatest("contain_a", "contain_b") >= threshold)
        .select("id_a", "id_b", "contain_a", "contain_b")
    )


def lsh_jaccard_pairs(df: DataFrame, key_col: str = "doc_id",
                      text_col: str = "text", n_hashes: int = 16,
                      bands: int = 4, shingle_k: int = 3,
                      threshold: float = 0.5,
                      max_bucket_size: int | None = None,
                      hash_mode: str = "md5") -> DataFrame:
    """The production near-dup composition: MinHash-LSH candidate
    generation + exact n-gram-Jaccard verification restricted to the
    candidates.  This is the scale-correct form of
    :func:`ngram_jaccard_pairs` — the exact verify join runs only on
    LSH candidate pairs (|candidates| << |corpus|^2), so the exploded
    shingle self-join's hot-shingle quadratic blowup never happens.

    Verification is a per-pair ``array_intersect`` on the two shingle
    sets (two skinny equi-joins keyed by id; no shingle explosion at
    all).  Returns (id_a, id_b, jaccard >= threshold)."""
    cands = lsh_candidate_pairs(df, key_col, text_col, n_hashes, bands,
                                shingle_k, max_bucket_size=max_bucket_size,
                                hash_mode=hash_mode)
    sh = (
        df.select(F.col(key_col), word_shingles(text_col, shingle_k).alias("sh"))
        .filter(F.size("sh") > 0)
    )
    return (
        cands
        .join(sh.withColumnsRenamed({key_col: "id_a", "sh": "sh_a"}), "id_a")
        .join(sh.withColumnsRenamed({key_col: "id_b", "sh": "sh_b"}), "id_b")
        .withColumn("n_inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter")
                / (F.size("sh_a") + F.size("sh_b") - F.col("n_inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash(col: str, hash_mode: str = "xxhash64") -> Column:
    """64-bit SimHash over whitespace tokens: per bit, sum +-1 over each
    token's hash bit (``getbit``), take the sign, reassemble.
    Entirely JVM-side nested array lambdas — no shuffle, no Python.
    Built as a SQL expression because ``shiftleft``/``getbit`` need
    column-valued bit positions (the Python API only takes literals).

    ``hash_mode``: ``'xxhash64'`` (production default — JVM-native,
    fastest) or ``'md5_64'`` — a 60-bit token hash from the first 15
    md5 hex chars, reproducible in any SQL engine (the driver's DuckDB
    oracle re-derives it as ('0x' || substr(md5(t),1,15))::BIGINT; 15
    chars keeps the value inside signed int64 on both sides).  Bits
    60-63 are then dead (never set), which only matters for chunk
    blocking at max_hamming > 14 — documented, not reachable at the
    h<=4 design point.

    One pass over the token-hash array folding a 64-wide counter vector
    (zip_with inside aggregate) — the per-bit outer-loop form would
    re-tokenize and re-hash the document 64 times (HOF lambda bodies
    re-evaluate embedded subexpressions per element)."""
    if hash_mode == "xxhash64":
        hash_fn = "xxhash64(t)"
    elif hash_mode == "md5_64":
        hash_fn = "cast(conv(substring(md5(t), 1, 15), 16, 10) as bigint)"
    else:
        raise ValueError(f"unknown hash_mode: {hash_mode!r}")
    expr = f"""
    aggregate(
      zip_with(
        aggregate(
          transform(CASE WHEN length(trim({col})) = 0 THEN array()
                    ELSE split(trim({col}), '\\\\s+') END,
                    t -> {hash_fn}),
          array_repeat(0, 64),
          (acc, h) -> zip_with(acc, sequence(0, 63),
                               (a, b) -> a + (2 * getbit(h, b) - 1))),
        sequence(0, 63),
        (c, b) -> if(c > 0, shiftleft(1L, b), 0L)),
      0L, (acc2, v) -> acc2 | v)
    """
    return F.expr(expr)


def _simhash_chunk_layout(max_hamming: int) -> list[tuple[int, int]]:
    """(start_bit, width) per chunk.  Pigeonhole: to guarantee recall at
    hamming <= h, split the 64 bits into h+1 DISJOINT chunks — h
    differing bits can dirty at most h of them, so at least one chunk
    matches exactly.  Widths are as even as 64/(h+1) allows.  (Round 1
    hardcoded 4x16-bit chunks, which only guarantees h <= 3; a pair at
    hamming 7 with no shared 16-bit chunk was silently missed.)"""
    n_chunks = min(max(max_hamming, 0) + 1, 64)
    base, rem = divmod(64, n_chunks)
    layout, start = [], 0
    for i in range(n_chunks):
        width = base + (1 if i < rem else 0)
        layout.append((start, width))
        start += width
    return layout


def _simhash_buckets(df: DataFrame, key_col: str, text_col: str,
                     max_hamming: int,
                     hash_mode: str = "xxhash64") -> DataFrame:
    """(chunk_idx, chunk) -> sorted (key, sh) struct array per bucket."""
    with_sh = df.select(F.col(key_col),
                        simhash(text_col, hash_mode).alias("sh"))
    chunks = F.array(*[
        F.struct(
            F.lit(i).alias("chunk_idx"),
            F.shiftrightunsigned(F.col("sh"), start)
            .bitwiseAND(F.lit((1 << width) - 1)).alias("chunk"),
        )
        for i, (start, width) in enumerate(_simhash_chunk_layout(max_hamming))
    ])
    chunked = with_sh.select(
        key_col, "sh", F.explode(chunks).alias("c")
    ).select(key_col, "sh", "c.chunk_idx", "c.chunk")
    return (
        chunked.groupBy("chunk_idx", "chunk")
        .agg(F.array_sort(F.collect_list(F.struct(key_col, "sh"))).alias("ms"))
        .filter(F.size("ms") > 1)
    )


def simhash_near_dup_pairs(df: DataFrame, key_col: str = "doc_id",
                           text_col: str = "text", max_hamming: int = 3,
                           max_bucket_size: int | None = None,
                           hash_mode: str = "xxhash64") -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming.

    Pigeonhole blocking with max_hamming+1 disjoint chunks (see
    ``_simhash_chunk_layout`` — blocking is derived from the threshold,
    so recall is exact for any h).  Candidates come from an equi-join
    on (chunk_idx, chunk_value), never all-pairs.

    Scale note: chunk width shrinks as h grows (h=8 -> 7-bit chunks ->
    only ~2^7 distinct values per chunk index), so buckets fatten; at
    web scale keep h small (<=4) or set ``max_bucket_size`` and report
    drops via :func:`simhash_bucket_overflow` (no silent truncation)."""
    buckets = _simhash_buckets(df, key_col, text_col, max_hamming, hash_mode)
    if max_bucket_size is not None:
        buckets = buckets.filter(F.size("ms") <= max_bucket_size)
    # bucket-local pair expansion (see lsh_candidate_pairs): one hash-agg
    # shuffle; struct array_sort orders by key, so id_a < id_b holds.
    cand = buckets.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("ms"),
                    lambda x, i: F.transform(
                        F.slice(F.col("ms"), i + 2,
                                F.greatest(F.size("ms") - i - 1, F.lit(0))),
                        lambda y: F.struct(
                            x[key_col].alias("id_a"),
                            y[key_col].alias("id_b"),
                            x["sh"].alias("sh_a"),
                            y["sh"].alias("sh_b"),
                        ),
                    ),
                )
            )
        ).alias("p")
    ).select("p.id_a", "p.id_b", "p.sh_a", "p.sh_b").distinct()
    xor = F.col("sh_a").bitwiseXOR(F.col("sh_b"))
    return (
        cand.withColumn("hamming", F.bit_count(xor))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def _star_round(e: DataFrame) -> DataFrame:
    """One large-star + small-star round (Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC 2014, alg. 4).

    large-star: per node u, m = min(N(u) ∪ {u}); rewire every neighbor
    v > u to m.  small-star: orient edges large→small, per node u with
    small-neighborhood N⁻(u), m = min(N⁻(u)); rewire N⁻(u) ∪ {u} to m.
    Both preserve connectivity; alternating them converges to one star
    per component (min node at the center) in O(log n) rounds — vs
    O(diameter) for plain min-label propagation, which an adversarial
    path graph makes linear.  Each round is two groupBy shuffles plus
    two equi-join shuffles, all on the skinny (u, v) edge list."""
    sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    lmin = (
        sym.groupBy("u").agg(F.min("v").alias("mv"))
        .select("u", F.least("u", "mv").alias("m"))
    )
    large = (
        sym.join(lmin, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    oriented = large.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    )
    smin = oriented.groupBy("u").agg(F.min("v").alias("m"))
    small = (
        oriented.join(smin, "u")
        .select(F.col("v").alias("a"), F.col("m").alias("b"))
        .unionByName(smin.select(F.col("u").alias("a"), F.col("m").alias("b")))
        .filter(F.col("a") != F.col("b"))
        .select(F.col("a").alias("u"), F.col("b").alias("v"))
        .distinct()
    )
    return small


def connected_components(edges: DataFrame, src: str = "id_a",
                         dst: str = "id_b", nodes: DataFrame | None = None,
                         key_col: str = "doc_id",
                         max_iterations: int = 25) -> DataFrame:
    """Connected components over an undirected edge list: every node is
    labeled with the MINIMUM node id reachable from it.  This is the
    step that turns near-dup *pairs* (LSH / SimHash / cosine output)
    into dedup *clusters* — pick ``key == cluster_id`` as the canonical
    document and drop the rest, the standard web-corpus dedup policy.

    Returns ``(key_col, cluster_id)``.  If ``nodes`` is given (any
    DataFrame carrying ``key_col``), nodes absent from the edge list
    are included as singletons (``cluster_id == key``).

    Scale story (100 TB): alternating large-star/small-star, so round
    count is O(log n) even on adversarial path graphs, and real dedup
    graphs (near-clique LSH buckets) converge in ~2 rounds.  Per-round
    state is only the (u, v) edge list — never text, never signatures.
    Each round ends in ``localCheckpoint`` to truncate lineage (an
    iterative Spark loop otherwise grows the plan exponentially and
    re-executes every prior round per action); on a real cluster swap
    in ``checkpoint()`` to durable storage so executor loss cannot
    silently replay stale lineage.  Convergence is detected from a
    (count, hash-xor) signature of the edge set — two scalar aggregates
    per round, no edge-set collect (xor, not sum: order-free like sum
    but cannot overflow under ANSI arithmetic, and the edge set is
    distinct so self-cancellation cannot occur).  Known skew point: the component
    root is the hot key of the final rounds' groupBy; bound it upstream
    with ``max_bucket_size`` on the pair generators (a 10M-doc
    boilerplate component is exact-dup territory, not pairwise)."""
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )

    def sig(df: DataFrame) -> tuple[int, int]:
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    prev = sig(e)
    for _ in range(max_iterations):
        # ONE star round per scheduled action: the checkpoint is
        # non-eager, so the sig() aggregate materializes the blocks as
        # a side effect (localCheckpoint caches at MEMORY_AND_DISK; no
        # recompute) and returns the convergence signature from the
        # same job — halving the driver round-trips vs the former
        # eager-checkpoint-then-sig pair, which the curate scaling
        # series measured as pure serial time at any parallelism.
        # (Batching TWO rounds per action was tried and reverted: the
        # convergence check then always pays a full extra no-op round
        # of shuffles, which regressed mid-size CC queries
        # (graph_components 2.5 s -> 5.1 s) for a saving the fused
        # action had already banked.)
        e = _star_round(e).localCheckpoint(eager=False)
        cur = sig(e)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            "rounds — raise max_iterations (expected only for graphs with "
            "components spanning > 2^25 nodes)"
        )
    # fixpoint is a star per component: each non-root points at its root
    assign = (
        e.select(F.col("u").alias(key_col), F.col("v").alias("cluster_id"))
        .unionByName(
            e.select(F.col("v").alias(key_col))
            .distinct()
            .select(key_col, F.col(key_col).alias("cluster_id"))
        )
        .distinct()
    )
    if nodes is not None:
        assign = (
            nodes.select(key_col)
            .distinct()
            .join(assign, key_col, "left")
            .select(
                key_col,
                F.coalesce("cluster_id", F.col(key_col)).alias("cluster_id"),
            )
        )
    return assign


def near_dup_clusters(df: DataFrame, key_col: str = "doc_id",
                      text_col: str = "text", n_hashes: int = 16,
                      bands: int = 4, shingle_k: int = 3,
                      max_bucket_size: int | None = None,
                      max_iterations: int = 25,
                      hash_mode: str = "md5") -> DataFrame:
    """End-to-end near-dup clustering: MinHash-LSH candidate pairs →
    connected components → ``(key, cluster_id, cluster_size)`` for
    EVERY input document (singletons get their own id, size 1).
    Downstream dedup keeps ``key == cluster_id`` rows; ``cluster_size``
    feeds the run report (how much of the corpus was duplicate).

    ``cluster_size`` is a groupBy count joined back, NOT a window over
    cluster_id: a pathological mega-cluster (exactly the boilerplate
    case this module warns about) would funnel all its rows through ONE
    window task, while the groupBy's map-side partial aggregation
    absorbs the hot key before the shuffle and the join redistributes
    only (cluster_id, count) rows."""
    pairs = lsh_candidate_pairs(df, key_col, text_col, n_hashes, bands,
                                shingle_k, max_bucket_size=max_bucket_size,
                                hash_mode=hash_mode)
    cc = connected_components(pairs, "id_a", "id_b",
                              nodes=df.select(key_col), key_col=key_col,
                              max_iterations=max_iterations)
    sizes = cc.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return cc.join(sizes, "cluster_id").select(
        key_col, "cluster_id", "cluster_size"
    )


def simhash_bucket_overflow(df: DataFrame, key_col: str = "doc_id",
                            text_col: str = "text", max_hamming: int = 3,
                            max_bucket_size: int = 1000,
                            hash_mode: str = "xxhash64") -> DataFrame:
    """Buckets dropped by ``simhash_near_dup_pairs(max_bucket_size=...)``:
    (chunk_idx, chunk, n_ids) — the no-silent-truncation companion."""
    return (
        _simhash_buckets(df, key_col, text_col, max_hamming, hash_mode)
        .filter(F.size("ms") > max_bucket_size)
        .select("chunk_idx", "chunk", F.size("ms").alias("n_ids"))
    )


# ---------------------------------------------------------------------------
# Bloom-filter incremental dedup (the Dolma paragraph-dedup design:
# Soldaini et al. 2024 use a Bloom filter so the "seen" set for a
# multi-snapshot crawl fits in bounded memory instead of a
# corpus-sized hash table).  Build folds an m-bit bitmap with a
# two-level OR aggregate; membership is k broadcast-join bit probes.
# False-positive rate ~ (1 - e^(-k*n/m))^k, deterministic given the
# hash family -- so a SQL oracle reproduces every FP bit-for-bit, and a
# dropped-by-FP line is a *documented* approximation, never silent
# drift between engines.
# ---------------------------------------------------------------------------

def _bloom_positions(col: str, m_bits: int, k: int, salt: str) -> list:
    """k independent bit positions for ``col``'s value: the shared
    60-bit md5 integer hash under k distinct salts, mod m_bits."""
    from ocr_spark.operators.corpus import _md5_60

    return [(_md5_60(col, f"{salt}{i}") % m_bits) for i in range(k)]


def bloom_build(df: DataFrame, col: str, m_bits: int = 1 << 13,
                k: int = 3, salt: str = "bloom") -> DataFrame:
    """Fold ``df[col]``'s values into an m-bit Bloom bitmap, returned
    as a tiny ``(word, bits)`` DataFrame of 32-bit words (<= m_bits/32
    rows -- 32-bit words because a 1<<63 mask overflows signed ranges
    on some engines).  ONE skinny shuffle: the explode emits k
    (position) ints per value, map-side partial bit_or absorbs
    repeats, and the reduce side sees at most m_bits/32 groups no
    matter the corpus size.  At 100 TB the bitmap is still a few MB --
    collect-free here, broadcast by the probe side."""
    pos = df.select(
        F.explode(F.array(*_bloom_positions(col, m_bits, k, salt)))
        .alias("pos")
    )
    return (
        pos.select(
            F.shiftright(F.col("pos"), 5).alias("word"),
            F.expr("shiftleft(1L, cast(pos % 32 as int))").alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_member(df: DataFrame, col: str, bloom: DataFrame,
                 m_bits: int = 1 << 13, k: int = 3, salt: str = "bloom",
                 member_col: str = "bloom_hit") -> DataFrame:
    """Append boolean ``member_col``: True iff all k probe bits are set
    in ``bloom`` (possible false positives at the documented rate,
    never false negatives).  The bitmap is broadcast (m_bits/32 skinny
    rows); each probe is a broadcast equi-join on the word index, so
    the corpus side never shuffles."""
    out = df
    cond = F.lit(True)
    probes = _bloom_positions(col, m_bits, k, salt)
    for i, pos in enumerate(probes):
        out = out.withColumn(f"_bpos{i}", pos)
        side = F.broadcast(bloom.select(
            F.col("word").alias(f"_bw{i}"), F.col("bits").alias(f"_bb{i}")
        ))
        out = out.join(
            side, F.shiftright(F.col(f"_bpos{i}"), 5) == F.col(f"_bw{i}"),
            "left",
        )
        hit = F.coalesce(
            F.expr(f"(_bb{i} & shiftleft(1L, cast(_bpos{i} % 32 as int)))"
                   " != 0"),
            F.lit(False),
        )
        cond = cond & hit
    drop = [f"_bpos{i}" for i in range(k)] + \
           [f"_bw{i}" for i in range(k)] + [f"_bb{i}" for i in range(k)]
    return out.withColumn(member_col, cond).drop(*drop)


def bloom_line_dedup(df: DataFrame, prior: DataFrame,
                     key_col: str = "doc_id", text_col: str = "text",
                     m_bits: int = 1 << 13, k: int = 3,
                     salt: str = "bloom") -> DataFrame:
    """Incremental line-level dedup of a NEW snapshot against a PRIOR
    corpus (Dolma's paragraph Bloom dedup, line == newline-delimited
    block): build the Bloom bitmap over ``prior``'s trimmed lines, drop
    every ``df`` line whose trimmed form probes as seen, reassemble.
    Returns one row per input doc: ``(key, text, n_lines_kept,
    n_lines_dropped)``, line order preserved; docs whose every line is
    seen come back with text '' (filtered by a later quality pass,
    never silently lost -- same contract as ``line_dedup``).

    Why Bloom instead of the exact anti-join ``line_dedup`` uses: the
    prior side of a multi-snapshot crawl is ALL PREVIOUS SNAPSHOTS --
    an exact distinct-line table outgrows executor memory and forces a
    corpus x corpus shuffle join every increment, while the bitmap
    stays m_bits/8 bytes forever and broadcasts.  The price, a
    deterministic FP rate, is the standard trade (Dolma ships 1e-4).

    Scale shape: ONE skinny shuffle builds the bitmap; the new
    snapshot's lines take k broadcast probes (no shuffle); the only
    full-width exchange is the final groupBy(key) reassembly of KEPT
    text -- identical to ``line_dedup``'s."""
    bloom = bloom_build(
        prior.select(F.trim(F.col(text_col)).alias("_t"))
        .select(F.explode(F.split("_t", "\n")).alias("ln"))
        .select(F.trim("ln").alias("nrm")),
        "nrm", m_bits, k, salt,
    )
    lines = df.select(
        F.col(key_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "ln"),
    ).withColumn("nrm", F.trim(F.col("ln")))
    flagged = bloom_member(lines, "nrm", bloom, m_bits, k, salt)
    keep = ~F.col("bloom_hit")
    kept_struct = F.when(keep, F.struct(F.col("pos"), F.col("ln")))
    return (
        flagged.groupBy(key_col)
        .agg(
            F.sort_array(F.collect_list(kept_struct)).alias("ks"),
            F.sum(F.when(keep, 1).otherwise(0)).alias("n_lines_kept"),
            F.sum(F.when(keep, 0).otherwise(1)).alias("n_lines_dropped"),
        )
        .select(
            key_col,
            F.array_join(
                F.transform(F.col("ks"), lambda s: s.getField("ln")), "\n"
            ).alias(text_col),
            "n_lines_kept", "n_lines_dropped",
        )
    )


def cluster_representatives(clusters: DataFrame, scores: DataFrame,
                            key_col: str = "doc_id",
                            score_col: str = "score") -> DataFrame:
    """Keep-BEST-per-cluster selection: given ``near_dup_clusters``
    output and a per-document score, pick each cluster's highest-score
    member (ties -> lowest key).  The ``key == cluster_id`` rule keeps
    an *arbitrary* member (the min-id one); production dedup runs
    usually keep the best version of a near-dup group instead — e.g.
    the longest capture, the highest quality_filter score, or the
    highest graph_prior rank (RefinedWeb/FineWeb keep-one policies).

    Returns ``(cluster_id, rep_<key>, rep_<score>, cluster_size)``.

    Scale shape: one skinny equi-join keyed by ``key_col`` to attach
    scores, then ONE groupBy(cluster_id) whose map-side partial
    aggregation absorbs the mega-cluster hot key (the same reasoning
    that moved cluster_size off a window); the argmax rides a single
    struct max — (score, -key) so the key tie-break stays a max —
    never a per-cluster sort or window."""
    j = clusters.join(scores.select(key_col, score_col), key_col)
    best = j.groupBy("cluster_id").agg(
        F.max(
            F.struct(
                F.col(score_col).alias("_s"),
                (-F.col(key_col)).alias("_nk"),
            )
        ).alias("_b"),
        F.count(F.lit(1)).alias("cluster_size"),
    )
    return best.select(
        "cluster_id",
        (-F.col("_b._nk")).alias(f"rep_{key_col}"),
        F.col("_b._s").alias(f"rep_{score_col}"),
        "cluster_size",
    )


def cdc_chunks(df: DataFrame, key_col: str = "doc_id",
               text_col: str = "text", divisor: int = 16,
               min_tokens: int = 1) -> DataFrame:
    """Content-defined chunking (token granularity): a token is a
    chunk BOUNDARY when its salted 60-bit hash ≡ 0 mod ``divisor`` —
    so chunk boundaries move WITH the content, not with byte offsets.
    That is the property fixed-size chunking lacks: insert one token
    at the front of a document and every fixed-size chunk shifts
    (nothing dedups), while CDC re-synchronizes at the next boundary
    and every untouched chunk keeps its digest (storage-dedup /
    rsync/LBFS lineage, Muthitacharoen et al. SOSP'01 — applied at
    token granularity so the whole derivation is expressible in both
    engines).

    Expected chunk length is ``divisor`` tokens.  Emits one row per
    chunk: ``(key, chunk_idx, n_tokens, chunk_digest)`` — digest-only
    by design (md5 of the space-joined tokens); the caller joins back
    for text when needed, so the wide column never rides the chunk
    rows.  Complements :func:`drop_duplicated_spans`: ExactSubstr
    removes duplicated k-gram SPANS from the text, CDC identifies
    shared CONTENT BLOCKS across documents for storage/transfer dedup
    and incremental re-processing.

    Scale shape: posexplode to (key, pos, token), boundary flag per
    row, chunk id = running boundary count over a window partitioned
    by DOCUMENT (bounded by tokens-per-doc — the same per-doc window
    discipline as line reassembly; never a corpus-wide window), then
    one (key, chunk_idx) hash aggregate whose collect_list is bounded
    by the chunk length (~divisor tokens).  Chunk rows are skinny
    (key, idx, n, digest); the digest uses the SAME in-order
    space-join both engines compute."""
    from pyspark.sql import Window

    from ocr_spark.functions.text import tokens

    ex = df.select(
        F.col(key_col),
        F.posexplode(tokens(text_col)).alias("pos", "t"),
    )
    is_b = (
        F.conv(F.substring(F.md5(F.concat(F.lit("cdc|"), F.col("t"))),
                           1, 15), 16, 10).cast("long") % divisor == 0
    )
    w = Window.partitionBy(key_col).orderBy("pos") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flagged = ex.withColumn(
        "chunk_idx",
        F.sum(F.when(is_b, 1).otherwise(0)).over(w).cast("int"),
    )
    return (
        flagged.groupBy(key_col, "chunk_idx")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.md5(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("pos", "t"))),
                        lambda s: s["t"],
                    ),
                )
            ).alias("chunk_digest"),
        )
        .filter(F.col("n_tokens") >= min_tokens)
    )


def edit_verify(pairs: DataFrame, docs: DataFrame,
                key_col: str = "doc_id", text_col: str = "text",
                id_a: str = "id_a", id_b: str = "id_b",
                max_chars: int = 256) -> DataFrame:
    """Exact EDIT-DISTANCE verification for candidate pairs ->
    ``(id_a, id_b, edit_dist, edit_sim)`` — the character-level
    sibling of :func:`lsh_jaccard_pairs`'s token-set verify.  Jaccard
    misses character-level edits inside tokens (typos, template
    number substitutions, OCR noise); Levenshtein catches exactly
    those, and both engines ship it natively (unit-cost
    insert/delete/substitute), so the check is fully value-oracled.

    ``edit_sim = 1 - dist / max(len_a, len_b)`` on the first
    ``max_chars`` characters, rounded to 6; two empty prefixes compare
    as identical (sim 1.0).

    Scale shape: the SAME discipline as every verifier here —
    restricted to the candidate list (two skinny id-keyed joins),
    NEVER all-pairs; Levenshtein's O(n·m) per-pair cost is bounded by
    the hard ``max_chars`` cap, so kernel cost per candidate is a
    constant (256² char ops), and the exchange carries only capped
    prefixes."""
    a = docs.select(
        F.col(key_col).alias(id_a),
        F.substring(F.col(text_col), 1, max_chars).alias("_ta"))
    b = docs.select(
        F.col(key_col).alias(id_b),
        F.substring(F.col(text_col), 1, max_chars).alias("_tb"))
    dist = F.levenshtein(F.col("_ta"), F.col("_tb"))
    denom = F.greatest(F.length("_ta"), F.length("_tb"))
    sim = F.when(denom == F.lit(0), F.lit(1.0)).otherwise(
        F.round(F.lit(1) - dist / denom, 6))
    return (
        pairs.join(a, id_a).join(b, id_b)
        .select(id_a, id_b, dist.alias("edit_dist"),
                sim.alias("edit_sim"))
    )


def record_linkage(left: DataFrame, right: DataFrame,
                   block_col: str,
                   field_weights: dict[str, tuple[int, int]],
                   t_match: int, t_possible: int,
                   id_col: str = "doc_id") -> DataFrame:
    """Blocked probabilistic record linkage (the Fellegi-Sunter 1969
    decision rule, as used by every dedup-across-snapshots / entity-
    resolution pipeline): candidate pairs share the blocking key; each
    compared field contributes its agreement weight when equal, its
    disagreement weight when unequal, and ZERO when either side is
    NULL (absence is no evidence); pairs scoring >= ``t_match`` are
    links, >= ``t_possible`` go to review, the rest are dropped (the
    overwhelming majority — emitting non-links would be quadratic).

    ``field_weights``: field -> (agree_milli, disagree_milli) —
    integer milli log-odds chosen by the caller, kept integral so the
    decision boundary is bit-exact cross-engine (the u/m-probability
    estimation that derives them is upstream offline work).

    Plan: ONE equi-join on the blocking key (never all-pairs — the
    blocking-key design bounds the candidate set exactly like LSH
    bands); per-field comparisons are per-row JVM expressions.  A hot
    blocking key expands quadratically — same discipline as every
    candidate generator here: pick blocks with bounded selectivity or
    cap/salt upstream, and count drops."""
    lid, rid = f"l_{id_col}", f"r_{id_col}"
    l = left.select(
        F.col(id_col).alias(lid), F.col(block_col).alias("_blk"),
        *[F.col(c).alias(f"l_{c}") for c in field_weights])
    r = right.select(
        F.col(id_col).alias(rid), F.col(block_col).alias("_blk"),
        *[F.col(c).alias(f"r_{c}") for c in field_weights])
    j = l.join(r, "_blk")
    score = F.lit(0)
    agree_cols = []
    for c, (wa, wd) in sorted(field_weights.items()):
        lc, rc = F.col(f"l_{c}"), F.col(f"r_{c}")
        agree = F.when(lc.isNull() | rc.isNull(),
                       F.lit(None).cast("boolean")).otherwise(lc == rc)
        agree_cols.append(agree.alias(f"agree_{c}"))
        score = score + (F.when(agree.isNull(), 0)
                          .when(agree, F.lit(wa))
                          .otherwise(F.lit(wd)))
    out = j.select(lid, rid, *agree_cols,
                   score.cast("long").alias("score_milli"))
    return (out.filter(F.col("score_milli") >= t_possible)
            .withColumn(
                "decision",
                F.when(F.col("score_milli") >= t_match, "match")
                 .otherwise("possible")))


def winnow_pairs(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", k: int = 3, w: int = 4,
                 min_shared: int = 3, max_df: int = 20) -> DataFrame:
    """MOSS-style near-dup candidate pairs from WINNOWING fingerprints
    (Schleimer et al. SIGMOD'03 §4 — the deployed plagiarism-detection
    composition): docs sharing >= ``min_shared`` selected fingerprint
    hashes are candidates.  Complements the MinHash/SimHash family
    with the winnowing guarantee — any shared run of >= k + w - 1
    tokens IS detected (those generators sample; winnowing's selection
    is locally exhaustive), which is the property you want for
    quote/boilerplate-chunk mining as opposed to whole-doc similarity.

    Scale shape (the same discipline as ngram_jaccard_pairs): the
    join is an EQUI-join on the fingerprint hash, never all-pairs;
    ubiquitous fingerprints (site chrome selected on every page) are
    removed by a document-frequency cap — the hot set is tiny by
    construction (it is the set of near-universal hashes), so it rides
    a broadcast anti-join; dropping them only lowers the shared count
    (documented undercount direction).  The distinct (doc, hash)
    projection is materialized once (three consumers: df counts + both
    join sides)."""
    from ocr_spark.functions.text import with_winnow_fingerprints

    fp = (with_winnow_fingerprints(
            df.select(F.col(id_col).alias("did"), text_col),
            text_col, "fps", k=k, w=w)
          .select("did", F.explode("fps").alias("f"))
          .select("did", F.col("f.h").alias("h"))
          .distinct())
    fp = fp.localCheckpoint(eager=True)
    hot = (fp.groupBy("h").agg(F.count("*").alias("df_h"))
           .where(F.col("df_h") > max_df))
    keep = fp.join(F.broadcast(hot), "h", "left_anti")
    a = keep.select(F.col("did").alias("doc_a"), "h")
    b = keep.select(F.col("did").alias("doc_b"), "h")
    return (a.join(b, "h").where(F.col("doc_a") < F.col("doc_b"))
            .groupBy("doc_a", "doc_b").agg(F.count("*").alias("shared"))
            .where(F.col("shared") >= min_shared))
