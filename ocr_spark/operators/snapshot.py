"""Crawl-snapshot diffing: what changed between two crawls.

An incremental crawl pipeline re-extracts only what changed; the
primitive is a key-level diff of two snapshots classifying every page
as ``added`` / ``removed`` / ``changed`` / ``unchanged`` by content
digest.  (The reference processes single uploads and has no notion of
a snapshot; this is the corpus-level capability its extraction output
feeds at crawl cadence.)

Scale shape: both snapshots project to skinny ``(key, digest)`` rows
before the one full-outer shuffle join — the text/html columns never
move.  At 10^12 documents the join is the textbook co-partitioned
case: both sides hash-partition on the same key, and a production
deployment bucketing its snapshot tables by the key makes the diff
shuffle-free entirely (the documented Iceberg swap point,
sources/catalog.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["snapshot_delta", "capture_history", "dist_drift", "ks_drift"]


def snapshot_delta(old: DataFrame, new: DataFrame, key_col: str = "url",
                   content_col: str = "text") -> DataFrame:
    """``(key, status)`` for every key in either snapshot, with status
    in {added, removed, changed, unchanged} — digest equality is
    null-safe md5 over the content column (NULL content hashes to a
    sentinel distinct from every real digest, so NULL vs text compares
    as changed, NULL vs NULL as unchanged)."""
    def digested(df: DataFrame, name: str) -> DataFrame:
        return df.select(
            F.col(key_col).alias("key"),
            F.coalesce(
                F.md5(F.encode(F.col(content_col), "utf-8")),
                F.lit("\x00null"),
            ).alias(name),
        )

    o = digested(old, "d_old")
    n = digested(new, "d_new")
    joined = o.join(n, "key", "full_outer")
    return joined.select(
        "key",
        F.when(F.col("d_old").isNull(), F.lit("added"))
        .when(F.col("d_new").isNull(), F.lit("removed"))
        .when(F.col("d_old") == F.col("d_new"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
        .alias("status"),
    )


def capture_history(df: DataFrame, key_col: str = "url",
                    ts_col: str = "ts",
                    tie_col: str | None = None) -> DataFrame:
    """SCD2-style validity intervals over a capture stream: per entity,
    each capture gets ``(version, valid_from, valid_to, is_current)``
    where ``valid_to`` is the next capture's timestamp (NULL = still
    current).  This is the slowly-changing-dimension form a crawl
    warehouse keeps so point-in-time queries ("what did this url say
    on date D") are a BETWEEN predicate instead of a groupBy-max scan;
    keep-latest dedup is the degenerate ``is_current`` slice.

    ``tie_col`` breaks equal-timestamp captures deterministically
    (pass the capture id; without it equal-ts ordering is
    engine-dependent).

    Scale shape: ONE window partitioned by the entity key.  Unlike
    corpus-wide ranks (cf. web.crawl_schedule), per-key cardinality
    here is bounded by the revisit rate — dozens of captures per url,
    never a corpus-sized partition — so the per-key window IS the
    right tool; the exchange is one hash partition by key."""
    order = [F.col(ts_col).asc()]
    if tie_col is not None:
        order.append(F.col(tie_col).asc())
    w = Window.partitionBy(key_col).orderBy(*order)
    return (
        df.withColumn("version", F.row_number().over(w))
        .withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w))
        .withColumn("is_current", F.col("valid_to").isNull())
    )


def revisit_schedule(snaps: DataFrame, key_col: str = "url",
                     order_col: str = "snap_k",
                     digest_col: str = "digest",
                     horizon_days: int = 30) -> DataFrame:
    """Change-rate-driven recrawl scheduling (Cho & Garcia-Molina,
    "Estimating Frequency of Change"): per key, compare consecutive
    snapshot digests, estimate the change rate as
    n_changes / n_intervals, and derive the next revisit interval —
    frequently-changing pages are recrawled proportionally sooner,
    static pages back off to ``horizon_days``.

    Input: one row per (key, snapshot) with a content digest.
    Output: key, n_snaps, n_changes, change_rate (round 6),
    revisit_days.

    Scale shape: ONE exchange on the key (uniform — keys are urls),
    then a partition-local lag + aggregate.  The digest column is the
    only payload; text never enters."""
    w = Window.partitionBy(key_col).orderBy(order_col)
    flagged = snaps.select(
        key_col, order_col, digest_col,
        (F.lag(digest_col).over(w).isNotNull()
         & (F.col(digest_col) != F.lag(digest_col).over(w)))
        .cast("int").alias("changed"),
        F.lag(digest_col).over(w).isNotNull().cast("int")
        .alias("has_prev"),
    )
    per_key = flagged.groupBy(key_col).agg(
        F.count("*").alias("n_snaps"),
        F.sum("changed").alias("n_changes"),
        F.sum("has_prev").alias("n_intervals"),
    )
    rate = F.when(F.col("n_intervals") > 0,
                  F.col("n_changes").cast("double")
                  / F.col("n_intervals").cast("double")).otherwise(F.lit(0.0))
    revisit = F.when(
        F.col("n_changes") > 0,
        F.greatest(F.lit(1), F.floor(
            F.col("n_intervals").cast("double")
            / F.col("n_changes").cast("double")).cast("long")),
    ).otherwise(F.lit(horizon_days).cast("long"))
    return per_key.select(
        key_col, "n_snaps",
        F.col("n_changes").cast("long").alias("n_changes"),
        F.round(rate, 6).alias("change_rate"),
        revisit.alias("revisit_days"),
    )


def dist_drift(a: DataFrame, b: DataFrame, value_col: str,
               boundaries: tuple[int, ...] = (500, 1000, 2000, 4000, 8000),
               round_digits: int = 6) -> DataFrame:
    """Population Stability Index between two corpus snapshots: bucket
    ``value_col`` by FIXED boundaries (fixed, not quantiles — quantile
    buckets move with the data and hide the drift being measured),
    Laplace-smooth the per-snapshot shares, and emit per-bucket
    ``psi = (p - q) * ln(p / q)``.  Sum over buckets is the headline
    drift number (rule of thumb: > 0.25 = the new crawl's distribution
    has shifted enough to re-tune quality thresholds).  This is the
    monitor a continuously-refreshed corpus runs between crawls before
    trusting round-N thresholds on round-N+1 data.

    Scale shape: two tiny hash aggregates (one per snapshot, output =
    n_buckets rows each) joined on bucket id — map-side partials absorb
    everything; nothing wide ever shuffles.  Smoothed shares are exact
    rationals divided once in double and the published columns are
    rounded, so a SQL oracle recomputes them bit-identically."""
    k = len(boundaries) + 1

    def bucket(col: str):
        c = F.col(col)
        e = F.lit(k - 1)
        for i, bnd in reversed(list(enumerate(boundaries))):
            e = F.when(c < bnd, F.lit(i)).otherwise(e)
        return e

    def counts(df: DataFrame, name: str) -> DataFrame:
        return (df.select(bucket(value_col).alias("bucket"))
                .groupBy("bucket").count()
                .withColumnRenamed("count", name))

    frame = a.sparkSession.range(k).select(
        F.col("id").cast("int").alias("bucket"))
    ca, cb = counts(a, "n_a"), counts(b, "n_b")
    j = (frame.join(ca, "bucket", "left").join(cb, "bucket", "left")
         .select("bucket",
                 F.coalesce("n_a", F.lit(0)).alias("n_a"),
                 F.coalesce("n_b", F.lit(0)).alias("n_b")))
    ta = a.count()
    tb = b.count()
    p = (F.col("n_a") + 1).cast("double") / F.lit(float(ta + k))
    q = (F.col("n_b") + 1).cast("double") / F.lit(float(tb + k))
    return j.select(
        "bucket",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.round(p, round_digits).alias("p_share"),
        F.round(q, round_digits).alias("q_share"),
        F.round((p - q) * F.log(p / q), round_digits).alias("psi"),
    )


def ks_drift(a: DataFrame, b: DataFrame, value_col: str,
             bucket_width: int = 1000, top: int = 5,
             round_digits: int = 6) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift between corpus snapshots:
    the EXACT supremum of |ECDF_a(v) - ECDF_b(v)| over observed values
    of ``value_col`` — the scale-free companion to :func:`dist_drift`:
    PSI needs pre-chosen bucket boundaries and misses drift that stays
    inside one bucket; the KS statistic is the textbook
    distribution-free test (Massey 1951) and binning-free by
    construction.  Emits the ``top`` values with the largest ECDF gap
    (deterministic tie-break on value) with both cumulative counts and
    both ECDFs — row 1's ``ks`` is the test statistic.

    Scale shape (the exact ECDF needs a GLOBAL cumulative sum — the
    classic global-window single-task trap): the corpus reduces to
    per-VALUE counts first (one skinny hash aggregate per side,
    map-side partials absorb hot values), then the distributed
    two-pass prefix sum used by ``operators.corpus.token_budget_mix``:
    fixed-width range buckets over the value domain, per-bucket totals
    collected to the driver (n_buckets rows — the only collect),
    cumulative OFFSETS broadcast back, and a per-bucket window adds
    the within-bucket cumsum.  Parallelism = n_buckets regardless of
    corpus size; no global window task ever sees more than one
    bucket's distinct values.  All cumulative counts are exact longs;
    the two double divisions + abs are identically ordered in the SQL
    oracle, and published floats are rounded."""
    def counts(df: DataFrame, name: str) -> DataFrame:
        return (df.select(F.col(value_col).alias("v"))
                .where(F.col("v").isNotNull())
                .groupBy("v").agg(F.count("*").alias(name)))

    j = (counts(a, "n_a").join(counts(b, "n_b"), "v", "full")
         .select("v",
                 F.coalesce("n_a", F.lit(0)).alias("n_a"),
                 F.coalesce("n_b", F.lit(0)).alias("n_b"))
         .withColumn("bkt", F.floor(F.col("v") / bucket_width)))
    # pass 1: per-bucket totals -> driver (tiny: one row per occupied
    # range bucket) -> exclusive cumulative offsets, broadcast back
    btot = sorted(j.groupBy("bkt").agg(F.sum("n_a").alias("ba"),
                                       F.sum("n_b").alias("bb")).collect(),
                  key=lambda r: r["bkt"])
    offs, run_a, run_b = [], 0, 0
    for r in btot:
        offs.append((r["bkt"], run_a, run_b))
        run_a += r["ba"]
        run_b += r["bb"]
    ta, tb = run_a, run_b
    spark = a.sparkSession
    off = F.broadcast(spark.createDataFrame(
        offs or [(0, 0, 0)], "bkt long, off_a long, off_b long"))
    # pass 2: within-bucket window + broadcast offset = global cumsum
    w = Window.partitionBy("bkt").orderBy("v")
    cum = (j.join(off, "bkt")
           .select("v",
                   (F.sum("n_a").over(w) + F.col("off_a")).alias("cum_a"),
                   (F.sum("n_b").over(w) + F.col("off_b")).alias("cum_b")))
    f_a = F.col("cum_a") / F.lit(ta).cast("long")
    f_b = F.col("cum_b") / F.lit(tb).cast("long")
    ks = F.abs(f_a - f_b)
    return (cum.select(
        "v", "cum_a", "cum_b",
        F.round(f_a, round_digits).alias("f_a"),
        F.round(f_b, round_digits).alias("f_b"),
        F.round(ks, round_digits).alias("ks"))
        .orderBy(F.col("ks").desc(), F.col("v").asc())
        .limit(top))
