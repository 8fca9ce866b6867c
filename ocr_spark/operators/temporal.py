"""Temporal joins Spark's optimizer has no native strategy for:
as-of join and range (interval) join.

* **asof_join** — for every left probe (key, ts), attach the latest
  right row with right.ts <= left.ts (the kdb/pandas ``merge_asof``
  backward join; the standard way to align events with the state that
  was current when they happened).  A naive formulation is an
  inequality join (quadratic blowup per key); the distributed form
  here is the classic union-and-carry: tag both sides, ONE shuffle by
  key, sort within key by (ts, side, tie), and carry the last non-null
  right attributes forward with ``last(ignorenulls)`` over the
  cumulative window.  Cost is one exchange + one per-key linear pass —
  no join explosion, no per-pair comparison.  Per-key cardinality is
  the series length per entity, bounded by revisit/update rates, never
  the corpus (same argument as snapshot.capture_history).

* **range_join** — points joined into intervals (lo <= p < hi), the
  ip-geolocation / value-tier / time-window containment join.  Naive =
  an inequality theta-join Spark executes as BroadcastNestedLoop or
  cartesian.  The distributed form is fixed-width binning (the same
  design as Databricks' range-join bin optimization, public docs):
  every interval explodes to the bins it overlaps, every point lands
  in exactly ONE bin, the join is an equi-join on the bin id, and the
  exact predicate filters inside the matched bin.  A (point, interval)
  pair can only meet in the point's single bin, so no dedup step is
  needed.  ``bin_width`` is the cost dial: ~the median interval width
  keeps the per-interval fanout at O(1) bins; skewed bins surface as
  ordinary join-key skew (AQE-splittable), never a nested loop.

Reference: the reference engine has no temporal joins (it is a
single-document HTTP service); these close the as-of/range gap named
in the engine survey's custom-operator list.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "range_join", "interval_join"]


def asof_join(left: DataFrame, right: DataFrame, key_col: str,
              ts_col: str, tie_col: str,
              right_prefix: str = "r_") -> DataFrame:
    """Backward as-of join: every ``left`` row gains the attributes of
    the latest ``right`` row with the same key and ``right.ts <=
    left.ts`` (ties at equal ts DO match — the right row sorts before
    the probe), or NULLs when no such row exists.

    All non-(key, ts) right columns come back prefixed with
    ``right_prefix`` (including ``<prefix><ts_col>``, the matched
    state's timestamp — the tolerance/staleness check is then a plain
    filter).  ``tie_col`` (a right-side unique column) makes the
    winner among equal-ts right rows deterministic: the largest
    ``tie_col`` wins, matching "latest capture wins" semantics.

    Scale shape: tag-union both sides (a zero-cost narrow op), ONE
    hash exchange by key, per-key sort by (ts, side, tie), and a
    cumulative ``last(ignorenulls)`` carry per right attribute —
    linear in the series, never |L| x |R|."""
    rcols = [c for c in right.columns if c != key_col]
    lcols = [c for c in left.columns if c != key_col]
    r = right.select(
        F.col(key_col),
        F.col(ts_col).alias("_ts"),
        F.lit(0).alias("_side"),
        F.col(tie_col).cast("long").alias("_tie"),
        *[F.col(c).alias(f"{right_prefix}{c}") for c in rcols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in lcols],
    )
    l = left.select(
        F.col(key_col),
        F.col(ts_col).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast("long").alias("_tie"),
        *[F.lit(None).cast(right.schema[c].dataType)
          .alias(f"{right_prefix}{c}") for c in rcols],
        *[F.col(c) for c in lcols],
    )
    u = r.unionByName(l)
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc(),
                 F.col("_tie").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        key_col, "_side",
        *[F.last(f"{right_prefix}{c}", ignorenulls=True).over(w)
          .alias(f"{right_prefix}{c}") for c in rcols],
        *lcols,
    )
    return carried.filter(F.col("_side") == 1).select(
        key_col, *lcols, *[f"{right_prefix}{c}" for c in rcols]
    )


def range_join(points: DataFrame, intervals: DataFrame,
               point_col: str, lo_col: str, hi_col: str,
               bin_width: float,
               how: str = "inner") -> DataFrame:
    """Containment join: every (point, interval) pair with
    ``lo <= point < hi``.  Executed as fixed-width binning + equi-join
    (see module docstring) — never an inequality nested loop.

    ``bin_width`` trades fanout for selectivity: intervals explode to
    ``O(width / bin_width)`` bins; points to exactly one.  Pairs can
    only meet in the point's bin, so the output needs no dedup.
    ``how='left'`` keeps unmatched points with NULL interval columns
    (a second broadcast-free anti-join-shaped pass is not needed: the
    bin equi-join IS left-joinable directly)."""
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    w = float(bin_width)
    i = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / w).cast("long"),
                F.floor(F.col(hi_col) / w).cast("long"),
            )
        ),
    )
    p = points.withColumn("_bin", F.floor(F.col(point_col) / w).cast("long"))
    cond = (
        (F.col(lo_col) <= F.col(point_col))
        & (F.col(point_col) < F.col(hi_col))
    )
    joined = p.join(i, on="_bin", how="inner").filter(cond)
    if how == "inner":
        return joined.drop("_bin")
    if how == "left":
        icols = [c for c in intervals.columns]
        matched = joined.drop("_bin")
        unmatched = p.join(
            joined.select(p.columns).dropDuplicates(points.columns),
            on=points.columns, how="left_anti",
        ).drop("_bin")
        for c in icols:
            unmatched = unmatched.withColumn(
                c, F.lit(None).cast(intervals.schema[c].dataType))
        return matched.unionByName(unmatched)
    raise ValueError(f"unsupported how={how!r}")


def interval_join(left: DataFrame, right: DataFrame,
                  l_lo: str, l_hi: str, r_lo: str, r_hi: str,
                  bin_width: float, keys: list[str] | None = None) -> DataFrame:
    """Interval-OVERLAP join: every (left, right) pair with
    ``l_lo < r_hi AND r_lo < l_hi`` (half-open), optionally also
    matching on equi-``keys`` (e.g. media_id).  Executed as fixed-
    width binning + equi-join like :func:`range_join`; a pair sharing
    several bins would duplicate, so each pair is emitted ONLY from
    its canonical bin — the bin containing ``greatest(l_lo, r_lo)``
    — which makes the output exactly-once WITHOUT a distinct (no
    wide dedup shuffle, the same trick DuckDB/Postgres use for
    band joins).

    This is the alignment join multimodal pipelines need (subtitle
    cues x detected speech segments, OCR boxes x layout regions):
    Spark has no native interval-overlap strategy, and the naive
    theta-join is a cartesian product per key."""
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    w = float(bin_width)
    keys = keys or []

    def binned(df: DataFrame, lo: str, hi: str) -> DataFrame:
        return df.withColumn(
            "_bin",
            F.explode(F.sequence(
                F.floor(F.col(lo) / w).cast("long"),
                F.floor(F.col(hi) / w).cast("long"))))

    l = binned(left, l_lo, l_hi)
    r = binned(right, r_lo, r_hi)
    overlap = (F.col(l_lo) < F.col(r_hi)) & (F.col(r_lo) < F.col(l_hi))
    canonical = F.col("_bin") == F.floor(
        F.greatest(F.col(l_lo), F.col(r_lo)) / w).cast("long")
    return (l.join(r, ["_bin"] + keys)
            .filter(overlap & canonical)
            .drop("_bin"))
