"""Deterministic HyperLogLog distinct-count sketch.

Web-scale corpus accounting ("how many distinct pages / hosts / texts
per shard?") cannot afford exact COUNT(DISTINCT) at 10^12 rows — the
distinct shuffle moves every key.  The standard answer is a
cardinality sketch: HyperLogLog (Flajolet et al. 2007), which Spark
itself ships as ``approx_count_distinct``.  That built-in, however,
is not cross-engine reproducible (its hash and register layout are
Spark-internal), so the driver's DuckDB oracle could never certify a
value.  This module implements HLL *from the published algorithm*
with an explicitly specified hash so the estimate is bit-for-bit
reproducible in any engine:

- hash: 60-bit integer from the md5 hex prefix (same family as
  ``operators/corpus._md5_60`` — computable as
  ``('0x' || substr(md5(v), 1, 15))::BIGINT`` in DuckDB);
- m = 64 registers, bucket = top 6 bits, rank computed on the
  remaining 54 bits via the binary-string-length trick (no float
  log2, which could misround near powers of two);
- the harmonic sum is accumulated as an *exact integer*:
  ``2^(55 - rho)`` summed in int64 (max 64 terms * 2^54 < 2^61), so
  floating-point summation order — the classic cross-engine
  nondeterminism — never enters; one final double division applies
  the 2^55 scale;
- alpha_64 = 0.709 and the small-range linear-counting correction
  (raw <= 2.5 m and empty registers present -> m * ln(m / V)) exactly
  per the paper.

Scale shape: the register build is a map-side groupBy(group, bucket)
max — partial aggregation collapses each partition to at most
|groups| * 64 skinny rows before the exchange, so the shuffle is
O(groups * 64) regardless of input row count.  That is the entire
point of the sketch at 100 TB.

Reference capability mirrored: the reference keeps per-run usage
counters only (services/usage_tracker.py); distinct-cardinality
accounting over the corpus is the scale-version of those counters.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["HLL_M", "hll_register", "hll_cardinality",
           "CMS_D", "CMS_W", "cms_bucket", "cms_sketch", "cms_estimate"]

HLL_M = 64          # registers; 6 index bits
_IDX_BITS = 6
_REST_BITS = 60 - _IDX_BITS          # 54
_ALPHA_M = 0.709                     # published alpha for m = 64
_SCALE = 55                          # integer scale: term = 2^(55 - rho)


def _h60(col: str | Column) -> Column:
    """60-bit md5-derived hash, identical to DuckDB's
    ('0x' || substr(md5(v), 1, 15))::BIGINT."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10) \
        .cast("long")


def hll_register(col: str | Column) -> tuple[Column, Column]:
    """(bucket, rho) for one value: bucket = top 6 hash bits, rho =
    leading-zero count of the low 54 bits + 1 (55 when they are all
    zero).  Stripping leading zeros off bin() gives the bit length
    without float log2 and is engine-agnostic."""
    h = _h60(col)
    bucket = F.shiftright(h, _REST_BITS)
    rest = h.bitwiseAND(F.lit((1 << _REST_BITS) - 1))
    bitlen = F.length(F.regexp_replace(F.bin(rest), "^0+", ""))
    rho = (F.lit(_REST_BITS + 1) - bitlen).cast("int")
    return bucket.alias("hll_bucket"), rho.alias("hll_rho")


def hll_cardinality(df: DataFrame, value_col: str,
                    group_cols: list[str]) -> DataFrame:
    """Per-group HLL cardinality estimate of ``value_col``.

    Two skinny aggregations: groupBy(group, bucket).max(rho) — the
    partial agg makes the exchange O(groups * 64) — then one
    per-group fold of the 64 registers with the exact-integer
    harmonic sum.  Emits ``hll_estimate`` (round 4)."""
    bucket, rho = hll_register(value_col)
    regs = (df.select(*group_cols, bucket, rho)
              .groupBy(*group_cols, "hll_bucket")
              .agg(F.max("hll_rho").alias("r")))
    # term = 2^(55 - rho) as an exact int64 (F.shiftleft needs a
    # literal shift, so the column-shift goes through the SQL parser)
    folded = regs.groupBy(*group_cols).agg(
        F.count("*").alias("nb"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {_SCALE} - r)"))
        .alias("s_scaled"),
    )
    m = F.lit(float(HLL_M))
    # denominator, still exact: s_scaled + empty_registers * 2^55
    denom = (F.col("s_scaled")
             + (F.lit(HLL_M) - F.col("nb")).cast("long")
             * F.lit(1 << _SCALE))
    raw = (F.lit(_ALPHA_M) * m * m * F.lit(float(1 << _SCALE))
           / denom.cast("double"))
    v_empty = (F.lit(HLL_M) - F.col("nb")).cast("double")
    est = F.when((raw <= F.lit(2.5 * HLL_M)) & (v_empty > 0),
                 m * F.log(m / v_empty)).otherwise(raw)
    return folded.select(*group_cols,
                         F.round(est, 4).alias("hll_estimate"))


# --------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005): point-queryable
# frequency estimates with one-sided error (never undercounts).
# Same cross-engine determinism contract as the HLL above: the d row
# hashes are md5-derived with the row index as salt, so DuckDB can
# rebuild the identical sketch.  At 100 TB the sketch table is d*w
# rows TOTAL (map-side partial counts collapse each partition before
# the exchange) — frequency estimation without ever shuffling the
# token stream into a full groupBy.
# --------------------------------------------------------------------------

CMS_D, CMS_W = 4, 1024     # depth (rows) x width (buckets per row)


def cms_bucket(col: str | Column, j: int, w: int = CMS_W) -> Column:
    """Row-j bucket of a token: md5-60('j|token') % w — identically
    ('0x' || substr(md5(j || '|' || tok), 1, 15))::BIGINT % w in
    DuckDB."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.conv(F.substring(
        F.md5(F.concat(F.lit(f"{j}|"), c.cast("string"))), 1, 15),
        16, 10).cast("long")
    return h % w


def cms_sketch(tokens: DataFrame, token_col: str = "tok",
               d: int = CMS_D, w: int = CMS_W) -> DataFrame:
    """Build the d x w count table from a token stream.  Each token
    contributes one increment per row; the groupBy partial-aggregates
    map-side so the exchange carries <= d*w rows per partition."""
    rows = F.explode(F.array(*[
        F.struct(F.lit(j).alias("j"),
                 cms_bucket(token_col, j, w).alias("bucket"))
        for j in range(d)
    ])).alias("r")
    return (tokens.select(rows)
            .select("r.j", "r.bucket")
            .groupBy("j", "bucket")
            .agg(F.count("*").alias("cnt")))


def cms_estimate(probe: DataFrame, sketch: DataFrame,
                 token_col: str = "tok", d: int = CMS_D,
                 w: int = CMS_W) -> DataFrame:
    """Point-query the sketch for each probe token: estimate =
    min over rows j of sketch[j][h_j(token)].  The sketch (d*w rows)
    broadcasts; the probe side never shuffles."""
    probed = probe.select(
        token_col,
        F.explode(F.array(*[
            F.struct(F.lit(j).alias("j"),
                     cms_bucket(token_col, j, w).alias("bucket"))
            for j in range(d)
        ])).alias("r"),
    ).select(token_col, "r.j", "r.bucket")
    return (probed.join(F.broadcast(sketch), ["j", "bucket"])
            .groupBy(token_col)
            .agg(F.min("cnt").alias("cms_est")))
