"""Data-layout planning: Z-order (Morton) clustering for
multi-dimensional data skipping.

At 100 TB the dominant query cost is the SCAN, and the dominant scan
win is file skipping: engines prune a parquet file when the query
predicate falls outside the file's per-column min/max footer stats.
Skipping only works if the layout CLUSTERS each filter column — and a
single sort key clusters exactly one dimension (files sorted by
domain have full-width timestamp ranges, so `WHERE ts = ...` scans
everything).  Z-ordering (Morton-code interleaving; the strategy
behind Delta Lake `OPTIMIZE ZORDER BY` and Iceberg's z-order sort
order rewrite) bit-interleaves two bounded dimensions into one sort
key so EVERY file is a small rectangle in (x, y) space: point/range
predicates on either dimension skip ~sqrt-fraction of files instead
of none.

* :func:`zorder_code` — the Morton key as a pure per-row JVM bitwise
  expression (shiftleft/and/or over ``bits`` positions): zero
  shuffle, zero Python, whole-stage-codegen friendly.
* :func:`zorder_layout` — the layout REPORT: assign each row to its
  target file (top bits of the z-code = range partition id) and
  publish per-file (n_rows, min/max of both dims, spans) for the
  z-order layout NEXT TO the same report for the naive single-key
  layout.  The report is the self-evaluation: z-order files have
  bounded spans in BOTH dims, linear files have full-width spans in
  the second dim.  One hash aggregate; map-side partials absorb any
  hot cell.

The WRITE path at scale is ``df.repartitionByRange(n_files,
zorder_code(...)).sortWithinPartitions(zorder_code(...))`` feeding the
bucketed sink (sources/catalog.py) — one range exchange, the same
shape as the existing url-hash bucket write; this module plans and
audits the layout, the sink owns the io.

Inputs are integer dimension columns already bounded to
``[0, 2**bits)`` — bucketization (hash buckets, length buckets,
day numbers) is the caller's domain knowledge and stays outside.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_code", "zorder_layout"]


def zorder_code(x: str | Column, y: str | Column, bits: int = 8) -> Column:
    """Morton interleave of two ``bits``-bit non-negative ints: bit b
    of x lands at position 2b, bit b of y at 2b+1.  Pure bitwise JVM
    expressions — no shuffle, no Python."""
    cx = F.col(x) if isinstance(x, str) else x
    cy = F.col(y) if isinstance(y, str) else y
    parts = []
    for b in range(bits):
        parts.append(F.shiftleft(F.shiftright(cx, b).bitwiseAND(F.lit(1)),
                                 2 * b))
        parts.append(F.shiftleft(F.shiftright(cy, b).bitwiseAND(F.lit(1)),
                                 2 * b + 1))
    return reduce(lambda a, c: a.bitwiseOR(c), parts)


def zorder_layout(df: DataFrame, x_col: str, y_col: str, bits: int = 8,
                  n_files: int = 16) -> DataFrame:
    """Per-file layout audit -> ``(layout, file_id, n_rows, min_x,
    max_x, min_y, max_y, span_x, span_y)`` for BOTH the z-order
    assignment and the naive x-sorted assignment over the same rows.

    ``n_files`` must be a power of two <= 2**(2*bits): the file id is
    the top ``log2(n_files)`` bits of the sort key (z-code for the
    z-order layout, ``x << bits | y`` for the linear layout), i.e.
    exactly the range-partition boundaries a sorted write would
    produce on uniformly bucketized dims."""
    if n_files & (n_files - 1) or n_files > (1 << (2 * bits)):
        raise ValueError(f"n_files must be a power of two <= 4^bits, "
                         f"got {n_files}")
    shift = (2 * bits) - n_files.bit_length() + 1
    x, y = F.col(x_col), F.col(y_col)
    z_file = F.shiftright(zorder_code(x, y, bits), shift)
    lin_file = F.shiftright(F.shiftleft(x, bits).bitwiseOR(y), shift)

    def report(file_col: Column, label: str) -> DataFrame:
        return (df.select(file_col.alias("file_id"), x.alias("x"),
                          y.alias("y"))
                .groupBy("file_id")
                .agg(F.count(F.lit(1)).alias("n_rows"),
                     F.min("x").alias("min_x"), F.max("x").alias("max_x"),
                     F.min("y").alias("min_y"), F.max("y").alias("max_y"))
                .select(F.lit(label).alias("layout"), "file_id", "n_rows",
                        "min_x", "max_x", "min_y", "max_y",
                        (F.col("max_x") - F.col("min_x")).alias("span_x"),
                        (F.col("max_y") - F.col("min_y")).alias("span_y")))

    return report(z_file, "zorder").unionAll(report(lin_file, "linear"))
