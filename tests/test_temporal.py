"""Temporal joins: as-of (backward, tie-deterministic) and range
(binned containment).  Load-bearing properties: exact agreement with
the naive quadratic reference, equal-ts tie semantics, and partition
invariance (the carry window must not depend on input layout)."""

from datetime import datetime

from ocr_spark.operators.temporal import asof_join, range_join


def _t(d):
    return datetime(2024, 1, d)


def test_asof_backward_semantics_and_ties(spark):
    right = spark.createDataFrame(
        [(1, "u", _t(1), 10.0), (2, "u", _t(5), 20.0), (3, "v", _t(3), 30.0),
         (4, "u", _t(5), 25.0)],  # equal-ts pair on u@5: max tie wins
        "rid long, k string, ts timestamp, px double")
    left = spark.createDataFrame(
        [(100, "u", _t(2)), (101, "u", _t(5)), (102, "u", _t(6)),
         (103, "v", _t(1)), (104, "w", _t(9))],
        "lid long, k string, ts timestamp")
    out = {r.lid: (r.r_rid, r.r_px)
           for r in asof_join(left, right, "k", "ts", "rid").collect()}
    assert out == {
        100: (1, 10.0),      # strictly earlier state
        101: (4, 25.0),      # equal ts matches; rid=4 beats rid=2
        102: (4, 25.0),      # carried forward
        103: (None, None),   # no state yet
        104: (None, None),   # unseen key
    }
    re_out = {r.lid: (r.r_rid, r.r_px)
              for r in asof_join(left.repartition(5), right.repartition(3),
                                 "k", "ts", "rid").collect()}
    assert re_out == out


def test_asof_matches_quadratic_reference(spark):
    import random

    rng = random.Random(3)
    right = [(i, f"k{rng.randrange(4)}", _t(rng.randrange(1, 28)),
              float(i)) for i in range(40)]
    left = [(100 + i, f"k{rng.randrange(5)}", _t(rng.randrange(1, 28)))
            for i in range(60)]
    rdf = spark.createDataFrame(right, "rid long, k string, ts timestamp, px double")
    ldf = spark.createDataFrame(left, "lid long, k string, ts timestamp")

    def ref(lk, lts):
        cand = [(ts, rid, px) for rid, k, ts, px in right
                if k == lk and ts <= lts]
        if not cand:
            return (None, None)
        ts, rid, px = max(cand)   # latest ts, then largest rid
        return (rid, px)

    got = {r.lid: (r.r_rid, r.r_px)
           for r in asof_join(ldf, rdf, "k", "ts", "rid").collect()}
    assert got == {lid: ref(k, ts) for lid, k, ts in left}


def test_range_join_matches_inequality_reference(spark):
    pts = spark.createDataFrame(
        [(i, i * 0.7) for i in range(50)], "pid long, v double")
    ivs = spark.createDataFrame(
        [(j, j * 1.3, j * 1.3 + 2.5) for j in range(20)],
        "iid long, lo double, hi double")
    got = sorted((r.pid, r.iid) for r in
                 range_join(pts, ivs, "v", "lo", "hi",
                            bin_width=2.0).collect())
    ref = sorted((i, j) for i in range(50) for j in range(20)
                 if j * 1.3 <= i * 0.7 < j * 1.3 + 2.5)
    assert got == ref
    # bin width must not change the result, only the plan economics
    wide = sorted((r.pid, r.iid) for r in
                  range_join(pts, ivs, "v", "lo", "hi",
                             bin_width=100.0).collect())
    assert wide == ref


def test_range_join_left_keeps_unmatched_points(spark):
    pts = spark.createDataFrame([(1, 0.5), (2, 99.0)], "pid long, v double")
    ivs = spark.createDataFrame([(7, 0.0, 1.0)], "iid long, lo double, hi double")
    out = {r.pid: r.iid for r in
           range_join(pts, ivs, "v", "lo", "hi", bin_width=1.0,
                      how="left").collect()}
    assert out == {1: 7, 2: None}
