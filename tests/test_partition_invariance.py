"""Partition-invariance gate, contract-wide (SURVEY §7.3's determinism
hazard): every ``queries()`` entry must produce the SAME canonical row
set regardless of how Spark partitions the work — a result that changes
with ``spark.sql.shuffle.partitions`` means some operator depends on
partition boundaries or intra-partition order (a non-deterministic
first/collect_list, an unkeyed window, a per-partition counter), which
is exactly the class of bug that stays invisible on a fixed test config
and detonates on a real cluster where partitioning is different by
definition.

A rotating deterministic sample (~30 per run, md5(salt + name) ranking;
bump SPARK_GRAFT_PI_SALT per round to sweep a different slice) keeps the
default suite fast; the full contract can be swept with
SPARK_GRAFT_PI_N=1000.  Each sampled query runs at 2 and at 16 shuffle
partitions on the same input and the canonical (column-sorted,
row-sorted, value-normalized) row sets must be identical.
"""

import hashlib
import os

import pytest

import __spark_entry__ as entry_mod
from tests.test_oracle_parity import canon

SF_DIR = os.environ.get("SPARK_GRAFT_PI_SF", "/root/testdata/sf0.001")
SALT = os.environ.get("SPARK_GRAFT_PI_SALT", "r5")
SAMPLE_N = int(os.environ.get("SPARK_GRAFT_PI_N", "30"))

# Bounded availableNow streams: a stream re-run costs full
# source/checkpoint/sink startup twice and the stateful operator's
# partitioning is the state-store's, not shuffle.partitions'; their
# determinism is covered by the parity gate + tests/test_streaming.py.
EXCLUDE = {"stream_extract_parity", "stream_sessionize"}


def _sample() -> list[str]:
    names = [n for n in entry_mod.queries() if n not in EXCLUDE]
    ranked = sorted(
        names,
        key=lambda n: hashlib.md5((SALT + n).encode()).hexdigest(),
    )
    return sorted(ranked[:SAMPLE_N])


@pytest.mark.parametrize("name", _sample())
def test_partition_invariance(spark, name):
    fn = entry_mod.queries()[name]
    got = {}
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for n_part in (2, 16):
            spark.conf.set("spark.sql.shuffle.partitions", str(n_part))
            df = fn(spark, SF_DIR)
            cols = sorted(df.columns)
            got[n_part] = sorted(
                tuple(canon(r[c]) for c in cols) for r in df.collect()
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    assert len(got[2]) == len(got[16]), (
        f"{name}: row count differs across partitioning "
        f"({len(got[2])} at 2 vs {len(got[16])} at 16)"
    )
    mism = [(a, b) for a, b in zip(got[2], got[16]) if a != b][:5]
    assert not mism, (
        f"{name}: values differ across shuffle partitioning: {mism}"
    )
