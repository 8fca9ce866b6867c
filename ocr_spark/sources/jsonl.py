"""JSON-lines ingest with corrupt-record quarantine.

Web-scale ingest reads line-delimited JSON sidecars (crawl metadata,
annotation exports, API dumps) where SOME lines are always broken —
truncated uploads, encoding damage, mid-write snapshots.  The two
naive modes both lose: FAILFAST kills a 100-TB job on one bad line;
silent null-dropping loses data without a trace.  The production
contract is PERMISSIVE-with-quarantine: parse what parses, keep the
raw line for every row that does not, and flag it so a quarantine
sink can route it to repair.

:func:`parse_json_records` implements that contract over any string
column with ``from_json`` — a JVM Jackson parse, zero Python in the
plan, schema projection pushed into the parser (unreferenced JSON
keys are never materialized).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["parse_json_records"]


def parse_json_records(df: DataFrame, json_col: str, schema: str,
                       id_col: str = "doc_id") -> DataFrame:
    """Parse ``json_col`` against the DDL ``schema``: output carries
    the schema's fields flattened, ``corrupt`` (true when the line
    failed to parse or convert — including NULL lines), and
    ``quarantine_raw`` (the original line for corrupt rows, NULL
    otherwise — clean rows don't pay to carry their raw bytes
    forward).

    Detection rides PERMISSIVE mode's ``columnNameOfCorruptRecord``
    field — a null-struct test does NOT work (Jackson returns a
    struct of nulls for malformed input, and even parses some
    truncations); the corrupt-record column is the documented Spark
    contract and also catches type-conversion failures, where
    convertible sibling fields are retained alongside the flag.

    Per-row JVM expressions only; zero shuffle."""
    rec = F.from_json(F.col(json_col), schema + ", _crpt string",
                      {"columnNameOfCorruptRecord": "_crpt"})
    out = df.select(F.col(id_col), rec.alias("_rec"))
    corrupt = (F.col("_rec").isNull()
               | F.col("_rec").getField("_crpt").isNotNull())
    return (out.select(id_col, "_rec.*", corrupt.alias("corrupt"))
            .withColumnRenamed("_crpt", "quarantine_raw"))
