"""PII detection / redaction for training-data curation: emails,
IPv4 addresses, international-format phone numbers.

Counts and redacts with built-in ``regexp_extract_all`` /
``regexp_replace`` — JVM-side, codegen'd, zero Python, zero shuffle
(pure per-row map expressions, safe at any corpus size).

The patterns are deliberately restricted to syntax shared by Java's
regex engine (Spark) and RE2 (DuckDB oracle): character classes,
bounded/unbounded counted repetition and ``\\b`` word boundaries only —
no lookarounds, no backreferences — so the oracle runs the *same*
pattern text.  A production deployment would extend the pattern set
(IBAN, SSN, credit cards with Luhn post-check in an Arrow kernel);
the contract here is the redaction machinery, which is pattern-count
invariant.

Redaction order matters and is part of the contract: emails first
(an email must not first lose its digits to the phone pattern), then
IPs (dotted quads must not be half-eaten by the phone pattern), then
phones.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["PII_PATTERNS", "count_pii", "with_pii_scrub"]

# (name, regex, replacement) in redaction order.  Kept Java/RE2-common.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+[0-9][0-9 ()./-]{6,14}[0-9]", "<PHONE>"),
]


def count_pii(col: str | Column) -> dict[str, Column]:
    """Per-kind match counts on the RAW text (before any redaction).
    Counts may overlap across kinds (a digit run inside an email local
    part counts as a phone too); ``with_pii_scrub`` counts sequentially
    instead, so its counts equal what each pass actually replaced."""
    c = F.col(col) if isinstance(col, str) else col
    return {
        name: F.size(F.regexp_extract_all(c, F.lit(pat), 0))
        for name, pat, _ in PII_PATTERNS
    }


def with_pii_scrub(df: DataFrame, text_col: str = "text",
                   out_col: str = "scrubbed") -> DataFrame:
    """Adds ``n_<kind>`` count columns and ``out_col`` with all patterns
    redacted in the documented order.  Each kind's count is computed on
    the text AFTER the previous kinds were redacted — n_<kind> is
    exactly the number of replacements that kind's pass made (a phone
    digit run inside an email local part is never double-counted)."""
    cur = F.col(text_col)
    for name, pat, repl in PII_PATTERNS:
        df = df.withColumn(
            f"n_{name}", F.size(F.regexp_extract_all(cur, F.lit(pat), 0))
        )
        cur = F.regexp_replace(cur, pat, repl)
    return df.withColumn(out_col, cur)
