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

__all__ = ["PII_PATTERNS", "count_pii", "with_pii_scrub",
           "k_anonymity", "suppress_below_k"]

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


def k_anonymity(df: DataFrame, quasi_cols: list[str],
                k: int = 5) -> DataFrame:
    """k-anonymity audit over quasi-identifier columns ->
    ``(quasi_cols..., class_size, is_safe)``, one row per
    equivalence class (Sweeney 2002; the release gate run before a
    curated corpus ships).

    A released record is k-anonymous when at least k records share
    its full quasi-identifier combination — combinations rarer than
    that re-identify people even after direct PII is scrubbed (the
    classic zip+birthdate+sex attack).  This is the complement to
    :func:`with_pii_scrub`: scrubbing removes direct identifiers,
    the k-audit catches the indirect ones.

    Shape: ONE hash aggregate on the quasi key (map-side partials
    absorb hot classes — 'en'-sized classes combine per-partition
    first); no join, no window, no Python.  NULL quasi values form
    their own class (they're a disclosure surface too)."""
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    return (df.groupBy(*quasi_cols)
            .agg(F.count(F.lit(1)).alias("class_size"))
            .withColumn("is_safe", F.col("class_size") >= F.lit(k)))


def suppress_below_k(df: DataFrame, quasi_cols: list[str],
                     k: int = 5) -> DataFrame:
    """Drop every row whose quasi-identifier equivalence class has
    fewer than k members — the suppression (not generalization) arm
    of k-anonymization.

    Shape: the audit aggregate above, filtered to UNSAFE classes
    only, then a LEFT ANTI equi-join back on the quasi key.  The
    anti-join ships only the unsafe-class key list (in a web corpus
    the tail classes are many but each key is skinny — the safe
    mega-classes never cross the exchange), and rows in safe classes
    stream through.  Identical column contract in and out."""
    unsafe = (k_anonymity(df, quasi_cols, k)
              .filter(~F.col("is_safe")).select(*quasi_cols)
              .alias("unsafe"))
    lhs = df.alias("lhs")
    # null-safe keys: a NULL quasi value is a class like any other
    # (groupBy already treats it so) and must suppress the same way
    cond = None
    for c in quasi_cols:
        eq = F.col(f"lhs.{c}").eqNullSafe(F.col(f"unsafe.{c}"))
        cond = eq if cond is None else (cond & eq)
    return lhs.join(unsafe, cond, "left_anti")
