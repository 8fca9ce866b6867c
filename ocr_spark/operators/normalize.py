"""Unicode text normalization for corpus hygiene.

Web-extracted text mixes NFC and NFD spellings of the same grapheme
("café" composed vs "cafe" + combining acute), plus stray C0 control
bytes and zero-width characters — all of which break exact dedup
(different byte strings, same text) and token statistics.  The
standard curation move (e.g. the normalizers stage of every tokenizer
pipeline) is: NFC-normalize, strip control characters, drop
zero-width code points.

Order matters and is fixed: **NFC first**, then strips — composing
first means a combining mark adjacent to a base letter is preserved
as the composed letter rather than orphaned by a strip.

Spark shape: ``unicodedata.normalize`` has no JVM built-in, so this is
an Arrow-batched ``mapInArrow`` kernel (no per-row Python UDF
dispatch), zero shuffle.  The DuckDB oracle runs its native
``nfc_normalize`` + identical regex strips — an independent second
implementation, which is what makes the driver check meaningful.
"""

from __future__ import annotations

import re
import unicodedata

from pyspark.sql import DataFrame
from pyspark.sql import types as T

__all__ = ["nfc_clean", "normalize_text", "fix_pdf_text",
           "markdown_strip", "MD_PATTERNS",
           "LIGATURES", "DEHYPHEN_PATTERN"]

# C0 controls except \t \n \r, plus DEL; then zero-widths + BOM.
# Spelled as explicit ranges so the DuckDB oracle regex is identical.
_CTRL_RE = re.compile("[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]")
_ZW_RE = re.compile("[\u200b\u200c\u200d\ufeff]")


def nfc_clean(s: str) -> str:
    """NFC -> strip C0 controls (keeping tab/newline/CR) -> strip
    zero-width chars.  The per-string kernel (also the test oracle)."""
    s = unicodedata.normalize("NFC", s)
    s = _CTRL_RE.sub("", s)
    return _ZW_RE.sub("", s)


def normalize_text(df: DataFrame, text_col: str = "text",
                   out_col: str | None = None) -> DataFrame:
    """Apply :func:`nfc_clean` to ``text_col`` (all other columns
    forwarded zero-copy).  ``out_col=None`` replaces in place."""
    out_col = out_col or text_col
    names = list(df.columns)
    ti = names.index(text_col)
    out_names = names + [out_col] if out_col not in names else names
    fields = [df.schema[c] for c in names]
    if out_col not in names:
        fields.append(T.StructField(out_col, T.StringType(), True))
    out_schema = T.StructType(fields)

    def kernel(batches):
        import pyarrow as pa  # executor-side import

        for batch in batches:
            vals = batch.column(ti).to_pylist()
            cleaned = pa.array(
                [None if v is None else nfc_clean(v) for v in vals],
                pa.string())
            arrays = [batch.column(j) for j in range(batch.num_columns)]
            if out_col in names:
                arrays[names.index(out_col)] = cleaned
            else:
                arrays.append(cleaned)
            yield pa.RecordBatch.from_arrays(arrays, out_names)

    return df.mapInArrow(kernel, schema=out_schema)


# PDF typography artifacts: presentation-form ligature code points
# (U+FB00..FB06) that PDF extractors emit verbatim, breaking token
# statistics and exact dedup; replacement pairs shared with the oracle.
LIGATURES: list[tuple[str, str]] = [
    ("ﬀ", "ff"), ("ﬁ", "fi"), ("ﬂ", "fl"),
    ("ﬃ", "ffi"), ("ﬄ", "ffl"), ("ﬅ", "st"),
    ("ﬆ", "st"),
]

# letter '-' newline letter -> merged word; the standard line-break
# dehyphenation heuristic (both sides must be letters, so numeric
# ranges and trailing hyphens survive).  RE2-common syntax.
DEHYPHEN_PATTERN = r"(\p{L})-\r?\n(\p{L})"


def fix_pdf_text(col):
    """PDF-extraction text repair as a pure JVM expression column:
    merge words split by end-of-line hyphenation (``exam-\\n ple`` ->
    ``example``; only letter-hyphen-newline-letter merges, so real
    hyphenated compounds and numeric ranges survive) and normalize
    presentation-form ligatures to their ASCII sequences (U+FB01 ->
    ``fi`` etc. — fonts substitute them at render time and extractors
    leak them into text, where they silently split token statistics
    and defeat exact dedup).  Zero shuffle, zero Python; the DuckDB
    oracle applies its OWN regexp engine to the same pattern — an
    independent second implementation, same discipline as
    normalize_text above."""
    from pyspark.sql import Column
    from pyspark.sql import functions as F

    c = F.col(col) if isinstance(col, str) else col
    out = F.regexp_replace(c, DEHYPHEN_PATTERN, "$1$2")
    for lig, rep in LIGATURES:
        out = F.replace(out, F.lit(lig), F.lit(rep))
    return out


# markdown_strip pattern table: (java_regex == re2_regex, replacement)
# — shared literal patterns; ONLY constructs both engines implement
# identically (no backreferences in patterns — RE2 lacks them; the
# $1/\1 difference lives in the engine-specific replacement string).
MD_PATTERNS: list[tuple[str, str]] = [
    (r"(?m)^```.*$", ""),                       # code-fence delimiters
    (r"!\[([^\]]*)\]\([^)]*\)", "$1"),          # images -> alt text
    (r"\[([^\]]*)\]\([^)]*\)", "$1"),           # links -> anchor text
    (r"\*{1,3}([^*]+)\*{1,3}", "$1"),           # bold/italic (asterisk)
    (r"`([^`]+)`", "$1"),                       # inline code
    (r"(?m)^#{1,6}[ \t]+", ""),                 # ATX headers
    (r"(?m)^>[ \t]?", ""),                      # blockquotes
    (r"(?m)^-{3,}[ \t]*$", ""),                 # horizontal rules
]


def markdown_strip(col):
    """Markdown -> plain text: drop fences/headers/quote markers,
    unwrap links/images/emphasis/inline code — the normalization a
    README/docs corpus needs before quality scoring and dedup (markup
    density otherwise dominates the symbol-ratio signals).

    Ordered regexp_replace chain over MD_PATTERNS — pure JVM
    expressions, zero shuffle.  Patterns avoid backreferences so the
    identical pattern strings run under DuckDB's RE2 for the oracle
    (replacement syntax is the only per-engine difference: $1 vs \\1).
    Deliberately lossy on nesting (bold inside links etc. unwraps in
    pattern order) — documented, deterministic, same in both
    engines."""
    from pyspark.sql import functions as F

    c = F.col(col) if isinstance(col, str) else col
    for pat, rep in MD_PATTERNS:
        c = F.regexp_replace(c, pat, rep)
    return c
