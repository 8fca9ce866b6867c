"""The extraction operator: vectorized Arrow-batched UDF stage.

This is the Spark expression of the reference's core extractor chain
O3->O9->O13 (services/file_processor.py dispatch, the Gemini call at
services/gemini_service.py:61-146 replaced by the deterministic oracle,
schema projection at services/business_license_processor.py:233-239).

Per BASELINE.json ``input_hint``: all hot-path work runs inside
``mapInPandas`` over Arrow record batches of the BinaryType ``html``
column — there is **no per-row Python UDF dispatch**; per-document
Python inside the batch kernel is the allowed pattern (SURVEY.md
§2.3).  The kernel is the *same* function as the pytest oracle
(`ocr_spark.extractor.core.extract_bytes`), which is what makes
byte-equality structural rather than aspirational.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ocr_spark.extractor.core import extract_bytes

__all__ = ["extract_pages", "EXTRACT_RESULT_FIELDS", "SPAN_TYPE"]

SPAN_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("start", T.LongType(), False),
            T.StructField("end", T.LongType(), False),
            T.StructField("kind", T.StringType(), False),
        ]
    )
)

# Output contract of the extraction stage (FIXTURES.md §2).
EXTRACT_RESULT_FIELDS = [
    T.StructField("text", T.StringType(), True),
    T.StructField("spans", SPAN_TYPE, True),
    T.StructField("n_blocks", T.IntegerType(), True),
    T.StructField("status", T.StringType(), True),
    T.StructField("error_msg", T.StringType(), True),
    T.StructField("doc_kind", T.StringType(), True),
    T.StructField("bytes_in", T.LongType(), True),
    T.StructField("bytes_out", T.LongType(), True),
    T.StructField("extract_ms", T.LongType(), True),
]


def extract_pages(
    df: DataFrame,
    payload_col: str = "html",
    passthrough: tuple[str, ...] = ("url",),
    all_pages: bool = False,
    with_spans: bool = True,
    dedup_first: str | None = None,
    profiles: dict | None = None,
    profile_col: str | None = None,
) -> DataFrame:
    """Run the deterministic extractor over a pages DataFrame.

    Input: any DataFrame with a BinaryType ``payload_col`` plus the
    ``passthrough`` columns (carried through untouched — keep this list
    minimal so Catalyst prunes the parquet scan to exactly what the
    stage needs).  Output: passthrough columns + EXTRACT_RESULT_FIELDS.

    ``dedup_first``: name of a key column (must be in ``passthrough``)
    for streaming keep-FIRST-per-key dedup inside the kernel.  Contract:
    the input is partitioned by a pure function of the key (all captures
    of a url share a partition) and ``sortWithinPartitions(key, ...)``
    has placed the winning capture first in each key group.  This turns
    keep-latest dedup into an O(1)-state streaming filter that rides the
    one html exchange instead of costing its own shuffle of the multi-MB
    payload column (SURVEY.md §4.2 "never shuffle html twice").

    ``profiles``/``profile_col``: per-key extraction profiles (the
    reference's per-country config, O7/O8 — normalized exactly per
    config.py:31-42 rules and shipped to executors with the task
    closure, the broadcast-dim pattern).  Each row resolves
    ``profiles[lower(strip(row[profile_col]))]`` falling back to
    ``profiles['default']`` then engine defaults; the resolved dict
    tunes the HTML classifier thresholds (core._classify).

    ``extract_ms`` is wall-clock metadata (the analogue of the
    reference's declared-but-unused processing_duration_ms,
    models.py:15-18) and is excluded from determinism contracts.
    """
    if dedup_first is not None and dedup_first not in passthrough:
        raise ValueError(f"dedup_first={dedup_first!r} must be in passthrough")
    if profile_col is not None and profile_col not in passthrough:
        raise ValueError(f"profile_col={profile_col!r} must be in passthrough")
    if profiles is not None:
        from ocr_spark.extractor.profiles import normalize_config
        norm_profiles = normalize_config(profiles)
        default_profile = norm_profiles.get("default")
    else:
        norm_profiles, default_profile = {}, None
    in_fields = [df.schema[c] for c in passthrough]
    result_fields = list(EXTRACT_RESULT_FIELDS)
    if not with_spans:
        result_fields = [f for f in result_fields if f.name != "spans"]
    out_schema = T.StructType(in_fields + result_fields)
    cols = list(passthrough) + [payload_col]

    def kernel(batches):
        import pandas as pd  # executor-side import

        prev_key = None  # streaming dedup state; partition == key scope
        for pdf in batches:
            if dedup_first is not None and len(pdf):
                keys = pdf[dedup_first]
                keep = keys.ne(keys.shift())  # first row of each adjacent group
                if prev_key is not None and len(keys):
                    keep.iloc[0] = keys.iloc[0] != prev_key
                prev_key = keys.iloc[-1]
                pdf = pdf[keep].reset_index(drop=True)
            n = len(pdf)
            if n == 0:
                continue
            out = {c: pdf[c] for c in passthrough}
            texts, spans, n_blocks, status, error_msg = [], [], [], [], []
            doc_kind, bytes_in, bytes_out, extract_ms = [], [], [], []
            if profile_col is not None and norm_profiles:
                keys = pdf[profile_col]
                row_profiles = [
                    norm_profiles.get(str(k).lower().strip(), default_profile)
                    if k is not None else default_profile
                    for k in keys
                ]
            else:
                row_profiles = [default_profile] * n
            for payload, prof in zip(pdf[payload_col], row_profiles):
                t0 = time.perf_counter()
                r = extract_bytes(bytes(payload) if payload is not None else b"",
                                  all_pages=all_pages, profile=prof)
                dt_ms = int((time.perf_counter() - t0) * 1000)
                texts.append(r["text"])
                if with_spans:
                    spans.append(
                        [{"start": s, "end": e, "kind": k} for s, e, k in r["spans"]]
                    )
                n_blocks.append(r["n_blocks"])
                status.append(r["status"])
                error_msg.append(r["error_msg"])
                doc_kind.append(r["doc_kind"])
                bytes_in.append(len(payload) if payload is not None else 0)
                bytes_out.append(len(r["text"].encode("utf-8")))
                extract_ms.append(dt_ms)
            out["text"] = texts
            if with_spans:
                out["spans"] = spans
            out["n_blocks"] = n_blocks
            out["status"] = status
            out["error_msg"] = error_msg
            out["doc_kind"] = doc_kind
            out["bytes_in"] = bytes_in
            out["bytes_out"] = bytes_out
            out["extract_ms"] = extract_ms
            yield pd.DataFrame(out)

    return df.select(*cols).mapInPandas(kernel, schema=out_schema)
