"""Extraction profiles: the engine's analogue of the reference's
country-config machinery.

Ports the semantics of:
  * config load + normalization  <- config.py:19-62 (O2): root must be a
    dict; non-string keys and non-dict values are skipped; keys lowercased.
  * schema lookup                <- services/business_license_processor.py:24-54 (O7)
  * schema projection, null-fill <- services/business_license_processor.py:233-239 (O13)
  * dot-path field extract       <- utils/response_parser.py:91-117 (O14)
  * candidate validation         <- services/business_license_processor.py:102-114 (O6):
    lowercase + strip, reject 'unknown' or out-of-config values.

In the Spark job the normalized profile dict is broadcast
(``sc.broadcast``) and consulted inside the Arrow UDF batches.
"""

from __future__ import annotations

import json
from typing import Any

__all__ = [
    "normalize_config",
    "load_config",
    "get_schema",
    "project_schema",
    "extract_field",
    "validate_lang",
    "DEFAULT_PROFILES",
]

# Per-lang extraction profiles (replaces per-country gemini_ocr_schema,
# country_config.json:2-23).  Parameters feed the block classifier.
DEFAULT_PROFILES: dict[str, dict[str, Any]] = {
    "default": {"max_link_density": 1.0 / 3.0, "min_words": 16,
                "fields": {"text": "main content", "spans": "block offsets"}},
    "ko": {"max_link_density": 1.0 / 3.0, "min_words": 16,
           "fields": {"text": "main content", "spans": "block offsets"}},
}


def normalize_config(raw: Any) -> dict[str, dict]:
    """Normalize a raw profile/config mapping exactly per config.py:31-42:
    require a dict root (else empty), keep only str keys mapping to dict
    values, lowercase the keys."""
    if not isinstance(raw, dict):
        return {}
    out: dict[str, dict] = {}
    for k, v in raw.items():
        if isinstance(k, str) and isinstance(v, dict):
            out[k.lower()] = v
    return out


def load_config(path: str) -> dict[str, dict]:
    """Load + normalize; failures degrade to {} rather than raise
    (app.py:101-107, config.py:56-62)."""
    try:
        with open(path, encoding="utf-8") as f:
            return normalize_config(json.load(f))
    except Exception:
        return {}


def get_schema(config: dict[str, dict], key: str) -> dict | None:
    """Resolve the per-key schema; None for unsupported (the 400
    analogue, services/business_license_processor.py:44-54)."""
    entry = config.get(key.lower().strip())
    if entry is None:
        return None
    schema = entry.get("fields", entry.get("gemini_ocr_schema"))
    return schema if isinstance(schema, dict) else None


def project_schema(extracted: dict, schema_keys) -> dict:
    """Project onto exactly the schema keys, null-filling misses and
    dropping extras (services/business_license_processor.py:235-239)."""
    return {k: extracted.get(k) for k in schema_keys}


def extract_field(data: Any, path: str, default: Any = None) -> Any:
    """Safe dot-path nested dict traversal
    (utils/response_parser.py:91-117)."""
    cur = data
    for part in path.split("."):
        if isinstance(cur, dict) and part in cur:
            cur = cur[part]
        else:
            return default
    return cur


def validate_lang(value: str | None, config: dict[str, dict]) -> str | None:
    """Lowercase/strip and validate against configured keys; reject
    'unknown' or out-of-config (services/business_license_processor.py:102-114).
    Returns the normalized key or None."""
    if not value:
        return None
    norm = value.lower().strip()
    if norm == "unknown" or norm not in config:
        return None
    return norm
