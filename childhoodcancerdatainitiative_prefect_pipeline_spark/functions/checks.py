"""Validation-side scalar predicates (SURVEY.md §2.10: F7-F13).

Each returns a boolean Column usable directly in the rule engine
(plans.rules).  Regex patterns are written in Java-regex dialect
(`rlike`) and audited against the reference's Python `re` patterns.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: F7 — PII patterns (dates, SSN, phone, ZIP) from
#: src/s3_validationry_refactored.py:620-746, combined into one
#: alternation so the scan is a single rlike per column.
PII_PATTERNS: tuple[str, ...] = (
    r"\d{1,2}[/-]\d{1,2}[/-]\d{2,4}",          # 1/2/2020, 01-02-20
    r"\d{4}[/-]\d{1,2}[/-]\d{1,2}",            # 2020-01-02
    r"\b\d{1,2}\s+(Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)[a-z]*\s+\d{2,4}\b",
    r"\b(Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)[a-z]*\s+\d{1,2},?\s+\d{2,4}\b",
    r"\b\d{3}-\d{2}-\d{4}\b",                  # SSN
    r"\b\d{3}[-.\s]\d{3}[-.\s]\d{4}\b",        # phone
)

PII_ALTERNATION = "(" + ")|(".join(PII_PATTERNS) + ")"

MD5_PATTERN = r"^[a-f0-9]{32}$"
#: F9 — key-id charset (src/s3_validationry_refactored.py:2001).
ID_CHARSET_PATTERN = r"^[a-zA-Z0-9_.@#;:-]*$"

#: Max age in days the reference allows before flagging PII
#: (>89 years, src/s3_validationry_refactored.py:749-834).
MAX_AGE_DAYS = 32849


def _c(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def contains_pii(c: Column | str) -> Column:
    """F7 — true when a free-text cell matches any PII pattern."""
    return _c(c).rlike(PII_ALTERNATION)


def is_valid_md5(c: Column | str) -> Column:
    """F8 — lowercase-hex md5 format (src/s3_validationry_refactored.py:1167-1198)."""
    return _c(c).rlike(MD5_PATTERN)


def is_valid_key_id(c: Column | str) -> Column:
    """F9 — id charset check (applies after ';' unpack)."""
    return _c(c).rlike(ID_CHARSET_PATTERN)


def is_valid_acl(acl: Column | str, file_access: Column | str) -> Column:
    """F10 — acl format: ``['*']`` for Open, ``['phsXXXXXX.cN']``-ish
    for Controlled (src/s3_validationry_refactored.py:2059-2120).
    """
    a, fa = _c(acl), _c(file_access)
    open_ok = a == "['*']"
    controlled_ok = a.rlike(r"^\['[A-Za-z0-9_.-]+'\]$") & (a != "['*']")
    return F.when(fa == "Open", open_ok).otherwise(controlled_ok)


def is_intlike(c: Column | str) -> Column:
    """F13 — value parses as an integer (reference ``if_string_int``,
    src/s3_validationry_refactored.py:36-41).  ``try_cast`` keeps the
    check inside codegen; no Python per-cell parsing.
    """
    col = _c(c)
    return col.isNotNull() & col.cast("string").try_cast("long").isNotNull()


def is_floatlike(c: Column | str) -> Column:
    """F13 — value parses as a number (``if_string_float``)."""
    col = _c(c)
    return col.isNotNull() & col.cast("string").try_cast("double").isNotNull()


def age_exceeds_limit(c: Column | str, limit: int = MAX_AGE_DAYS) -> Column:
    """F13/age-PII — ``abs(int(float(v))) > 32849``
    (src/s3_validationry_refactored.py:749-815)."""
    v = _c(c).cast("string").try_cast("double")
    return v.isNotNull() & (F.abs(v.cast("long")) > limit)


#: Email pattern for training-data redaction (additive — the
#: reference's F7 scan covers dates/SSN/phone/ZIP only).
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"

#: Redaction order matters (an SSN's tail can pre-match the date
#: pattern); both engines chain replacements in THIS order so results
#: agree byte-for-byte.
REDACT_PATTERNS: tuple[str, ...] = PII_PATTERNS + (EMAIL_PATTERN,)


def redact_pii(c: Column | str, sentinel: str = "[PII]") -> Column:
    """Replace every PII pattern occurrence with ``sentinel``.

    The redaction twin of :func:`pii_violation` (F7 is detect-only —
    the reference REJECTS values; a training-data pipeline keeps the
    text and masks the spans).  One chained ``regexp_replace`` per
    pattern, all JVM-side.
    """
    out = _c(c)
    for pat in REDACT_PATTERNS:
        out = F.regexp_replace(out, pat, sentinel)
    return out
