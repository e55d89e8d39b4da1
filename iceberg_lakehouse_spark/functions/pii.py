"""Shared PII patterns + redaction Column helper.

One definition for every consumer (streaming curation sink, future
batch callers), so the tokenization/redaction the dedup fingerprint
depends on can't silently diverge between the batch and stream twins.
Patterns are CASE-INSENSITIVE — 'John.Doe@Example.COM' is as much PII
as its lowercase form. (The oracle-paired ``pii_redaction`` suite
query keeps its own lowercase literals because its injected fixtures
are lowercase by construction and the DuckDB twin must match
character-for-character; this module is the generic production
surface.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EMAIL_PATTERN = r"(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PHONE_PATTERN = r"555-[0-9]{4}"


def redact(col: Column | str, email_to: str = "<EMAIL>",
           phone_to: str = "<PHONE>") -> Column:
    """Replace emails and phone numbers with placeholders — pure Column
    expression (map-side, parquet-scan speed at any corpus size)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(
        F.regexp_replace(c, EMAIL_PATTERN, email_to), PHONE_PATTERN, phone_to
    )
