"""PII detection + redaction over the ``documents`` table — the
scrubbing pass every released pretraining corpus runs (ROOTS/BigScience
and Dolma both ship regex-family PII pipelines: emails, phone numbers,
IP addresses, national-id-shaped numbers).

Everything here is built-in ``regexp_count`` / ``regexp_replace`` —
JVM-side, whole-stage-codegen, zero shuffles: at 100 TB the scrub is a
pure map over the scan, so it costs one pass and parallelizes
perfectly. Patterns stay inside the RE2-compatible subset (no
lookaround, no backrefs) so a DuckDB/RE2 oracle — or a Go/Rust
re-implementation — matches Java's engine byte-for-byte.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .text import _docs

# Detection patterns, RE2-safe. Order matters for redaction: emails
# first (an email's host can look like an IPv4 / its local part can
# contain digits), then the id-shaped numbers from most to least
# specific (ssn 3-2-4 before phone 3-3-4 — disjoint shapes, but keep
# the convention), IPv4 last.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("phone", r"\b\+?\d{3}[-. ]\d{3}[-. ]\d{4}\b"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b"),
)


def redact_col(col: F.Column) -> F.Column:
    """Sequentially replace each PII family with its typed placeholder
    (``<EMAIL>``, ``<SSN>``, ...) — typed tokens keep the redacted text
    trainable (the model still sees 'an email goes here')."""
    out = col
    for name, pat in PII_PATTERNS:
        out = F.regexp_replace(out, pat, f"<{name.upper()}>")
    return out


def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document PII counts (on the ORIGINAL text, per family) plus
    the redacted text. Returns (doc_id, n_email, n_ssn, n_phone,
    n_ipv4, n_pii, text_redacted); ``n_pii`` counts every family hit
    BEFORE redaction, so a doc whose email hides an IPv4-shaped host
    still reports the email exactly once."""
    d = _docs(spark, sf_dir)
    counts = [F.regexp_count("text", F.lit(pat)).cast("long")
              .alias(f"n_{name}") for name, pat in PII_PATTERNS]
    return d.select(
        "doc_id", *counts,
        redact_col(F.col("text")).alias("text_redacted"),
    ).withColumn(
        "n_pii",
        sum(F.col(f"n_{name}") for name, _ in PII_PATTERNS),
    ).select("doc_id", "n_email", "n_ssn", "n_phone", "n_ipv4",
             "n_pii", "text_redacted")
