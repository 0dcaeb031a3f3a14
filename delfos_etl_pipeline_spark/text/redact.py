"""PII redaction + text normalization — cleaning-stage operators for a
training corpus (SURVEY.md §7 M5 extension family).

Both are pure ``regexp_replace``/``translate`` expression chains: JVM-side,
whole-stage-codegen, zero Python — at 100 TB these run at scan throughput.
Patterns are kept to the common Java-regex ∩ RE2 subset (ASCII classes,
no lookaround, no backreferences) so the DuckDB oracle applies the SAME
pattern strings and must produce byte-identical output.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (name, pattern, replacement) applied IN ORDER — order matters: emails
#: are matched before phone-ish digit runs so "u5@ex.com" never half-matches.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\b[0-9]{3}-[0-9]{3,4}(-[0-9]{4})?\b", "<PHONE>"),
]


def redact_pii(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, redacted, n_email, n_ipv4, n_phone) — counts are taken BEFORE
    replacement so they report what was found, then patterns apply in
    order. All global replaces (Spark regexp_replace is global; the
    oracle's DuckDB twin passes the 'g' flag)."""
    redacted: Column = F.col(text_col)
    counts = []
    for name, pat, _ in PII_PATTERNS:
        counts.append(
            F.regexp_count(F.col(text_col), F.lit(pat)).cast("bigint").alias(
                f"n_{name}"
            )
        )
    for _, pat, repl in PII_PATTERNS:
        redacted = F.regexp_replace(redacted, pat, repl)
    return df.select(F.col(id_col), *counts, redacted.alias("redacted"))


def normalize_text(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Canonical cleaning: strip ASCII control chars, collapse whitespace
    runs to single spaces, trim, lowercase. Emits the normalized text and
    its md5 — the content key exact dedup should group on, so
    near-identical-whitespace copies collapse to one hash."""
    t = F.col(text_col)
    cleaned = F.regexp_replace(t, r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]", " ")
    collapsed = F.trim(F.regexp_replace(cleaned, r"\s+", " "))
    norm = F.lower(collapsed)
    return df.select(
        F.col(id_col),
        norm.alias("norm_text"),
        F.md5(norm).alias("norm_md5"),
        (F.length(t) - F.length(norm)).cast("bigint").alias("chars_removed"),
    )
