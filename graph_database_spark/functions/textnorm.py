"""Text normalization / tokenization expressions.

Regex choices are deliberately portable: the same patterns behave
identically under Java regex (Spark) and RE2 (DuckDB), which keeps every
text operator oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# One token = a run of alphanumerics over lowercased text.
TOKEN_PATTERN = "[a-z0-9]+"

# BPE-ish segmentation: letter runs, digit runs, or single punctuation
# marks — a cheap deterministic proxy for subword token counting.
BPE_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9\\s]"


def normalize_text(col) -> Column:
    """Lowercase, strip non-alphanumerics (keep spaces), collapse runs of
    whitespace, trim. The deterministic near-dup key (SURVEY.md §2.11 X2)."""
    lowered = F.lower(col)
    stripped = F.regexp_replace(lowered, "[^a-z0-9 ]", "")
    collapsed = F.regexp_replace(stripped, " +", " ")
    return F.trim(collapsed)


def text_fingerprint(col) -> Column:
    """md5 hex digest of the normalized text — portable across engines."""
    return F.md5(normalize_text(col))


def tokens(col) -> Column:
    """Array of lowercase alphanumeric tokens."""
    return F.filter(F.split(normalize_text(col), " "), lambda t: t != "")
