"""PII detection and redaction as pure Column expressions.

A 100 TB training-data pipeline screens every document for personally
identifiable information before the corpus ships; this module provides that
pass as JVM-side regex expressions (whole-stage codegen, zero Python in the
hot path).  Detection = ``regexp_count`` per category; redaction = chained
``regexp_replace`` into ``[CATEGORY]`` tokens.

The reference repo's closest analogue is the keyword/pattern sensitivity
scan (``data_normalizer.py:398-499``, ``text_processor.py:34-46`` —
pattern lists matched per row in Python); here the same per-document
pattern screen is a vectorized column pass, extended to the standard PII
categories an LLM-corpus pipeline actually redacts.

Patterns are deliberately restricted to syntax with IDENTICAL semantics in
Java regex (Spark) and RE2 (the DuckDB oracle): character classes, bounded
repetition, ``\\b`` word boundaries — no backreferences, no lookaround.
Each pattern's SQL twin is the same string, so the oracle in
``__spark_entry__.py`` runs the literal same regexes.

Scale notes: regex scans are embarrassingly parallel per-row column work —
no shuffle, no skew surface; cost is linear in corpus bytes and runs inside
the same fused scan as the other per-row rules.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Category -> (regex, replacement token). Order matters for redaction:
# longer/more-specific number shapes first so e.g. a credit-card number is
# consumed before the SSN/phone patterns could nibble at its tail.
PII_PATTERNS: dict[str, str] = {
    "card": r"\b\d{4}(-\d{4}){3}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "phone": r"\b\d{3}-\d{3}-\d{4}\b",
    "ipv4": r"\b(\d{1,3}\.){3}\d{1,3}\b",
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
}


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def pii_count(col: Column | str, kind: str) -> Column:
    """Number of non-overlapping matches of one PII category (BIGINT).

    NULL text counts as 0 matches (not NULL) so aggregates over the counts
    never silently drop null-text documents."""
    return F.coalesce(
        F.regexp_count(_c(col), F.lit(PII_PATTERNS[kind])).cast("long"),
        F.lit(0).cast("long"),
    )


def pii_counts(col: Column | str) -> list[Column]:
    """One aliased count column per category: ``n_<kind>``."""
    return [pii_count(col, k).alias(f"n_{k}") for k in PII_PATTERNS]


def redact(col: Column | str, kinds: list[str] | None = None) -> Column:
    """Replace every PII match with its ``[CATEGORY]`` token.

    Chained ``regexp_replace`` in PII_PATTERNS order (most-specific number
    shapes first); a single projection, still one codegen stage.
    """
    out = _c(col)
    for k in kinds or list(PII_PATTERNS):
        out = F.regexp_replace(out, PII_PATTERNS[k], f"[{k.upper()}]")
    return out


def has_pii(col: Column | str) -> Column:
    """True if any category matches — the cheap pre-filter for routing
    documents to the redaction writer vs the pass-through writer.

    NULL text yields False (not NULL): without the coalesce,
    ``lit(False) | NULL`` is NULL, so the routing pair
    ``filter(has_pii)`` / ``filter(~has_pii)`` would drop null-text rows
    from BOTH writers and documents would silently vanish from the split."""
    c = _c(col)
    flag = F.lit(False)
    for k in PII_PATTERNS:
        flag = flag | (F.regexp_count(c, F.lit(PII_PATTERNS[k])) > 0)
    return F.coalesce(flag, F.lit(False))
