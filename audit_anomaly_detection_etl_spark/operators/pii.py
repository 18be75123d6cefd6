"""PII pattern detection + redaction for training-data pipelines.

Pretraining corpora are scrubbed of personally-identifiable strings before
use (emails, phone numbers, IP addresses — the pattern classes every public
pipeline redacts, e.g. BigScience ROOTS / RefinedWeb §2.3). This module is
the pure-Catalyst tier of that step: per-document match counts, redacted
text, and grouped corpus-level stats. There is no reference-repo analogue —
it belongs to the training-data-pipeline extension surface (README
"training-data ops"), like the dedup/ANN tiers.

Patterns are deliberately written in the common subset of Java regex
(Spark) and RE2 (DuckDB oracle): character classes, bounded repetition and
``\\b`` only — no backreferences, no lookaround (RE2 has neither). Counting
uses ``regexp_count`` (Spark) vs ``len(regexp_extract_all(...))`` (DuckDB);
redaction order is fixed (email, phone, IPv4) so both engines produce
byte-identical redacted text.

Scale shape: everything here is per-row whole-stage-codegen expression work
— no UDFs, no shuffles beyond the caller's final groupBy. At 10^12 rows the
cost is one scan; the grouped stats are a two-phase hash agg.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# pattern order is the redaction order — keep the tuple stable
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+[0-9]{1,2}-[0-9]{3}-[0-9]{3}-[0-9]{4}", "<PHONE>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
)


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-row match count per PII class (email/phone/ipv4)."""
    return {name: F.regexp_count(text, F.lit(pat)) for name, pat, _ in PII_PATTERNS}


def redact(text: Column) -> Column:
    """Text with every PII match replaced by its class placeholder.

    Applied in ``PII_PATTERNS`` order: the email pattern would otherwise
    never see addresses whose local part was half-eaten by the ipv4 rule
    (emails can contain digit runs), so email goes first.
    """
    out = text
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_stats(
    df: DataFrame, text_col: str = "text", group_cols: Sequence[str] = ()
) -> DataFrame:
    """Grouped corpus PII stats: row counts, rows with any PII, per-class
    match totals, and characters removed by redaction.

    ``redacted_chars`` counts original minus redacted length — the audit
    number a privacy review wants ("how much text did scrubbing change"),
    robust to placeholder length because it is a signed delta.
    """
    t = F.col(text_col)
    counts = pii_counts(t)
    any_pii = sum(counts.values(), F.lit(0)) > 0
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(any_pii.cast("long")).alias("rows_with_pii"),
    ]
    aggs += [F.sum(c).alias(f"n_{name}") for name, c in counts.items()]
    aggs.append(
        F.sum(F.length(t) - F.length(redact(t))).alias("redacted_chars")
    )
    return df.groupBy(*group_cols).agg(*aggs)
