"""Composite pretraining-corpus filter: the ordered C4/Gopher rule stack.

Individual quality signals exist as separate operators (length/punct/
stopword q28, repetition q68, LM perplexity q76); real pipelines apply
them as ONE ordered rule stack and keep per-document attribution — which
rule killed a document — so corpus curation is auditable and rule
thresholds can be tuned from kill-statistics instead of re-running the
corpus. This is the C4 heuristic-stack shape (Raffel et al. 2020 §2.2)
with Gopher repetition rules (Rae et al. 2021 §A1.1.2) folded in.

No reference-repo analogue (the reference's anomaly flags are per-metric;
this is the corpus-filter composition) — training-data extension surface.

Scale shape (10^12 docs): every scalar rule is whole-stage-codegen over
the normalized token array (computed once per row); the repetition rules
reuse the q68 explode -> two-phase hash-agg shape; the single join is
entity-grained hash-equi on doc_id. No windows, no driver state, no
Python.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import text as T


@dataclass(frozen=True)
class FilterThresholds:
    """Fixed, documented thresholds — the oracle replicates them digit for
    digit. Defaults are scaled-down C4/Gopher values (the corpus fixtures
    are ~10-100-word documents; production values in comments)."""

    min_words: int = 16            # Gopher: 50
    max_words: int = 100_000       # Gopher: 100k
    min_mean_word_len: float = 2.0  # Gopher: 3
    max_mean_word_len: float = 12.0  # Gopher: 10
    max_punct_ratio: float = 0.2
    min_stopword_ratio: float = 0.02
    max_top_token_frac: float = 0.2   # Gopher table A1
    max_dup_bigram_frac: float = 0.1  # Gopher table A1


# rule evaluation order = attribution order (structural before statistical,
# the C4 convention); first_fail reports the earliest failing rule
RULE_ORDER = (
    "too_short",
    "too_long",
    "word_len_out",
    "high_punct",
    "low_stopword",
    "repetitive",
)


def filter_verdicts(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    th: FilterThresholds = FilterThresholds(),
) -> DataFrame:
    """Per-document filter verdict: one boolean per rule, ``n_fail``,
    ``keep`` (no rule fired) and ``first_fail`` (earliest firing rule in
    ``RULE_ORDER``, NULL when kept) — ``WHERE NOT keep`` is the kill-list,
    ``GROUP BY first_fail`` the tuning report."""
    # NULL text coalesces to '' so the doc is KILLED (too_short), not
    # NULL-verdicted: under ANSI size(NULL) is NULL, which would make every
    # rule NULL and let the doc slip through `WHERE NOT keep` — the one
    # document class that must never survive a corpus filter silently
    txt = F.coalesce(F.col(text_col), F.lit(""))
    ws = T.words(T.normalized_text(txt))
    n = F.size(ws)
    nd = n.cast("double")
    mean_wl = F.when(
        n > 0,
        F.aggregate(ws, F.lit(0), lambda a, x: a + F.length(x)).cast("double") / nd,
    ).otherwise(F.lit(0.0))
    stop_ratio = F.when(
        n > 0, F.size(F.filter(ws, lambda x: x.isin(T.STOPWORDS))) / nd
    ).otherwise(F.lit(0.0))
    punct_ratio = T.punct_count(txt).cast("double") / F.greatest(
        nd, F.lit(1.0)
    )

    scal = docs.select(
        F.col(id_col),
        n.alias("n_words"),
        (n < th.min_words).alias("too_short"),
        (n > th.max_words).alias("too_long"),
        ((mean_wl < th.min_mean_word_len) | (mean_wl > th.max_mean_word_len)).alias(
            "word_len_out"
        ),
        (punct_ratio > th.max_punct_ratio).alias("high_punct"),
        (stop_ratio < th.min_stopword_ratio).alias("low_stopword"),
    )

    # Gopher repetition rules: q68 shape — explode, per-(doc, gram) counts,
    # per-doc reaggregate, entity-grained join back
    toks = docs.select(F.col(id_col), F.explode(ws).alias("tok"))
    tc = toks.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("c"))
    tops = tc.groupBy(id_col).agg(
        (F.max("c").cast("double") / F.sum("c")).alias("__topf")
    )
    bgs = docs.select(F.col(id_col), F.explode(T.ngrams(txt, 2)).alias("bg"))
    bc = bgs.groupBy(id_col, "bg").agg(F.count(F.lit(1)).alias("c"))
    dupb = bc.groupBy(id_col).agg(
        (
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(F.lit(0))).cast("double")
            / F.sum("c")
        ).alias("__dupbf")
    )
    rep = tops.join(dupb, id_col, "left").select(
        id_col,
        (
            (F.col("__topf") > th.max_top_token_frac)
            | (F.coalesce(F.col("__dupbf"), F.lit(0.0)) > th.max_dup_bigram_frac)
        ).alias("repetitive"),
    )

    j = scal.join(rep, id_col, "left").withColumn(
        "repetitive", F.coalesce(F.col("repetitive"), F.lit(False))
    )
    n_fail = sum(F.col(r).cast("int") for r in RULE_ORDER)
    first_fail = None
    for r in reversed(RULE_ORDER):
        nxt = F.lit(None).cast("string") if first_fail is None else first_fail
        first_fail = F.when(F.col(r), F.lit(r)).otherwise(nxt)
    return j.select(
        id_col,
        "n_words",
        *RULE_ORDER,
        n_fail.cast("int").alias("n_fail"),
        (n_fail == 0).alias("keep"),
        first_fail.alias("first_fail"),
    )
