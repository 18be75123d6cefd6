"""Corpus-trained bigram LM quality scoring (the CCNet-style filter tier).

Quality filtering in public pipelines (CCNet, RefinedWeb, Gopher) scores
documents with a language model trained on a trusted corpus and drops the
high-perplexity tail. This module is the engine-native analogue with the LM
itself computed as DataFrames: add-one-smoothed word-bigram probabilities
trained on a reference corpus, each document scored by its mean negative
log-probability (== log-perplexity per bigram; high = unusual text).

score(d) = -mean over bigrams (w1,w2) of ln( (c(w1,w2)+1) / (c(w1,.)+V) )

No reference-repo analogue — training-data-pipeline extension surface
(README "training-data ops"), alongside the heuristic quality signals in
functions/text.py (q28) and the repetition rules (q68).

Scale shape: one explode of the corpus into bigrams, shared (lazy
localCheckpoint) across its three consumers — bigram counts, context
counts, and the scoring side — so the explode is computed once; counting is
two-phase hash agg; scoring joins are hash-equi on the bigram/context keys
(the count tables are Zipf-concentrated: ``min_count`` pruning keeps them
broadcast-able at corpus scale, with pruned bigrams falling back to the
smoothed unseen probability — recall-neutral, the score just saturates).
The vocabulary size V is a 1-row broadcast aggregate, never a collect of
the vocabulary itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as T


def doc_bigrams(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, w1, w2) — one row per consecutive word pair (normalized
    whitespace/case per functions/text.py)."""
    ws = T.words(T.normalized_text(F.col(text_col)))
    # bind the words array once as a real column (Catalyst HOFs have no
    # let-binding; a projected intermediate works at row granularity)
    d = docs.select(F.col(id_col).alias("doc_id"), ws.alias("__ws"))
    n = F.greatest(F.size("__ws") - 1, F.lit(0))
    z = F.arrays_zip(
        F.slice("__ws", 1, n),
        F.slice("__ws", 2, n),
    )
    e = d.select("doc_id", F.explode(z).alias("p"))
    return e.select(
        "doc_id",
        F.col("p.0").alias("w1"),
        F.col("p.1").alias("w2"),
    )


def lm_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    train: DataFrame | None = None,
    min_count: int = 1,
    exact_vocab: bool = True,
    rsd: float = 0.02,
) -> DataFrame:
    """(doc_id, n_bigrams, lm_score) for every doc with >= 1 bigram.

    ``train`` defaults to ``docs`` (self-trained corpus model); pass a
    trusted reference corpus for CCNet-style filtering. ``min_count``
    prunes bigrams rarer than the threshold from the model (they score as
    unseen) — the Zipf-tail bound that keeps the model broadcast-able.
    lm_score is rounded to 6dp (cross-engine float parity)."""
    bg = doc_bigrams(docs, id_col, text_col)
    tbg = bg if train is docs or train is None else doc_bigrams(train, id_col, text_col)
    tbg = tbg.localCheckpoint(eager=False)  # consumed by c2, c1, and V
    if train is None or train is docs:
        bg = tbg
    c2 = tbg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    if min_count > 1:
        c2 = c2.where(F.col("c2") >= min_count)
    c1 = tbg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    # V = distinct words anywhere in the training corpus (contexts + finals).
    # exact_vocab=False swaps the exact global distinct (the one unbounded
    # distinct-aggregate wall in this operator at 10^12 rows) for an HLL
    # sketch: V only Laplace-smooths the denominator, so an rsd-bounded V
    # perturbs lm_score by at most ~rsd/(1 + c1/V) nats per bigram — the
    # tolerance pytest in tests/test_lmscore.py bounds it empirically.
    v_agg = (
        F.countDistinct("w") if exact_vocab else F.approx_count_distinct("w", rsd)
    )
    vocab = (
        tbg.select(F.col("w1").alias("w"))
        .union(tbg.select(F.col("w2").alias("w")))
        .agg(v_agg.alias("v"))
    )
    j = (
        bg.join(c2, ["w1", "w2"], "left")
        .join(c1, ["w1"], "left")
        .crossJoin(F.broadcast(vocab))
    )
    logp = F.log(
        (F.coalesce(F.col("c2"), F.lit(0)) + 1.0)
        / (F.coalesce(F.col("c1"), F.lit(0)) + F.col("v"))
    )
    return (
        j.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg(-logp), 6).alias("lm_score"),
        )
    )
