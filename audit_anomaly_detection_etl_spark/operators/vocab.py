"""Vocabulary building + distinct-count aggregates with an exact/approx tier.

Reference analogue: the per-entity distinct-count features (SURVEY.md A9,
features_engineering/nodes.py:238-248) and the token-frequency prep a
training-data pipeline needs (q67). Both default to EXACT aggregation —
that is what the DuckDB oracle checks — and both expose the 100 TB tier:
``exact=False`` swaps ``count_distinct`` for ``approx_count_distinct``
(HyperLogLog++, relative error ``rsd``), mirroring the exact/approx
quantile switch in operators/outliers.py. At 10^12 rows an exact distinct
over a high-cardinality key materializes every (group, key) pair through
the shuffle; HLL sketches merge map-side in O(groups * sketch_size).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import text as T


def _count_distinct(col: str, exact: bool, rsd: float) -> Column:
    return F.countDistinct(col) if exact else F.approx_count_distinct(col, rsd)


def vocabulary(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tf: int = 50,
    exact: bool = True,
    rsd: float = 0.05,
) -> DataFrame:
    """Term frequency + document frequency per normalized token, thresholded
    on tf. One explode + one hash agg with map-side combine; ``df`` is the
    distinct-doc count per token — the exact/approx switch applies to it.
    Output: (token, tf, df)."""
    ex = docs.select(
        F.col(id_col), F.explode(T.words(T.normalized_text(F.col(text_col)))).alias("token")
    )
    return (
        ex.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            _count_distinct(id_col, exact, rsd).alias("df"),
        )
        .where(F.col("tf") >= min_tf)
    )


def distinct_counts(
    df: DataFrame,
    group_col: str,
    value_col: str,
    exact: bool = True,
    rsd: float = 0.05,
) -> DataFrame:
    """Per-group distinct count + total + events-per-distinct ratio (A9).
    Output: (group_col, n_distinct, n_rows, rows_per_distinct)."""
    return df.groupBy(group_col).agg(
        _count_distinct(value_col, exact, rsd).alias("n_distinct"),
        F.count(F.lit(1)).alias("n_rows"),
        # try_divide: a group whose values are ALL NULL has n_distinct=0 and
        # plain division would abort the query under ANSI — report the group
        # with a NULL ratio instead
        F.round(
            F.try_divide(
                F.count(F.lit(1)).cast("double"),
                _count_distinct(value_col, exact, rsd),
            ),
            6,
        ).alias("rows_per_distinct"),
    )


def zipf_audit(
    docs: DataFrame,
    text_col: str = "text",
    top_n: int = 200,
    slope_lo: float = -1.5,
    slope_hi: float = -0.5,
    min_r2: float = 0.8,
) -> DataFrame:
    """Zipf rank-frequency conformance of the corpus vocabulary: natural
    language follows ``tf ~ rank^-s`` with s near 1 — a corpus whose
    log-log rank-frequency line is too flat (machine-generated /
    boilerplate-heavy text) or badly non-linear (template spam at the head)
    fails this audit before any per-document quality filter fires.

    One explode + hash agg to (term, tf); the head of the distribution is
    taken with ``orderBy(tf desc, term).limit(top_n)`` — a
    TakeOrderedAndProject, which reduces map-side: no global sort, no
    full-vocabulary shuffle. Ranks are then a row_number over the
    ALREADY-BOUNDED top_n rows (<= top_n by construction — same bounded
    exemption as q32's histogram windows), and the least-squares fit of
    ln(tf) on ln(rank) is closed-form sums, so both engines compute it
    identically.

    Returns one row: (n_terms, top_tf, slope, r2, zipf_ok).
    """
    from pyspark.sql.window import Window

    counts = (
        docs.select(F.explode(T.words(T.normalized_text(F.col(text_col)))).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    top = counts.orderBy(F.col("tf").desc(), F.col("t")).limit(top_n)
    ranked = top.select(
        "tf",
        F.row_number()
        .over(Window.orderBy(F.col("tf").desc(), F.col("t")))
        .alias("rank"),
    )
    xy = ranked.select(
        F.log(F.col("rank").cast("double")).alias("x"),
        F.log(F.col("tf").cast("double")).alias("y"),
        F.col("tf"),
    )
    s = xy.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.max("tf").cast("long").alias("top_tf"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    denx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    deny = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    # try_divide: a degenerate head — a single distinct term (denx=0) or a
    # perfectly flat rank-frequency curve, every tf equal (deny=0), which is
    # exactly the machine-generated-text failure mode this audit exists to
    # flag — must report zipf_ok=false, not abort with DIVIDE_BY_ZERO
    slope = F.try_divide(num, denx)
    r2 = F.try_divide(num * num, denx * deny)
    return s.select(
        F.col("n").cast("long").alias("n_terms"),
        "top_tf",
        F.round(slope, 6).alias("slope"),
        F.round(r2, 6).alias("r2"),
        F.coalesce(
            (slope >= F.lit(slope_lo))
            & (slope <= F.lit(slope_hi))
            & (r2 >= F.lit(min_r2)),
            F.lit(False),
        ).alias("zipf_ok"),
    )


def vocab_divergence(
    docs: DataFrame,
    side_a,
    text_col: str = "text",
    top_k: int = 500,
    jsd_norm_threshold: float = 0.1,
) -> DataFrame:
    """Jensen-Shannon divergence between two corpus slices' token
    distributions, on the shared top-``top_k`` vocabulary (by combined
    count, renormalized within it).

    The scalar-drift checks compare numeric columns; training corpora drift
    in CONTENT — a crawler picking up a new domain, a language bleeding into
    an English-only slice. JSD over the head vocabulary is the standard
    bounded ([0, ln 2]) symmetric measure of that: near 0 for same-topic
    slices, near ln 2 for disjoint vocabularies. ``side_a`` is a boolean
    Column splitting the corpus.

    Plan shape: one explode + hash agg to (token, n_a, n_b) (conditional
    sums — both sides in ONE pass, no self-join); the head is
    TakeOrderedAndProject-bounded like zipf_audit; side totals broadcast
    back; the JSD sum runs over <= top_k aggregate-grain rows. Returns one
    row (n_tokens_a, n_tokens_b, k, jsd, jsd_norm, diverged).
    """
    tok = docs.select(
        side_a.alias("a"),
        F.explode(T.words(T.normalized_text(F.col(text_col)))).alias("t"),
    )
    counts = tok.groupBy("t").agg(
        F.sum(F.when(F.col("a"), 1).otherwise(0)).alias("na"),
        F.sum(F.when(~F.col("a"), 1).otherwise(0)).alias("nb"),
    )
    top = counts.orderBy(
        (F.col("na") + F.col("nb")).desc(), F.col("t")
    ).limit(top_k)
    tot = top.agg(
        F.sum("na").cast("double").alias("ta"),
        F.sum("nb").cast("double").alias("tb"),
        F.count(F.lit(1)).cast("int").alias("k"),
    )
    j = top.crossJoin(F.broadcast(tot))
    # try_divide + coalesce: an EMPTY side (side_a matching all or no rows —
    # the maximal-divergence case this check exists for) has a zero total;
    # plain division would crash under ANSI. Treating the empty side's mass
    # as 0 makes every term p*ln(2) (m = p/2), i.e. jsd_norm = 0.5 ->
    # diverged=true, the verdict total divergence deserves.
    p = F.coalesce(F.try_divide(F.col("na").cast("double"), F.col("ta")), F.lit(0.0))
    q = F.coalesce(F.try_divide(F.col("nb").cast("double"), F.col("tb")), F.lit(0.0))
    m = (p + q) / F.lit(2.0)
    term = F.when(p > 0, p * F.log(p / m)).otherwise(F.lit(0.0)) + F.when(
        q > 0, q * F.log(q / m)
    ).otherwise(F.lit(0.0))
    agg = j.agg(
        (F.sum(term) / F.lit(2.0)).alias("jsd_raw"),
        F.max("ta").cast("long").alias("n_tokens_a"),
        F.max("tb").cast("long").alias("n_tokens_b"),
        F.max("k").alias("k"),
    )
    ln2 = 0.6931471805599453
    return agg.select(
        "n_tokens_a",
        "n_tokens_b",
        "k",
        F.round("jsd_raw", 6).alias("jsd"),
        F.round(F.col("jsd_raw") / F.lit(ln2), 6).alias("jsd_norm"),
        (F.col("jsd_raw") / F.lit(ln2) > F.lit(jsd_norm_threshold)).alias("diverged"),
    )
