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
        F.round(
            F.count(F.lit(1)).cast("double") / _count_distinct(value_col, exact, rsd),
            6,
        ).alias("rows_per_distinct"),
    )
