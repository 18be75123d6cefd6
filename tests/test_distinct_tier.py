"""Exact/approx distinct-tier tolerance (verdict r4 item 7).

Every exact ``countDistinct`` left in the engine is keyed- or
domain-bounded (one-line grain note at each site); the ONE table-wide
distinct surface is variable-type classification (q42, SURVEY.md A21),
which pins exact for oracle parity and documents the
``approx_count_distinct`` swap for 10^12 rows. This test is the tolerance
evidence for that swap: the approx tier classifies identically whenever
the true cardinality is outside the threshold's +-4*rsd guard band, and
its relative error stays inside the HLL++ bound.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

RSD = 0.05
THRESHOLD = 20


@pytest.mark.parametrize("n_distinct", [3, 12, 500, 50_000])
def test_approx_tier_classifies_like_exact(spark, n_distinct):
    df = spark.range(100_000).select(
        (F.col("id") % n_distinct).cast("string").alias("v")
    )
    row = df.agg(
        F.countDistinct("v").alias("exact"),
        F.approx_count_distinct("v", RSD).alias("approx"),
    ).collect()[0]
    assert row["exact"] == n_distinct
    rel_err = abs(row["approx"] - n_distinct) / n_distinct
    assert rel_err <= 4 * RSD, f"approx {row['approx']} vs {n_distinct}"
    # classification agrees outside the guard band (all fixtures are)
    assert (row["approx"] <= THRESHOLD) == (n_distinct <= THRESHOLD)
