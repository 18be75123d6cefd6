"""Referential-integrity checks via anti-joins.

Reference analogue: the audit<->questionnaire substring-membership counting
(SURVEY.md J6, features_engineering/nodes.py:300-335) and the UI's
``np.setdiff1d`` on id arrays (app_tab/interpretation.py:34). The north rule
upgrades these to proper transcript<->clip referential checks as
broadcast / sort-merge anti-joins.

Strategy selection:
- ``broadcast=True``  -> hint ``F.broadcast`` on the reference side; correct
  when the ref keyset fits executor memory (dimension-table case).
- ``broadcast=False`` -> plain join; Catalyst/AQE picks sort-merge or
  shuffled-hash for two large sides, and AQE skew-split handles hot keys.

Both directions are emitted: rows with no reference (missing_ref) and
reference rows with no data row (orphan_ref) — the latter is the reference
repo's "questionnaire question never visited" analogue.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import VIOLATION_COLS


def anti_join(left: DataFrame, right: DataFrame, key: str, broadcast: bool = True) -> DataFrame:
    r = right.select(key).distinct()
    if broadcast:
        r = F.broadcast(r)
    return left.join(r, key, "left_anti")


def referential_violations(
    df: DataFrame,
    ref: DataFrame,
    key_col: str = "clip_id",
    part_col: str = "part",
    broadcast: bool = False,
) -> DataFrame:
    """Both-direction orphan detection as VIOLATION_SCHEMA rows."""
    missing = anti_join(
        df.select(key_col, part_col), ref, key_col, broadcast=broadcast
    ).select(
        F.col(key_col).alias("key"),
        F.lit("referential_missing_ref").alias("check"),
        F.lit("clip has no reference row").alias("detail"),
        F.col(part_col).cast("int").alias("part"),
        F.lit(2.0).alias("severity"),
    )
    orphan_part = (
        F.col(part_col).cast("int") if part_col in ref.columns else F.lit(None).cast("int")
    )
    orphans = anti_join(ref, df, key_col, broadcast=broadcast).select(
        F.col(key_col).alias("key"),
        F.lit("referential_orphan_ref").alias("check"),
        F.lit("reference row has no clip").alias("detail"),
        orphan_part.alias("part"),
        F.lit(1.0).alias("severity"),
    )
    return missing.select(*VIOLATION_COLS).unionByName(orphans.select(*VIOLATION_COLS))
