"""Constraint suggestion: profile a table and propose a validation spec.

Reference analogue: the reference's YAML column map (SURVEY.md §1.3,
conf/base/globals_template.yml:1-54) is hand-authored — someone inspected
the data and typed the dtypes and domains in. This operator automates that
authoring step (the Deequ "constraint suggestion" idea): one profiling
aggregate over the table yields, per column, the evidence for NOT NULL /
unique-key / numeric-range / categorical-domain constraints, and
``spec_from_suggestions`` turns the accepted rows into the engine's own
``TableSchemaSpec`` — so running the suggested spec back over the profiled
data produces zero violations (the loop-closure property the tests pin).

Scale notes (10^12 rows):
- The profile is ONE aggregate — a single scan with map-side partial
  aggregation. With ``exact=True`` Spark plans multiple ``count_distinct``
  columns via an Expand (each input row duplicated once per distinct
  column), so N profiled columns cost ~N scans' worth of shuffle input.
  ``exact=False`` swaps in HyperLogLog++ sketches (``rsd`` relative error):
  single pass, no Expand, sketches merge map-side — the 100 TB tier,
  mirroring operators/vocab.py. Uniqueness/categorical flags then become
  rsd-accurate heuristics — confirm a suggested key with the exact
  uniqueness check before adopting it.
- Distinct VALUES (the categorical domain list) are only materialized for
  columns the caller names in ``value_cols`` — a ``collect_set`` buffers
  every distinct value of its column in the aggregation state, which is an
  executor-memory hazard on an unprofiled high-cardinality column. The
  intended flow: profile once with no value_cols, read ``is_categorical``,
  then re-run (or run ``allowed_values``) naming only qualifying columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DateType,
    NumericType,
    StringType,
    TimestampNTZType,
    TimestampType,
)

from .schema_check import ColumnSpec, TableSchemaSpec
from .vocab import _count_distinct

_TS_FMT = "yyyy-MM-dd HH:mm:ss"


def suggest_constraints(
    df: DataFrame,
    cols: list[str] | None = None,
    *,
    allowed_max: int = 20,
    exact: bool = True,
    rsd: float = 0.05,
    value_cols: tuple = (),
) -> DataFrame:
    """Per-column constraint-suggestion profile, one row per column.

    Output columns: ``col, dtype, n_rows, n_null, n_distinct,
    suggest_not_null, suggest_unique_key, is_categorical, min_num, max_num,
    min_ts, max_ts, min_len, max_len, allowed_csv`` — type-inapplicable
    metrics are typed NULLs, so the schema is stable across column mixes.

    - ``suggest_not_null``: no NULL observed (and the table is non-empty —
      an empty table is evidence of nothing).
    - ``suggest_unique_key``: non-null and fully distinct.
    - ``is_categorical``: string column with 1..allowed_max distinct values.
    - ``allowed_csv``: the sorted distinct values joined with ``,`` — only
      for columns in ``value_cols`` that also pass ``is_categorical`` (see
      the module docstring for why this is opt-in), and only when no value
      itself contains ``,`` (the rendering is lossy there; use
      ``allowed_values`` for the authoritative list).
    """
    fields = {f.name: f.dataType for f in df.schema.fields}
    names = list(cols) if cols is not None else list(fields)
    null_d = F.lit(None).cast("double")
    null_s = F.lit(None).cast("string")
    null_l = F.lit(None).cast("long")

    aggs = [F.count(F.lit(1)).cast("long").alias("__n_rows")]
    agg_names: set[str] = set()

    def add(expr, name: str) -> None:
        aggs.append(expr.alias(name))
        agg_names.add(name)

    for c in names:
        dt = fields[c]
        col = F.col(c)
        add(F.count(col).cast("long"), f"{c}__nv")
        add(_count_distinct(c, exact, rsd).cast("long"), f"{c}__nd")
        if isinstance(dt, NumericType):
            add(F.min(col.cast("double")), f"{c}__mn")
            add(F.max(col.cast("double")), f"{c}__mx")
        elif isinstance(dt, (DateType, TimestampType, TimestampNTZType)):
            add(F.min(F.date_format(col, _TS_FMT)), f"{c}__mnts")
            add(F.max(F.date_format(col, _TS_FMT)), f"{c}__mxts")
        elif isinstance(dt, StringType):
            add(F.min(F.length(col)).cast("long"), f"{c}__mnl")
            add(F.max(F.length(col)).cast("long"), f"{c}__mxl")
        if c in value_cols:
            if not isinstance(dt, StringType):
                raise ValueError(f"value_cols entry {c!r} is not a string column")
            add(F.array_join(F.sort_array(F.collect_set(col)), ","), f"{c}__vals")
            # the csv rendering is LOSSY for values containing the join
            # char: 'red,green' would split into phantom domain values and
            # break the closure property — withhold the csv and leave
            # ``allowed_values`` (a real list, no encoding) as the path
            add(F.max(F.col(c).contains(",").cast("int")), f"{c}__comma")

    wide = df.agg(*aggs)

    stack_args: list = [F.lit(len(names))]
    for c in names:
        dt = fields[c]

        def have(suffix: str, c=c):
            return f"{c}__{suffix}" in agg_names

        stack_args += [
            F.lit(c),
            F.struct(
                F.lit(dt.simpleString()).alias("dtype"),
                F.col(f"{c}__nv").alias("nv"),
                F.col(f"{c}__nd").alias("nd"),
                (F.col(f"{c}__mn") if have("mn") else null_d).alias("mn"),
                (F.col(f"{c}__mx") if have("mx") else null_d).alias("mx"),
                (F.col(f"{c}__mnts") if have("mnts") else null_s).alias("mnts"),
                (F.col(f"{c}__mxts") if have("mxts") else null_s).alias("mxts"),
                (F.col(f"{c}__mnl") if have("mnl") else null_l).alias("mnl"),
                (F.col(f"{c}__mxl") if have("mxl") else null_l).alias("mxl"),
                # the non-foldable cardinality + no-comma guard doubles as
                # the nullability strip: array_join is NOT NULL, and stack()
                # requires every column's struct to have the identical type
                (
                    F.when(
                        (F.col(f"{c}__nd") <= F.lit(allowed_max))
                        & (F.coalesce(F.col(f"{c}__comma"), F.lit(0)) == 0),
                        F.col(f"{c}__vals"),
                    )
                    if have("vals")
                    else null_s
                ).alias("vals"),
            ),
        ]

    stacked = wide.select(
        F.col("__n_rows").alias("n_rows"), F.stack(*stack_args).alias("col", "m")
    )
    m = F.col("m")
    n_rows = F.col("n_rows")
    is_cat = (m["dtype"] == "string") & m["nd"].between(1, allowed_max)
    return stacked.select(
        F.col("col"),
        m["dtype"].alias("dtype"),
        n_rows,
        (n_rows - m["nv"]).alias("n_null"),
        m["nd"].alias("n_distinct"),
        ((n_rows > 0) & (m["nv"] == n_rows)).alias("suggest_not_null"),
        ((n_rows > 0) & (m["nv"] == n_rows) & (m["nd"] == n_rows)).alias(
            "suggest_unique_key"
        ),
        is_cat.alias("is_categorical"),
        m["mn"].alias("min_num"),
        m["mx"].alias("max_num"),
        m["mnts"].alias("min_ts"),
        m["mxts"].alias("max_ts"),
        m["mnl"].alias("min_len"),
        m["mxl"].alias("max_len"),
        F.when(is_cat, m["vals"]).alias("allowed_csv"),
    )


def allowed_values(df: DataFrame, col: str, allowed_max: int = 20) -> list:
    """Sorted distinct values of one column, for callers that profiled
    first: raises if the column exceeds ``allowed_max`` distincts instead
    of collecting an unbounded set. The distinct shuffle is bounded by the
    column's true cardinality check happening BEFORE the collect — the
    ``limit`` caps driver transfer even when the caller misjudged."""
    rows = (
        df.select(F.col(col).alias("v"))
        .where(F.col("v").isNotNull())
        .distinct()
        .limit(allowed_max + 1)
        .collect()
    )
    if len(rows) > allowed_max:
        raise ValueError(f"{col} has more than {allowed_max} distinct values")
    return sorted(r["v"] for r in rows)


def spec_from_suggestions(
    rows: list,
    *,
    key_col: str | None = None,
    part_col: str = "part",
) -> TableSchemaSpec:
    """Turn collected ``suggest_constraints`` rows (one per column — a
    bounded driver transfer) into a runnable ``TableSchemaSpec``: NOT NULL
    where suggested, numeric [min, max] range constraints from the observed
    extremes, and value domains where a categorical column's values were
    materialized. ``key_col`` defaults to the first suggested unique key.
    The closure property: ``schema_check.constraint_violations(df, spec)``
    over the profiled data itself is empty."""
    specs, key = [], key_col
    for r in rows:
        numeric = r["min_num"] is not None or r["max_num"] is not None
        allowed = r["allowed_csv"].split(",") if r["allowed_csv"] else None
        specs.append(
            ColumnSpec(
                r["col"],
                r["dtype"],
                nullable=not r["suggest_not_null"],
                allowed=allowed,
                min_value=r["min_num"] if numeric else None,
                max_value=r["max_num"] if numeric else None,
            )
        )
        if key is None and r["suggest_unique_key"]:
            key = r["col"]
    if key is None:
        raise ValueError("no unique-key column suggested; pass key_col")
    return TableSchemaSpec(columns=specs, key_col=key, part_col=part_col)


def suggestions_to_spec_doc(
    rows: list,
    *,
    key_col: str | None = None,
    part_col: str = "part",
    margin: float = 0.0,
    values: dict[str, list] | None = None,
) -> dict:
    """Render collected suggestion rows as the plain spec DOCUMENT
    ``plans/spec.py:spec_from_dict`` loads — the file a human reviews and
    checks in, closing the loop profile -> spec file -> ``validate --spec``.

    ``margin`` widens each numeric [min, max] by that fraction of the
    observed range on each side: the profiled data is a sample of the
    process, and bounds pinned at the sample extremes flag the first
    legitimately-larger value. ``values`` (col -> sorted list, e.g. from
    ``allowed_values``) takes precedence over any profiled ``allowed_csv``.
    """
    cols, key = [], key_col
    for r in rows:
        if r["col"] == part_col:
            continue
        doc: dict = {"name": r["col"], "dtype": r["dtype"]}
        if r["suggest_not_null"]:
            doc["nullable"] = False
        vals = (values or {}).get(r["col"])
        if vals is None and r["allowed_csv"]:
            vals = r["allowed_csv"].split(",")
        if vals is not None:
            doc["allowed"] = list(vals)
        if r["min_num"] is not None and r["max_num"] is not None:
            pad = margin * (r["max_num"] - r["min_num"])
            doc["min_value"] = r["min_num"] - pad
            doc["max_value"] = r["max_num"] + pad
        cols.append(doc)
        if key is None and r["suggest_unique_key"]:
            key = r["col"]
    if key is None:
        raise ValueError("no unique-key column suggested; pass key_col")
    return {"schema": {"columns": cols, "key_col": key, "part_col": part_col}}
