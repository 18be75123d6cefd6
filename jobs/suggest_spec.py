"""Profile a clips table and write a suggested validation-spec file.

Closes the spec-authoring loop: the reference's YAML column map is
hand-written (SURVEY.md §1.3); here

    python jobs/suggest_spec.py --data /path/clips --out /path/spec.json

profiles the table once (operators/profiler.py), materializes value
domains only for the columns that proved categorical, and writes the spec
DOCUMENT that ``jobs/validate.py --spec`` loads — after a human review,
which is the point: the file is the reviewable artifact.

The written spec is round-tripped through ``plans/spec.py:spec_from_dict``
before it touches disk, so an emitted file can never fail to load.

Scale: one profiling aggregate (exact distinct = Expand, one scan's worth
of shuffle per profiled column; ``--approx`` swaps in HLL sketches for a
true single pass) plus one bounded distinct per categorical column.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from audit_anomaly_detection_etl_spark.operators import profiler
from audit_anomaly_detection_etl_spark.plans.spec import spec_from_dict
from audit_anomaly_detection_etl_spark.session import get_spark
from audit_anomaly_detection_etl_spark.sources import tableio


def main(argv: list[str] | None = None) -> dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True, help="table root to profile")
    ap.add_argument("--out", required=True, help="spec .json path to write")
    ap.add_argument("--master", default=None)
    ap.add_argument("--key-col", default=None,
                    help="override the suggested unique-key column")
    ap.add_argument("--part-col", default="part")
    ap.add_argument("--allowed-max", type=int, default=20,
                    help="max distinct values for a categorical-domain suggestion")
    ap.add_argument("--margin", type=float, default=0.0,
                    help="widen numeric [min,max] by this fraction of the "
                    "observed range on each side")
    ap.add_argument("--approx", action="store_true",
                    help="HLL distinct counts (single pass, no Expand) — "
                    "flags become rsd-accurate heuristics")
    args = ap.parse_args(argv)

    spark = get_spark(master=args.master)
    df = tableio.read_table(spark, args.data)
    rows = profiler.suggest_constraints(
        df, allowed_max=args.allowed_max, exact=not args.approx
    ).collect()

    # second, bounded pass: distinct values only for proven categoricals
    values = {
        r["col"]: profiler.allowed_values(df, r["col"], args.allowed_max)
        for r in rows
        if r["is_categorical"] and r["col"] != args.part_col
    }
    doc = profiler.suggestions_to_spec_doc(
        rows,
        key_col=args.key_col,
        part_col=args.part_col,
        margin=args.margin,
        values=values,
    )
    spec_from_dict(doc)  # must load before it may be written
    with open(args.out, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)

    summary = {
        "out": args.out,
        "n_columns": len(doc["schema"]["columns"]),
        "key_col": doc["schema"]["key_col"],
        "categorical": sorted(values),
        "profile": [
            {k: r[k] for k in ("col", "dtype", "n_rows", "n_null", "n_distinct")}
            for r in rows
        ],
    }
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main()
