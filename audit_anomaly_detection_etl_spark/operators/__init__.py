"""Validation checks and large-scale data operators.

Every operator is a lazy ``DataFrame -> DataFrame`` program: nothing here
triggers an action, so the suite runner can compose checks into one plan per
pass and let Catalyst share the scan. Violation rows from every check share
one schema (``VIOLATION_SCHEMA``) so they union into a single ranked output,
mirroring the reference's ranked anomaly output (SURVEY.md O1,
model_output/nodes.py:86-112).
"""

from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

# (key, check, detail, part, severity) — severity ranks the final output;
# reference analogue: anomaly_prediction desc, anomaly_score desc.
VIOLATION_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("check", StringType()),
        StructField("detail", StringType()),
        StructField("part", IntegerType()),
        StructField("severity", DoubleType()),
    ]
)

VIOLATION_COLS = [f.name for f in VIOLATION_SCHEMA.fields]
