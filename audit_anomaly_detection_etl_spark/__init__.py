"""audit_anomaly_detection_etl_spark — a brand-new PySpark-native schema +
constraint validation engine.

Built from scratch on the Spark DataFrame / Catalyst stack with the query and
data-processing capabilities of the ``QuentinVillotta/audit_anomaly_detection_ETL``
reference (a single-node Kedro/pandas ETL — see SURVEY.md), re-targeted at
Iceberg-style tables of audio clip + transcript pairs
(``clip_id, bytes, sr_hz, dur_ms, codec, transcript``) at 10^12-row scale.

Layout
------
- ``functions/``  pure-numpy kernels (audio codecs, SNR, KS/PSI) and portable
  column-expression builders (text quality, vectors) — no Spark dependency in
  the numpy parts so they unit-test in milliseconds.
- ``sources/``    deterministic table synthesis (seeded, no wall-clock) and a
  thin ``TableIO`` that emulates Iceberg partition listing over partitioned
  parquet (no Iceberg runtime jar in this sandbox).
- ``operators/``  the validation checks and large-scale data ops, each a lazy
  DataFrame -> DataFrame program (column stats, salted uniqueness,
  referential anti-joins, drift histograms + KS/PSI, payload decode via
  Arrow-vectorized pandas UDFs, dedup families, ANN similarity).
- ``plans/``      declarative check specs, the suite runner, and the
  per-partition checkpoint / lineage / resume planner.
- ``streaming/``  incremental (Trigger.AvailableNow-style) batch validation.
"""

__version__ = "0.2.0"
