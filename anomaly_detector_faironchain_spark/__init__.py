"""PySpark-native schema + constraint validation engine.

A from-scratch, DataFrame-first engine with the capabilities of the
reference anomaly-detection pipeline (RodyHuang/anomaly-detector-faironchain):
declarative constraints (column stats, uniqueness, referential integrity,
format/domain/range checks, distribution-drift scoring) compiled into a
minimal number of scan passes, emitting per-partition pass/fail verdicts
plus materialized violation rows, resumable from per-partition checkpoints.

Everything here is public-API PySpark (pyspark.sql + Arrow-vectorized
pandas UDFs). No per-row Python in any hot path.
"""

__version__ = "0.1.0"
