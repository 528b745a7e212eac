"""anomalydetection_spark — a from-scratch PySpark-native validation engine.

Re-expresses the capabilities of the reference single-node pipeline
(ElkamelDyari/AnomalyDetection: Drain template mining → frequency filter →
embedding → scoring → quantile threshold → verdict + violation report) as a
declarative schema/constraint validation engine over Iceberg-shaped tables
of interleaved text+media documents:

- per-column statistics (count / null-rate / min / max / mean / stddev /
  exact+approx quantiles / t-digest sketches)       [reference: mlflow_utils.py:71-97]
- doc_id uniqueness via salted two-phase aggregate  [reference: preprocessing.py:4-13]
- media_ref referential integrity via anti-join     [reference: preprocessing.py:7-10]
- KL / PSI distribution drift on span histograms    [reference: VAE_utils.py:112-115]
- quantile-threshold verdicts + violation rows      [reference: end_to_end_prediction.py:447-479]
- checkpointed per-partition manifest for resume    [reference: models/drain.py:48-51]

Everything is DataFrame/SQL (Catalyst + AQE); Python only as vectorized
pandas/Arrow UDFs — never per-row.
"""

__version__ = "0.1.0"

from anomalydetection_spark.session import get_spark  # noqa: F401
