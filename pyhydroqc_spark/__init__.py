"""pyhydroqc_spark — a PySpark-native time-series rollup + downsample +
retention engine carrying the QC semantics of AmberSJones/pyhydroqc.

Built from scratch on the Spark DataFrame API (Catalyst-optimizable window
expressions, grouped-map Arrow UDFs for the genuinely sequential per-series
passes), over tables of pre-tokenized training sequences
``(doc_id: string, tokens: array<int32>, n_tok: int32, source: string)``.

Reference semantics are cited per-function as ``/root/reference/<file>:<line>``.
No code is copied from the reference; it is a pandas/statsmodels library,
while this engine is a distributed Spark pipeline.
"""

__version__ = "0.1.0"
