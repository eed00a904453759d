"""aloha_spark: a PySpark-native point-in-time feature-engineering engine
with the feature semantics of eHarmony/aloha, rebuilt Spark-first.

Layers:
* ``functions``  — Aloha-parity kernels (MurmurHash3 stringHash, bag /
  n-gram / skip-gram, SOS2 binning, Java-compatible formatting)
* ``operators``  — distributed engine: as-of join, window features,
  sessionization, dedup, similarity search, text stats
* ``sinks``      — VW / LibSVM / CSV training-line writers
* ``sources``    — table readers (parquet stand-in for Iceberg), CSV
  typed schema, multimodal binary plumbing
* ``plans``      — feature-spec JSON compiler, featurize pipeline,
  per-partition lineage + checkpoint resume
* ``data``       — deterministic synthetic transcript generators
"""

__version__ = "0.1.0"
