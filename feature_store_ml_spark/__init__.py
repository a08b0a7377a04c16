"""feature_store_ml_spark — a PySpark-native feature-store / analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference repo ``tembolo1284/feature_store_ML`` (a single-node pandas +
scikit-learn feature-store pipeline, see SURVEY.md), re-expressed Spark-first
and extended with the relational / LLM-data-pipeline operator surface a
100 TB-scale training-data platform needs:

- ``session``    — tuned SparkSession builder (AQE, shuffle sizing, Arrow).
- ``schemas``    — explicit StructTypes for every table (never infer).
- ``io``         — parquet/CSV/JSON sources and sinks.
- ``operators``  — relational core (joins incl. as-of/range, aggregates,
                   windows, set ops), dedup (exact/MinHash/SimHash/Jaccard),
                   similarity search, text analysis, multimodal plumbing,
                   feature-store point-in-time ops.
- ``ml``         — reference-parity pipeline (synthetic source → RandomForest
                   → metrics → sinks) on MLlib, plus the profile API
                   (histogram / correlation).
- ``streaming``  — Structured Streaming twins of the event aggregations.

Design rules (enforced throughout):
1. DataFrame/SQL first — Catalyst plans everything; no RDDs.
2. Built-in ``pyspark.sql.functions`` in the hot path; Pandas UDFs only where
   built-ins genuinely can't express the semantics (multimodal decode).
3. Every operator is shuffle-conscious: broadcast small dims, one shuffle for
   as-of joins, partial aggregation everywhere, LSH instead of cross joins at
   scale.
"""

__version__ = "0.1.0"
