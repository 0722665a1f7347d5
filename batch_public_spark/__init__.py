"""batch_public_spark — a PySpark-native analytics/ETL engine.

A ground-up re-expression of the capabilities of the reference pipeline
(``MediaBlackout/batch_public``, surveyed in /root/repo/SURVEY.md) on top of
Apache Spark: the full relational surface comes from DataFrame/SQL/Catalyst;
the reference's pipeline semantics (timestamp normalization, text extraction,
keyed dedup, watermark-incremental processing, LLM request build/parse) are
composable DataFrame transforms; plus LLM-data-pipeline operators (dedup
families, similarity search, text analysis, multimodal columns) designed for
100 TB scale.

Layout:
  session     — SparkSession factory (AQE, Arrow, UTC, tuned shuffles)
  sources     — table loaders (parquet star schema, JSONL), catalog helpers
  functions   — column-expression library (timestamps, text, json repair, vectors)
  operators   — dedup, similarity, asof/range joins, watermark, ledger
  pipeline    — request formatter, JSONL sink, batch-output parser, orchestrator
  streaming   — structured-streaming jobs over the events table
  plans       — declared query corpus (relational + pipeline + llmops)
"""

from batch_public_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
