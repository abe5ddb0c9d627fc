"""data_ingestion_py_spark — a PySpark-native analytics/ingestion engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference ``egorji/data_ingestion.py`` (a single-node PDF→snippet ETL
pipeline with a MongoDB catalog), extended with the operators a
large-scale LLM-training-data pipeline needs (dedup, similarity search,
text analysis, multimodal columns).

Design stance (see SURVEY.md §7):

- State is tables; mutations are set-based ``(state, command) -> state``
  pure functions (no per-row round trips, no compensation sagas).
- The flat ``snippets`` serving table is a deterministic derived view of
  the documents table: ``snippets = snippetize(documents)``.
- Everything that can be column algebra IS column algebra (whole-stage
  codegen); Python appears only at true UDF boundaries (PDF decode, OCR)
  and there only as Arrow-batched ``mapInPandas``.
- Every operator is designed for a 1000-executor / 100 TB deployment:
  broadcast the small dims, pre-partition the big facts, never collect.
"""

from data_ingestion_py_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
