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


def __getattr__(name):
    """Lazy top-level API (keeps ``import data_ingestion_py_spark``
    free of Spark-session side effects and import cycles)."""
    _API = {
        "snippetize": ("data_ingestion_py_spark.operators.snippetize", "snippetize"),
        "asof_join": ("data_ingestion_py_spark.operators.asof", "asof_join"),
        "time_proximity_pairs": (
            "data_ingestion_py_spark.operators.rangejoin",
            "time_proximity_pairs",
        ),
        "salted_join": ("data_ingestion_py_spark.operators.skew", "salted_join"),
        "exact_duplicates": (
            "data_ingestion_py_spark.operators.dedup",
            "exact_duplicates",
        ),
        "near_duplicates_minhash": (
            "data_ingestion_py_spark.operators.dedup",
            "near_duplicates_minhash",
        ),
        "embedding_near_duplicates": (
            "data_ingestion_py_spark.operators.similarity",
            "embedding_near_duplicates",
        ),
        "cosine_topk": (
            "data_ingestion_py_spark.operators.similarity",
            "cosine_topk",
        ),
        "ivf_topk": ("data_ingestion_py_spark.operators.similarity", "ivf_topk"),
        "sessionize_stream": (
            "data_ingestion_py_spark.streaming.stateful",
            "sessionize_stream",
        ),
        "load_table": ("data_ingestion_py_spark.io", "load_table"),
        "register_views": ("data_ingestion_py_spark.io", "register_views"),
        "QUERIES": ("data_ingestion_py_spark.queries", "QUERIES"),
    }
    if name in _API:
        import importlib

        mod, attr = _API[name]
        if name == "QUERIES":  # ensure extension registries are loaded
            importlib.import_module("data_ingestion_py_spark.queries_ext")
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = [
    "get_spark",
    "snippetize",
    "asof_join",
    "time_proximity_pairs",
    "salted_join",
    "exact_duplicates",
    "near_duplicates_minhash",
    "embedding_near_duplicates",
    "cosine_topk",
    "ivf_topk",
    "sessionize_stream",
    "load_table",
    "register_views",
    "QUERIES",
]
__version__ = "0.1.0"
