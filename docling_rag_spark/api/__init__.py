from docling_rag_spark.api import service  # noqa: F401
