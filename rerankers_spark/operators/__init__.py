from rerankers_spark.operators import bm25, topk  # noqa: F401
