from rerankers_spark.rerank.ranker import (  # noqa: F401
    AVAILABLE_SCORERS,
    Reranker,
    get_reranker,
    prep_docs,
    register_scorer,
)
