from rerankers_spark.functions.tokenize import (  # noqa: F401
    TOKEN_SPLIT_RE,
    tokenize_col,
    tokenize_pandas_udf,
    tokenize_py,
)
