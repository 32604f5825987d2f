"""Reusable column expressions (JVM-side, whole-stage-codegen friendly).

Everything here is built from pyspark.sql.functions — no Python UDFs —
so the expressions inline into codegen and survive a 100 TB scan.
"""

from graph_database_spark.functions.vectors import cosine_similarity, dot, l2_norm
from graph_database_spark.functions.textnorm import (
    TOKEN_PATTERN,
    normalize_text,
    text_fingerprint,
    tokens,
)

__all__ = [
    "cosine_similarity",
    "dot",
    "l2_norm",
    "TOKEN_PATTERN",
    "normalize_text",
    "text_fingerprint",
    "tokens",
]
