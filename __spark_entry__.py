"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

The real surface lives in ``graph_database_spark.catalog``; this module
is a thin re-export so the engine stays importable as a library.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from graph_database_spark import catalog


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the reference's proof-1 hypothesis pipeline
    (src/main.js:29-46) over the derived co-purchase graph at sf0.001."""
    return catalog.q_hypothesis_pct(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 / §2.11."""
    return dict(catalog.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query key; rows-only ops are omitted
    (catalog.ROWS_ONLY) and get the driver's weaker rows-only check."""
    return catalog.oracle_sql()
