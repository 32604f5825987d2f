"""graph_database_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capability surface of the
reference repo ``debalin/graph-database`` (a Node.js + Neo4j ego-network
analytics pipeline; see SURVEY.md), extended with the LLM-data-pipeline
operators (dedup, similarity search, multimodal columns, text analysis)
and designed for horizontal scale: DataFrame/Catalyst plans, no
row-at-a-time Python in hot paths, broadcast-able dimensions, canonical
edge representation to halve shuffle volume.

Layout:
  sources/    parquet + SNAP ego-network text ingest, JSONL/CSV/ORC,
              bucketed co-located layout
  sinks/      text-file result sinks (.proofs/.metrics), partitioned +
              Z-order clustered parquet writers
  plans/      derived graph constructions (co-purchase graph)
  operators/  graph analytics, betweenness, components, dedup, similarity,
              text, events, temporal joins, multimodal binary columns
  functions/  reusable column expressions (vector math, text normalization)
  streaming/  Structured Streaming variants of the event operators
graph_api.py / corpus_api.py expose the SparkGraph and Corpus
facades; engine.py the SQL
entry point; catalog.py the driver-facing query surface (QUERIES /
oracle_sql).
"""

__version__ = "0.1.0"

from graph_database_spark.graph_api import SparkGraph  # noqa: E402,F401
from graph_database_spark.corpus_api import Corpus  # noqa: E402,F401
