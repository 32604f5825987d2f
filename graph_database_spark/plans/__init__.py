from graph_database_spark.plans.copurchase import (
    COPURCHASE_EDGES_SQL,
    COPURCHASE_VERTICES_SQL,
    copurchase_edges,
    copurchase_vertices,
)

__all__ = [
    "COPURCHASE_EDGES_SQL",
    "COPURCHASE_VERTICES_SQL",
    "copurchase_edges",
    "copurchase_vertices",
]
