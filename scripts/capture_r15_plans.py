"""Capture plans/r15/<query>_{before,after}.txt — the optimization
round's plan-diff evidence (judge-checkable without running Spark).

For each touched query: the returned frame's explain("formatted") plus,
for eager iterative operators, the per-materialization pre-AQE plans via
fixpoint.PLAN_CAPTURE (Exchange count per round + the worst round's
plan), at sf0.001 so the capture runs in seconds.

Usage:
  PYTHONPATH=<checkout> python scripts/capture_r15_plans.py <suffix>
writes plans/r15/<query>_<suffix>.txt under THIS repo (cwd), sourcing
the engine from $PYTHONPATH's checkout — run once with the pre-round
worktree (suffix=before) and once with the optimized tree (after).
"""

from __future__ import annotations

import io
import os
import re
import sys

from contextlib import redirect_stdout

suffix = sys.argv[1]
sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"

from graph_database_spark import catalog  # noqa: E402
from graph_database_spark.operators import fixpoint  # noqa: E402
from graph_database_spark.session import get_spark  # noqa: E402

QUERIES = os.environ.get("R15_PLAN_QUERIES", "").split(",") if os.environ.get(
    "R15_PLAN_QUERIES"
) else [
    "ann_ivfpq",
    "pq_codes",
    "betweenness",
    "edge_betweenness",
    "bfs_distances",
    "closeness_sampled",
    "copurchase_components",
    "label_propagation",
    "kcore",
    "ktruss",
    "pagerank",
    "scc_components",
    "scc_reach",
    "topo_layers",
    "temporal_reachability",
    "sssp_weighted",
    "graph_coloring",
    "maximal_matching",
    "max_spanning_forest",
    "percolation",
    "ann_ivf",
]


def main() -> None:
    spark = get_spark("plan-capture-r15")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs("plans/r15", exist_ok=True)
    for name in QUERIES:
        fixpoint.PLAN_CAPTURE = []
        try:
            df = catalog.QUERIES[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            rounds = fixpoint.PLAN_CAPTURE or []
        finally:
            fixpoint.PLAN_CAPTURE = None
        parts = [
            f"# {name} — {suffix} ({sf_dir})",
            "",
            "## explain('formatted') of the returned frame",
            "",
            buf.getvalue(),
        ]
        if rounds:
            counts = [len(re.findall(r"Exchange ", p)) for p in rounds]
            parts += [
                f"## eager per-materialization plans: {len(rounds)}"
                " materializations",
                f"Exchange count per materialization: {counts}",
                "",
            ]
            worst = max(range(len(rounds)), key=lambda i: counts[i])
            parts += [
                f"## worst materialization (#{worst + 1},"
                f" {counts[worst]} exchanges)",
                "",
                rounds[worst][:4000],
            ]
        with open(f"plans/r15/{name}_{suffix}.txt", "w") as fh:
            fh.write("\n".join(parts) + "\n")
        n_mat = len(rounds)
        print(f"{name}: {n_mat} materializations captured", flush=True)
        for rdd in list(
            spark.sparkContext._jsc.getPersistentRDDs().values()
        ):
            rdd.unpersist()
    print("done")


if __name__ == "__main__":
    main()
