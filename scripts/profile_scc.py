"""Per-stage wall-clock profile of the scc family at a given sf_dir.

r13 bisect harness for the r12 scc_reach regression (VERDICT r12 #1):
times the edge build, scc_components (with per-fixpoint round counts
from the operators' own stats hook), the reach sketch, and the layer
readout — calling the REAL operators so the profile cannot drift out
of sync with operators/scc.py.

Run: PYTHONPATH=/root/repo python scripts/profile_scc.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .appName("profile_scc")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from graph_database_spark import catalog
    from graph_database_spark.operators import scc as S

    t0 = time.monotonic()
    d = S.orient_md5(catalog._edges(spark, sf_dir)).localCheckpoint()
    n_edges = d.count()
    t1 = time.monotonic()
    print(f"edges: {n_edges} rows in {t1 - t0:.2f}s", flush=True)

    stats: dict = {}
    scc = S.scc_components(d, stats=stats)
    n_scc = scc.count()
    t2 = time.monotonic()
    print(f"scc_components: {n_scc} rows in {t2 - t1:.2f}s "
          f"(phases={stats.get('phases')})", flush=True)

    reach = S.scc_reach_sketch(d, scc)
    n_reach = reach.count()
    t3 = time.monotonic()
    print(f"scc_reach_sketch (scc reused): {n_reach} rows in {t3 - t2:.2f}s",
          flush=True)

    layers = S.condensation_layers(d, scc)
    n_lay = layers.count()
    t4 = time.monotonic()
    print(f"condensation_layers (scc reused): {n_lay} rows in {t4 - t3:.2f}s",
          flush=True)

    print("fixpoint rounds (fused):", stats.get("rounds"))
    print(f"TOTAL {t4 - t0:.2f}s (end-to-end q_scc_reach equivalent: "
          f"{t3 - t0:.2f}s)")
    spark.stop()


if __name__ == "__main__":
    main()
