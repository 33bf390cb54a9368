"""One-shot SCC crossover experiment at 50M edges / 4M nodes.

VERDICT r02 asked for the distributed-vs-local crossover to be
DEMONSTRATED, not extrapolated: at 5M edges numpy led 1.87x, at 20M
the gap closed to ~1.23x, extrapolating the crossover to ~40-60M.
This script measures both kernels once at 50M (not part of bench.py —
several minutes per side) and prints one JSON line for SCALE.md.

Run alone (never while pytest/bench runs):
    python scripts/scc_crossover_50m.py
"""

import json
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from graph_spark.graph import algorithms as alg  # noqa: E402
from graph_spark.graph.property_graph import PropertyGraph  # noqa: E402
from graph_spark.graph.synth import synthetic_edges  # noqa: E402
from graph_spark.session import get_spark  # noqa: E402


def main() -> None:
    spark = get_spark("scc-crossover-50m")
    n_edges, n_nodes = 50_000_000, 4_000_000
    e = synthetic_edges(spark, n_edges, n_nodes).persist()
    out = {"edges": e.count(), "nodes": n_nodes}
    v = e.select(F.col("src").alias("id")).distinct()
    g = PropertyGraph(v, e)

    for key, local in (("scc_dist", False), ("scc_local", True)):
        t0 = time.perf_counter()
        n = alg.strongly_connected_components(g, local=local).count()
        out[key] = round(time.perf_counter() - t0, 3)
        print(f"# {key}: {out[key]}s ({n} rows)", file=sys.stderr)

    out["ratio_dist_over_local"] = round(out["scc_dist"] / out["scc_local"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
