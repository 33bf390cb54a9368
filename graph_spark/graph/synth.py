"""Deterministic synthetic graph generator (distributed-path benching).

The declared graph views are rollups orders of magnitude smaller than
the fact tables (SCALE.md), so every sf0.1 bench number exercises the
numpy small-graph kernel.  To measure the >`LOCAL_EDGE_THRESHOLD`
regime — the path that carries the 100 TB story — we need a graph that
is actually big.  This generator builds one distributively: edges are
pure column expressions over `spark.range` (xxhash64 endpoints), so a
billion-edge graph costs no driver memory and no data movement beyond
the persist, and the same (n_edges, n_nodes, seed) triple reproduces
the identical graph on any cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def synthetic_edges(
    spark: SparkSession,
    n_edges: int,
    n_nodes: int,
    seed: int = 7,
    symmetric: bool = False,
) -> DataFrame:
    """Uniform random directed multigraph as (src, dst) string ids.

    Endpoints are xxhash64(row-id, seed) mod n_nodes — fully
    column-expression, deterministic, and embarrassingly parallel.
    Self-loops are dropped (algorithms here assume simple-ish graphs).
    `symmetric=True` unions the reverse orientation (what
    connected_components / k_core expect).
    """
    base = spark.range(n_edges)
    src = F.concat(
        F.lit("n"), F.pmod(F.xxhash64(F.col("id"), F.lit(seed)), F.lit(n_nodes)).cast("string")
    )
    dst = F.concat(
        F.lit("n"),
        F.pmod(F.xxhash64(F.col("id"), F.lit(seed + 1)), F.lit(n_nodes)).cast("string"),
    )
    e = base.select(src.alias("src"), dst.alias("dst")).filter(F.col("src") != F.col("dst"))
    if symmetric:
        e = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    return e
