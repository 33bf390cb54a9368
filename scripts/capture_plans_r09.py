#!/usr/bin/env python
"""Capture .explain('formatted') for every gate query plus the
operators touched in the r09 optimization round.

Usage: python scripts/capture_plans_r09.py <suffix>
Writes plans/r09/<name>_<suffix>.txt (suffix = before|after).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout
from pathlib import Path

SUFFIX = sys.argv[1] if len(sys.argv) > 1 else "before"
OUT = Path(__file__).resolve().parent.parent / "plans" / "r09"
OUT.mkdir(parents=True, exist_ok=True)
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from graph_spark.catalog import Catalog  # noqa: E402
from graph_spark.queries.registry import by_name  # noqa: E402
from graph_spark.session import get_spark  # noqa: E402

GATE = [
    "q01_scan_agg", "q03_join_agg", "q04_5way_join", "q06_semi_join",
    "q07_anti_join", "q09_nonequi_join", "q10_asof_join", "q11_distinct_agg",
    "q12_rollup", "q14_topk_per_group", "q15_window_running",
    "q17_global_topk", "q24_json", "q26_corr_subquery", "s01_tumbling_window",
    "g01_degree", "g03_bfs", "g06_pagerank", "g07_snapshot_degree",
    "l03_cosine_topk", "l04_tfidf",
]

# touched operator paths, captured on small synthetic inputs so the
# plan shape (not the data) is what's recorded
EXTRA = ["l17_ann_ivf", "l20_simhash_hamming", "l123_rouge_l", "l02_minhash_lsh"]


def grab(name, df):
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    (OUT / f"{name}_{SUFFIX}.txt").write_text(buf.getvalue())
    print(f"wrote {name}_{SUFFIX}.txt", file=sys.stderr)


def main():
    spark = get_spark("plan-capture-r09")
    spark.sparkContext.setLogLevel("ERROR")
    cat = Catalog(spark, SF)
    cat.cache_tables()
    cat.graph_edges().count()
    cat.graph_nodes().count()
    cat.graph_edges_sym().count()
    cat.graph_edges_ts().count()
    reg = by_name()
    for name in GATE + [q for q in EXTRA if q in reg]:
        try:
            grab(name, reg[name].build(spark, SF))
        except Exception as e:
            print(f"# {name} FAILED: {e}", file=sys.stderr)

    # store.align at scale shape (tiny input, same plan)
    from pyspark.sql import functions as F

    from graph_spark.temporal.store import TemporalPropertyStore

    log = spark.range(1000).select(
        (F.col("id") % 100).alias("entity_id"),
        F.concat(F.lit("p"), (F.col("id") % 2).cast("string")).alias("prop"),
        F.timestamp_seconds(F.lit(1704067200) + F.col("id")).alias("ts"),
        (F.col("id") % 7 * 1.0).alias("value"),
        F.lit(0).cast("long").alias("seq"),
    )
    grab("store_align", TemporalPropertyStore(log).align(["p0", "p1"]))


if __name__ == "__main__":
    main()
