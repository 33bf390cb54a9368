"""Partition-count invariance: declared queries must produce identical
results when the shuffle layout changes.

This is the 1000-executor test in miniature: on a real cluster the
partition count is a deployment knob, not a semantic one, so any query
whose output depends on `spark.sql.shuffle.partitions` (float summation
order, window ties, limit-without-order, first/last nondeterminism) is
broken at scale even if it hash-matches the oracle at 32 partitions.
The declared canonicalization protocol (in-query rounding + total
ORDER BY, SURVEY §2) is exactly what should make this pass.

The sample deliberately spans the nondeterminism hazards: float aggs
(q01), windows (q15), percentiles (q27), iterative float loops
(g06/g70), kmeans (l35), grouped medians (t28), top-k ties (q14).
"""

from __future__ import annotations

import pytest

from graph_spark.queries.registry import HAZARD_PRIORITY, by_name

from .conftest import SF_SMOKE

# Single source of truth: the registry front-loads exactly this list in
# the driver-facing order (never-verified hazard queries get external
# verification first).  Kept as a registry constant so the two lists
# cannot drift; the commented history below documents why each name is
# a hazard.
SAMPLE = HAZARD_PRIORITY

_SAMPLE_HISTORY = [
    "q01_scan_agg",
    "q14_topk_per_group",
    "q15_window_running",
    "q27_percentile",
    "q73_weighted_median",
    "g04_connected_components",
    "g06_pagerank",
    "g70_temporal_pagerank",
    "l02_minhash",
    "l35_kmeans",
    "l63_lsh_recall_curve",
    "t28_rolling_median",
    "s01_tumbling_window",
    # round-2 continuation hazards: pair-state float iteration (g80),
    # power iteration + max-normalization (g81), Louvain integer argmax
    # tie-breaks (g76), KL float sum (l71), EWMA grouped-map fold
    # (t76), burstiness moments (g84), PQ shortlist cut (l72)
    "g76_louvain_rounds",
    "g80_simrank",
    "g81_eigenvector",
    "l71_unigram_kl",
    "t76_ewma",
    "g84_edge_burstiness",
    "l72_ann_pq_rerank",
    # round-3 hazards: cypher agg over float weights (g89), cypher
    # optional-match null-extension (g94), DSIR log-ratio float sums,
    # Gumbel-key global ranking (l77), ntile tercile cut (l78)
    "g89_cypher_copurchase",
    "g94_cypher_optional_match",
    "l76_dsir",
    "l77_dsir_resample",
    "l78_ccnet_buckets",
    # round-3b hazards: weighted-PageRank float loop with a top-20 cut
    # on the rounded score (l81), HLL harmonic mean (integer-exact by
    # construction — this test is what proves that claim) (l85),
    # driver-side BPE merge picks fed by distributed pair counts (l83)
    "l81_textrank",
    "l83_bpe_merges",
    "l85_hyperloglog",
    # PCA power iteration: G rounded pre-iteration is the protocol
    # under test — drift must not reappear through the loop
    "l92_pca_power_iteration",
    # round-3c hazards: JS divergence float sum ordered DESC in the
    # output (l95), d2 fold + nearest-neighbor cut (l103), SimRank
    # top-20 cut on a single-expression float (g108), Theil-Sen
    # median selection under the (slope, i, j) order (q142), NB
    # log-likelihood sums (l104)
    "l95_js_source_drift",
    "l103_triplet_mining",
    "g108_simrank",
    "q142_theil_sen",
    "l104_naive_bayes",
    # round-4 hazards: skip-gram top-25 cut on count ties (l111 —
    # total (cnt DESC, w1, w2, d) order is the protocol under test),
    # item-item top-3 per customer on summed-int score ties (g117),
    # DTW chained single-partition windows (t85), bounded negative
    # sampling's md5 rank windows (g107 after the r4 rewrite)
    "l111_skipgram_pairs",
    "g117_itemitem_recs",
    "t85_dtw",
    "g107_negative_sampling",
]


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(repr(r[c]) for c in cols) for r in df.collect())


@pytest.mark.parametrize("name", SAMPLE)
def test_result_invariant_under_shuffle_partitions(spark, name):
    q = by_name()[name]
    base = _rows(q.build(spark, SF_SMOKE))
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        alt = _rows(q.build(spark, SF_SMOKE))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert base == alt, f"{name} output depends on shuffle partition count"
