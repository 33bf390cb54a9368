"""Aggregated declared-query registry (the t2 contract surface)."""

from __future__ import annotations

import json
from pathlib import Path

from . import gsuite, lsuite, qsuite, ssuite
from .common import Query

# Float/tie-hazard queries (the partition-invariance sample list):
# names whose canonicalization protocol is the thing most worth
# external verification, so the driver-facing order front-loads any of
# them not yet verified.  tests/test_partition_invariance.py imports
# this list as its sample, keeping one source of truth.
HAZARD_PRIORITY = [
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
    "g76_louvain_rounds",
    "g80_simrank",
    "g81_eigenvector",
    "l71_unigram_kl",
    "t76_ewma",
    "g84_edge_burstiness",
    "l72_ann_pq_rerank",
    "g89_cypher_copurchase",
    "g94_cypher_optional_match",
    "l76_dsir",
    "l77_dsir_resample",
    "l78_ccnet_buckets",
    "l81_textrank",
    "l83_bpe_merges",
    "l85_hyperloglog",
    "l92_pca_power_iteration",
    "l95_js_source_drift",
    "l103_triplet_mining",
    "g108_simrank",
    "q142_theil_sen",
    "l104_naive_bayes",
    "l111_skipgram_pairs",
    "g117_itemitem_recs",
    "t85_dtw",
    "g107_negative_sampling",
    # round-5 hazards: ALS micro-carrier division + rounded-float
    # top-25 cut (g124), RBO top-10 rank cut on exact cents (q148),
    # diagonal-island windows (l112), global ring-ordered window
    # (q150), 30-stage banded-DTW window chain (t88)
    "g124_als_rank1",
    "q148_rbo",
    "l112_ngram_span_dedup",
    "q150_consistent_hashing",
    "t88_dtw_band",
    # round-6 hazards: rounded-double top-25 cut over the capped gram
    # join (l114), x1e4 integer-truncated top-20 cut (g128), per-group
    # order-statistic selection (q154), per-row scaled-int SSW terms
    # summed as integers (q153), per-user x1e6 metric carriers (l115)
    "l114_span_dedup_capped",
    "g128_slope_one",
    "q154_split_conformal",
    "q153_anova",
    "l115_ranking_metrics",
    # round-6b hazards: recursive double fold carrying a seasonal ring
    # (t90), integer-carried R/S + 4-point log2 slope (t91), global
    # rank with x100 per-group carriers (q158), float top-1 cut on two
    # cosine frames (l119), division-ranked backoff scores (l121)
    "t90_holt_winters",
    "t91_hurst_rs",
    "q158_kruskal_wallis",
    "l119_matryoshka_audit",
    "l121_stupid_backoff",
    # global float-ranked top-20 cut on -ln(u)/w priorities (q161)
    "q161_reservoir_ares",
    # round-6b continuation hazards: 12-stage window-chain LCS (l123),
    # exp() p-values ordered under the BH step-up (q159), 3-round IRLS
    # scaled-weight folds (q162), dense-lattice JT carriers (q163),
    # double-ranked shrinkage movers cut (q164), float MA window chain
    # into scaled-int variances (t92), global (t, delta) sweep (s26)
    "l123_rouge_l",
    "q159_bh_fdr",
    "q162_huber_location",
    "q163_jonckheere_trend",
    "q164_eb_shrinkage",
    "t92_seasonal_strength",
    "s26_state_size_audit",
    # late round-6b hazards: pairwise tau over the collapsed frame
    # (q165), x1e6 log-term sums (q166), planted-jitter band edges
    # (q167), 8-way rate pivot (q168), UniMax prefix boundary (l126),
    # Chao1 singleton counts (l125), per-(doc,byte) islands (m14)
    "q165_kendall_tau_b",
    "q166_inequality_panel",
    "q167_blocking_audit",
    "q168_shapley_attribution",
    "l125_chao1_vocab",
    "l126_unimax_allocation",
    "m14_byte_run_lengths",
    # round-7 hazards: lexicographically-smallest-shortest-path
    # representative (greedy per-level array min — the tie protocol
    # nodes(p) pins) and per-pair lex-first over a full path
    # enumeration; g138's hazard is the composed symmetric closure
    # equaling the pre-built view minus seed backtracks
    "g137_cypher_path_nodes",
    "g139_cypher_path_enum",
    "g138_cypher_undirected_sp",
    # round-8 hazards: the '>'-joined path protocol on the allSP full
    # enumeration (g142 — per-path rows, the first-reach/prefix-property
    # contract), count-subquery left-join coalesce-0 semantics (g140),
    # CALL broadcast-threshold cross position (g141)
    "g142_cypher_allsp_enum",
    "g140_cypher_count_subquery",
    "g141_cypher_call_subquery",
    # the WITH-stage top-10 cut (deterministic full tiebreak — the
    # protocol worth external pinning) and the full-outer ts-window
    # rendering
    "g143_cypher_with_topk_expand",
    "s27_stream_stream_full_join",
    # round-9 hazards: correlated-CALL zero-fill left-join semantics
    # (g144 — the ASC cut surfaces the count-0/sum-0 rows, exactly the
    # protocol worth external pinning) and the count{}-as-sort-key
    # helper-drop + TakeOrdered cut (g145)
    "g144_cypher_correlated_call",
    "g145_cypher_count_subquery_order_by",
]


def _driver_verified_names() -> set[str]:
    """Names already externally verified by the driver in any prior
    round's ``CORRECTNESS_r*.json`` (written at the repo root).

    Used only by :func:`driver_ordered_queries` (the driver-facing
    coverage rotation); :func:`all_queries` never reads these files, so
    library ordering is deterministic across checkouts."""
    root = Path(__file__).resolve().parents[2]
    seen: set[str] = set()
    try:
        for f in sorted(root.glob("CORRECTNESS_r*.json")):
            try:
                data = json.loads(f.read_text())
            except (OSError, json.JSONDecodeError):
                continue
            if not isinstance(data, dict):
                continue
            for k, v in data.items():
                if not (isinstance(k, str) and isinstance(v, dict)):
                    continue
                # a name only counts as verified on a GREEN row: a full
                # hash match, or a rows-only entry that executed
                # (err == "no_oracle" with a row count).  A row the
                # driver ERRORED on (e.g. g137's r7 canonicalizer
                # TypeError) must rotate back into the sampled prefix
                # so the fix gets re-checked (VERDICT r7 item 1).
                if v.get("hash_match") is True or (
                    v.get("err") == "no_oracle" and v.get("spark_rows") is not None
                ):
                    seen.add(k)
    except OSError:
        pass
    return seen


def all_queries() -> list[Query]:
    """All declared queries in DETERMINISTIC order: interleaved
    round-robin across the four suites (q, g, s, l) so that any prefix
    samples relational, graph, streaming and LLM-pipeline operators
    alike instead of exhausting the q-suite first.

    This order depends only on the suite definitions — never on
    environment state or repo-root artifacts — so two checkouts always
    agree (pytest parametrization, docs, user iteration all see one
    stable order).  The driver entry point applies its own coverage
    rotation on top via :func:`driver_ordered_queries`."""
    from itertools import chain, zip_longest

    suites = [qsuite.QUERIES, gsuite.QUERIES, ssuite.QUERIES, lsuite.QUERIES]
    return [q for q in chain.from_iterable(zip_longest(*suites)) if q is not None]


def driver_ordered_queries() -> list[Query]:
    """Driver-facing order used by ``__spark_entry__.py`` ONLY.

    The external driver correctness-checks a fixed-size prefix (first
    ~50 entries) per round, so this order exists purely to maximize
    external verification coverage across rounds:

    1. never-driver-verified queries WITH an oracle, float/tie-hazard
       names (``HAZARD_PRIORITY``) first, then interleaved suite order;
    2. never-verified rows-only entries (no oracle — the driver can
       only count rows for these, so they must not burn a
       hash-verifiable prefix slot);
    3. previously verified names (stable interleaved order) — these are
       still regression-tested every run by the local pytest suite
       (tests/test_declared.py parametrizes over ``all_queries()``).

    The set of queries and their names are identical to
    ``all_queries()`` — only the order differs."""
    interleaved = all_queries()
    verified = _driver_verified_names()
    hazard_rank = {n: i for i, n in enumerate(HAZARD_PRIORITY)}

    fresh_oracle = [
        q for q in interleaved if q.name not in verified and q.oracle is not None
    ]
    fresh_rows_only = [
        q for q in interleaved if q.name not in verified and q.oracle is None
    ]
    stale = [q for q in interleaved if q.name in verified]

    fresh_oracle.sort(
        key=lambda q: (hazard_rank.get(q.name, len(hazard_rank)),)
    )  # stable: non-hazard entries keep interleaved order
    return fresh_oracle + fresh_rows_only + stale


def by_name() -> dict[str, Query]:
    out = {}
    for q in all_queries():
        if q.name in out:
            raise ValueError(f"duplicate declared query name {q.name}")
        out[q.name] = q
    return out
