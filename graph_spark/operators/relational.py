"""Relational operators that Spark lacks as single primitives.

Each is a composition of DataFrame ops chosen for shuffle economy at
scale — no crossJoin, no collect, no row-at-a-time Python.

Capability parity target: the temporal/as-of query surface of the
reference system (see SURVEY.md §2.B Q09/Q10, §2.D) — re-expressed as
idiomatic Spark plans rather than index lookups.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str] | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.ts <= left.ts`` within the same `on` keys (LEFT semantics:
    left rows with no match keep NULLs).

    Implementation: tag-and-union + window `last(ignorenulls)` — a single
    shuffle on (keys, ts) instead of a non-equi join.  This is the plan
    that survives 100 TB: both sides shuffle once on the equi keys; no
    broadcast of a fact table, no range crossJoin.  Ties (right.ts ==
    left.ts) count as matches: right rows sort before left rows at equal
    timestamps via the side tag.

    direction="forward" flips the read: the EARLIEST right row with
    ``right.ts > left.ts`` (strictly after — the next-event semantics).
    Same single shuffle; only the window frame and the null-skipping
    edge (first vs last) change.  At equal timestamps the right row
    sorts before the left row, so the forward frame starting at the
    left row correctly excludes equal-ts matches.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward or forward, got {direction!r}")
    value_cols = list(value_cols or [c for c in right.columns if c not in (*on, right_ts)])

    lt = left.withColumn("__side", F.lit(1)).withColumn("__ts", F.col(left_ts))
    rt = right.withColumn("__side", F.lit(0)).withColumn("__ts", F.col(right_ts))
    for c in value_cols:
        rt = rt.withColumn(f"__v_{c}", F.col(c))
        lt = lt.withColumn(f"__v_{c}", F.lit(None).cast(rt.schema[f"__v_{c}"].dataType))
    rt = rt.withColumn("__r_ts", F.col(right_ts))
    lt = lt.withColumn("__r_ts", F.lit(None).cast(rt.schema["__r_ts"].dataType))

    keep = list(on) + ["__side", "__ts", "__r_ts"] + [f"__v_{c}" for c in value_cols]
    unioned = lt.select(*keep, *[c for c in left.columns if c not in keep]).unionByName(
        rt.select(*keep), allowMissingColumns=True
    )

    base = Window.partitionBy(*on).orderBy(F.col("__ts").asc(), F.col("__side").asc())
    if direction == "backward":
        w = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        pick = lambda c: F.last(c, ignorenulls=True).over(w)  # noqa: E731
    else:
        w = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        pick = lambda c: F.first(c, ignorenulls=True).over(w)  # noqa: E731
    out = unioned.withColumn("__m_ts", pick("__r_ts"))
    for c in value_cols:
        out = out.withColumn(f"__m_{c}", pick(f"__v_{c}"))

    out = out.filter(F.col("__side") == 1)
    result = out.select(
        *[c for c in left.columns],
        F.col("__m_ts").alias(f"asof_{right_ts}"),
        *[F.col(f"__m_{c}").alias(f"asof_{c}") for c in value_cols],
    )
    return result


def topk_per_group(
    df: DataFrame, keys: Sequence[str], order: Sequence[Column], k: int, rn_col: str = "rn"
) -> DataFrame:
    """Top-k rows per group via row_number (one shuffle on the keys)."""
    w = Window.partitionBy(*keys).orderBy(*order)
    return df.withColumn(rn_col, F.row_number().over(w)).filter(F.col(rn_col) <= k)


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_seconds: float,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Assign 1-based session ids per user: a new session starts when the
    gap since the previous event is strictly greater than `gap_seconds`.

    Single shuffle on the user key; gap math in microseconds so
    sub-second timestamps compare exactly.
    """
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in tiebreak]
    w = Window.partitionBy(user_col).orderBy(*order)
    us = F.unix_micros(F.col(ts_col))
    prev = F.lag(us).over(w)
    flag = F.when(prev.isNull() | ((us - prev) > int(gap_seconds * 1_000_000)), 1).otherwise(0)
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn("session_id", F.sum(flag).over(wrun))


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-buster equi-join for known-hot keys: append a random salt
    (0..n_salts) to the LEFT side's key and replicate the RIGHT side
    once per salt value, so a hot key's rows spread over `n_salts`
    shuffle partitions instead of one straggler task.

    AQE's skew-join split handles moderate skew automatically; this is
    the explicit tool for extreme, known-in-advance hubs (power-law
    graph vertices, null-ish sentinel keys).  Cost: right side is
    replicated n_salts times — use with a small-ish right side or a
    pre-filtered hot-key subset (split-join pattern).
    """
    on = list(on)
    lsalt = left.withColumn("__salt", (F.rand(seed=7) * n_salts).cast("int"))
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__salt")
    rsalt = right.select("*", salts)
    out = lsalt.join(rsalt, on + ["__salt"], how)
    return out.drop("__salt")


def interval_overlap_join(
    df: DataFrame,
    keys: Sequence[str],
    start_col: str,
    end_col: str,
    id_col: str,
) -> DataFrame:
    """Self-join pairs within `keys` whose [start, end) intervals overlap,
    keeping each unordered pair once (a.id < b.id).

    Equi-join on the keys first (one shuffle), residual range predicate
    evaluated post-join.  At 100 TB the keys partition the pairs space;
    per-key cardinality is the blow-up risk — callers bound it (e.g. the
    declared T02 restricts to low-degree customers).  For unkeyed range
    joins, bucketize the time axis first.
    """
    a = df.select(*keys, F.col(id_col).alias("a_id"), F.col(start_col).alias("a_s"), F.col(end_col).alias("a_e"))
    b = df.select(*keys, F.col(id_col).alias("b_id"), F.col(start_col).alias("b_s"), F.col(end_col).alias("b_e"))
    cond = (F.col("a_id") < F.col("b_id")) & (F.col("a_s") < F.col("b_e")) & (F.col("b_s") < F.col("a_e"))
    return a.join(b, on=list(keys), how="inner").filter(cond)


def bucketed_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 7200,
) -> DataFrame:
    """Point-in-interval join WITHOUT an equi-key: the scale strategy
    for unkeyed range joins, where a plain theta-join degenerates to a
    broadcast-nested-loop / cartesian scan.

    Each interval explodes to the time buckets it covers (end
    exclusive); each point maps to exactly one bucket; the join becomes
    an equi-join on the bucket id with the range predicate as residual.
    No dedup is needed: a point matches an interval in exactly one
    bucket.  Cost scales with bucket co-occupancy, tuned by
    `bucket_seconds` ~ typical interval length (each interval then
    covers <= 2 buckets).  Column names must be pre-disambiguated by
    the caller.
    """
    p = points.withColumn(
        "__b", F.floor(F.col(point_ts).cast("long") / bucket_seconds)
    )
    iv = (
        # empty intervals (end <= start) match nothing; drop them BEFORE
        # the bucket expansion — F.sequence(a, b) with b < a would emit a
        # DESCENDING bucket list and explode garbage rows
        intervals.filter(F.col(end_col) > F.col(start_col))
        .withColumn(
            "__bs", F.floor(F.col(start_col).cast("long") / bucket_seconds)
        )
        .withColumn(
            "__be", F.floor((F.col(end_col).cast("long") - 1) / bucket_seconds)
        )
        .withColumn("__b", F.explode(F.sequence(F.col("__bs"), F.col("__be"))))
        .drop("__bs", "__be")
    )
    return (
        p.join(iv, "__b")
        .filter(
            (F.col(point_ts) >= F.col(start_col)) & (F.col(point_ts) < F.col(end_col))
        )
        .drop("__b")
    )


def skew_audit(df: DataFrame, key: str, name: str | None = None) -> DataFrame:
    """One-row shuffle-skew audit for a join/groupBy key: per-key
    cardinality, heaviest-key share, Gini coefficient and coefficient
    of variation — the decision inputs for plain-shuffle vs AQE
    skew-join vs explicit salting (`salted_join`) BEFORE a large job
    runs.

    All moments are exact integer sums (rank-weighted sum, sum of
    squares) from one groupBy plus one sort-rank over the (small)
    per-key count table; doubles appear once in the output row.
    """
    label = name if name is not None else key
    k = df.groupBy(F.col(key).alias("k")).agg(F.count(F.lit(1)).alias("c"))
    r = k.select("c", F.row_number().over(Window.orderBy("c", "k")).alias("r"))
    s = r.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("t"),
        F.max("c").alias("mx"),
        F.sum(F.col("r") * F.col("c")).alias("rc"),
        F.sum(F.col("c") * F.col("c")).alias("cc"),
    )
    return s.select(
        F.lit(label).alias("key_name"),
        F.col("n").alias("n_keys"),
        F.col("t").alias("total_rows"),
        F.col("mx").alias("max_rows"),
        F.round(F.col("mx").cast("double") / F.col("t"), 4).alias("top1_share"),
        F.round(
            (2 * F.col("rc").cast("double") - (F.col("n") + 1) * F.col("t"))
            / (F.col("n").cast("double") * F.col("t")),
            4,
        ).alias("gini"),
        F.round(
            F.sqrt(
                F.col("n").cast("double") * F.col("cc")
                - F.col("t").cast("double") * F.col("t")
            )
            / F.col("t"),
            4,
        ).alias("cv"),
    )


def sweep_concurrency(
    intervals: DataFrame, start_col: str = "st", end_col: str = "en"
) -> DataFrame:
    """Sweep-line concurrency over integer-time intervals: returns one
    row per boundary point with the running concurrency level and the
    dwell time to the next boundary (`t`, `conc`, `nxt`).

    Starts sort before ends at the same instant so point intervals
    never dip the count negative.  The single global sort runs over
    boundary points (2 per interval), not source rows — at scale that
    is orders of magnitude smaller than the fact table that produced
    the intervals.
    """
    pts = intervals.select(
        F.col(start_col).alias("t"), F.lit(1).alias("delta")
    ).unionAll(intervals.select(F.col(end_col).alias("t"), F.lit(-1).alias("delta")))
    w = Window.orderBy("t", F.desc("delta"))
    return pts.select(
        "t",
        F.sum("delta")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("int")
        .alias("conc"),
        F.lead("t").over(w).alias("nxt"),
    )


def profile_columns(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Per-column data-quality profile — the deequ/dbt-style audit a
    pipeline runs before trusting a new drop: for each column,
    (col_name, n_rows, n_null, n_distinct, min_str, max_str).

    ONE aggregation pass over the input computes every column's stats
    (Catalyst plans the multi-distinct with one Expand — still a
    single scan), then a literal struct-array explode unpivots the
    1-row result; nothing rescans per column.  min/max are cast to
    string AFTER the typed aggregation, so numeric order is preserved
    (cast-then-min would sort '10' < '9').  Pre-render timestamp
    columns (e.g. with queries.common.ts_str) if string formats must
    match another engine's.
    """
    cols = columns or df.columns
    aggs = []
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"__nn_{c}"),
            F.countDistinct(F.col(c)).cast("long").alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__mx_{c}"),
        ]
    row = df.agg(F.count(F.lit(1)).cast("long").alias("__n"), *aggs)
    structs = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col("__n").alias("n_rows"),
            F.col(f"__nn_{c}").alias("n_null"),
            F.col(f"__nd_{c}").alias("n_distinct"),
            F.col(f"__mn_{c}").alias("min_str"),
            F.col(f"__mx_{c}").alias("max_str"),
        )
        for c in cols
    ]
    return row.select(F.explode(F.array(*structs)).alias("p")).select("p.*")
