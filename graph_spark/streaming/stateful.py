"""Custom stateful streaming operators (SURVEY.md §2.E "arbitrary
stateful op"): applyInPandasWithState kernels whose semantics are
parity-tested against their batch window-function forms.

State-store scale model: one state row per group key, RocksDB-backed
on executors at scale.  These kernels run with GroupStateTimeout
.NoTimeout, so state is bounded by ALL-TIME DISTINCT KEYS, not the
watermark horizon — correct for these recurrences (a session/EWMA must
survive arbitrarily long user gaps; expiring state would silently
restart sessions and reseed averages) but a deliberate trade-off: a
deployment with unbounded key churn should wrap the update functions
with EventTimeTimeout eviction and accept the semantic change, or
bound keys upstream.  The s26 declared query sizes the TTL'd
alternative (peak concurrent state under a 30-min horizon) for
capacity planning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import LongType, StructField, StructType


def stateful_sessionize(
    stream: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-user session assignment over an unbounded stream: a new
    session starts when the gap since the user's previous event is
    strictly greater than `gap_seconds` — the streaming twin of
    `operators.relational.sessionize` (same gap semantics, same
    (ts, id) ordering), carried across micro-batches by a 2-long state
    row (last event time µs, current session id) per user.

    Requires per-user event-time order across micro-batches (true for
    the ordered file replay; with out-of-order sources buffer by
    watermark first, e.g. a session_window pre-pass).  Emits
    (user, id, session_id) rows in update mode.
    """
    import pandas as pd

    gap_us = int(gap_seconds) * 1_000_000
    out_schema = StructType(
        [
            StructField(user_col, LongType()),
            StructField(id_col, LongType()),
            StructField("session_id", LongType()),
        ]
    )
    state_schema = StructType(
        [StructField("last_us", LongType()), StructField("sid", LongType())]
    )

    def update(key, pdfs, state):
        last_us, sid = state.get if state.exists else (None, 0)
        rows = pd.concat(list(pdfs), ignore_index=True)
        if not len(rows):
            return
        rows = rows.sort_values([ts_col, id_col])
        us = rows[ts_col].astype("int64") // 1000  # ns -> µs
        sids = []
        for u in us:
            if last_us is None or u - last_us > gap_us:
                sid += 1
            last_us = int(u)
            sids.append(sid)
        state.update((int(last_us), int(sid)))
        yield pd.DataFrame(
            {
                user_col: key[0],
                id_col: rows[id_col].to_numpy(),
                "session_id": sids,
            }
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return stream.groupBy(user_col).applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def stateful_ewma(
    stream: DataFrame,
    alpha: float = 0.2,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-user streaming EWMA (s' = alpha*x + (1-alpha)*s) carried
    across micro-batches by a 3-value state row (running ewma, running
    max, event count) — the streaming twin of the t76 batch recurrence,
    folding each micro-batch's (ts, id)-ordered values into the state
    with literally the same `alpha*x + (1-alpha)*s` double arithmetic,
    so the trajectory is bit-identical to the batch scan.

    Emits one cumulative (user, n_events, final_ewma, max_ewma) row per
    user per micro-batch in update mode; the latest row per user is the
    authoritative state (highest n_events).  Same event-time-order
    requirement as stateful_sessionize.
    """
    import pandas as pd

    from pyspark.sql.types import DoubleType

    out_schema = StructType(
        [
            StructField(user_col, LongType()),
            StructField("n_events", LongType()),
            StructField("final_ewma", DoubleType()),
            StructField("max_ewma", DoubleType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("s", DoubleType()),
            StructField("mx", DoubleType()),
            StructField("n", LongType()),
        ]
    )

    def update(key, pdfs, state):
        s, mx, n = state.get if state.exists else (None, None, 0)
        rows = pd.concat(list(pdfs), ignore_index=True)
        if not len(rows):
            return
        rows = rows.sort_values([ts_col, id_col])
        for x in rows[value_col]:
            s = float(x) if s is None else alpha * float(x) + (1.0 - alpha) * s
            mx = s if mx is None else max(mx, s)
            n += 1
        state.update((float(s), float(mx), int(n)))
        yield pd.DataFrame(
            {
                user_col: [key[0]],
                "n_events": [int(n)],
                "final_ewma": [s],
                "max_ewma": [mx],
            }
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return stream.groupBy(user_col).applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )
