"""Exponential-smoothing folds over keyed series (SURVEY §2.D family).

The declared forms (t76 EWMA, t82 Holt, t90 Holt-Winters) fix exact
IEEE recurrences; this module is the reusable per-key operator behind
them.  Scale shape: state per key is O(season) doubles inside ONE
grouped Arrow batch — embarrassingly parallel across keys, a single
shuffle on the key columns, no driver loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def holt_winters(
    df: DataFrame,
    value_col: str = "x",
    order_cols: tuple = ("rn",),
    key_cols: tuple = (),
    alpha: float = 0.3,
    beta: float = 0.1,
    gamma: float = 0.2,
    season: int = 7,
) -> DataFrame:
    """Additive Holt-Winters triple smoothing per key.

    Recurrence (the t90 declared protocol — literal IEEE op order):
    ``l' = a*(x - s_old) + (1-a)*(l + b)``;
    ``b' = beta*(l' - l) + (1-beta)*b``;
    ``s' = gamma*(x - l') + (1-gamma)*s_old``, seeded with
    ``l = mean(first season values)`` (sequential sum — exact for
    integer series), ``b = 0``, ``s_i = x_i - l``.  Keys with fewer
    than ``season + 1`` observations are dropped (nothing to fold).

    ``order_cols`` MUST be a total order within each key: the fold is
    a pandas ``sort_values`` per Arrow batch group, so tied rows would
    fold in batch-arrival order and the result would be silently
    layout-sensitive (t90's spine uses a dense per-key ``rn``; do the
    same, or append a unique tie-break column).

    Returns one row per key: ``*key_cols, n_obs, level, trend,
    s_next, forecast_1`` where ``forecast_1 = level + trend + s_next``
    (the one-step-ahead seasonal forecast).
    """
    import pandas as pd

    m = int(season)
    if m < 2:
        raise ValueError("holt_winters: season must be >= 2")
    keys = list(key_cols) or ["__g"]
    frame = df if key_cols else df.withColumn("__g", F.lit(1))

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(list(order_cols))
        xs = [float(v) for v in pdf[value_col]]
        if len(xs) < m + 1:
            return pd.DataFrame(
                {c: [] for c in keys}
                | {
                    "n_obs": [],
                    "level": [],
                    "trend": [],
                    "s_next": [],
                }
            )
        s = 0.0
        for v in xs[:m]:
            s += v
        lvl = s / float(m)
        sl = [xi - s / float(m) for xi in xs[:m]]
        b = 0.0
        for xv in xs[m:]:
            s_old = sl[0]
            new_l = alpha * (xv - s_old) + (1.0 - alpha) * (lvl + b)
            new_b = beta * (new_l - lvl) + (1.0 - beta) * b
            new_s = gamma * (xv - new_l) + (1.0 - gamma) * s_old
            sl = sl[1:] + [new_s]
            lvl, b = new_l, new_b
        row = {c: [pdf[c].iloc[0]] for c in keys}
        row |= {
            "n_obs": [len(xs)],
            "level": [lvl],
            "trend": [b],
            "s_next": [sl[0]],
        }
        return pd.DataFrame(row)

    key_schema = ", ".join(
        f"{c} {frame.schema[c].dataType.simpleString()}" for c in keys
    )
    out = frame.groupBy(*keys).applyInPandas(
        fold,
        f"{key_schema}, n_obs long, level double, trend double, s_next double",
    )
    out = out.withColumn(
        "forecast_1", F.col("level") + F.col("trend") + F.col("s_next")
    )
    return out.drop("__g") if not key_cols else out
