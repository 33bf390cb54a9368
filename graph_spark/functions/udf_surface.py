"""UDF / UDAF / UDTF surface (SURVEY.md §2.G).

The engine's extension points, in descending order of preference:

1. Built-in column functions — JVM-side, whole-stage codegen. Always
   first choice; nothing here applies.
2. `@pandas_udf` — Arrow-batched, vectorized.  ~10-100x faster than
   row-at-a-time; the only acceptable Python scalar path at scale.
3. `applyInPandas` / `mapInPandas` — grouped-map / partition-map for
   operators that need a whole group or partition in memory.
4. `@udf` (row-at-a-time) — exposed for completeness; discouraged and
   never used in this repo's hot paths.
5. Python UDTF — table-valued functions (PySpark 4).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType


# -- example vectorized UDF: deterministic text quality bucket ----------
@F.pandas_udf(DoubleType())
def pudf_char_entropy(texts: pd.Series) -> pd.Series:
    """Shannon entropy of the character distribution, Arrow-batched.
    (Feature-engineering example for the documents table.)"""
    import math

    def ent(s: str) -> float:
        if not s:
            return 0.0
        counts: dict[str, int] = {}
        for ch in s:
            counts[ch] = counts.get(ch, 0) + 1
        n = len(s)
        return -sum((c / n) * math.log2(c / n) for c in counts.values())

    return texts.map(ent)


# -- grouped-agg pandas UDAF: Arrow-batched custom aggregate ------------
@F.pandas_udf(DoubleType())
def pudf_trimmed_mean(v: pd.Series) -> float:
    """10% symmetric trimmed mean — the UDAF extension point: a
    Series-to-scalar pandas_udf usable directly inside groupBy().agg().
    Spark feeds each group's column as one Arrow batch; partial
    aggregation is NOT available for custom UDAFs (the whole group
    ships to one task), so at 100 TB this is for moderate-cardinality
    group-bys — value-skewed keys belong in the builtin-expression
    path (q53 winsorize) instead.

    Value-sorted trimming is deterministic without a tie-break: ties
    at the cut boundary contribute identical sums either way."""
    s = v.sort_values().to_numpy()
    k = int(len(s) * 0.1)
    kept = s[k : len(s) - k] if len(s) > 2 * k else s
    if not len(kept):
        return float("nan")
    # round the sum to cents before dividing: the inputs are 2-decimal
    # money, so this collapses cross-engine summation-order ulp drift
    # before it can flip the final rounding (same guard as t07)
    return round(float(kept.sum()), 2) / len(kept)


# -- example row-at-a-time UDF (slow path, registered for parity) -------
@F.udf(StringType())
def udf_reverse_words(text: str) -> str:
    return " ".join(reversed((text or "").split(" ")))


def register_all(spark: SparkSession) -> None:
    """SQL registration: expose the Python surface to engine.sql()."""
    spark.udf.register("char_entropy", pudf_char_entropy)
    spark.udf.register("trimmed_mean", pudf_trimmed_mean)
    spark.udf.register("reverse_words", udf_reverse_words)
    try:
        from pyspark.sql.functions import udtf  # PySpark 4

        @udtf(returnType="term: string, pos: int")
        class Tokenize:
            """UDTF: explode a text into (term, position) rows."""

            def eval(self, text: str):  # noqa: D102
                for i, t in enumerate((text or "").split(" ")):
                    if t:
                        yield t, i

        spark.udtf.register("tokenize", Tokenize)
    except Exception:
        pass  # UDTF unavailable -> SQL surface simply lacks tokenize()
