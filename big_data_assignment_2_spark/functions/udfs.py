"""Python UDF surface (SURVEY.md §2.9).

The reference's Python hooks — one scalar UDF (U1, `prepare_data.py:27`),
a foreach writer (U2), RDD lambdas (U3), and six stdin/stdout MapReduce
scripts (U4) — are all replaced by native expressions elsewhere in this
package.  What remains here is the ONE sanctioned pattern for when Python
is genuinely required (a Python-only library, e.g. a tokenizer or model):
an Arrow-vectorized ``pandas_udf``.  Batch transfer via Arrow + columnar
numpy work is 10-100× faster than a row-at-a-time ``F.udf``; still ~10×
slower than staying in the JVM — which is why nothing in the hot paths
uses it.

``shannon_entropy`` is the demonstration (a real quality signal for
training-data filtering): chars → counts → -Σ p·log2 p, vectorized with
numpy over each Arrow batch.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


@pandas_udf(DoubleType())
def shannon_entropy(texts: pd.Series) -> pd.Series:
    """Character-level Shannon entropy (bits/char), 0.0 for empty text."""
    import math
    from collections import Counter

    def one(t: str | None) -> float:
        if not t:
            return 0.0
        counts = Counter(t)
        n = len(t)
        return round(-sum((c / n) * math.log2(c / n) for c in counts.values()), 6)

    return texts.map(one)


def minmax_scale_by_group(df, group_col: str, value_col: str,
                          out_col: str = "scaled"):
    """Grouped-map Arrow surface (``applyInPandas``): per-group min-max
    normalization of ``value_col``, rounded 6 dp (constant groups → 0.0).

    This exists to put the grouped-map plumbing itself under a hard
    cross-engine correctness row — the shuffle-by-group + whole-group
    pandas batch shape a Python-only per-group model (a scorer, a
    calibrator) would use.  For THIS particular computation the native
    form (group agg + broadcast join, as the SQL oracle is written) is
    the 100-TB path: a grouped map materializes every group in one
    executor's memory, so few-valued group keys make hot tasks.
    """
    import numpy as np

    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in df.schema.fields)
    schema = f"{fields}, {out_col} double"

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        lo, hi = pdf[value_col].min(), pdf[value_col].max()
        if hi == lo:
            pdf[out_col] = 0.0
        else:
            x = (pdf[value_col] - lo) / float(hi - lo)
            # round half AWAY from zero (what Spark F.round and DuckDB
            # round() do) — np.round is half-to-even, which diverges by
            # 1 ulp on exact binary ties like 0.6953125
            pdf[out_col] = np.floor(x * 1e6 + 0.5) / 1e6
        return pdf

    return df.groupBy(group_col).applyInPandas(fn, schema)
