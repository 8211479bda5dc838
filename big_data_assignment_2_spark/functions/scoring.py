"""BM25 scoring expressions (SURVEY.md §2.7, F4-F5).

Exact reference semantics, as pure column arithmetic (whole-stage codegen):

- IDF (`app/query.py:169-170`): ``ln(max(1, N / max(1, df)))`` — the plain
  clamped variant, NOT the textbook BM25 ``log((N-df+0.5)/(df+0.5))``.
- Term score (`app/query.py:186-188`):
  ``idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))``
  with the reference's non-standard defaults k1=1.0, b=0.75
  (`app/query.py:145`).
- avgdl is a true double here; the reference's Cassandra ``AVG(length)``
  silently floors to int (`app/query.py:75-77`, SURVEY.md §7.5) — documented
  divergence, the rebuild keeps full precision.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

K1_DEFAULT = 1.0
B_DEFAULT = 0.75


def idf_plain(df_col: Column, n_docs: Column | float) -> Column:
    """F4: ``ln(max(1, N / max(1, df)))`` (`app/query.py:170`)."""
    n = F.lit(n_docs) if not isinstance(n_docs, Column) else n_docs
    return F.log(F.greatest(F.lit(1.0), n / F.greatest(F.lit(1), df_col)))


def bm25_term_score(tf: Column, idf: Column, doc_len: Column,
                    avgdl: Column | float, k1: float = K1_DEFAULT,
                    b: float = B_DEFAULT) -> Column:
    """F5: per-(doc, term) BM25 partial score (`app/query.py:186-188`)."""
    avg = F.lit(avgdl) if not isinstance(avgdl, Column) else avgdl
    return idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * doc_len / avg))
