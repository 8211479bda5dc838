"""Sampled sf1 oracle verification for dedup_prefix_jaccard (VERDICT r16 #2).

The FULL DuckDB replay of this row at sf1 is a 33M-candidate exact join
plus a ~19M-row result normalize: it survived the 48 GB memory cap in r16
but not a 50-minute timebox.  This tool certifies the row at sf1 by
DETERMINISTIC SAMPLED verification instead — the method the r16 verdict
adopted from the builder's own proposal:

- Sample predicate, fixed by construction (no RNG state to disagree on):
  Knuth multiplicative hash of the pair's SMALLER id,
  ``(doc_a * 2654435761) % 2^32 % SAMPLE_MOD == 0`` — selects ~1/SAMPLE_MOD
  of doc_a values, pseudo-randomly spread across make_sf1's copy-shifted
  id space, with identical integer semantics in Spark and DuckDB (all
  operands positive, < 2^63).
- Spark side: the FULL engine pipeline (global df-order, prefix filter,
  positional/length filters, verify) runs unrestricted; only the final
  result is filtered to sampled doc_a.  Candidate generation is NOT
  narrowed, so a lost qualifying pair with sampled doc_a still fails.
- Oracle side: the row's own prefix-FREE DuckDB SQL with the predicate
  pushed into the pair join's x side (one asserted substitution), so the
  oracle still enumerates EVERY token-sharing pair whose smaller id is
  sampled.
- Compare: exact multiset equality on (doc_a, doc_b, jaccard@6dp).

This yields completeness AND value correctness over every pair whose
smaller id lands in the sample (~1% of the ~9.65M true pairs at sf1) —
an exact check on a deterministic subset, not a probabilistic bound.

Usage: python tools/check_prefix_jaccard_sf1_sampled.py [sf1_dir] [mod]
       (defaults: /tmp/spark_graft_sf1, 100)
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, ".")

KNUTH = 2654435761
M32 = 2 ** 32


def main() -> int:
    import duckdb
    from pyspark.sql import functions as F

    from big_data_assignment_2_spark.plans.dedup_queries import (
        ORACLES, q_prefix_jaccard)
    from big_data_assignment_2_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1"
    mod = int(sys.argv[2]) if len(sys.argv) > 2 else 100

    spark = get_spark("ppjoin-sf1-sample", shuffle_partitions=64)

    t0 = time.time()
    pred = ((F.col("doc_a").cast("bigint") * KNUTH) % M32 % mod == 0)
    sdf = q_prefix_jaccard(spark, sf_dir).filter(pred)
    srows = sorted((int(r.doc_a), int(r.doc_b), round(float(r.jaccard), 6))
                   for r in sdf.collect())
    t_spark = time.time() - t0
    print(f"spark: {len(srows)} sampled pairs [{t_spark:.1f}s]")

    sql = ORACLES["dedup_prefix_jaccard"]
    anchor = "WHERE CAST(x.doc_id AS BIGINT) < CAST(y.doc_id AS BIGINT)"
    assert sql.count(anchor) == 1, "oracle pair-join anchor drifted"
    sampled_sql = sql.replace(
        anchor,
        anchor + f"\n    AND (CAST(x.doc_id AS BIGINT) * {KNUTH}) "
                 f"% {M32} % {mod} = 0")

    con = duckdb.connect()
    con.execute("SET memory_limit='48GB'")
    con.execute("SET temp_directory='/tmp/duckdb_check_spill'")
    path = f"{sf_dir}/documents.parquet"
    pattern = f"{path}/*.parquet" if os.path.isdir(path) else path
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{pattern}'")

    t1 = time.time()
    orows = sorted((int(a), int(b), round(float(j), 6))
                   for a, b, j in con.execute(sampled_sql).fetchall())
    t_duck = time.time() - t1
    print(f"duckdb: {len(orows)} sampled pairs [{t_duck:.1f}s]")

    ok = len(srows) == len(orows)
    if ok:
        for s, o in zip(srows, orows):
            if s[:2] != o[:2] or not math.isclose(s[2], o[2], abs_tol=1e-9):
                print(f"MISMATCH spark={s} oracle={o}")
                ok = False
                break
    else:
        ss, os_ = set(srows), set(orows)
        print(f"  only-spark (first 3): {sorted(ss - os_)[:3]}")
        print(f"  only-oracle (first 3): {sorted(os_ - ss)[:3]}")

    verdict = "ok" if ok else "FAIL"
    print(f"{verdict}  dedup_prefix_jaccard sf1 sampled(1/{mod}): "
          f"pairs={len(srows)} spark={t_spark:.1f}s oracle={t_duck:.1f}s")
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
