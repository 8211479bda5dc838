"""Synthesize a ~sf1 dataset (10x sf0.1) for scale stress runs.

No sf1 testdata ships in the environment (/root/testdata has sf0.001/0.01/
0.1 only), so this derives one: each table is unioned 10x with disjoint
key ranges via a single crossJoin(range(10)) pass (one distributed plan,
not 10 stacked scans).  Foreign keys are shifted consistently so every
join family (orders->customer, lineitem->orders/part/supplier) still
resolves at 10x cardinality.  region/nation stay fixed (dimension tables
are scale-invariant in TPC-H too).

Two deliberate choices for the data-dependent families:

* documents.text is token-salted per copy (every token gets the copy
  digit appended via a regexp_replace with a Column replacement), so the
  token sets of copy i and copy j are DISJOINT.  Near-dup structure
  within a copy is preserved exactly, so MinHash/SimHash/winnow pair
  output scales 10x (linear) instead of 100x (quadratic cross-copy
  pairs).  A scale run should measure the engine, not an output
  explosion the corpus design caused.
* embeddings are cyclically ROTATED by the copy index (an orthogonal
  transform): within-copy inner products are bit-preserved, so each
  copy's near-dup structure matches the original exactly, while
  cross-copy pairs decorrelate — without this, 10 identical copies of
  every vector put 10x members in every LSH bucket and candidate pairs
  grow 100x (measured: a 12-minute single-task dot-product grind).
* events timestamps are NOT shifted: 10x density in the same time range
  stresses sessionization/window state the way a bigger tenant would.

Each scaled table is written with ~10x the file count of its sf0.1
source (crossJoin preserves the 1-file input partitioning, which would
hand every sf1 scan to a single task — a bigger dataset arrives as more
files, so the stress data should too).

Usage: python tools/make_sf1.py [out_dir]   (default /tmp/spark_graft_sf1)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from big_data_assignment_2_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
COPIES = 10

# Per-table key-shift strides: comfortably above each table's max key so
# the 10 copies occupy disjoint ranges.
STRIDE = {
    "c_custkey": 100_000,
    "s_suppkey": 10_000,
    "p_partkey": 100_000,
    "o_orderkey": 10_000_000,
    "l_orderkey": 10_000_000,
    "l_partkey": 100_000,
    "l_suppkey": 10_000,
    "event_id": 10_000_000,
    "user_id": 1_000_000,
    "doc_id": 1_000_000,
    "vec_id": 1_000_000,
}
# Columns that are FKs into another scaled table share its stride.
STRIDE["o_custkey"] = STRIDE["c_custkey"]


def _amplify(df: DataFrame, key_cols: list[str], salt_text: bool = False,
             rotate_vec: bool = False) -> DataFrame:
    copies = df.sparkSession.range(COPIES).withColumnRenamed("id", "__copy")
    out = df.crossJoin(F.broadcast(copies))
    for c in key_cols:
        out = out.withColumn(c, (F.col(c) + F.col("__copy") * F.lit(STRIDE[c])).cast("long"))
    if salt_text:
        # Copy 0 keeps the original corpus byte-for-byte; copies 1..9 get
        # every token suffixed with the copy digit (disjoint token sets
        # across copies -> near-dup pair output scales linearly).
        salted = F.regexp_replace(
            F.col("text"), F.lit(r"(\S+)"),
            F.concat(F.lit("$1"), F.col("__copy").cast("string")))
        out = out.withColumn(
            "text", F.when(F.col("__copy") == 0, F.col("text")).otherwise(salted))
        out = out.withColumn("n_chars", F.length("text").cast("long"))
    if rotate_vec:
        # Cyclic rotation by the copy index: orthogonal, so cosines WITHIN
        # a copy are untouched and cross-copy pairs decorrelate.
        n = F.size("embedding")
        rotated = F.concat(
            F.slice("embedding", F.col("__copy") + 1, n - F.col("__copy")),
            F.slice("embedding", F.lit(1), F.col("__copy")))
        out = out.withColumn(
            "embedding",
            F.when(F.col("__copy") == 0, F.col("embedding")).otherwise(rotated))
    return out.drop("__copy")


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1"
    spark = get_spark("make-sf1")

    # (key cols, output file count): ~10x the sf0.1 file count so scan
    # parallelism scales with the data like a real bigger dataset's would.
    plan = {
        "region": ([], 1),
        "nation": ([], 1),
        "customer": (["c_custkey"], 4),
        "supplier": (["s_suppkey"], 2),
        "part": (["p_partkey"], 4),
        "orders": (["o_orderkey", "o_custkey"], 10),
        "lineitem": (["l_orderkey", "l_partkey", "l_suppkey"], 16),
        "events": (["event_id", "user_id"], 10),
        "documents": (["doc_id"], 10),
        "embeddings": (["vec_id"], 4),
    }
    for table, (keys, nfiles) in plan.items():
        df = spark.read.parquet(f"{SRC}/{table}.parquet")
        if keys:
            df = _amplify(df, keys, salt_text=(table == "documents"),
                          rotate_vec=(table == "embeddings"))
        df.repartition(nfiles).write.mode("overwrite").parquet(
            f"{out_dir}/{table}.parquet")
        print(f"{table}: {spark.read.parquet(f'{out_dir}/{table}.parquet').count()} rows")
    print(f"wrote {out_dir}")


if __name__ == "__main__":
    main()
