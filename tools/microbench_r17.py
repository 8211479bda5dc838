"""Focused min-of-N microbench for the r17 optimization loop: same
methodology as bench.py (noop sink, untimed warmup, min + median) but
only for the named queries, so each optimization iterates in seconds.

Usage: SPARK_GRAFT_SF_DIR=... python tools/microbench_r17.py q1 q2 ...
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

REPEATS = int(os.environ.get("MB_REPEATS", "4"))


def main() -> int:
    from big_data_assignment_2_spark.plans import all_queries
    from big_data_assignment_2_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("microbench-r17")
    qs = all_queries()

    def materialize(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # same warmups as bench.py: codegen + shuffle + noop committer
    from pyspark.sql import functions as F
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for name in ("region", "nation", "lineitem", "orders", "events",
                 "documents", "embeddings"):
        spark.read.parquet(f"{sf_dir}/{name}.parquet").count()
    for i in range(5):
        materialize(spark.range(2_000_000)
                    .withColumn("g", F.col("id") % (512 + i))
                    .groupBy("g").agg(F.count("*").alias("n"),
                                      F.sum("id").alias("s")))

    out = {}
    for name in sys.argv[1:]:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"mb:{name}")
        materialize(fn(spark, sf_dir))  # untimed warmup
        runs = []
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            materialize(fn(spark, sf_dir))
            runs.append(time.perf_counter() - t0)
        out[name] = {"min": round(min(runs), 3),
                     "median": round(sorted(runs)[len(runs) // 2], 3),
                     "runs": [round(r, 3) for r in runs]}
        print(f"{name}: min={out[name]['min']} med={out[name]['median']}",
              file=sys.stderr)
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
