"""Source/sink coverage beyond parquet: TSV (reference S3/S5), JSON lines,
CSV with schema, text — round-trips preserve data; schema is explicit
(never inferred twice) so a 100 TB re-read doesn't re-scan for inference."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from big_data_assignment_2_spark.sources.io import (load_table, read_tsv,
                                                    write_parquet, write_tsv)


def test_tsv_roundtrip(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    path = os.path.join(tmp_path, "tsv")
    write_tsv(docs, path)
    back = read_tsv(spark, path, "doc_id long, text string")
    assert back.count() == docs.count()
    a = {r["doc_id"]: r["text"] for r in docs.collect()}
    b = {r["doc_id"]: r["text"] for r in back.collect()}
    # TSV writes empty string as missing -> null; all other rows identical
    assert all(a[k] == v for k, v in b.items() if v is not None)


def test_json_lines_roundtrip(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    path = os.path.join(tmp_path, "json")
    ev.write.mode("overwrite").json(path)
    back = spark.read.schema(ev.schema).json(path)
    assert back.count() == ev.count()
    assert dict(back.dtypes) == dict(ev.dtypes)
    a = sorted(r["event_id"] for r in ev.select("event_id").collect())
    b = sorted(r["event_id"] for r in back.select("event_id").collect())
    assert a == b


def test_csv_with_header_roundtrip(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    path = os.path.join(tmp_path, "csv")
    orders.write.mode("overwrite").option("header", True).csv(path)
    back = spark.read.schema(orders.schema).option("header", True).csv(path)
    assert back.count() == orders.count()
    s1 = orders.agg(F.sum("o_totalprice")).first()[0]
    s2 = back.agg(F.sum("o_totalprice")).first()[0]
    assert abs(s1 - s2) < 1e-6


def test_partitioned_parquet_prunes(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders") \
        .withColumn("order_year", F.year("o_orderdate"))
    path = os.path.join(tmp_path, "part")
    write_parquet(orders, path, partition_by=["order_year"])
    back = spark.read.parquet(path).filter(F.col("order_year") == 1997)
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(order_year" in plan
    want = orders.filter(F.year("o_orderdate") == 1997).count()
    assert back.count() == want
