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


def test_permissive_vs_dropmalformed(spark, tmp_path):
    """P6: malformed-row tolerance moves from per-line try/except
    (`reducer1.py:16-17`) to the CSV parser's mode."""
    path = os.path.join(tmp_path, "bad.csv")
    with open(path, "w") as f:
        f.write("1\tok text\n")
        f.write("shortrow\n")                                # too few fields
        f.write("not_an_int\tbad id cell\n")                 # unparsable cell
        f.write("3\tanother fine row\n")
    schema = "doc_id long, text string"
    permissive = spark.read.option("sep", "\t").schema(schema) \
        .option("mode", "PERMISSIVE").csv(path)
    rows = permissive.collect()
    assert len(rows) == 4                       # every row kept
    assert sum(r["doc_id"] is None for r in rows) == 2   # bad cells nulled
    dropped = spark.read.option("sep", "\t").schema(schema) \
        .option("mode", "DROPMALFORMED").csv(path)
    # Gotcha encoded on purpose: count() prunes all columns, so parsing
    # never fails and NOTHING is counted as malformed — only materializing
    # rows applies the drop.  (One more reason typed Parquet beats CSV.)
    assert dropped.count() == 4
    assert [tuple(r) for r in dropped.collect()] == [(1, "ok text"),
                                                     (3, "another fine row")]


def test_orc_roundtrip(spark, sf_dir, tmp_path):
    """ORC: the other bundled columnar format (parquet remains primary)."""
    orders = load_table(spark, sf_dir, "orders")
    path = os.path.join(tmp_path, "orc")
    orders.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    assert back.count() == orders.count()
    assert dict(back.dtypes) == dict(orders.dtypes)


def test_parquet_schema_evolution(spark, tmp_path):
    """mergeSchema: later files may add columns (a 100 TB dataset is written
    over months; readers must tolerate schema drift)."""
    path = os.path.join(tmp_path, "evolve")
    spark.createDataFrame([(1, "a")], "id long, name string") \
        .write.parquet(path + "/batch=1")
    spark.createDataFrame([(2, "b", 9.5)], "id long, name string, score double") \
        .write.parquet(path + "/batch=2")
    merged = spark.read.option("mergeSchema", True).parquet(path)
    assert set(merged.columns) == {"id", "name", "score", "batch"}
    rows = {r["id"]: r["score"] for r in merged.collect()}
    assert rows == {1: None, 2: 9.5}


def test_jsonl_malformed_rows_quarantined(spark, tmp_path):
    """P5/P6-adjacent robustness: corrupt JSONL lines land in
    _corrupt_record under PERMISSIVE (the 100-TB default: quarantine and
    continue), and FAILFAST surfaces them as errors instead of silently
    dropping data."""
    import os

    from pyspark.errors import PythonException
    from pyspark.sql import functions as F
    from pyspark.sql.utils import CapturedException

    p = os.path.join(tmp_path, "docs.jsonl")
    with open(p, "w") as f:
        f.write('{"doc_id": 1, "text": "good row"}\n')
        f.write('{"doc_id": 2, "text": "also fine"}\n')
        f.write('{"doc_id": 3, "text": "broken\n')          # truncated JSON
        f.write('not json at all\n')

    schema = ("doc_id BIGINT, text STRING, _corrupt_record STRING")
    df = spark.read.schema(schema).json(p).cache()
    try:
        good = df.filter(F.col("_corrupt_record").isNull())
        bad = df.filter(F.col("_corrupt_record").isNotNull())
        assert good.count() == 2
        assert bad.count() == 2
        assert {r["doc_id"] for r in good.collect()} == {1, 2}
    finally:
        df.unpersist()

    import pytest

    with pytest.raises((CapturedException, PythonException, Exception)):
        spark.read.schema("doc_id BIGINT, text STRING") \
            .option("mode", "FAILFAST").json(p).collect()


def test_zorder_value_interleaves_bits(spark):
    from big_data_assignment_2_spark.operators.persist import zorder_value
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(3, 5), (0, 0), (65535, 65535)],
                               "x long, y long")
    got = [r[0] for r in df.select(zorder_value("x", "y")).collect()]

    def ref(x, y):
        z = 0
        for b in range(16):
            z |= ((x >> b) & 1) << (2 * b)
            z |= ((y >> b) & 1) << (2 * b + 1)
        return z

    assert got == [ref(3, 5), 0, ref(65535, 65535)]
    assert ref(3, 5) == 0b100111  # x=11 on even bits, y=101 on odd


def test_zorder_autosized_bits_no_aliasing_past_16_bits(spark, tmp_path):
    """write_zorder sizes the interleave width from the observed max, so
    a key k >= 2**16 gets a DIFFERENT z-value than k - 2**16 (the r7
    aliasing bug: bits=16 truncated both to the same value, mixing
    distant key ranges in the same files).  Wide-value round-trip is
    also pinned: values needing > 16 bits survive interleave intact."""
    from big_data_assignment_2_spark.operators.persist import (
        write_zorder, zorder_value)

    k = 70_000  # > 2**16, aliased with 70_000 - 65_536 = 4_464 under bits=16
    df = spark.createDataFrame([(k, 1), (k - 65_536, 1)], "x long, y long")

    # bits=16 truncation really does alias (the bug being guarded):
    z16 = [r[0] for r in df.select(zorder_value("x", "y", bits=16)).collect()]
    assert z16[0] == z16[1]

    p = str(tmp_path / "z")
    used = write_zorder(df, p, "x", "y", n_files=1)
    assert used == k.bit_length()  # sized from the observed max, not 16
    back = {(r["x"], r["zval"]) for r in spark.read.parquet(p).collect()}
    zvals = {z for _, z in back}
    assert len(zvals) == 2  # distinct keys -> distinct z-values


def test_zorder_layout_prunes_box_rowgroups(spark, sf_dir, tmp_path):
    """The point of the Z-layout: row-group min/max envelopes stay tight
    on BOTH box dimensions, so a 2-D box intersects fewer row groups
    than under a random (hash-partitioned) layout, where every row
    group spans the full range of both columns."""
    import datetime
    import glob as _glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from big_data_assignment_2_spark.operators.persist import write_zorder
    from big_data_assignment_2_spark.sources.io import load_table

    o = load_table(spark, sf_dir, "orders").withColumn(
        "__days", F.datediff(F.col("o_orderdate"),
                             F.to_date(F.lit("1992-01-01"))))
    zpath, rpath = str(tmp_path / "z"), str(tmp_path / "r")
    write_zorder(o, zpath, "o_custkey", "__days", n_files=16)
    o.repartition(16).write.parquet(rpath)

    lo_d = datetime.date(1995, 1, 1)
    hi_d = datetime.date(1995, 6, 30)

    def touched(path):
        hit = total = 0
        for f in _glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                st = {g.column(i).path_in_schema: g.column(i).statistics
                      for i in range(g.num_columns)}
                ck, od = st["o_custkey"], st["o_orderdate"]
                # date column may surface as datetime.datetime stats
                od_min = od.min.date() if hasattr(od.min, "date") else od.min
                od_max = od.max.date() if hasattr(od.max, "date") else od.max
                total += 1
                if (ck.min <= 200 and ck.max >= 100
                        and od_min <= hi_d and od_max >= lo_d):
                    hit += 1
        return hit, total

    z_hit, z_total = touched(zpath)
    r_hit, r_total = touched(rpath)
    assert r_hit == r_total          # random layout: every group intersects
    assert z_hit < r_hit             # Z-layout prunes the 2-D box


def test_agg_pushdown_plan_and_v1_parity(spark, sf_dir):
    """The stats-only aggregation must (a) plan as PushedAggregation on
    the V2 scan — metadata answered, no data pages — and (b) equal the
    default V1 full-scan aggregation exactly; the conf isolation must
    leave the parent session on V1."""
    from big_data_assignment_2_spark.plans.source_queries import \
        q_agg_pushdown

    df = q_agg_pushdown(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedAggregation" in plan, plan
    from pyspark.sql import functions as F
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    want = li.agg(F.count(F.lit(1)).alias("n_rows"),
                  F.min("l_quantity").alias("min_qty"),
                  F.max("l_quantity").alias("max_qty"),
                  F.min("l_extendedprice").alias("min_price"),
                  F.max("l_extendedprice").alias("max_price")).collect()
    assert df.collect() == want
    # parent session conf untouched (V1 list still defaults non-empty)
    assert spark.conf.get("spark.sql.sources.useV1SourceList") != ""
