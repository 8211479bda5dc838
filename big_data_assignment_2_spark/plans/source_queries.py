"""Source/sink round-trip queries (SURVEY.md §2.1): the reference stages
data as HDFS TSV (`app/prepare_data.py:41`, read back by
`app/mapreduce/mapper1.py:20-24`); this engine's primary formats are
Parquet (S1) and — for the LLM-corpus surface — JSON Lines.

Each query WRITES a harness table through the format under test, READS it
back with an explicit schema, and aggregates a portable content checksum
(xor-folded 60-bit md5, order-insensitive, overflow-free); the DuckDB
oracle computes the same aggregate from the original parquet.  A green row
therefore certifies the full write→read cycle loses nothing — count,
numeric values, and byte-exact text — not merely that the sink ran.

Scale notes: JSONL and TSV sinks write one file per task (no driver
funnel); uncompressed line formats stay splittable on read, so the
round-trip parallelizes in both directions.  The partitioned-parquet query
additionally proves storage-level partition pruning: the read plan scans
only the `o_orderstatus=F` directory (asserted in tests/test_sources.py).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import md5_hash64, md5_hash64_sql
from ..sources.io import (cleanup_stale_scratch, load_table, read_jsonl,
                          read_tsv, write_jsonl,
                          write_parquet, write_tsv)

# Deterministic scratch root: overwrite-mode rewrites keep reruns clean.
_SCRATCH = os.path.join(tempfile.gettempdir(), "spark_graft_io")

# One scratch suffix per process (see q_orc_roundtrip's path discipline).
import uuid as _uuid  # noqa: E402

_PROCESS_UID = _uuid.uuid4().hex[:8]


def _checksum(*cols) -> F.Column:
    """Order-insensitive 60-bit content checksum: xor of per-row md5 hashes
    of the unit-separator-joined column values (portable per hashing.py)."""
    return F.bit_xor(md5_hash64(
        F.concat_ws("\x1f", *[F.col(c).cast("string") for c in cols])))


def _checksum_sql(*exprs: str) -> str:
    joined = " || chr(31) || ".join(f"CAST({e} AS VARCHAR)" for e in exprs)
    return f"bit_xor({md5_hash64_sql(joined)})"


def q_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → JSONL → documents: per-source doc count, char volume,
    and text checksum survive the round-trip byte-exactly."""
    docs = load_table(spark, sf_dir, "documents")
    path = os.path.join(_SCRATCH, "jsonl_documents")
    write_jsonl(docs, path)
    back = read_jsonl(spark, path, docs.schema)
    return back.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
        _checksum("doc_id", "text").alias("checksum"))


def q_tsv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders → TSV staging (S3) → TSV scan (S5): the reference's HDFS
    staging cycle, checksummed.  Doubles round-trip exactly (Spark writes
    shortest-round-trip decimal strings)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice")
    path = os.path.join(_SCRATCH, "tsv_orders")
    write_tsv(o, path)
    back = read_tsv(spark, path,
                    "o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE")
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
         .cast("double").alias("sum_price"),
        _checksum("o_orderkey", "o_orderstatus").alias("checksum"))


def q_partitioned_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders → parquet partitioned by status → pruned scan of ONE
    partition directory (the Cassandra-partition-key analogue for generic
    tables; the index path proves the same in operators/persist.py).  The
    filter never touches the other partitions' files."""
    o = load_table(spark, sf_dir, "orders")
    path = os.path.join(_SCRATCH, "orders_by_status")
    write_parquet(o.select("o_orderkey", "o_totalprice", "o_orderstatus"),
                  path, partition_by=["o_orderstatus"])
    back = spark.read.parquet(path).filter(F.col("o_orderstatus") == "F")
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
         .cast("double").alias("sum_price"),
        _checksum("o_orderkey").alias("checksum"))


def q_perdoc_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 per-document artifact sink (`prepare_data.py:31-38`) round-trip:
    documents → distributed `filename \\t text` dataset → text scan →
    count + content checksum over (sanitized filename, text).  The oracle
    recomputes the F7-sanitized filename from doc_id directly, so a green
    row certifies the whole stage → re-read cycle including the filename
    render.  (Tab-splitting is safe on the harness corpus: tokenized-word
    text, no tabs — production would stage JSONL, `source_jsonl_roundtrip`.)
    """
    from ..operators.prepare import prepare_documents, write_doc_files

    docs = load_table(spark, sf_dir, "documents")
    path = os.path.join(_SCRATCH, "perdoc_documents")
    write_doc_files(prepare_documents(docs), path)
    parts = F.split(F.col("value"), "\t", 2)
    rt = spark.read.text(path).select(parts.getItem(0).alias("fname"),
                                      parts.getItem(1).alias("text"))
    return rt.agg(F.count(F.lit(1)).alias("n_files"),
                  _checksum("fname", "text").alias("checksum"))


def q_index_store_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8+S9 (`app/app.py:29-72,121-250`): the full index-store cycle —
    build the three index tables, persist them through
    :func:`operators.persist.write_index` (term-bucket-partitioned
    postings + parquet df/stats; the Cassandra-DDL replacement), read them
    BACK, and checksum each table.  The oracle recomputes all three tables
    from ``documents`` directly, so a green row certifies the store/load
    cycle preserves every (term, doc_id, tf, positions), (term, df), and
    (doc_id, length) tuple byte-exactly.  The three tables are tag-unioned
    into one groupBy (3 output rows) — no 1×1 join stitching."""
    from ..operators.index import build_index
    from ..operators.persist import read_index, write_index

    docs = load_table(spark, sf_dir, "documents")
    path = os.path.join(_SCRATCH, "index_store")
    write_index(build_index(docs, term_buckets=8), path, term_buckets=8)
    back = read_index(spark, path)

    def tagged(df: DataFrame, tbl: str, *cols) -> DataFrame:
        return df.select(
            F.lit(tbl).alias("tbl"),
            F.concat_ws("\x1f", *[c.cast("string") for c in cols]).alias("__p"))

    posting = back["term_document"]
    payload = (
        tagged(posting, "term_document", F.col("term"), F.col("doc_id"),
               F.col("tf"), F.array_join("positions", ","))
        .unionByName(tagged(back["document_frequency"], "document_frequency",
                            F.col("term"), F.col("df")))
        .unionByName(tagged(back["documents_info"], "documents_info",
                            F.col("doc_id"), F.col("length"))))
    return payload.groupBy("tbl").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.bit_xor(md5_hash64(F.col("__p"))).alias("checksum"))


def q_sample_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2+P2 (`prepare_data.py:19-21`): the count-then-sample stage.  The
    corpus count is the oracle-checkable fact; the Bernoulli draw itself is
    engine-specific (seeded rand stream), so the row certifies the
    reference's failure mode is fixed — the fraction guard caps at 1.0
    (the reference's ``100*n/count`` errors when it exceeds 1.0,
    SURVEY.md §7.5) — and the P3 cap holds, as booleans."""
    from ..operators.prepare import sample_corpus

    docs = load_table(spark, sf_dir, "documents")
    n_total = docs.count()
    n_sample = sample_corpus(docs, n=100, seed=0).count()
    return spark.createDataFrame(
        [(n_total, bool(n_sample <= 100), bool(0 < n_sample <= n_total))],
        "n_total bigint, cap_ok boolean, sample_bounded boolean")


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling (`operators/prepare.py` ``sampleBy`` — the
    training-data-mix downsampler) with a DETERMINISTIC fraction map
    ({en: 1.0, others: 0.0}): keep-all and drop-all strata make the
    Bernoulli draw exact, so the engine-specific rand stream cancels out
    and the row hard-certifies the sampleBy routing itself (per-stratum
    fraction application, no row duplication/loss).  Map-side filter —
    no shuffle before the final count."""
    from ..operators.prepare import stratified_sample

    docs = load_table(spark, sf_dir, "documents")
    kept = stratified_sample(
        docs, "lang", {"en": 1.0, "de": 0.0, "es": 0.0, "fr": 0.0, "zh": 0.0},
        seed=0)
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        _checksum("doc_id", "text").alias("checksum"))


def q_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → ORC → events: the second columnar format Spark ships
    natively (a production lake mixes parquet and ORC feeds).  Exercises
    timestamp/double/string ORC encode+decode; per-type counts, an exact
    DECIMAL value sum, and a content checksum must survive byte-exactly.
    One path PER PROCESS (module-level uuid): unique enough that a second
    process can't overwrite files backing this one's lazy DataFrames,
    while repeated invocations in-process (bench min-of-3, gate sweeps)
    reuse one directory instead of accumulating copies.  Stale siblings
    from dead processes are best-effort removed first — they can only
    back DataFrames of prior runs (this machine has a documented
    orphan-temp hazard)."""
    import glob
    import shutil

    ev = load_table(spark, sf_dir, "events")
    path = os.path.join(_SCRATCH, f"orc_events_{_PROCESS_UID}")
    cleanup_stale_scratch(_SCRATCH, "orc_events_*", keep=path)
    ev.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    # Timestamps checksum as epoch MICROS (unix_micros / epoch_us) — an
    # integer both engines render identically; string rendering of
    # fractional seconds is not portable.
    # ORC reads the column back as TIMESTAMP_NTZ; session TZ is UTC, so
    # the cast to TIMESTAMP is identity.
    return (back.withColumn("ts_us",
                            F.unix_micros(F.col("ts").cast("timestamp")))
            .groupBy("event_type").agg(
                F.count(F.lit(1)).alias("n_events"),
                # decimal → string → double: exact decimal render + one
                # correctly-rounded parse in both engines; a direct
                # decimal→double cast double-rounds differently per engine
                # once the unscaled sum crosses 2^53 (see SCALE.md).
                F.sum(F.col("value").cast("decimal(18,6)"))
                 .cast("string").cast("double").alias("sum_value"),
                _checksum("event_id", "ts_us", "user_id").alias("checksum")))


def q_zorder_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) data layout — the lakehouse OPTIMIZE ZORDER
    story: orders rewritten clustered on the interleaved
    (o_custkey, days-since-1992) value, then a 2-D box predicate
    (customer range × date range) read back from the clustered copy.
    The aggregate (count + exact-decimal sum via the string route +
    min/max z-value) must equal the same box computed on the ORIGINAL
    parquet — certifying both the rewrite cycle and the z-value integer
    arithmetic cross-engine.  The I/O-pruning benefit itself (fewer
    row-groups intersect a box under Z-layout than under a 1-D sort) is
    asserted from parquet footer stats in
    tests/test_sources.test_zorder_layout_prunes_box_rowgroups.
    Scratch hygiene: one path per process, stale siblings removed
    (same policy as q_orc_roundtrip)."""
    import glob
    import shutil

    from ..operators.persist import write_zorder

    o = load_table(spark, sf_dir, "orders")
    path = os.path.join(_SCRATCH, f"zorder_orders_{_PROCESS_UID}")
    cleanup_stale_scratch(_SCRATCH, "zorder_orders_*", keep=path)
    days = F.datediff(F.col("o_orderdate"), F.to_date(F.lit("1992-01-01")))
    write_zorder(o.withColumn("__days", days), path, "o_custkey", "__days")
    back = spark.read.parquet(path)
    box = back.filter(F.col("o_custkey").between(100, 200)
                      & F.col("o_orderdate").between("1995-01-01",
                                                     "1995-06-30"))
    return box.agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
         .cast("string").cast("double").alias("sum_price"),
        F.min("zval").alias("min_z"),
        F.max("zval").alias("max_z"))


def q_agg_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STATISTICS-ONLY aggregation: count/min/max answered from parquet
    FOOTER metadata — the scan returns aggregate results, no data pages
    read (plan shows ``PushedAggregation``; at 100 TB this is the
    difference between a metadata listing and a full-table scan).

    Needs the DataSource-V2 parquet reader (`useV1SourceList` cleared)
    plus ``parquet.aggregatePushdown``; both are set on an ISOLATED
    ``spark.newSession()`` clone (shared SparkContext, separate SQLConf)
    so no other query's plan changes — the returned DataFrame keeps the
    clone's conf at execution time.  tests/test_sources.py asserts the
    PushedAggregation plan shape and that V1 answers identically."""
    s2 = spark.newSession()
    s2.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    s2.conf.set("spark.sql.sources.useV1SourceList", "")
    li = s2.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    return li.agg(F.count(F.lit(1)).alias("n_rows"),
                  F.min("l_quantity").alias("min_qty"),
                  F.max("l_quantity").alias("max_qty"),
                  F.min("l_extendedprice").alias("min_price"),
                  F.max("l_extendedprice").alias("max_price"))


QUERIES = {
    "source_agg_pushdown": q_agg_pushdown,
    "source_zorder_prune": q_zorder_prune,
    "source_stratified_sample": q_stratified_sample,
    "source_orc_roundtrip": q_orc_roundtrip,
    "source_perdoc_roundtrip": q_perdoc_sink_roundtrip,
    "source_jsonl_roundtrip": q_jsonl_roundtrip,
    "source_tsv_roundtrip": q_tsv_roundtrip,
    "source_partitioned_prune": q_partitioned_prune,
    "source_index_store_roundtrip": q_index_store_roundtrip,
    "source_sample_count": q_sample_count,
}

def _zval_sql(x: str, y: str, bits: int = 31) -> str:
    """SQL twin of operators.persist.zorder_value (same shift terms).
    Width 31 == write_zorder's auto-size ceiling; extra leading-zero
    bits contribute 0, so this matches any auto-sized width that covers
    the data — the twin stays static while the engine adapts."""
    terms = []
    for b in range(bits):
        terms.append(f"(((CAST({x} AS BIGINT) >> {b}) & 1) << {2 * b})")
        terms.append(f"(((CAST({y} AS BIGINT) >> {b}) & 1) << {2 * b + 1})")
    return " + ".join(terms)


_ZVAL = _zval_sql("o_custkey",
                  "datediff('day', DATE '1992-01-01', o_orderdate)")

ORACLES = {
    "source_agg_pushdown": """
SELECT count(*) AS n_rows,
       min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
       min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price
FROM lineitem
""",
    # Oracles aggregate the ORIGINAL parquet: equality certifies the
    # write→read cycle, not just the aggregation.
    "source_zorder_prune": f"""
SELECT count(*) AS n_orders,
       CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS VARCHAR)
            AS DOUBLE) AS sum_price,
       min({_ZVAL}) AS min_z,
       max({_ZVAL}) AS max_z
FROM orders
WHERE o_custkey BETWEEN 100 AND 200
  AND o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1995-06-30'
""",
    # F7 filename = sanitize(doc_id || '_') — digits and '_' pass the
    # [a-zA-Z0-9_-] filter untouched.
    "source_perdoc_roundtrip": f"""
SELECT count(*) AS n_files,
       {_checksum_sql("CAST(doc_id AS VARCHAR) || '_'", "text")} AS checksum
FROM documents
""",
    "source_jsonl_roundtrip": f"""
SELECT source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       {_checksum_sql('doc_id', 'text')} AS checksum
FROM documents GROUP BY source
""",
    "source_tsv_roundtrip": f"""
SELECT o_orderstatus, count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
       {_checksum_sql('o_orderkey', 'o_orderstatus')} AS checksum
FROM orders GROUP BY o_orderstatus
""",
    "source_partitioned_prune": f"""
SELECT o_orderstatus, count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
       {_checksum_sql('o_orderkey')} AS checksum
FROM orders WHERE o_orderstatus = 'F' GROUP BY o_orderstatus
""",
    "source_sample_count": """
SELECT count(*) AS n_total, TRUE AS cap_ok, TRUE AS sample_bounded
FROM documents
""",
    "source_orc_roundtrip": f"""
SELECT event_type, count(*) AS n_events,
       CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
           AS sum_value,
       {_checksum_sql('event_id', 'epoch_us(ts)', 'user_id')} AS checksum
FROM events GROUP BY event_type
""",
    "source_stratified_sample": f"""
SELECT lang, count(*) AS n_docs,
       {_checksum_sql('doc_id', 'text')} AS checksum
FROM documents WHERE lang = 'en' GROUP BY lang
""",
}


def _index_store_oracle() -> str:
    # Import here (not at module top) to keep plan modules import-order-free.
    from .search_queries import _TOKENS_CTE

    return f"""
WITH {_TOKENS_CTE},
postings AS (
  SELECT term, doc_id, count(*) AS tf,
         string_agg(CAST(position AS VARCHAR), ',' ORDER BY position) AS pos
  FROM tokens GROUP BY term, doc_id),
payload AS (
  SELECT 'term_document' AS tbl,
         term || chr(31) || doc_id || chr(31) || CAST(tf AS VARCHAR)
              || chr(31) || pos AS p
  FROM postings
  UNION ALL
  SELECT 'document_frequency' AS tbl,
         term || chr(31) || CAST(count(*) AS VARCHAR) AS p
  FROM postings GROUP BY term
  UNION ALL
  SELECT 'documents_info' AS tbl,
         doc_id || chr(31) || CAST(len(toks) AS VARCHAR) AS p
  FROM docs)
SELECT tbl, count(*) AS n_rows,
       bit_xor({md5_hash64_sql('p')}) AS checksum
FROM payload GROUP BY tbl
"""


ORACLES["source_index_store_roundtrip"] = _index_store_oracle()
