"""Sources & sinks (SURVEY.md §2.1, S1-S13).

The reference's storage zoo (HDFS TSV staging, per-doc text files, three
Cassandra tables loaded by driver-side batch INSERTs — `app/app.py:121-250`)
collapses to Parquet DataFrames: the vectorized Parquet reader (the reference
opts in at `app/prepare_data.py:12`; Spark's default) gives columnar scans
with predicate pushdown and column pruning for free.

Writers keep the reference's shapes available (TSV staging S3, per-doc text
S4) for fidelity, but Parquet is the primary format — splittable, columnar,
statistics-bearing, the right call at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# The harness tables (TESTDATA.md); one parquet file per table.
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar scan of one harness table (S1, `prepare_data.py:19`).

    ``events.ts`` is parquet TIMESTAMP(NANOS); with
    ``spark.sql.legacy.parquet.nanosAsLong`` it arrives as a nanos-epoch
    long and is floored to microseconds here — the same truncation DuckDB
    applies when it reads nanos into its native micro timestamps, so both
    engines see identical values.
    """
    # Self-sufficient: the driver may hand us a session built without
    # session.py's confs; both flags are runtime-settable.  UTC is
    # required for oracle parity — event-time window bucketing and
    # date_format render in the session zone, while the DuckDB
    # date_trunc oracles are zone-free (round-4 ADVICE: a non-UTC host
    # would shift day-window boundaries).  Set on EVERY load path, not
    # just events, so timestamp rendering is not order-dependent on
    # which table a bare session happens to touch first (round-5
    # ADVICE).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, names=TABLES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str, names=TABLES) -> None:
    """Register temp views so spark.sql(...) sees the same names DuckDB does."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


def write_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None,
                  mode: str = "overwrite") -> None:
    """Primary sink. ``partition_by`` enables storage-level partition pruning
    (the Spark equivalent of the reference's term-partitioned Cassandra table,
    `app/app.py:48`)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_tsv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """TSV staging sink (S3, `prepare_data.py:41`) — kept for reference parity;
    prefer Parquet."""
    df.write.option("sep", "\t").mode(mode).csv(path)


def read_tsv(spark: SparkSession, path: str, schema) -> DataFrame:
    """Quote-aware TSV scan (S5, `mapper1.py:20-24`)."""
    return spark.read.option("sep", "\t").schema(schema).csv(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-Lines sink — the lingua franca of LLM training corpora.
    One JSON object per line, splittable when uncompressed (each executor
    reads a byte range and resyncs on newlines), so a 100 TB corpus export
    still parallelizes on read."""
    df.write.mode(mode).json(path)


def read_jsonl(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """JSON-Lines scan.  ALWAYS pass a schema in production: schema
    inference is a full extra pass over the data (at 100 TB, a second
    100 TB scan before the first byte of real work)."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.json(path)


def cleanup_stale_scratch(scratch: str, pattern: str,
                          keep: str | None = None,
                          max_age_s: int = 1800) -> None:
    """Best-effort removal of STALE sibling scratch dirs only — never a
    directory a concurrently-running process may still be using.  The
    per-process scratch paths embed either the owning pid
    (``near_dedup_{pid}_{seq}``) or a process uuid; a dir is deleted
    only if (a) an embedded decimal token is a pid that is no longer
    alive, or (b) no token parses as a pid AND the dir's mtime is older
    than ``max_age_s``.  Anything that might belong to a live process
    (its pid is alive, or it is younger than the age gate) is left
    alone — a concurrent gate + bench run must never have its store or
    sink deleted mid-query."""
    import glob
    import os
    import shutil
    import time

    def pid_alive(pid: int) -> bool:
        try:
            os.kill(pid, 0)
            return True
        except ProcessLookupError:
            return False
        except OSError:
            return True       # exists under another uid / can't tell: keep

    now = time.time()
    for stale in glob.glob(os.path.join(scratch, pattern)):
        if keep is not None and os.path.abspath(stale) == os.path.abspath(keep):
            continue
        tokens = [t for t in os.path.basename(stale).split("_") if t.isdigit()]
        # Floor of 300 keeps small sequence counters (near_dedup_{pid}_{seq},
        # seq starts at 0) from false-matching live low-numbered system pids.
        pids = [int(t) for t in tokens if 300 <= int(t) < 2 ** 22]
        if pids:
            if any(pid_alive(p) for p in pids):
                continue                           # owner may still run
        else:
            try:
                if now - os.path.getmtime(stale) < max_age_s:
                    continue                       # too young to judge
            except OSError:
                continue
        shutil.rmtree(stale, ignore_errors=True)
