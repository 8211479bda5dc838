"""Data-preparation pipeline (SURVEY.md §3 E1 — `app/prepare_data.py`):
sample → project → normalize title → stage.

Reference parity notes:
- P2 sampling: the reference computes ``fraction = 100*n/count`` which
  EXceeds 1.0 on small inputs and errors (SURVEY.md §7.5); guarded here
  with ``min(1.0, ...)``.  seed=0 kept.
- P3 limit after sample (`prepare_data.py:21`).
- F2 title normalization: the reference registers a Python UDF
  (`prepare_data.py:23-27`); native ``trim(regexp_replace(...))`` here —
  no JVM→Python hop.
- S3 TSV staging sink (`prepare_data.py:41`) and S4 per-doc text files
  (`prepare_data.py:31-38`, filename ``{id}_{title}.txt`` sanitized per F7)
  are kept for fidelity but Parquet is the primary staging format: TSV
  loses types and splits poorly on multiline text at scale.
- S4 writes one file per row — driver-visible side artifact in the
  reference; here a partitioned text write so it stays distributed (no
  ``foreach`` + local-FS dependency on executors).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import normalize_whitespace, sanitize_filename


def sample_corpus(docs: DataFrame, n: int = 1000, seed: int = 0,
                  oversample: float = 100.0) -> DataFrame:
    """P2+P3 (`prepare_data.py:20-21`): Bernoulli-oversample then cap at n."""
    total = docs.count()
    if total == 0:
        return docs
    fraction = min(1.0, oversample * n / total)
    return docs.sample(fraction=fraction, seed=seed).limit(n)


# Bounded-collect contract for the scalar-fraction path: the strata
# enumeration is a driver-side distinct().collect(), inherent to the
# sampleBy fractions API.  Fine for the intended strata (source labels,
# languages — tens of keys); a high-cardinality stratum column would
# stall the driver at scale, so the enumeration is capped and raises
# instead of silently collecting millions of keys (same policy as
# dedup.LOCAL_CC_MAX_EDGES).
STRATA_MAX_KEYS = 10_000


def stratified_sample(docs: DataFrame, strata_col: str,
                      fractions: dict[str, float] | float,
                      seed: int = 0) -> DataFrame:
    """Stratified (per-stratum Bernoulli) sampling — the training-data-mix
    operator: downsample over-represented sources/languages to a target
    ratio.  ``fractions`` is per-stratum, or a scalar applied to all
    observed strata.  `sampleBy` is a map-side filter: no shuffle, scales
    to any input size; only the strata enumeration (when a scalar is
    given) touches the driver, bounded by ``STRATA_MAX_KEYS`` — pass an
    explicit ``fractions`` dict (or a plain ``rand() < f`` filter) for
    unbounded-cardinality strata."""
    if not isinstance(fractions, dict):
        keys = [r[0] for r in (docs.select(strata_col).distinct()
                               .limit(STRATA_MAX_KEYS + 1).collect())]
        if len(keys) > STRATA_MAX_KEYS:
            raise ValueError(
                f"stratified_sample: > {STRATA_MAX_KEYS} distinct "
                f"'{strata_col}' strata; pass an explicit fractions dict "
                f"instead of enumerating unbounded keys on the driver")
        fractions = {k: float(fractions) for k in keys}
    return docs.sampleBy(strata_col, fractions, seed=seed)


def prepare_documents(docs: DataFrame, id_col: str = "doc_id",
                      title_col: str | None = None,
                      text_col: str = "text") -> DataFrame:
    """P1+P4: project to (doc_id, [title,] text), normalize title whitespace."""
    cols = [F.col(id_col).cast("string").alias("doc_id")]
    if title_col is not None:
        cols.append(normalize_whitespace(title_col).alias("title"))
    cols.append(F.col(text_col).alias("text"))
    return docs.select(*cols)


def stage_tsv(prepared: DataFrame, path: str) -> None:
    """S3: the reference's HDFS TSV staging write."""
    from ..sources.io import write_tsv

    write_tsv(prepared, path)


def write_doc_files(prepared: DataFrame, path: str,
                    title_col: str = "title") -> None:
    """S4: per-document text artifact.  The reference `foreach`-writes one
    local file per row from executors; here each row becomes
    ``filename \\t text`` in a distributed text dataset — same information,
    no driver/local-FS coupling."""
    fname = sanitize_filename(
        F.concat_ws("_", F.col("doc_id"),
                    F.col(title_col) if title_col in prepared.columns
                    else F.lit("")))
    (prepared.select(F.concat_ws("\t", fname, F.col("text")).alias("value"))
     .write.mode("overwrite").text(path))


def sample_per_key(df: DataFrame, key_col: str, k: int,
                   salt: str = "", id_col: str = "doc_id") -> DataFrame:
    """Deterministic per-key sample: exactly min(k, |stratum|) rows per
    key, selected by md5 hash rank — the distributed, reproducible
    replacement for per-key reservoir sampling (Vitter's Algorithm R
    needs sequential state; ranking a uniform hash gives the same
    uniform-k-subset marginal per stratum and is embarrassingly
    parallel).  Unlike :func:`stratified_sample` (Bernoulli — only the
    EXPECTED per-stratum count is controlled) the output size per key is
    exact, which is what eval-set carving and per-source caps need.

    Scale shape: one shuffle on ``key_col``; the rank window sorts
    WITHIN each key's partition (never a single-partition global
    window).  A pathologically hot key serializes only its own
    partition; for exact-k-per-key semantics that sort is inherent.
    Returns (key, id, sample_rank) with rank 1..k by hash order —
    deterministic across engines and runs for a fixed salt.
    """
    from pyspark.sql.window import Window

    sid = F.col(id_col).cast("string")
    h = F.md5(F.concat(sid, F.lit(salt)))
    w = Window.partitionBy(key_col).orderBy(h, sid)
    return (df.select(F.col(key_col), sid.alias(id_col))
            .withColumn("sample_rank", F.row_number().over(w))
            .filter(F.col("sample_rank") <= k))
